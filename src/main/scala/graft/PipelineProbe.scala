package graft

import graft.ops.{Corpus, Dedup, TextOps}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch profiler for the e2e pipeline stages (temporary). */
object PipelineProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    timed("warmup") { docs.count() }
    timed("verdict_scan") {
      Corpus.withVerdict(docs).filter(col("verdict") === "keep").count()
    }
    timed("pipeline_full") { Corpus.pipelineQuery(spark, dir).count() }
    timed("pipeline_full_again") { Corpus.pipelineQuery(spark, dir).count() }
    timed("dedup_minhash") { Dedup.minhashLsh(Dedup.augmented(spark, dir)).count() }
    timed("dedup_jaccard") { Dedup.ngramJaccard(Dedup.augmented(spark, dir)).count() }
    timed("line_dedup") { Dedup.lineDedupQuery(spark, dir).count() }
    timed("contamination") { Corpus.contaminationQuery(spark, dir).count() }
    spark.stop()
  }
}
