package graft

import graft.ingest.TokenGen
import org.apache.spark.sql.SparkSession

/** Write-path microbenchmark (measurement tool, guide §1.4): times the
  * pieces of one bench ingest commit — generation alone (noop sink),
  * parquet encode at zstd levels, stats collection — so write-side
  * optimizations are chosen from numbers, not folklore.
  */
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val rows = 1500000L // 6 bench commits' worth
    val base = "/dev/shm/graft_write_probe"
    Bench.wipeDir(base)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", s"$base/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def gen() = TokenGen.asTokenRows(TokenGen.generate(
      spark, rows, idOffset = 0, minLen = 32, maxLen = 160, numPartitions = 128))
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[wp] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs load=${Bench.loadavg()}")
    }
    // JIT warm-up
    gen().limit(100000).write.format("noop").mode("overwrite").save()
    gen().limit(100000).write.mode("overwrite").option("compression", "zstd").parquet(s"$base/warm")

    for (rep <- 1 to 2) {
      timed("gen->noop")(gen().write.format("noop").mode("overwrite").save())
      timed("gen->parquet-zstd3") {
        gen().write.mode("overwrite").option("compression", "zstd")
          .option("parquet.block.size", (32L * 1024 * 1024).toString)
          .parquet(s"$base/z3")
      }
      spark.sparkContext.hadoopConfiguration.setInt("parquet.compression.codec.zstd.level", 1)
      timed("gen->parquet-zstd1") {
        gen().write.mode("overwrite").option("compression", "zstd")
          .option("parquet.block.size", (32L * 1024 * 1024).toString)
          .parquet(s"$base/z1")
      }
      spark.sparkContext.hadoopConfiguration.unset("parquet.compression.codec.zstd.level")
      timed("gen->parquet-snappy") {
        gen().write.mode("overwrite").option("compression", "snappy")
          .option("parquet.block.size", (32L * 1024 * 1024).toString)
          .parquet(s"$base/sn")
      }
      timed("gen->parquet-uncompressed") {
        gen().write.mode("overwrite").option("compression", "uncompressed")
          .option("parquet.block.size", (32L * 1024 * 1024).toString)
          .parquet(s"$base/un")
      }
      timed("gen->parquet-zstd3-nodict") {
        gen().write.mode("overwrite").option("compression", "zstd")
          .option("parquet.block.size", (32L * 1024 * 1024).toString)
          .option("parquet.enable.dictionary", "false")
          .parquet(s"$base/z3nd")
      }
      timed("gen->parquet-zstd3-bigpage") {
        gen().write.mode("overwrite").option("compression", "zstd")
          .option("parquet.block.size", (32L * 1024 * 1024).toString)
          .option("parquet.page.size", (8 * 1024 * 1024).toString)
          .parquet(s"$base/z3bp")
      }
      // Read-side check: full decode + checksum of each layout.
      import org.apache.spark.sql.functions._
      for ((tag, p) <- Seq("z3" -> s"$base/z3", "z3nd" -> s"$base/z3nd")) {
        timed(s"scan-checksum-$tag") {
          spark.read.parquet(p)
            .agg(sum(pmod(xxhash64(col("doc_id"), col("tokens")), lit(1000000007L)))).head()
        }
      }
      def du(p: String): Long = {
        val d = new java.io.File(p)
        if (!d.exists) 0L else d.listFiles.map(f => f.length).sum
      }
      println(s"[wp] bytes z3=${du(s"$base/z3") / 1e6}MB z1=${du(s"$base/z1") / 1e6}MB " +
        s"snappy=${du(s"$base/sn") / 1e6}MB unc=${du(s"$base/un") / 1e6}MB " +
        s"z3nd=${du(s"$base/z3nd") / 1e6}MB z3bp=${du(s"$base/z3bp") / 1e6}MB")
      // Stats pass over the z3 output (128 files) — the per-commit cost
      // TokenTable.statsFor pays on the driver pool.
      timed("statsFor(128 files)") {
        val t = new graft.table.TokenTable(base, spark)
        val s = t.statsFor("z3")
        require(s.map(_.rows).sum == rows, s"stat rows ${s.map(_.rows).sum}")
      }
      val _ = rep
    }
    spark.stop()
  }
}
