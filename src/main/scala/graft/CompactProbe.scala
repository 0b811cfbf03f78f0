package graft

import graft.ingest.TokenGen
import graft.table.TokenTable
import org.apache.spark.sql.SparkSession

/** Diagnostic: per-bin timing of one bench-shaped compaction —
  * `runMain graft.CompactProbe <cpus> <rows>`. Prints the lineage task
  * durations (decode+encode per bin), the plan shape, and wall times of
  * plan / execute / stats+commit, to localize compaction cost at the
  * official bench config.
  */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0).toInt else 32
    val rows = if (args.length > 1) args(1).toLong else 6000000L
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", "/dev/shm/graft/local")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).agg(org.apache.spark.sql.functions.sum("id")).head()
    val loc = s"/dev/shm/graft/compactprobe_$cpus"
    Bench.wipeDir(loc)
    val t = TokenTable.create(spark, loc)
    val commits = 24
    val per = rows / commits
    (0 until commits).foreach { c =>
      t.append(TokenGen.asTokenRows(TokenGen.generate(
        spark, per, idOffset = c * per, minLen = 32, maxLen = 160,
        numPartitions = 32)))
    }
    val bytes = t.filesLocal(t.current).map(_.bytes).sum
    val target = math.max(8L * 1024 * 1024, bytes / 64L)
    println(f"table: ${bytes / 1e9}%.2f GB, target bin ${target / 1e6}%.1f MB")
    val t0 = System.nanoTime()
    val res = graft.maintain.Compact.run(t, target, "probe-compact",
      parallelism = cpus)
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"compact wall: $wall%.2f s  bins=${res.binsRewritten}  " +
      f"gb/s=${res.bytesIn / 1e9 / wall}%.3f")
    // Post-compaction full scan (token decode): is scan speed hurt by
    // concat's smaller row groups vs re-encode's single big group?
    import org.apache.spark.sql.functions._
    val s0 = System.nanoTime()
    val toks = t.scan().agg(
      sum(col("n_tok").cast("long")),
      sum(pmod(xxhash64(col("doc_id"), col("tokens")), lit(1000000007L)))).head()
    val scanS = (System.nanoTime() - s0) / 1e9
    println(f"post-compact full scan: $scanS%.2f s  " +
      f"(${toks.getLong(0) / scanS / 1e6}%.0f M tokens/s)  files=${t.filesLocal(t.current).size}")
    // Per-bin durations from the lineage records.
    val durs = (0 until res.binsRewritten).flatMap { i =>
      graft.lineage.Lineage.loadTask(t, res.execId, i.toString).map(_.durationMs)
    }.sorted
    if (durs.nonEmpty)
      println(s"bin durations ms: min=${durs.head} p50=${durs(durs.size / 2)} " +
        s"p90=${durs(durs.size * 9 / 10)} max=${durs.last} " +
        s"sum=${durs.sum} n=${durs.size}")

    // --- micro: where does one bin's time go? Reuse the POST-compaction
    // files (each ~target-sized) grouped into one synthetic bin.
    val files = t.filesLocal(t.current).sortBy(_.path).take(12)
    val paths = files.map(f => s"$loc/${f.path}")
    def ms[A](tag: String)(f: => A): Unit = {
      val s = System.nanoTime(); f
      println(f"  $tag%-34s ${(System.nanoTime() - s) / 1e6}%8.1f ms " +
        f"(${files.map(_.bytes).sum / 1e6}%.0f MB in)")
    }
    val df = () => spark.read.schema(t.schema).parquet(paths: _*)
    ms("decode only (count)") { df().selectExpr("sum(n_tok)", "max(tokens[0])").head() }
    ms("coalesce(1) write zstd sort") {
      df().coalesce(1).sortWithinPartitions("doc_id").write
        .mode("overwrite").option("compression", "zstd")
        .option("parquet.block.size", TokenTable.RowGroupBytes.toString)
        .parquet(s"$loc/__probe1")
    }
    ms("coalesce(1) write zstd nosort") {
      df().coalesce(1).write
        .mode("overwrite").option("compression", "zstd")
        .option("parquet.block.size", TokenTable.RowGroupBytes.toString)
        .parquet(s"$loc/__probe2")
    }
    ms("coalesce(1) write zstd nodict") {
      df().coalesce(1).write
        .mode("overwrite").option("compression", "zstd")
        .option("parquet.enable.dictionary", "false")
        .parquet(s"$loc/__probe3")
    }
    ms("coalesce(1) write zstd bigpage") {
      df().coalesce(1).write
        .mode("overwrite").option("compression", "zstd")
        .option("parquet.page.size", (4 * 1024 * 1024).toString)
        .option("parquet.page.size.row.check.min", "10000")
        .parquet(s"$loc/__probe4")
    }
    ms("coalesce(1) write zstd nodict+bigpage") {
      df().coalesce(1).write
        .mode("overwrite").option("compression", "zstd")
        .option("parquet.enable.dictionary", "false")
        .option("parquet.page.size", (4 * 1024 * 1024).toString)
        .option("parquet.page.size.row.check.min", "10000")
        .parquet(s"$loc/__probe5")
    }
    ms("8-task write zstd (per-thread tput)") {
      df().repartition(8).write
        .mode("overwrite").option("compression", "zstd")
        .parquet(s"$loc/__probe6")
    }
    ms("statsFor one bin dir") { t.statsFor("__probe1") }
    spark.stop()
  }
}
