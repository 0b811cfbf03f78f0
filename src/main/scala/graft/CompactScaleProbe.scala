package graft

import graft.ingest.TokenGen
import graft.table.TokenTable
import org.apache.spark.sql.SparkSession

/** Compaction-only N-vs-4N probe — `runMain graft.CompactScaleProbe
  * [rows]`. Concat-path compaction does no Spark job (driver-pool
  * bytewise copies), so its width is `Compact.run(parallelism=...)`,
  * not the session master: two IDENTICAL tables (deterministic
  * generator) compacted at parallelism 2 and 8 isolate the op's
  * scaling at any data size without paying a slow low-width ingest.
  * This exists because the full-cycle 24M artifact measures concat
  * compaction at ~8 s @2 — fast enough that the ~1 s width-independent
  * commit floor (lineage + survivor manifest + CAS) is a visible
  * Amdahl fraction; at larger bins the floor amortizes and the ratio
  * recovers, which is the 10^12-scale regime the north rule names.
  */
object CompactScaleProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 48000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.local.dir", "/dev/shm/graft/local")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).agg(org.apache.spark.sql.functions.sum("id")).head()

    def cycle(width: Int): (Double, Long) = {
      val loc = s"/dev/shm/graft/cscale_$width"
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
      val t0 = System.nanoTime()
      val r = graft.maintain.Compact.run(t, target, s"cscale-$width",
        parallelism = width)
      val wall = (System.nanoTime() - t0) / 1e9
      Bench.wipeDir(loc)
      (wall, r.bytesIn)
    }
    // Warm-up (JIT) at the small width, then INTERLEAVE the widths —
    // three adjacent (p2, p8) pairs — and report the median of per-pair
    // ratios: this box's speed drifts on hour scales (BASELINE.md), and
    // alternation cancels slow drift out of the ratio where a
    // block-of-w2-then-block-of-w8 design confounds it with width.
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    cycle(8)
    val pairs = (0 until 3).map(_ => (cycle(2), cycle(8)))
    val w2 = pairs.map(_._1); val w8 = pairs.map(_._2)
    val (t2, t8) = (med(w2.map(_._1)), med(w8.map(_._1)))
    val pairEff = med(pairs.map { case ((a, _), (b, _)) => a / (4 * b) })
    val gb = w2.head._2 / 1e9
    println(f"compact-only scaling at ${rows / 1000000}M rows ($gb%.1f GB in): " +
      f"p2 med $t2%.2f s (${gb / t2}%.2f GB/s)  p8 med $t8%.2f s (${gb / t8}%.2f GB/s)  " +
      f"pair-ratio median eff $pairEff%.2f  (runs p2=${w2.map(_._1).map(x => f"$x%.2f")} " +
      f"p8=${w8.map(_._1).map(x => f"$x%.2f")})")
    spark.stop()
  }
}
