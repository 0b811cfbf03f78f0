package graft

import graft.ingest.TokenGen
import graft.maintain.{Cluster, Compact, Merge}
import graft.table.TokenTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Controlled A/B probe for the merge rewrite variants (measurement
  * tool; guide §1 — adjacent interleaved runs so box drift cancels):
  * builds the bench's exact pre-merge table state once, snapshots the
  * version, then for each variant runs merge + the bench delete and
  * ROLLS BACK — identical input state for every variant, same JVM,
  * adjacent in time.
  *
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_ROWS as in Bench.
  */
object MergeProbe {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "6000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val base = "/dev/shm/graft_merge_probe"
    Bench.wipeDir(base)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", s"$base/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def build(loc: String, n: Long): TokenTable = {
      Bench.wipeDir(loc)
      val t = TokenTable.create(spark, loc)
      val commits = 24
      val per = n / commits
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val fs = (0 until commits).map { c =>
        scala.concurrent.Future {
          t.append(TokenGen.asTokenRows(TokenGen.generate(
            spark, per, idOffset = c * per, minLen = 32, maxLen = 160,
            numPartitions = 32)))
        }
      }
      try scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(fs),
        scala.concurrent.duration.Duration.Inf)
      finally pool.shutdown()
      val bytesIn = t.filesLocal(t.current).map(_.bytes).sum
      val targetBytes = math.max(8L * 1024 * 1024, bytesIn / 64L)
      spark.conf.set("spark.sql.files.maxPartitionBytes", targetBytes.toString)
      Compact.run(t, targetBytes = targetBytes, jobId = "probe-compact", parallelism = cpus)
      Cluster.run(t, Cluster.ZOrder, "probe-zorder", targetBytes = targetBytes)
      t
    }

    case class V(name: String, confs: Map[String, String])
    val variants = Seq(
      V("smj", Map("graft.merge.broadcastKeyRows" -> "0")),
      V("bc_exchange", Map("graft.merge.broadcastKeyRows" -> "2000000",
        "graft.merge.placement" -> "exchange")),
      V("bc_partition8", Map("graft.merge.broadcastKeyRows" -> "2000000",
        "graft.merge.placement" -> "partition", "graft.merge.rangeGroups" -> "8")),
      V("bc_partition32", Map("graft.merge.broadcastKeyRows" -> "2000000",
        "graft.merge.placement" -> "partition", "graft.merge.rangeGroups" -> "32")),
      V("bc_none", Map("graft.merge.broadcastKeyRows" -> "2000000",
        "graft.merge.placement" -> "none")))

    // Warm-up build+merge at 1/8 scale (JIT).
    val warm = build(s"$base/warm", math.max(rows / 8, 96000L))
    Merge.mergeInto(warm, TokenGen.generate(spark, rows / 160, idOffset = 0,
      minLen = 32, maxLen = 160, numPartitions = 32), "offset", "warm-m")

    val t = build(s"$base/t", rows)
    val preVersion = t.currentVersion
    val reps = sys.env.getOrElse("GRAFT_PROBE_REPS", "2").toInt
    for (rep <- 1 to reps; v <- variants) {
      v.confs.foreach { case (k, x) => spark.conf.set(k, x) }
      val calib = Bench.calibrate()
      val t0 = System.nanoTime()
      val upd = TokenGen.generate(spark, rows / 20, idOffset = 0,
        minLen = 32, maxLen = 160, numPartitions = 32)
      val ins = TokenGen.generate(spark, rows / 50,
        idOffset = rows * 10, minLen = 32, maxLen = 160, numPartitions = 32)
      val mres = Merge.mergeInto(t, upd.unionByName(ins), "offset", s"m-${v.name}-$rep")
      val tm = (System.nanoTime() - t0) / 1e9
      val nFiles = t.filesLocal(mres.snapshot).size
      val d0 = System.nanoTime()
      val lo = f"doc_${rows / 4}%012d"
      val hi = f"doc_${rows / 4 + rows / 50}%012d"
      val res = graft.maintain.Delete.deleteWhere(t,
        col("doc_id") >= lo && col("doc_id") < hi, s"d-${v.name}-$rep")
      val td = (System.nanoTime() - d0) / 1e9
      println(f"[probe] rep=$rep ${v.name}%-14s merge=$tm%6.2fs delete=$td%6.2fs mergeFiles=$nFiles%5d delRewritten=${res.rewrittenFiles} delBytes=${res.decodedBytes / 1e6}%.0fMB calib=${calib.toInt}ms load=${Bench.loadavg()}")
      t.rollbackTo(preVersion)
    }
    spark.stop()
  }
}
