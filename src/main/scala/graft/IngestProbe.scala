package graft

import graft.ingest.TokenGen
import graft.table.TokenTable
import org.apache.spark.sql.SparkSession

/** Diagnostic: per-phase timing of the append path at a given
  * parallelism — `runMain graft.IngestProbe <cpus> <rowsPerCommit>
  * <commits>`. Replays exactly what [[TokenTable.append]] does
  * (write → stats → manifest → CAS) but timed per phase, to localize
  * per-commit floors that only appear at low core counts (the 4-cpu
  * verify smoke once showed ~10 s/commit where local[32] shows ~0.5 s).
  */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val per = if (args.length > 1) args(1).toLong else 16666L
    val commits = if (args.length > 2) args(2).toInt else 6
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", "/dev/shm/graft/local")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).agg(org.apache.spark.sql.functions.sum("id")).head()
    val loc = s"/dev/shm/graft/ingestprobe_$cpus"
    Bench.wipeDir(loc)
    val t = TokenTable.create(spark, loc)
    def ms[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e6)
    }
    val writers = if (args.length > 3) args(3).toInt else 1
    def oneCommit(c: Int): String = {
      val (df, tGen) = ms(TokenGen.asTokenRows(TokenGen.generate(
        spark, per, idOffset = c * per, minLen = 32, maxLen = 160,
        numPartitions = 32)))
      val (added, tWrite) = ms(t.writeDataFiles(df))
      val (manifest, tMan) = ms(t.writeManifest(added))
      val (_, tCommit) = ms {
        val parent = if (t.currentVersion >= 0) Some(t.current) else None
        t.commit(parent, "append",
          addManifests = Seq(manifest),
          keepManifests = parent.map(_.manifests).getOrElse(Nil),
          removedPaths = Set.empty, maxAttempts = 64)
      }
      f"commit $c%2d: gen $tGen%7.1f  write+stats $tWrite%8.1f  " +
        f"manifest $tMan%6.1f  cas $tCommit%6.1f  files=${added.size}"
    }
    if (writers <= 1) (0 until commits).foreach(c => println(oneCommit(c)))
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val fs = (0 until commits).map(c => scala.concurrent.Future(oneCommit(c)))
      try scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(fs),
        scala.concurrent.duration.Duration.Inf).foreach(println)
      finally pool.shutdown()
    }
    spark.stop()
  }
}
