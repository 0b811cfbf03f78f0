package graft

import graft.ingest.TokenGen
import graft.maintain.{Cluster, Compact, Expire, Merge}
import graft.table.TokenTable
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement-only companion to [[Bench]] (guide §1: measure first;
  * §1.4/1.5 noop-style isolation + labelled jobs). NOT part of the
  * driver contract — Bench.scala stays frozen; this main exists so the
  * optimization round can attribute each north-star phase's wall time
  * to (a) Spark jobs (with shuffle/input byte totals per job) and (b)
  * driver-side gaps (planning, stats pools, commit IO), without
  * touching the measured harness.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.BenchExtra"
  * Optional: SPARK_GRAFT_BENCH_ROWS (default 6000000),
  *           SPARK_GRAFT_EXTRA_PHASES=ns_merge,ns_zorder (filter).
  */
object BenchExtra {

  private case class JobRec(jobId: Int, desc: String, submitMs: Long,
      var endMs: Long = 0L, var stages: Int = 0, var tasks: Int = 0,
      var runTimeMs: Long = 0L, var shufReadB: Long = 0L,
      var shufWriteB: Long = 0L, var inputB: Long = 0L,
      var outputB: Long = 0L)

  private class JobLog extends SparkListener {
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    override def onJobStart(js: SparkListenerJobStart): Unit = {
      val desc = Option(js.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
      val rec = JobRec(js.jobId, desc, js.time)
      jobs.put(js.jobId, rec)
      js.stageIds.foreach(sid => stageToJob.put(sid, js.jobId))
    }
    override def onJobEnd(je: SparkListenerJobEnd): Unit = {
      Option(jobs.get(je.jobId)).foreach(_.endMs = je.time)
    }
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      Option(stageToJob.get(si.stageId)).flatMap(j => Option(jobs.get(j))).foreach { r =>
        r.synchronized {
          r.stages += 1
          r.tasks += si.numTasks
          val m = si.taskMetrics
          r.runTimeMs += m.executorRunTime
          r.shufReadB += m.shuffleReadMetrics.totalBytesRead
          r.shufWriteB += m.shuffleWriteMetrics.bytesWritten
          r.inputB += m.inputMetrics.bytesRead
          r.outputB += m.outputMetrics.bytesWritten
        }
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val benchRows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "6000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val phaseFilter = sys.env.get("SPARK_GRAFT_EXTRA_PHASES")
      .map(_.split(",").map(_.trim).toSet)
    val benchBase = {
      val root =
        if (java.nio.file.Files.isWritable(java.nio.file.Paths.get("/dev/shm")))
          "/dev/shm/graft_bench_extra"
        else s"${System.getProperty("java.io.tmpdir")}/graft_bench_extra"
      s"$root/run_${benchRows}_$cpus"
    }
    Bench.wipeDir(benchBase)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", s"$benchBase/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val log = new JobLog
    spark.sparkContext.addSparkListener(log)

    def runCycle(rows: Long, rep: String, report: Boolean): Unit = {
      val loc = s"$benchBase/t_${rows}_$rep"
      Bench.wipeDir(loc)
      val t = TokenTable.create(spark, loc)
      val phases = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]
      def phase[A](name: String)(f: => A): A = {
        if (phaseFilter.exists(!_.contains(name))) return null.asInstanceOf[A]
        spark.sparkContext.setJobDescription(name)
        val t0 = System.currentTimeMillis()
        val r = f
        val t1 = System.currentTimeMillis()
        phases(name) = (t0, t1)
        spark.sparkContext.setJobDescription(null)
        r
      }
      val commits = 24
      phase("ns_ingest") {
        val per = rows / commits
        val writers = math.max(1, math.min(4, cpus / 2))
        val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
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
      }
      val bytesIn = t.filesLocal(t.current).map(_.bytes).sum
      val targetBytes = math.max(8L * 1024 * 1024, bytesIn / 64L)
      spark.conf.set("spark.sql.files.maxPartitionBytes", targetBytes.toString)
      phase("ns_compact") {
        Compact.run(t, targetBytes = targetBytes, jobId = "bench-compact",
          parallelism = cpus)
      }
      phase("ns_zorder") {
        Cluster.run(t, Cluster.ZOrder, "bench-zorder", targetBytes = targetBytes)
      }
      phase("ns_merge") {
        val upd = TokenGen.generate(spark, rows / 20, idOffset = 0,
          minLen = 32, maxLen = 160, numPartitions = 32)
        val ins = TokenGen.generate(spark, rows / 50,
          idOffset = rows * 10, minLen = 32, maxLen = 160, numPartitions = 32)
        Merge.mergeInto(t, upd.unionByName(ins), "offset", "bench-merge")
      }
      phase("ns_expire") { Expire.run(t, retainLast = 1, graceMs = 0) }
      phase("ns_scan") {
        t.scan().agg(sum(col("n_tok").cast("long"))).head().getLong(0)
      }
      phase("ns_scan_full") {
        t.scan().agg(
          sum(col("n_tok").cast("long")),
          sum(pmod(xxhash64(col("doc_id"), col("tokens")), lit(1000000007L)))).head()
      }
      phase("ns_delete") {
        val lo = f"doc_${rows / 4}%012d"
        val hi = f"doc_${rows / 4 + rows / 50}%012d"
        graft.maintain.Delete.deleteWhere(t,
          col("doc_id") >= lo && col("doc_id") < hi, "bench-delete")
      }
      if (report) {
        import scala.jdk.CollectionConverters._
        val allJobs = log.jobs.values.asScala.toSeq.sortBy(_.submitMs)
        println(f"%nPHASE BREAKDOWN rows=$rows")
        phases.foreach { case (name, (t0, t1)) =>
          val wall = (t1 - t0) / 1000.0
          val js = allJobs.filter(j => j.submitMs >= t0 && j.submitMs < t1)
          val jobWall = js.map(j => math.max(0L, j.endMs - j.submitMs)).sum / 1000.0
          println(f"%n== $name%-14s wall=$wall%7.2fs  jobs=${js.size}%3d  jobWall=$jobWall%7.2fs  driverGap=${wall - jobWall}%7.2fs")
          js.foreach { j =>
            val d = math.max(0L, j.endMs - j.submitMs) / 1000.0
            if (d >= 0.05)
              println(f"   job ${j.jobId}%4d  ${d}%7.2fs  stages=${j.stages}%2d tasks=${j.tasks}%4d run=${j.runTimeMs / 1000.0}%8.1fs in=${j.inputB / 1e6}%8.1fMB out=${j.outputB / 1e6}%8.1fMB sr=${j.shufReadB / 1e6}%8.1fMB sw=${j.shufWriteB / 1e6}%8.1fMB  ${j.desc.take(40)}")
          }
        }
      }
      Bench.wipeDir(loc)
    }

    // Warm-up (JIT) at 1/8 scale, then one measured cycle.
    runCycle(math.max(benchRows / 8, 96000L), "warm", report = false)
    log.jobs.clear()
    println(s"[extra] calib=${Bench.calibrate()}%.0f loadavg=${Bench.loadavg()}")
    runCycle(benchRows, "meas", report = true)
    spark.stop()
  }
}
