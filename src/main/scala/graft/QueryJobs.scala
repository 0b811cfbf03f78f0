package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Job-timeline dump for one representative query (measurement tool):
  * prints every Spark job's wall time inside the query so sequential-
  * action overhead (hidden driver gaps, repeated subtree computations)
  * is visible. GRAFT_PROBE_QUERIES picks the queries.
  */
object QueryJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val names = sys.env.getOrElse("GRAFT_PROBE_QUERIES",
      "text_lm_perplexity,corpus_pipeline_e2e,dedup_clusters").split(",").toSeq
    val base = "/dev/shm/graft_query_jobs"
    Bench.wipeDir(base)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", s"$base/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class J(id: Int, t0: Long, var t1: Long = 0L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit =
        jobs.put(s.jobId, J(s.jobId, s.time))
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        Option(jobs.get(e.jobId)).foreach(_.t1 = e.time)
    })
    // warm-up
    names.foreach(n => SparkEntry.queries(n)(spark, sfDir).count())
    ops.Corpus.releasePackCache()
    val detail = sys.env.get("GRAFT_PROBE_DETAIL").contains("1")
    for (r <- 1 to 3; n <- names;
         aqe <- if (r % 2 == 1) Seq("true", "false") else Seq("false", "true")) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      jobs.clear()
      val t0 = System.currentTimeMillis()
      SparkEntry.queries(n)(spark, sfDir).count()
      val t1 = System.currentTimeMillis()
      import scala.jdk.CollectionConverters._
      val js = jobs.values.asScala.toSeq.sortBy(_.t0)
      println(f"[qj] == $n aqe=$aqe wall=${(t1 - t0) / 1000.0}%5.2fs jobs=${js.size}")
      if (detail) {
        var prevEnd = t0
        js.foreach { j =>
          val gap = (j.t0 - prevEnd) / 1000.0
          println(f"[qj]   job ${j.id}%4d start+${(j.t0 - t0) / 1000.0}%5.2f wall=${(j.t1 - j.t0) / 1000.0}%5.2f gapBefore=$gap%5.2f")
          prevEnd = math.max(prevEnd, j.t1)
        }
      }
    }
    spark.stop()
  }
}
