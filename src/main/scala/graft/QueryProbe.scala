package graft

import org.apache.spark.sql.SparkSession

/** Adjacent A/B probe for the representative pipeline queries
  * (measurement tool; guide §1): each rep runs every listed query under
  * both settings of `graft.ops.materialize` back-to-back, so box drift
  * multiplies both arms equally and the per-rep ratio is trustworthy —
  * the official bench runs each query ONCE, which makes single-draw
  * comparisons across bench invocations meaningless for these.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("GRAFT_PROBE_REPS", "3").toInt
    val names = sys.env.get("GRAFT_PROBE_QUERIES")
      .map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq("dedup_minhash_lsh", "dedup_simhash_hamming",
        "dedup_ngram_jaccard", "dedup_substring", "dedup_lines",
        "dedup_clusters", "text_lm_perplexity", "corpus_pipeline_e2e",
        "sim_lsh_ann", "sim_ivf_ann"))
    val base = "/dev/shm/graft_query_probe"
    Bench.wipeDir(base)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", s"$base/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    // JIT warm-up: one pass of everything, both settings.
    for (m <- Seq("on", "off"); n <- names) {
      spark.conf.set("graft.ops.materialize", m); run(n)
    }
    ops.Corpus.releasePackCache()
    val acc = scala.collection.mutable.Map.empty[(String, String), List[Double]]
      .withDefaultValue(Nil)
    // Alternate the arm order per rep: running the same query twice
    // back-to-back warms code paths for whichever arm goes second, a
    // measured ~1.5x bias on otherwise-identical plans.
    for (r <- 1 to reps; n <- names;
         m <- if (r % 2 == 1) Seq("on", "off") else Seq("off", "on")) {
      spark.conf.set("graft.ops.materialize", m)
      val t = run(n)
      acc((n, m)) = t :: acc((n, m))
    }
    ops.Corpus.releasePackCache()
    def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
    names.foreach { n =>
      val on = acc((n, "on")); val off = acc((n, "off"))
      println(f"[qp] $n%-24s on med=${med(on)}%5.2f min=${on.min}%5.2f | off med=${med(off)}%5.2f min=${off.min}%5.2f | ratio(on/off)=${med(on) / med(off)}%4.2f")
    }
    spark.stop()
  }
}
