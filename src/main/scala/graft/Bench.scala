package graft

import graft.ingest.TokenGen
import graft.maintain.{Cluster, Compact, Expire, Merge}
import graft.table.TokenTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main (driver contract): one JSON line with per-query
  * seconds plus the north-star metrics — post-maintenance full-scan
  * tokens/sec and compaction GB/s (BASELINE.json `metric`).
  *
  * The maintenance cycle runs on a deterministic TokenGen table sized by
  * SPARK_GRAFT_BENCH_ROWS (default 6M rows / ~588M tokens — the
  * BASELINE.md workload, so driver benches are same-scale); the
  * representative testdata queries run on SPARK_GRAFT_SF_DIR. Scaling
  * evidence (N vs 4N): run this main at SPARK_GRAFT_CPUS=8 and =32 on
  * the same inputs — results recorded in BASELINE.md.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // Default = BASELINE.md's measured workload (6M rows / ~588M tokens)
    // so per-round BENCH numbers are a same-scale comparison against the
    // published medians; round 1 defaulted to 400k and its absolute
    // throughputs were overhead-dominated (~3x below the 6M medians).
    val benchRows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "6000000").toLong
    // tmpfs when available: the sandbox's single virtual disk serializes
    // concurrent IO and would measure the disk, not the engine (a real
    // cluster has per-node disks/object storage).
    // SPARK_GRAFT_BENCH_DIR overrides for runs whose working set
    // (several retained table versions + shuffle) would not fit in RAM
    // as tmpfs pages — e.g. the 60M-row robustness cycle runs on disk.
    // The wiped scratch roots are always a bench-OWNED subdirectory
    // named graft_bench / graft-spark-local UNDER whatever the env names
    // (ADVICE r3): pointing SPARK_GRAFT_BENCH_DIR at /tmp or a shared
    // volume must never recursively delete that directory's own contents.
    val benchRoot = sys.env.get("SPARK_GRAFT_BENCH_DIR")
      .map(d => s"${d.stripSuffix("/")}/graft_bench")
      .getOrElse(
        if (java.nio.file.Files.isWritable(java.nio.file.Paths.get("/dev/shm")))
          "/dev/shm/graft_bench"
        else s"${System.getProperty("java.io.tmpdir")}/graft_bench")
    // Config-scoped scratch: concurrent benches at DIFFERENT configs
    // (e.g. a 24M scaling run and a 400k smoke) must not wipe each
    // other's live tables out from under them.
    val benchBase = s"$benchRoot/run_${benchRows}_$cpus"
    // Wipe the whole OWNED base (stale tables from other widths plus
    // spark-local shuffle dirs that a killed JVM never cleaned): on
    // tmpfs these pages are RAM, and tens of leftover GB plus the live
    // run's working set is exactly how the OOM-killer gets invoked.
    wipe(benchBase)
    // SPARK_GRAFT_LOCAL_DIR splits scratch storage: the biggest runs
    // put table versions on disk (capacity) and shuffle on tmpfs
    // (bandwidth) — neither alone holds a 60M-row cycle on this box.
    val localDir = sys.env.get("SPARK_GRAFT_LOCAL_DIR")
      .map(d => s"${d.stripSuffix("/")}/graft-spark-local")
      .getOrElse(s"$benchBase/spark-local")
    wipe(localDir)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      times(name) = (System.nanoTime() - t0) / 1e9
      r
    }

    // ---------------- north-star maintenance cycle on a TokenGen table
    //
    // The cycle runs SPARK_GRAFT_BENCH_REPS times (default 3) on a fresh
    // table each rep, and the artifact reports per-phase MEDIANS (plus
    // min and the raw runs): this box swings ±20-30% run to run, and a
    // single draw once recorded a 1.9x phantom "regression" (VERDICT r3)
    // — the official artifact must carry its own noise evidence.
    case class Cycle(times: Map[String, Double], tokens: Long, bytesIn: Long)
    def runCycle(rep: Int, benchRows: Long): Cycle = {
      val cycleTimes = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      def ctimed[A](name: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        cycleTimes(name) = (System.nanoTime() - t0) / 1e9
        r
      }
      val loc = s"$benchBase/t_${benchRows}_${cpus}_rep$rep"
      wipe(loc)
      val t = TokenTable.create(spark, loc)
      val commits = 24
      ctimed("ns_ingest") {
        // Concurrent appenders (real ingest is many writers): the CAS
        // commit protocol auto-rebases append conflicts. Fixed partition
        // count -> identical file layout at every parallelism level (the
        // scaling comparison holds the plan constant, varying only
        // concurrency).
        val per = benchRows / commits
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
      // Work-unit size is a function of DATA, not core count, so the plan
      // is identical at every parallelism level (the N-vs-4N comparison
      // then varies only concurrency): ~64 units total, floor 8MB.
      val targetBytes = math.max(8L * 1024 * 1024, bytesIn / 64L)
      spark.conf.set("spark.sql.files.maxPartitionBytes", targetBytes.toString)
      ctimed("ns_compact") {
        Compact.run(t, targetBytes = targetBytes, jobId = "bench-compact",
          parallelism = cpus)
      }
      ctimed("ns_zorder") {
        Cluster.run(t, Cluster.ZOrder, "bench-zorder", targetBytes = targetBytes)
      }
      ctimed("ns_merge") {
        // 5% updates + 2% inserts
        val upd = TokenGen.generate(spark, benchRows / 20, idOffset = 0,
          minLen = 32, maxLen = 160, numPartitions = 32)
        val ins = TokenGen.generate(spark, benchRows / 50,
          idOffset = benchRows * 10, minLen = 32, maxLen = 160, numPartitions = 32)
        Merge.mergeInto(t, upd.unionByName(ins), "offset", "bench-merge")
      }
      ctimed("ns_expire") { Expire.run(t, retainLast = 1, graceMs = 0) }
      // Metadata-cheap scan: sum(n_tok) prunes to one int column.
      val tokens = ctimed("ns_scan") {
        t.scan().agg(sum(col("n_tok").cast("long"))).head().getLong(0)
      }
      // The headline metric — post-maintenance FULL scan: decodes every
      // token array and folds it into a checksum, so all bytes are read.
      val fullChecksum = ctimed("ns_scan_full") {
        t.scan().agg(
          sum(col("n_tok").cast("long")),
          sum(pmod(xxhash64(col("doc_id"), col("tokens")), lit(1000000007L)))).head()
      }
      require(fullChecksum.getLong(0) == tokens, "scan disagreement")
      // Row-level DELETE (M9) as the final phase — AFTER both scans, so
      // every earlier phase measures the identical table state it did
      // in prior rounds' artifacts. 2% of the keyspace by doc_id range:
      // post-Z-order the range prunes against file stats, the boundary
      // files rewrite copy-on-write.
      ctimed("ns_delete") {
        val lo = f"doc_${benchRows / 4}%012d"
        val hi = f"doc_${benchRows / 4 + benchRows / 50}%012d"
        val res = graft.maintain.Delete.deleteWhere(t,
          col("doc_id") >= lo && col("doc_id") < hi, "bench-delete")
        require(res.deletedRows > 0, "bench delete removed nothing")
      }
      wipe(loc) // keep tmpfs flat across reps
      Cycle(cycleTimes.toMap, tokens, bytesIn)
    }

    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    // JIT warm-up: the first cycle in a fresh JVM consistently runs
    // 1.5-2x slow (C2 compiling the whole write/stats/codegen stack),
    // which poisons a 3-rep median. One eighth-scale cycle compiles all
    // phases at ~1/8 cost; it is REPORTED (warmup_rows) but never mixed
    // into the stats. SPARK_GRAFT_BENCH_WARMUP=0 disables.
    val warmup = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "1").toInt
    val warmupRows = if (warmup > 0) math.max(benchRows / 8, 96000L) else 0L
    if (warmup > 0) runCycle(-1, warmupRows)
    val cycles = (0 until reps).map(runCycle(_, benchRows))
    // Deterministic generator ⇒ identical tables ⇒ identical totals.
    require(cycles.map(_.tokens).distinct.size == 1, "cross-rep token disagreement")
    require(cycles.map(_.bytesIn).distinct.size == 1, "cross-rep byte disagreement")
    val tokens = cycles.head.tokens
    val compactBytesIn = cycles.head.bytesIn
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val phaseNames = Seq("ns_ingest", "ns_compact", "ns_zorder", "ns_merge",
      "ns_expire", "ns_scan", "ns_scan_full", "ns_delete")
    val phaseRuns: Map[String, Seq[Double]] =
      phaseNames.map(p => p -> cycles.map(_.times(p))).toMap
    phaseNames.foreach(p => times(p) = median(phaseRuns(p)))

    // ---------------- representative testdata queries (driver contract)
    // SPARK_GRAFT_BENCH_SKIP_QUERIES=1 runs the north-star cycle only —
    // for N-vs-4N scaling runs, whose evidence is phase_stats alone.
    val skipQueries = sys.env.get("SPARK_GRAFT_BENCH_SKIP_QUERIES").contains("1")
    for (name <- if (skipQueries) Seq.empty[String]
      else Seq("d1_dedup_firstwins", "m3_stats_agg", "text_analyze",
        "dedup_exact", "dedup_minhash_lsh", "dedup_simhash_hamming",
        "dedup_ngram_jaccard", "sim_bruteforce_topk", "sim_lsh_ann",
        "sim_ivf_ann", "dedup_embedding", "multimodal_features",
        "dedup_clusters", "corpus_pack", "corpus_quality_filter",
        "dedup_lines", "corpus_vocab", "text_scrub", "text_line_dedup_doc",
        "text_repetition", "text_lm_perplexity", "corpus_domain_mix",
        "corpus_pipeline_e2e")) {
      timed(name) {
        try SparkEntry.queries(name)(spark, sfDir).count()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1L }
      }
    }
    // Each packSequences call releases its predecessor's cached
    // projection; drop the final one too so the session ends clean.
    ops.Corpus.releasePackCache()

    // queries carries the MEDIAN per ns_* phase; phase_stats carries
    // median/min plus every raw run so the artifact evidences its own
    // noise (single draws on this box swing ±20-30%).
    val scanTps = tokens / math.max(times("ns_scan_full"), 1e-9)
    val compactGbps = (compactBytesIn / 1e9) / math.max(times("ns_compact"), 1e-9)
    val total = times.values.sum
    val qs = times.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val stats = phaseNames.map { p =>
      val runs = phaseRuns(p)
      s""""$p":{"median":${median(runs)},"min":${runs.min},"runs":[${runs.mkString(",")}]}"""
    }.mkString("{", ",", "}")
    // Which BASELINE.md row this artifact compares against (VERDICT r3
    // task 7): keyed by the workload config, so a 6M/32-cpu driver run
    // is never read against the 24M scaling table or vice versa.
    val baselineRow =
      s"BASELINE.md 'Current (round 4)' row rows=$benchRows cpus=$cpus"
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"""" +
        s""","cpus":$cpus,"bench_rows":$benchRows,"reps":$reps""" +
        s""","warmup_rows":$warmupRows,"tokens":$tokens""" +
        s""","scan_tokens_per_sec":${scanTps.toLong}""" +
        s""","compact_gb_per_sec":${f"$compactGbps%.4f"}""" +
        s""","compact_bytes_in":$compactBytesIn""" +
        s""","baseline_row":"$baselineRow"""" +
        s""","phase_stats":$stats}""")
    spark.stop()
  }

  def wipeDir(dir: String): Unit = wipe(dir)

  private def wipe(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val st = java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
      try st.iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      finally st.close()
    }
  }
}
