package graft

import graft.ops.{Corpus, Dedup, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probe for the LLM-pipeline kernels (the sf0.1 documents
  * table is only 5k docs — per-query bench times there are dominated by
  * fixed planning/codegen cost, not data work). This main replicates
  * the documents deterministically (re-keyed doc_ids), caches the input
  * so every kernel times pure compute + its own shuffles, and prints
  * per-kernel seconds. Run at two widths for the north-rule N -> 4N
  * comparison:
  *
  *   sbt "runMain graft.LlmScaleProbe 2 32"
  *   sbt "runMain graft.LlmScaleProbe 8 32"
  *
  * Two sections:
  *  - LINEAR kernels (signatures, line dedup, packing, vocab, quality)
  *    over replicated real documents;
  *  - PAIR kernels (MinHash+LSH, banded SimHash) over a fully SYNTHETIC
  *    corpus of pairwise-distinct docs with a planted FIXED 5% dup
  *    rate, so candidate-pair counts grow O(N) with corpus size —
  *    replicating real docs would make every doc an N-way near-dup and
  *    grow candidates O(N^2), a property of that degenerate input, not
  *    of the algorithms.
  */
object LlmScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val rep = if (args.length > 1) args(1).toInt else 32
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Same scratch hygiene as Bench: leftover tmpfs shuffle pages from a
    // killed run are RAM, and the probe is documented to run twice
    // back-to-back — wipe before starting.
    val scratch =
      if (java.nio.file.Files.isWritable(java.nio.file.Paths.get("/dev/shm")))
        "/dev/shm/graft_llmprobe"
      else s"${System.getProperty("java.io.tmpdir")}/graft_llmprobe"
    Bench.wipeDir(scratch)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", s"$scratch/local")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val docs = base
      .select(explode(sequence(lit(0), lit(rep - 1))).as("r"),
        col("doc_id"), col("text"), col("lang"))
      .select((col("doc_id") + col("r") * 10000000L).as("doc_id"),
        col("text"), col("lang"))
      .repartition(cpus * 4)
      .persist()
    val nDocs = docs.count()
    val nTok = docs.agg(sum(TextOps.tokenCountWs(col("text")))).head().getLong(0)
    println(s"""{"docs":$nDocs,"tokens":$nTok,"cpus":$cpus,"rep":$rep}""")

    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"""{"kernel":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.3f}""")
    }

    timed("minhash_signatures") {
      Dedup.minhashSignatures(docs)
        .agg(sum(pmod(xxhash64(col("doc_id"), col("sig")), lit(1000000007L)))).head()
    }
    timed("simhash") {
      Dedup.simhashed(docs)
        .agg(sum(pmod(col("simhash"), lit(1000000007L)))).head()
    }
    timed("line_dedup") {
      Dedup.lineDedup(docs).agg(sum(col("n_kept"))).head()
    }
    timed("pack_sequences") {
      Corpus.packSequences(docs).agg(max(col("seq_id"))).head()
    }
    timed("vocab") {
      TextOps.vocab(docs, 100).collect()
    }
    timed("quality_filter") {
      // withVerdict, not the inline convenience form: the verdict
      // references the word array several times and only the
      // materialized-attribute form runs the word regex once per doc.
      Corpus.withVerdict(docs).groupBy(col("verdict")).count().collect()
    }
    docs.unpersist(blocking = true)

    // ---- pair kernels over a planted-dup-rate synthetic corpus ----
    // Base docs are pairwise distinct (60 words drawn per-doc from a
    // 50k vocab via xxhash64 — no shared shingles beyond chance), plus
    // a planted 5% exact-dup rate (doc_id%20==0 re-keyed +10^9), so
    // true pair count is ~N/20 and candidate counts stay O(N).
    val nBase = (nDocs / 2).max(50000L)
    val synth = {
      val words = transform(sequence(lit(0), lit(59)),
        j => concat(lit("w"), pmod(xxhash64(col("doc_id"), j), lit(50000L))))
      val base = spark.range(nBase).select(col("id").as("doc_id"))
        .select(col("doc_id"), array_join(words, " ").as("text"))
      base.unionByName(
        base.filter(col("doc_id") % 20 === 0)
          .select((col("doc_id") + 1000000000L).as("doc_id"), col("text")))
        .repartition(cpus * 4)
        .persist()
    }
    val nSynth = synth.count()
    println(s"""{"synth_docs":$nSynth,"planted_dup_rate":0.05}""")

    timed("minhash_lsh_pairs") {
      val pairs = Dedup.minhashLsh(synth).count()
      // Planted exact dups share all 12 signature positions — the pair
      // count must be at least the planted count (near-chance extras ok).
      require(pairs >= nBase / 20,
        s"minhash pairs $pairs < planted ${nBase / 20}")
    }
    timed("simhash_hamming_pairs") {
      val pairs = Dedup.simhashHamming(synth).count()
      require(pairs >= nBase / 20,
        s"simhash pairs $pairs < planted ${nBase / 20}")
    }
    spark.stop()
  }
}
