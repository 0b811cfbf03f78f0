package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the corpus-pipeline ops added around dedup: sequence
  * packing (scalable prefix sum), stratified sampling, quality filter.
  */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("domain mix: binding source fully taken, shares track targets, deterministic") {
    // Rates math, integer-exact: a is the scarce weighted source, so it
    // is taken in full (1e6 ppm) and b downsamples to its share.
    val rates = Corpus.domainMixRates(
      Map("a" -> 100L, "b" -> 1000L, "c" -> 7L),
      Seq("a" -> 500, "b" -> 500))
    assert(rates == Map("a" -> 1000000L, "b" -> 100000L)) // c unweighted: dropped
    // Zero-weight and absent sources never produce rates.
    assert(Corpus.domainMixRates(Map("a" -> 5L), Seq("x" -> 1000)).isEmpty)

    // End-to-end: only weighted sources survive; the realized mix is
    // within hash-threshold noise of the 4:3:2:1 target; deterministic.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val out = Corpus.domainMix(docs)
    val bySrc = out.groupBy($"source").count()
      .as[(String, Long)].collect().toMap
    assert(bySrc.keySet.subsetOf(Corpus.MixWeights.map(_._1).toSet),
      s"unweighted sources must drop, got ${bySrc.keySet}")
    assert(bySrc.getOrElse("src0", 0L) >= bySrc.getOrElse("src1", 0L))
    assert(bySrc.getOrElse("src1", 0L) > bySrc.getOrElse("src3", 0L),
      s"shares must order by weight: $bySrc")
    val ids1 = out.select($"doc_id").as[Long].collect().sorted.toSeq
    val ids2 = Corpus.domainMix(docs.repartition(7))
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2, "mixing must be layout-independent")
  }

  test("packSequences equals the single-threaded reference packing") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val budget = 256L
    val got = Corpus.packSequences(docs, budget)
      .select($"doc_id", $"n_tok", $"seq_id", $"seq_pos", $"spans")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)

    // Reference model: sort by (hash, id) in memory, run the cumsum.
    val keyed = docs.select($"doc_id",
        TextOps.tokenCountWs($"text").as("n_tok"),
        Dedup.hash60(concat(lit("pack:"), $"doc_id".cast("string"))).as("k"))
      .filter($"n_tok" > 0)
      .as[(Long, Long, Long)].collect().sortBy(t => (t._3, t._1))
    var cum = 0L
    val expected = keyed.map { case (id, n, _) =>
      val start = cum; cum += n
      (id, n, start / budget, start % budget, (cum - 1) / budget - start / budget + 1)
    }.sortBy(_._1)
    assert(got.toSeq == expected.toSeq)
    // Every position is inside the budget; spans >= 1.
    assert(got.forall(r => r._4 >= 0 && r._4 < budget && r._5 >= 1))
  }

  test("packSequences output is independent of input layout") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def run(df: org.apache.spark.sql.DataFrame) =
      Corpus.packSequences(df).as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(run(docs) == run(docs.repartition(13, $"lang")))
  }

  test("packSequences edge cases: unit budget, exact-budget docs, empty docs") {
    val rows = Seq(
      (1L, "alpha beta gamma"), // 3 tokens
      (2L, ""), // zero tokens -> excluded
      (3L, "one two")) // 2 tokens
    val df = rows.toDF("doc_id", "text")
    // budget=1: every token its own sequence; spans == n_tok.
    val unit = Corpus.packSequences(df, budget = 1L)
      .select($"doc_id", $"n_tok", $"spans").as[(Long, Long, Long)].collect()
    assert(unit.length == 2) // empty doc excluded
    assert(unit.forall(r => r._3 == r._2))
    // Budget exactly equal to total tokens: one sequence, everything
    // at spans=1, seq_id=0.
    val exact = Corpus.packSequences(df, budget = 5L)
      .select($"seq_id", $"spans").as[(Long, Long)].collect()
    assert(exact.forall(r => r._1 == 0L && r._2 == 1L))
  }

  test("stratified sample is deterministic and respects per-language rates") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def kept(df: org.apache.spark.sql.DataFrame) =
      Corpus.stratifiedSample(df).select($"doc_id").as[Long].collect().toSet
    val a = kept(docs)
    assert(a == kept(docs.repartition(7))) // layout-independent
    // Unlisted languages keep everything.
    val frAll = docs.filter($"lang" === "fr").select($"doc_id").as[Long].collect().toSet
    assert(frAll.subsetOf(a))
    // Listed languages are actually downsampled (rate < 100 drops some).
    val enAll = docs.filter($"lang" === "en").select($"doc_id").as[Long].collect().toSet
    val enKept = enAll & a
    assert(enKept.size < enAll.size && enKept.nonEmpty)
  }

  test("line dedup drops repeated lines globally, keeps first occurrence") {
    val rows = Seq(
      // doc 1: two distinct 10-word lines (20 words).
      (1L, ((1 to 10).map(i => s"a$i") ++ (1 to 10).map(i => s"b$i")).mkString(" ")),
      // doc 2: repeats doc 1's first line, adds a fresh one.
      (2L, ((1 to 10).map(i => s"a$i") ++ (1 to 10).map(i => s"c$i")).mkString(" ")),
      // doc 3: exact copy of doc 1 — every line dropped.
      (3L, ((1 to 10).map(i => s"a$i") ++ (1 to 10).map(i => s"b$i")).mkString(" ")))
    val got = Dedup.lineDedup(rows.toDF("doc_id", "text"))
      .select($"doc_id", $"n_lines", $"n_kept", $"text_hash")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1L, 2L, 2L), (2L, 2L, 1L), (3L, 2L, 0L)))
    // Doc 3 keeps nothing: its rebuilt text is the md5 of "".
    assert(got(2)._4 == java.security.MessageDigest.getInstance("MD5")
      .digest("".getBytes).map("%02x".format(_)).mkString)
    // Determinism across layouts.
    val again = Dedup.lineDedup(rows.toDF("doc_id", "text").repartition(5))
      .select($"doc_id", $"n_lines", $"n_kept", $"text_hash")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(again.toSeq == got.toSeq)
  }

  test("line dedup hot line: one boilerplate line in EVERY doc, salted window stays exact") {
    // The straggler scenario the salted two-phase window exists for: the
    // same nav-bar line opens every document. All its occurrences would
    // land in ONE window partition unsalted; the salted form must still
    // keep exactly the globally-first occurrence (doc 0, pos 0).
    val nav = (1 to 10).map(i => s"nav$i").mkString(" ")
    val n = 500
    val rows = (0 until n.toInt).map { i =>
      (i.toLong, nav + " " + (1 to 10).map(j => s"u${i}w$j").mkString(" "))
    }
    val got = Dedup.lineDedup(rows.toDF("doc_id", "text"))
      .select($"doc_id", $"n_lines", $"n_kept")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length == n)
    // Doc 0 keeps both lines; every other doc keeps only its unique line.
    assert(got.head == ((0L, 2L, 2L)))
    assert(got.tail.forall { case (_, lines, kept) => lines == 2L && kept == 1L },
      s"hot-line first-wins broke: ${got.tail.filterNot(t => t._2 == 2L && t._3 == 1L).take(5).toSeq}")
    // Phase-1 salting really spreads the hot line: with 500 occurrences
    // and 16 salts, every (line, salt) group is ~31 rows, and the
    // phase-2 global window sees at most LineSalts rows per line.
    assert(Dedup.LineSalts > 1)
  }

  test("vocab returns deterministic top-k with exact counts") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val got = TextOps.vocab(docs, k = 20)
      .as[(String, Long, Long)].collect()
    assert(got.length == 20)
    // Sorted by (occurrences desc, word asc); df <= occurrences.
    assert(got.sliding(2).forall { case Array(x, y) =>
      x._2 > y._2 || (x._2 == y._2 && x._1 < y._1) })
    assert(got.forall(r => r._3 <= r._2 && r._3 >= 1))
    // Exact count spot-check against a direct aggregate.
    val (w, occ, _) = got.head
    val direct = docs.select(explode(TextOps.words($"text")).as("w"))
      .filter($"w" === w).count()
    assert(direct == occ)
  }

  test("end-to-end pipeline composes: output only packs kept, deduped, sampled train docs") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val out = Corpus.pipelineQuery(spark, dir)
      .select($"doc_id").as[Long].collect().toSet
    // Recompute the survivor set stage by stage with an independent
    // in-memory model (pure-JVM md5 for the hash predicates).
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val kept = docs.filter(Corpus.qualityVerdict($"text") === "keep")
      .select($"doc_id", $"text", $"lang").as[(Long, String, String)].collect()
    val firstPerText = kept.groupBy(_._2).values.map(_.minBy(_._1)._1).toSet
    val expected = kept
      .filter(r => firstPerText.contains(r._1))
      .filter(r => h60(s"sample:${r._1}") % 100 <
        Corpus.SampleRates.getOrElse(r._3, 100))
      .filter(r => h60(s"split:${r._1}") % 100 < 80) // train
      .filter(_._2.trim.nonEmpty) // packing excludes zero-token docs
      .map(_._1).toSet
    assert(out == expected)
  }

  test("quality verdict fires each rule on a crafted doc, first rule wins") {
    val rows = Seq(
      (1L, "a b"), // too_short (2 words)
      (2L, "one two three four five !!!???!!!***###$$$%%%"), // punct_soup
      (3L, "extraordinarily incomprehensible characteristically "
        + "disproportionately institutionalization"), // long_words
      (4L, (1 to 25).map(i => s"w$i").mkString(" ")), // no_stopwords (und)
      (5L, "the cat sat on the mat and it is happy today"), // keep
      (6L, Seq.fill(30)("spam").mkString(" "))) // repetitive (1 distinct 3-gram)
    val got = rows.toDF("doc_id", "text")
      .select($"doc_id", Corpus.qualityVerdict($"text").as("v"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "too_short", 2L -> "punct_soup",
      3L -> "long_words", 4L -> "no_stopwords", 5L -> "keep",
      6L -> "repetitive"))
  }
}
