package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  test("lg1k: integer fixed-point log2 — monotone, within 90/1024 below true log2") {
    val rows = spark.range(1, 5001).select(col("id"),
      LmScore.lg1k(col("id")).as("lg")).collect()
    var prev = Long.MinValue
    rows.foreach { r =>
      val n = r.getLong(0); val lg = r.getLong(1)
      val exact = 1024.0 * (math.log(n.toDouble) / math.log(2.0))
      assert(lg <= exact + 1e-6, s"n=$n lg=$lg above exact=$exact")
      assert(lg >= exact - 90, s"n=$n lg=$lg too far below exact=$exact")
      assert(lg >= prev, s"n=$n broke monotonicity")
      prev = lg
    }
    // exact at powers of two — the case floating log2 implementations miss
    assert(rows(0).getLong(1) == 0L)
    assert(rows(1023).getLong(1) == 10 * 1024L)
    assert(rows(4095).getLong(1) == 12 * 1024L)
  }

  test("score: repetitive text scores fewer bits than novel text") {
    val repeated = ("the cat sat on the mat " * 60).trim
    val novel = (1 to 360).map(i => s"zq${i}xw").mkString(" ")
    val docs = Seq((1L, repeated), (2L, novel)).toDF("doc_id", "text")
    val out = LmScore.score(docs).collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L)._1 == 360L && out(2L)._1 == 360L) // bigrams = word count
    // the repeated phrase's bigrams dominate the model -> low surprisal;
    // each novel word is a hapax (all in-vocab, every bigram count 1)
    assert(out(1L)._2 < out(2L)._2,
      s"repetitive ${out(1L)._2} should be < novel ${out(2L)._2}")
  }

  test("score: model stays bounded by (V+2)^2 and OOV words map to <unk>") {
    // vocabCap 4: only 4 words survive; everything else shares <unk>
    val docs = (1 to 40).map { i =>
      (i.toLong, s"aa bb cc dd rare$i other$i more$i")
    }.toDF("doc_id", "text")
    val out = LmScore.score(docs, vocabCap = 4)
    assert(out.count() == 40L)
    // rebuild the mapped-bigram space the way the operator does and
    // check the cap: 4 vocab words + <s> + <unk> = 6 distinct tokens
    val words = docs.select(explode(TextOps.words(col("text"))).as("w"))
      .groupBy("w").count().orderBy(col("count").desc, col("w")).limit(4)
      .as[(String, Long)].collect().map(_._1).toSet
    assert(words == Set("aa", "bb", "cc", "dd"))
    val bigramTypes = docs.select(col("doc_id"), TextOps.words(col("text")).as("ws"))
      .select(explode(expr(
        "arrays_zip(slice(concat(array('<s>'), ws), 1, size(ws)), " +
        "slice(concat(array('<s>'), ws), 2, size(ws)))")).as("b"))
      .select(col("b").getField("0").as("w1"), col("b").getField("1").as("w2"))
      .select(
        when(col("w1").isin(words.toSeq :+ "<s>": _*), col("w1")).otherwise("<unk>").as("w1"),
        when(col("w2").isin(words.toSeq: _*), col("w2")).otherwise("<unk>").as("w2"))
      .distinct().count()
    assert(bigramTypes <= 36L, s"mapped bigram space $bigramTypes > (V+2)^2")
  }

  test("score: deterministic across runs and zero-word docs drop out") {
    val docs = Seq((1L, "alpha beta gamma alpha beta"), (2L, "!!! ???"),
      (3L, "beta gamma alpha")).toDF("doc_id", "text")
    val a = LmScore.score(docs).orderBy("doc_id").collect().toSeq
    val b = LmScore.score(docs).orderBy("doc_id").collect().toSeq
    assert(a == b)
    assert(a.map(_.getLong(0)) == Seq(1L, 3L)) // doc 2 has no [a-z0-9]+ words
  }
}
