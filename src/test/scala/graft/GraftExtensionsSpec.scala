package graft

import graft.functions.{CurveKeys, Keys}
import org.apache.spark.sql.functions._

/** The native expressions work through all three public surfaces:
  * Column API, temp-function registration, and a codegen'd projection.
  */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("z_interleave / hilbert_index usable from SQL after registration") {
    CurveKeys.register(spark, bitsPer = 20)
    val r = spark.sql(
      "SELECT z_interleave(5L, 9L, 12L) AS z, hilbert_index(5L, 9L, 12L) AS h").head()
    assert(r.getLong(0) == Keys.zInterleave(Array(5L, 9L, 12L), 20))
    assert(r.getLong(1) == Keys.hilbertIndex(Array(5L, 9L, 12L), 20))
  }

  test("word_grams / quantize_vec / qdot_vec / token_seq usable from SQL after registration") {
    graft.functions.TextGrams.register(spark)
    val r = spark.sql(
      """SELECT word_grams(array('a','b','c','d'), 3, 1) AS sh,
        |       word_grams(array('a','b','c','d'), 3, 3) AS ch,
        |       quantize_vec(array(CAST(0.123 AS FLOAT), CAST(-0.5 AS FLOAT)), 100) AS q,
        |       qdot_vec(array(2L, 3L), array(5L, 7L)) AS d,
        |       token_seq('doc_x', 4, 50257) AS t""".stripMargin).head()
    assert(r.getSeq[String](0) == Seq("a b c", "b c d"))
    assert(r.getSeq[String](1) == Seq("a b c", "d"))
    assert(r.getSeq[Long](2) == Seq(12L, -50L))
    assert(r.getLong(3) == 31L)
    // token_seq must agree with Spark's own xxhash64 streaming.
    val expected = spark.sql(
      "SELECT transform(sequence(0, 3), j -> CAST(pmod(xxhash64('doc_x', j), 50257) AS INT))")
      .head().getSeq[Int](0)
    assert(r.getSeq[Int](4) == expected)
  }

  test("curve expressions evaluate identically in codegen and interpreted paths") {
    val df = spark.range(1000).select(
      col("id"),
      CurveKeys.zkey(20, col("id"), col("id") * 3, col("id") + 7).as("z"),
      CurveKeys.hilbertKey(20, col("id"), col("id") * 3, col("id") + 7).as("h"))
    df.collect().foreach { r =>
      val i = r.getLong(0)
      assert(r.getLong(1) == Keys.zInterleave(Array(i, i * 3, i + 7), 20))
      assert(r.getLong(2) == Keys.hilbertIndex(Array(i, i * 3, i + 7), 20))
    }
  }

  test("null inputs propagate to null keys") {
    val df = Seq((Some(1L), 2L), (None, 3L)).toDF("a", "b")
      .select(CurveKeys.zkey(20, col("a"), col("b")).as("z"))
    val rows = df.collect()
    assert(!rows(0).isNullAt(0) && rows(1).isNullAt(0))
  }
}
