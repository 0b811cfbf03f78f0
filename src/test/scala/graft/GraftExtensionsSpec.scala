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
