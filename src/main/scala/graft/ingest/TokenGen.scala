package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic token-sequence generator (FIXTURES.md §B).
  *
  * Every column is a pure function of `doc_id` built from Catalyst
  * expressions only (`xxhash64`, `sequence`, `transform`) — fully
  * codegen'd, no UDFs, no RNG state — so (a) any two runs agree, (b)
  * token-array equality is checkable from the key alone, and (c)
  * generation parallelizes perfectly via `spark.range`.
  */
object TokenGen {

  val Vocab = 50257 // GPT-2-ish vocab size
  val Sources = Seq("web", "books", "code", "wiki", "forums")

  /** Zipfian-ish skewed source assignment — intentionally skewed so the
    * clustering salt path gets exercised (north_rule skew splitting).
    * web 50%, books 25%, code 12%, wiki 8%, forums 5%.
    */
  private def sourceFor(docId: org.apache.spark.sql.Column) = {
    val u = pmod(xxhash64(docId, lit("src")), lit(100L))
    when(u < 50, "web")
      .when(u < 75, "books")
      .when(u < 87, "code")
      .when(u < 95, "wiki")
      .otherwise("forums")
  }

  /** Generate `n` rows with ids in [idOffset, idOffset+n).
    *
    * @param dupRate  fraction of rows (<= 0.5; those with
    *                 id % 100 < dupRate*100, id >= 100) that repeat the
    *                 doc_id of a row in the PREVIOUS century's non-dup
    *                 band (`id - 100 + threshold`) — a target that was
    *                 emitted as itself, so every dup row forms a real
    *                 duplicate pair with *identical* tokens, mirroring
    *                 the reference's duplicate-message replay fixtures
    *                 (`/root/reference/src/pipeline/mod.rs:315-352`).
    *                 (Pointing at `id - 100` naively would chain through
    *                 rows that are themselves remapped, collapsing the
    *                 duplicate rate to ~0.)
    */
  def generate(
      spark: SparkSession,
      n: Long,
      dupRate: Double = 0.0,
      minLen: Int = 16,
      maxLen: Int = 128,
      idOffset: Long = 0L,
      numPartitions: Int = 0): DataFrame = {
    require(dupRate >= 0.0 && dupRate <= 0.5, s"dupRate $dupRate not in [0, 0.5]")
    val base =
      if (numPartitions > 0) spark.range(0L, n, 1L, numPartitions)
      else spark.range(n)
    val dupThreshold = math.round(dupRate * 100).toInt
    val docIndex = when(
      col("id") >= 100L && pmod(col("id"), lit(100L)) < dupThreshold,
      col("id") - 100L + dupThreshold).otherwise(col("id")) + lit(idOffset)
    val docId = format_string("doc_%012d", docIndex)
    val len = (pmod(xxhash64(docId, lit("len")), lit((maxLen - minLen + 1).toLong))
      + lit(minLen.toLong)).cast("int")
    base
      .withColumn("doc_id", docId)
      .withColumn("n_tok", len)
      // Native kernel, bit-identical to
      // transform(sequence(0, n_tok-1), j -> pmod(xxhash64(doc_id, j), Vocab))
      // (property-tested): the HOF form re-hashed doc_id per ELEMENT
      // through an interpreted lambda — ~10^8 evals per bench ingest.
      .withColumn("tokens",
        graft.functions.GenOps.tokenSeq(col("doc_id"), col("n_tok"), Vocab))
      .withColumn("source", sourceFor(col("doc_id")))
      .withColumn("offset", col("id") + lit(idOffset)) // ingest-order lineage column
      .select("doc_id", "tokens", "n_tok", "source", "offset")
  }

  /** The token-schema projection (drops the ingest `offset` column). */
  def asTokenRows(df: DataFrame): DataFrame =
    df.select("doc_id", "tokens", "n_tok", "source")
}
