package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-wise with
  * `mapPartitions` over a typed Dataset (the Scala analog of PySpark's
  * `mapInPandas` — one decoder instantiation per partition, rows
  * streamed through it).
  *
  * The container has no image/audio codecs, so the *decode* step is a
  * clearly-marked deterministic stub ([[StubDecoder]]); everything
  * Spark-side — schema, binary handling, partition-wise batching, the
  * feature projection — is real and oracle-checked (byte lengths and
  * first-byte features are computable in SQL).
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(doc_id: Long, media: Array[Byte], media_type: String,
      n_bytes: Long)

  /** Extracted features. `feat` stands in for a decoded embedding. */
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
      first_byte: Int, feat: Array[Float])

  /** STUB: a real pipeline would decode the image/audio payload here
    * (e.g. JPEG -> pixels -> CNN features). Deterministic fake: an
    * 8-dim feature from byte statistics, so tests and oracles are
    * stable. Instantiated once per partition (the expensive-decoder
    * pattern), not per row.
    */
  class StubDecoder {
    def features(payload: Array[Byte]): Array[Float] = {
      val f = new Array[Float](8)
      var i = 0
      while (i < payload.length) {
        f(i % 8) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      f
    }
  }

  /** Synthesize a media table from `documents` (UTF-8 bytes of the text
    * stand in for an encoded image). Deterministic and SQL-mirrorable.
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        encode(col("text"), "utf-8").as("media"),
        lit("text/plain").as("media_type"),
        octet_length(encode(col("text"), "utf-8")).cast("long").as("n_bytes"))
      .as[MediaRow]
  }

  /** The feature-extraction job: partition-wise decode with one decoder
    * per partition. This is the genuinely imperative step (external
    * codec), hence `mapPartitions` rather than a Column expression.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = new StubDecoder // once per partition
      rows.map { r =>
        MediaFeatures(r.doc_id, r.media_type, r.n_bytes,
          if (r.media.nonEmpty) r.media(0) & 0xff else -1,
          decoder.features(r.media))
      }
    }
  }

  /** Oracle-checkable projection (no float feature columns). */
  def featureSummary(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaTable(spark, dir))
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        col("first_byte").cast("long").as("first_byte"))

  /** documents.text is ASCII, so utf-8 byte length == n_chars and the
    * first byte is ascii(first char).
    */
  val featureSummarySql: String =
    """SELECT doc_id, 'text/plain' AS media_type,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |       CAST(CASE WHEN length(text) > 0 THEN ascii(substr(text, 1, 1)) ELSE -1 END AS BIGINT) AS first_byte
      |FROM documents""".stripMargin
}
