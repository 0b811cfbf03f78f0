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

  /** One sampled "frame": a fixed-size window of the payload (the video
    * frame-sampling analog — every `stride`-th frame is kept).
    */
  case class MediaFrame(doc_id: Long, frame_idx: Long, frame_len: Long,
      frame_first: Long, frame_sum: Long)

  /** Frame sampling: split each payload into frameSize-byte frames and
    * keep every stride-th one — partition-wise imperative extraction
    * (the real pipeline would seek keyframes in a container format),
    * one decoder per partition, rows flat-mapped to frames.
    */
  def sampleFrames(media: Dataset[MediaRow], frameSize: Int = 32,
      stride: Int = 2): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val n = r.media.length
        (0 until n by frameSize).zipWithIndex.collect {
          case (off, idx) if idx % stride == 0 =>
            val end = math.min(off + frameSize, n)
            var s = 0L; var i = off
            while (i < end) { s += r.media(i) & 0xff; i += 1 }
            MediaFrame(r.doc_id, idx, end - off, r.media(off) & 0xff, s)
        }
      }
    }
  }

  /** Resize (thumbnail) stub: keep every `factor`-th byte — the byte-
    * domain stand-in for image downsampling (no codecs in the
    * container); the Spark-side shape (binary in, smaller binary out,
    * partition-wise) is the real pattern.
    */
  def resize(media: Dataset[MediaRow], factor: Int = 4): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val out = Array.tabulate(
          (r.media.length + factor - 1) / factor)(i => r.media(i * factor))
        r.copy(media = out, n_bytes = out.length.toLong)
      }
    }
  }

  /** Driver query: sampled frames of the media table. documents.text is
    * ASCII, so byte i of the payload == ascii(substr(text, i+1, 1)) and
    * the oracle reproduces frame windows with substr arithmetic.
    */
  def frames(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaTable(spark, dir))
      .select(col("doc_id"), col("frame_idx"), col("frame_len"),
        col("frame_first"), col("frame_sum"))

  val framesSql: String =
    """WITH f AS (
      |  SELECT doc_id, text, unnest(range(0, (octet_length(encode(text)) + 31) // 32)) AS frame_idx
      |  FROM documents WHERE octet_length(encode(text)) > 0
      |)
      |SELECT doc_id, frame_idx,
      |  least(32, CAST(octet_length(encode(text)) AS BIGINT) - frame_idx * 32) AS frame_len,
      |  CAST(ascii(substr(text, CAST(frame_idx * 32 + 1 AS INTEGER), 1)) AS BIGINT) AS frame_first,
      |  CAST(list_sum(list_transform(
      |    range(CAST(frame_idx * 32 + 1 AS INTEGER),
      |          CAST(frame_idx * 32 + least(32, CAST(octet_length(encode(text)) AS BIGINT) - frame_idx * 32) + 1 AS INTEGER)),
      |    i -> ascii(substr(text, i, 1)))) AS BIGINT) AS frame_sum
      |FROM f WHERE frame_idx % 2 = 0""".stripMargin

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
