package graft.ingest

import graft.SparkSpec
import graft.table.TokenTable

/** S2 dead-letter sink: quarantined rows land in the DLQ table with
  * their error AND original payload (strictly more than the reference,
  * which forwards only the error string —
  * `/root/reference/src/kafka/mod.rs:288-300`), while good rows commit.
  */
class DeadLetterSpec extends SparkSpec {
  import spark.implicits._

  test("ingest with deadLetterDir: bad rows quarantined, good rows committed") {
    val dir = tmpDir("dlq-tbl")
    val dlq = tmpDir("dlq-out")
    val t = TokenTable.create(spark, dir)
    val good = """{"doc_id":"doc_%d","tokens":[1,2],"n_tok":2,"source":"web"}"""
    val batch = Seq(
      RawMessage("t", 0, 0, Some("k0"), good.format(0)),
      RawMessage("t", 0, 1, Some("k1"), "garbage"),
      RawMessage("t", 0, 2, Some("k2"), """{"doc_id":"x","n_tok":1,"source":"web"}"""),
      RawMessage("t", 0, 3, Some("k3"), good.format(3))).toDS()
    val res = Ingest.ingestBatch(t, batch, deadLetterDir = Some(dlq))
    assert(res.appended == 2)
    assert(res.deadLettered == 2)
    def readDlq() = spark.read
      .option("recursiveFileLookup", "true").parquet(dlq)
    val dead = readDlq()
    assert(dead.count() == 2)
    val byOffset = dead.select($"offset", $"error", $"value")
      .as[(Long, String, String)].collect().map(r => r._1 -> r).toMap
    assert(byOffset(1L)._2.startsWith("ParseError"))
    assert(byOffset(2L)._2.startsWith("MissingField") && byOffset(2L)._2.contains("tokens"))
    assert(byOffset(1L)._3 == "garbage", "original payload must be preserved")
    // A second batch lands in its own deterministic subdir (the DLQ is
    // a table, not a topic).
    Ingest.ingestBatch(t,
      Seq(RawMessage("t", 0, 9, Some("k9"), "also bad")).toDS(),
      deadLetterDir = Some(dlq))
    assert(readDlq().count() == 3)
  }

  test("DLQ retry is idempotent: a replayed batch overwrites its own subdir") {
    // Crash between the DLQ write and the snapshot commit leaves the
    // watermark unadvanced -> the SAME batch is retried. Two fresh
    // tables against one DLQ dir simulate the commit never landing: the
    // batch tag is offset-derived, so the retry overwrites in place
    // instead of appending duplicates.
    val dlq = tmpDir("dlq-idem")
    val batch = Seq(
      RawMessage("t", 0, 0, Some("k0"), "bad one"),
      RawMessage("t", 0, 1, Some("k1"), "bad two")).toDS()
    Ingest.ingestBatch(TokenTable.create(spark, tmpDir("dlq-t1")), batch,
      deadLetterDir = Some(dlq))
    Ingest.ingestBatch(TokenTable.create(spark, tmpDir("dlq-t2")), batch,
      deadLetterDir = Some(dlq))
    val dead = spark.read.option("recursiveFileLookup", "true").parquet(dlq)
    assert(dead.count() == 2, "replayed dead letters must not duplicate")
  }
}
