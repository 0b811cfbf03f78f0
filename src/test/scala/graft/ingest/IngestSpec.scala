package graft.ingest

import graft.SparkSpec
import graft.table.TokenTable

/** Ingest-path tests mirroring the reference's unit suite
  * (`/root/reference/src/pipeline/mod.rs:302-385`,
  * `src/utils/mod.rs:380-460`) plus the exactly-once replay integration
  * test it left as a TODO.
  */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def msg(offset: Long, key: String, value: String,
      partition: Int = 0): RawMessage =
    RawMessage("t", partition, offset, Option(key), value)

  private val good =
    """{"doc_id":"%s","tokens":[1,2,3],"n_tok":3,"source":"web"}"""

  test("parse: valid rows project to the token schema") {
    val (valid, dead) = Ingest.parse(Seq(
      msg(0, "a", good.format("doc_a")),
      msg(1, "b", good.format("doc_b"))).toDS())
    assert(valid.count() == 2 && dead.count() == 0)
    val r = valid.orderBy("offset").head()
    assert(r.getAs[String]("doc_id") == "doc_a")
    assert(r.getAs[scala.collection.Seq[Int]]("tokens") == Seq(1, 2, 3))
  }

  test("parse: empty JSON object is silently dropped (not an error)") {
    val (valid, dead) = Ingest.parse(Seq(msg(0, "a", "{}")).toDS())
    assert(valid.count() == 0 && dead.count() == 0)
  }

  test("parse: non-object, missing field, type mismatch -> dead letters") {
    val (valid, dead) = Ingest.parse(Seq(
      msg(0, "a", "not json at all"),
      msg(1, "b", """[1,2,3]"""),
      msg(2, "c", """{"doc_id":"x","tokens":[1],"n_tok":1}"""), // missing source
      msg(3, "d", """{"doc_id":"x","tokens":"oops","n_tok":1,"source":"web"}"""),
      msg(4, "e", good.format("doc_ok"))).toDS())
    assert(valid.count() == 1)
    val errs = dead.collect().map(d => d.offset -> d.error).toMap
    assert(errs.keySet == Set(0L, 1L, 2L, 3L))
    assert(errs(2L).startsWith("MissingField"))
    assert(errs(2L).contains("source"))
    assert(errs(3L).startsWith("TypeMismatch"))
  }

  test("dedup D1: duplicate offset -> first wins") {
    val df = Seq(
      ("doc_a", Seq(1), 1, "web", 5L),
      ("doc_b", Seq(2), 1, "web", 5L) // same offset, different key
    ).toDF("doc_id", "tokens", "n_tok", "source", "offset")
    val out = Ingest.dedupFirstWins(df)
    assert(out.count() == 1)
  }

  test("dedup D1: duplicate key -> first (lowest offset) wins") {
    val df = Seq(
      ("doc_a", Seq(9, 9), 2, "web", 7L),
      ("doc_a", Seq(1), 1, "web", 3L),
      ("doc_b", Seq(2), 1, "web", 9L)
    ).toDF("doc_id", "tokens", "n_tok", "source", "offset")
    val out = Ingest.dedupFirstWins(df).select($"doc_id", $"offset")
      .as[(String, Long)].collect().toMap
    assert(out == Map("doc_a" -> 3L, "doc_b" -> 9L))
  }

  test("ingest batch -> atomic snapshot; replay is exactly-once (X1)") {
    val dir = tmpDir("tbl")
    val t = TokenTable.create(spark, dir)
    val batch = (0L until 100L).map(i => msg(i, s"doc_$i", good.format(s"doc_$i"))).toDS()
    val r1 = Ingest.ingestBatch(t, batch)
    assert(r1.appended == 100)
    val state = checksum(t.scan())

    // Crash-replay: the exact same batch arrives again (reference
    // rebalance-replay semantics) -> watermark filters everything.
    val r2 = Ingest.ingestBatch(t, batch)
    assert(r2.appended == 0 && r2.replayFiltered == 100)
    assert(checksum(t.scan()) == state, "replay must be a no-op on table state")

    // Partial overlap: offsets 50..149 -> only 100..149 are new.
    val overlap = (50L until 150L).map(i => msg(i, s"doc_$i", good.format(s"doc_$i"))).toDS()
    val r3 = Ingest.ingestBatch(t, overlap)
    assert(r3.appended == 50 && r3.replayFiltered == 50)
    assert(t.scan().count() == 150)
  }

  test("generator: tokens are a pure function of doc_id (duplicates byte-equal)") {
    val df = TokenGen.generate(spark, 300, dupRate = 0.1)
    import org.apache.spark.sql.functions._
    val dups = df.groupBy($"doc_id")
      .agg(countDistinct(xxhash64($"tokens")).as("variants"), count(lit(1)).as("n"))
    assert(dups.filter($"variants" =!= 1).count() == 0,
      "same doc_id must always carry identical tokens")
    assert(dups.filter($"n" > 1).count() > 0, "dupRate must produce duplicates")
    // n_tok always equals the token array length.
    assert(df.filter(size($"tokens") =!= $"n_tok").count() == 0)
  }
}
