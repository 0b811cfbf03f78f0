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

  test("dedup D1: duplicate offset within a partition -> first wins") {
    val df = Seq(
      ("t", 0, "doc_a", Seq(1), 1, "web", 5L),
      ("t", 0, "doc_b", Seq(2), 1, "web", 5L) // same (topic,partition,offset)
    ).toDF("topic", "partition", "doc_id", "tokens", "n_tok", "source", "offset")
    val out = Ingest.dedupFirstWins(df)
    assert(out.count() == 1)
  }

  test("dedup D1: same offset in DIFFERENT partitions is not a duplicate") {
    // Every Kafka partition starts at offset 0 — the reference's global
    // seen_offsets set would wrongly collapse these (recorded
    // discrepancy we do not replicate).
    val df = Seq(
      ("t", 0, "doc_a", Seq(1), 1, "web", 0L),
      ("t", 1, "doc_b", Seq(2), 1, "web", 0L),
      ("u", 0, "doc_c", Seq(3), 1, "web", 0L)
    ).toDF("topic", "partition", "doc_id", "tokens", "n_tok", "source", "offset")
    assert(Ingest.dedupFirstWins(df).count() == 3)
  }

  test("dedup D1: duplicate key -> first (lowest offset) wins") {
    val df = Seq(
      ("t", 0, "doc_a", Seq(9, 9), 2, "web", 7L),
      ("t", 0, "doc_a", Seq(1), 1, "web", 3L),
      ("t", 0, "doc_b", Seq(2), 1, "web", 9L)
    ).toDF("topic", "partition", "doc_id", "tokens", "n_tok", "source", "offset")
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

  test("watermarks survive maintenance commits and concurrent-append rebases") {
    val dir = tmpDir("tbl")
    val t = TokenTable.create(spark, dir)
    val batch0 = (0L until 50L).map(i =>
      RawMessage("t", 0, i, Some(s"p0_$i"), good.format(s"p0_$i"))).toDS()
    Ingest.ingestBatch(t, batch0)

    // A maintenance commit in between must inherit the watermarks.
    graft.maintain.Compact.run(t, targetBytes = 8L * 1024 * 1024, jobId = "wm-c")
    assert(Ingest.watermarks(t.current)("t/0") == 49L,
      "maintenance commits must carry watermarks forward")

    // Two concurrent ingests on different partitions: the rebase loser's
    // commit must keep the winner's watermark.
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val fs = Seq(1, 2).map { p =>
      Future {
        val t2 = TokenTable.open(spark, dir)
        Ingest.ingestBatch(t2, (0L until 30L).map(i =>
          RawMessage("t", p, i, Some(s"p${p}_$i"), good.format(s"p${p}_$i"))).toDS())
      }
    }
    Await.result(Future.sequence(fs), Duration.Inf)
    pool.shutdown()
    val wm = Ingest.watermarks(t.current)
    assert(wm("t/0") == 49L && wm("t/1") == 29L && wm("t/2") == 29L,
      s"all partitions' watermarks must survive the race, got $wm")

    // Replay of every partition is exactly-once.
    val replay = Ingest.ingestBatch(t, (
      (0L until 50L).map(i => RawMessage("t", 0, i, Some(s"p0_$i"), good.format(s"p0_$i"))) ++
      (0L until 30L).map(i => RawMessage("t", 1, i, Some(s"p1_$i"), good.format(s"p1_$i")))).toDS())
    assert(replay.appended == 0 && replay.replayFiltered == 80)
    assert(t.scan().count() == 110)
  }

  test("parse: explicit null required field is quarantined (non-null schema)") {
    val (valid, dead) = Ingest.parse(Seq(
      msg(0, "a", """{"doc_id":"x","tokens":[1],"n_tok":null,"source":"web"}"""),
      msg(1, "b", """{"doc_id":null,"tokens":[1],"n_tok":1,"source":"web"}"""),
      msg(2, "c", good.format("doc_ok"))).toDS())
    assert(valid.count() == 1)
    val errs = dead.collect().map(d => d.offset -> d.error).toMap
    assert(errs(0L).contains("n_tok"))
    assert(errs(1L).contains("doc_id"))
  }

  test("parse: null ELEMENT inside tokens is quarantined (containsNull=false schema)") {
    val (valid, dead) = Ingest.parse(Seq(
      msg(0, "a", """{"doc_id":"x","tokens":[1,null,2],"n_tok":3,"source":"web"}"""),
      msg(1, "b", good.format("doc_ok"))).toDS())
    assert(valid.count() == 1)
    val d = dead.head()
    assert(d.offset == 0L && d.error.contains("tokens"))
  }

  test("dedup D1: same-offset different-payload tie-break is deterministic") {
    val rows = Seq(
      ("t", 0, "doc_x", Seq(1, 2), 2, "web", 5L),
      ("t", 0, "doc_y", Seq(3), 1, "web", 5L),
      ("t", 0, "doc_z", Seq(4, 5, 6), 3, "books", 5L))
    // Different physical layouts -> different arrival order inside the
    // window partition; the payload-derived ordering must pick the SAME
    // winner every run (ordering by the partition-constant offset would
    // not).
    val winners = Seq(1, 2, 3).map { n =>
      val df = rows.toDF("topic", "partition", "doc_id", "tokens", "n_tok", "source", "offset")
        .repartition(n)
      Ingest.dedupFirstWins(df).select($"doc_id").as[String].collect().toSeq
    }
    assert(winners.forall(_.size == 1))
    assert(winners.distinct.size == 1, s"winner must not depend on layout: $winners")
  }

  test("replay filter scales to thousands of topic-partitions (join, not when-chain)") {
    val dir = tmpDir("tbl-manytp")
    val t = TokenTable.create(spark, dir)
    val nPart = 5000
    val batch = (0 until nPart).map(p =>
      RawMessage("t", p, 0L, Some(s"doc_p$p"), good.format(s"doc_p$p"))).toDS()
    val r1 = Ingest.ingestBatch(t, batch)
    assert(r1.appended == nPart)
    // Full replay across all 5k partitions: everything filtered by the
    // broadcast watermark join (a when-chain expression tree would blow
    // up long before this size).
    val r2 = Ingest.ingestBatch(t, batch)
    assert(r2.appended == 0 && r2.replayFiltered == nPart)
    assert(t.scan().count() == nPart)
  }

  test("concurrent same-partition writers never double-append (rebase guard)") {
    val dir = tmpDir("tbl-race")
    TokenTable.create(spark, dir)
    val mk = () => (0L until 50L).map(i =>
      msg(i, s"doc_$i", good.format(s"doc_$i"))).toDS()
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    // Both workers ingest the SAME offsets concurrently. Depending on
    // timing a worker either (a) sees the other's commit first and
    // replay-filters everything, or (b) loses the CAS and the rebase
    // guard aborts it. Either way the table must hold each row once.
    val outcomes = Await.result(Future.sequence(Seq(1, 2).map { _ =>
      Future {
        try Right(Ingest.ingestBatch(TokenTable.open(spark, dir), mk()))
        catch { case e: graft.table.CommitConflictException => Left(e) }
      }
    }), Duration.Inf)
    pool.shutdown()
    val t = TokenTable.open(spark, dir)
    assert(t.scan().count() == 50,
      s"exactly-once violated: ${t.scan().count()} rows; outcomes=$outcomes")
    assert(t.scan().select($"doc_id").distinct().count() == 50)
    val appendedTotal = outcomes.collect { case Right(r) => r.appended }.sum
    assert(appendedTotal == 50, s"double-append: $outcomes")
  }

  test("generator: tokens are a pure function of doc_id (duplicates byte-equal)") {
    val df = TokenGen.generate(spark, 300, dupRate = 0.1)
    import org.apache.spark.sql.functions._
    val dups = df.groupBy($"doc_id")
      .agg(countDistinct(xxhash64($"tokens")).as("variants"), count(lit(1)).as("n"))
    assert(dups.filter($"variants" =!= 1).count() == 0,
      "same doc_id must always carry identical tokens")
    // ids 100..299 with id%100 < 10 are dups -> 20 duplicated doc_ids
    // (a real dupRate fraction, not a collapsed chain).
    assert(dups.filter($"n" > 1).count() == 20,
      "dupRate must produce the documented duplicate fraction")
    // n_tok always equals the token array length.
    assert(df.filter(size($"tokens") =!= $"n_tok").count() == 0)
  }
}
