package graft.table

import graft.SparkSpec
import graft.ingest.{Ingest, RawMessage, TokenGen}
import graft.maintain.{Cluster, Compact, Expire, Merge}

/** Degenerate-state hardening: every operator must be a clean no-op (or
  * a sane small op) on empty tables, empty batches, and empty sources —
  * the states a long-running maintenance loop hits constantly.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private def emptyTable() = TokenTable.create(spark, tmpDir("edge"))

  test("maintenance ops on an empty table are clean no-ops") {
    val t = emptyTable()
    val c = Compact.run(t, 8L * 1024 * 1024, "e-compact")
    assert(c.binsRewritten == 0)
    val z = Cluster.run(t, Cluster.ZOrder, "e-z")
    assert(z.buckets == 0)
    val d = Cluster.run(t, Cluster.ByDocId, "e-d")
    assert(d.buckets == 0)
    val e = Expire.run(t, retainLast = 2)
    assert(e.deletedFiles == 0)
    assert(t.scan().count() == 0)
  }

  test("merge into an empty table inserts everything") {
    val t = emptyTable()
    val src = TokenGen.generate(spark, 50, numPartitions = 1)
    val res = Merge.mergeInto(t, src, "offset", "e-merge")
    assert(res.sourceRows == 50 && res.touchedFiles == 0)
    assert(t.scan().count() == 50)
  }

  test("merge with an empty source leaves the table intact") {
    val t = emptyTable()
    t.append(TokenGen.asTokenRows(TokenGen.generate(spark, 50, numPartitions = 1)))
    val before = checksum(t.scan())
    val res = Merge.mergeInto(t,
      TokenGen.generate(spark, 50, numPartitions = 1).filter($"n_tok" < 0),
      "offset", "e-merge2")
    assert(res.sourceRows == 0)
    assert(checksum(t.scan()) == before)
  }

  test("ingest of a fully-filtered batch commits a watermark-only snapshot") {
    val t = emptyTable()
    val good = """{"doc_id":"d%d","tokens":[1],"n_tok":1,"source":"web"}"""
    Ingest.ingestBatch(t, (0L until 10L).map(i =>
      RawMessage("t", 0, i, Some(s"d$i"), good.format(i))).toDS())
    // Replay the same offsets: everything filtered, commit still clean.
    val r = Ingest.ingestBatch(t, (0L until 10L).map(i =>
      RawMessage("t", 0, i, Some(s"d$i"), good.format(i))).toDS())
    assert(r.appended == 0 && r.replayFiltered == 10)
    assert(t.scan().count() == 10)
    // Watermarks survive the empty commit.
    assert(Ingest.watermarks(t.current)("t/0") == 9L)
  }

  test("compaction skips tables that are already compact") {
    val t = emptyTable()
    t.append(TokenGen.asTokenRows(TokenGen.generate(spark, 2000, numPartitions = 1)))
    val v = t.currentVersion
    val res = Compact.run(t, targetBytes = 8L * 1024, "e-noop") // files exceed target
    assert(res.binsRewritten == 0, "files at/above target size must not be rewritten")
    assert(t.currentVersion == v, "no-op compaction must not commit")
  }
}
