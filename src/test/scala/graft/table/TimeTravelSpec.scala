package graft.table

import graft.SparkSpec
import graft.ingest.TokenGen
import graft.maintain.Compact

/** Snapshot isolation & time travel: every retained snapshot remains
  * scannable and returns exactly its historical state, even after later
  * commits rewrote the files (the serializable-snapshot-isolation
  * property the north rule requires).
  */
class TimeTravelSpec extends SparkSpec {

  test("scan at version returns the historical state; compaction doesn't disturb it") {
    val dir = tmpDir("tt")
    val t = TokenTable.create(spark, dir)
    t.append(TokenGen.asTokenRows(TokenGen.generate(spark, 200, numPartitions = 2)))
    val v1 = t.currentVersion
    val state1 = checksum(t.scan())

    t.append(TokenGen.asTokenRows(
      TokenGen.generate(spark, 300, idOffset = 1000, numPartitions = 2)))
    val v2 = t.currentVersion
    val state2 = checksum(t.scan())

    Compact.run(t, targetBytes = 8L * 1024 * 1024, jobId = "tt-compact")

    // All three versions scannable, each with its own state.
    assert(checksum(t.scan(t.snapshotAt(v1))) == state1)
    assert(checksum(t.scan(t.snapshotAt(v2))) == state2)
    assert(checksum(t.scan()) == state2, "compaction preserves current state")
    assert(t.current.parentVersion == v2)
  }

  test("scanChanges: append delta rows, empty range, pruning, SQL spelling") {
    import org.apache.spark.sql.functions.col
    val dir = tmpDir("inc")
    val t = TokenTable.create(spark, dir)
    (0 until 3).foreach { i =>
      t.append(TokenGen.asTokenRows(TokenGen.generate(
        spark, 200, idOffset = i * 200L, numPartitions = 2)))
    }
    val head = t.currentVersion
    // Delta of the last two commits = exactly their 400 rows.
    val delta = t.scanChanges(head - 2, head)
    assert(delta.count() == 400)
    assert(checksum(delta) ==
      checksum(t.scan().where(col("doc_id") >= f"doc_${200}%012d")))
    // Empty range; full range == full scan.
    assert(t.scanChanges(head, head).count() == 0)
    assert(checksum(t.scanChanges(0, head)) == checksum(t.scan()))
    // The incremental read plans through the pruned FileIndex: a doc_id
    // filter on the delta touches only the delta's matching files.
    assert(delta.where(col("doc_id") === f"doc_${250}%012d").count() == 1)
    // SQL spelling via the resolution rule.
    val parsed = spark.sessionState.sqlParser.parsePlan(
      s"SELECT count(*) AS n FROM graft_changes_v${head - 2}_v$head.`${t.location}`")
    val n = org.apache.spark.sql.GraftSqlBridge
      .ofRows(spark, graft.plans.TokenTableResolution(spark)(parsed))
      .head().getLong(0)
    assert(n == 400)
  }

  test("scanChanges: a rewrite in the range fails loudly (re-sync contract)") {
    val dir = tmpDir("incrw")
    val t = TokenTable.create(spark, dir)
    t.append(TokenGen.asTokenRows(TokenGen.generate(spark, 200, numPartitions = 2)))
    val v1 = t.currentVersion
    t.append(TokenGen.asTokenRows(
      TokenGen.generate(spark, 200, idOffset = 1000, numPartitions = 2)))
    Compact.run(t, targetBytes = 8L * 1024 * 1024, jobId = "incrw-compact")
    val head = t.currentVersion
    intercept[IllegalArgumentException] { t.scanChanges(v1, head) }
    // After the rewrite, deltas starting AT the rewrite are readable again.
    t.append(TokenGen.asTokenRows(
      TokenGen.generate(spark, 100, idOffset = 2000, numPartitions = 2)))
    assert(t.scanChanges(head, t.currentVersion).count() == 100)
  }
}
