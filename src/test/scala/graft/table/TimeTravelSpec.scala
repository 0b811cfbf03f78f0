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
}
