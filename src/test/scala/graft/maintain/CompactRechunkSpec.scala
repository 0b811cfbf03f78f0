package graft.maintain

import graft.SparkSpec
import graft.ingest.TokenGen
import graft.table.TokenTable

/** Row-group-aware compaction (VERDICT r4 task 4): the concat-vs-
  * re-encode decision keys on the bin's average ROW-GROUP size (concat
  * preserves groups verbatim, so group fragmentation — not file size —
  * is what a re-encode fixes), and `rechunk = true` extends candidacy
  * to large-but-fragmented files so a compact-only table has an
  * explicit convergence path to writer-sized groups.
  */
class CompactRechunkSpec extends SparkSpec {

  /** Footer row-group count, independent of the manifest stat. */
  private def footerGroups(abs: String): Int = {
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(abs),
        spark.sessionState.newHadoopConf()))
    try r.getFooter.getBlocks.size finally r.close()
  }

  test("manifest groups stat matches the parquet footer") {
    spark.conf.set("graft.write.rowGroupBytes", (48 * 1024).toString)
    try {
      val t = TokenTable.create(spark, tmpDir("grpstat"))
      t.append(TokenGen.asTokenRows(TokenGen.generate(
        spark, 4000, minLen = 64, maxLen = 128, numPartitions = 1)))
      val f = t.filesLocal(t.current).head
      assert(f.groups > 1, s"48KB groups over ~1MB of data: ${f.groups}")
      assert(f.groups == footerGroups(s"${t.location}/${f.path}"))
    } finally spark.conf.unset("graft.write.rowGroupBytes")
  }

  test("default compaction re-encodes group-fragmented bins (swamp converges)") {
    // Files of ~2MB (above the old 1MB avg-FILE heuristic — round 4
    // would have concatenated them, preserving the swamp) built from
    // ~48KB row groups (far below the 1MB avg-GROUP threshold).
    val t = TokenTable.create(spark, tmpDir("swamp"))
    spark.conf.set("graft.write.rowGroupBytes", (48 * 1024).toString)
    try {
      (0 until 6).foreach { i =>
        t.append(TokenGen.asTokenRows(TokenGen.generate(
          spark, 8000, idOffset = i * 8000L, minLen = 64, maxLen = 128,
          numPartitions = 1)))
      }
    } finally spark.conf.unset("graft.write.rowGroupBytes")
    val before = t.filesLocal(t.current)
    assert(before.forall(f => f.bytes >= (1L << 20)),
      s"swamp files must clear the old file-size heuristic: ${before.map(_.bytes)}")
    val groupsBefore = before.map(_.groups).sum
    assert(groupsBefore >= 6 * 10, s"swamp must be fragmented: $groupsBefore")
    val keep = checksum(t.scan())

    val res = Compact.run(t, targetBytes = 64L << 20, jobId = "swamp-compact")
    assert(res.binsRewritten >= 1)
    val after = t.filesLocal(t.current)
    assert(checksum(t.scan()) == keep, "compaction must preserve state")
    // ONE default pass converges the swamp to writer-sized groups.
    assert(after.map(_.groups).sum <= before.size,
      s"re-encode must consolidate groups: ${after.map(_.groups)} vs $groupsBefore")
    assert(after.forall(f => f.avgGroupBytes >= (1L << 20)),
      s"median group must be writer-sized now: ${after.map(_.avgGroupBytes)}")
  }

  test("rechunk never resumes a crashed DEFAULT run's plan (mode-scoped execId)") {
    val t = TokenTable.create(spark, tmpDir("rechunk_iso"))
    spark.conf.set("graft.write.rowGroupBytes", (48 * 1024).toString)
    try {
      t.append(TokenGen.asTokenRows(TokenGen.generate(
        spark, 8000, minLen = 64, maxLen = 128, numPartitions = 1)))
    } finally spark.conf.unset("graft.write.rowGroupBytes")
    val f0 = t.filesLocal(t.current).head
    val target = math.max(1L << 20, f0.bytes / 2)
    // A DEFAULT run finds nothing to pack (the file is too big for
    // candidacy), commits nothing — but PERSISTS its empty plan at this
    // version. Lineage resume keys on execId alone, so without the
    // mode-scoped execId a rechunk retry with the same jobId would be
    // handed that empty plan and silently do nothing.
    val skip = Compact.run(t, targetBytes = target, jobId = "iso-job")
    assert(skip.binsRewritten == 0)
    val res = Compact.run(t, targetBytes = target, jobId = "iso-job",
      rechunk = true)
    assert(res.binsRewritten == 1,
      s"rechunk must not inherit the default run's empty persisted plan: $res")
    assert(res.resumedTasks == 0)
  }

  test("rechunk mode consolidates large fragmented files default compaction skips") {
    val t = TokenTable.create(spark, tmpDir("rechunk"))
    spark.conf.set("graft.write.rowGroupBytes", (48 * 1024).toString)
    try {
      t.append(TokenGen.asTokenRows(TokenGen.generate(
        spark, 16000, minLen = 64, maxLen = 128, numPartitions = 1)))
    } finally spark.conf.unset("graft.write.rowGroupBytes")
    val f0 = t.filesLocal(t.current).head
    assert(f0.groups > 20, s"need a heavily fragmented file: ${f0.groups}")
    val keep = checksum(t.scan())

    // Default mode: the file is above the small-file threshold — not a
    // candidate, nothing planned.
    val target = math.max(1L << 20, f0.bytes / 2)
    val skip = Compact.run(t, targetBytes = target, jobId = "rechunk-skip")
    assert(skip.binsRewritten == 0,
      s"default compaction must skip the large fragmented file: $skip")

    // Rechunk mode: singleton fragmented bin, re-encoded.
    val res = Compact.run(t, targetBytes = target, jobId = "rechunk-go",
      rechunk = true)
    assert(res.binsRewritten == 1, s"rechunk must plan the file: $res")
    val after = t.filesLocal(t.current)
    assert(checksum(t.scan()) == keep, "rechunk must preserve state")
    assert(after.map(_.groups).sum <= 2 * after.size,
      s"groups must consolidate: ${after.map(_.groups)}")
    assert(after.forall(f => f.groups == footerGroups(s"${t.location}/${f.path}")))
  }
}
