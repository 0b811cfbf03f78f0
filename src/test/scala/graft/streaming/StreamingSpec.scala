package graft.streaming

import graft.SparkSpec
import graft.ingest.RawMessage
import graft.table.TokenTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Streaming integration tests: continuous ingest with exactly-once
  * table effect across micro-batches and redelivery (the reference's
  * rebalance-replay contract, `/root/reference/README.md:84-85`).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    """{"doc_id":"%s","tokens":[%d,2,3],"n_tok":3,"source":"web"}"""

  private def msgs(lo: Long, hi: Long): Seq[RawMessage] =
    (lo until hi).map(i =>
      RawMessage("t", 0, i, Some(s"doc_$i"), good.format(s"doc_$i", i)))

  test("offset-gap monitor: state survives micro-batches, gaps flagged, replays ignored") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[RawMessage]
    val gaps = StreamingIngest.offsetGapMonitor(source.toDS())
    val q = gaps.writeStream.format("memory").queryName("gaps")
      .outputMode("append").trigger(Trigger.ProcessingTime(0L)).start()
    try {
      // Batch 1: contiguous from 0 on two partitions -> no gaps.
      source.addData(msgs(0, 3) ++ (0L until 2L).map(i =>
        RawMessage("t", 1, i, Some(s"p1_$i"), good.format(s"p1_$i", i))))
      q.processAllAvailable()
      assert(spark.table("gaps").count() == 0)
      // Batch 2: partition 0 jumps 3,4 -> one gap; partition 1 continues.
      source.addData(msgs(5, 7) :+
        RawMessage("t", 1, 2, Some("p1_2"), good.format("p1_2", 2)))
      q.processAllAvailable()
      val g = spark.table("gaps")
        .as[OffsetGap].collect()
      assert(g.toSeq == Seq(OffsetGap("t", 0, 3, 5, 2)), g.mkString(","))
      // Batch 3: replayed offset 1 (redelivery, not a gap) + contiguous 7.
      source.addData(msgs(1, 2) ++ msgs(7, 8))
      q.processAllAvailable()
      assert(spark.table("gaps").count() == 1, "replay must not flag a gap")
      // Batch 4: a second hole in the same partition uses the UPDATED cursor.
      source.addData(msgs(10, 11))
      q.processAllAvailable()
      val g2 = spark.table("gaps").as[OffsetGap].collect().sortBy(_.got)
      assert(g2.toSeq == Seq(OffsetGap("t", 0, 3, 5, 2), OffsetGap("t", 0, 8, 10, 2)))
      // Batch 5: a NEW partition first seen at offset 100 — attaching
      // mid-stream (head retention / committed start) is not a gap.
      source.addData(Seq(
        RawMessage("t", 7, 100, Some("p7"), good.format("p7", 0)),
        RawMessage("t", 7, 101, Some("p7b"), good.format("p7b", 1))))
      q.processAllAvailable()
      assert(spark.table("gaps").count() == 2, "first sighting must not flag")
      // ...but a hole AFTER the first sighting does flag.
      source.addData(Seq(RawMessage("t", 7, 105, Some("p7c"), good.format("p7c", 2))))
      q.processAllAvailable()
      assert(spark.table("gaps").as[OffsetGap].collect()
        .exists(g => g.partition == 7 && g.expectedFrom == 102 && g.missing == 3))
    } finally q.stop()
  }

  test("streaming ingest: micro-batches append atomically; replayed offsets are no-ops") {
    val dir = tmpDir("stream-tbl")
    val t = TokenTable.create(spark, dir)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[RawMessage]
    val q = StreamingIngest.start(t, source.toDS(), tmpDir("ckpt"),
      Trigger.ProcessingTime(0L))
    try {
      source.addData(msgs(0, 50): _*)
      q.processAllAvailable()
      assert(t.scan().count() == 50)
      val v1 = t.currentVersion

      // Second micro-batch with a replayed overlap (offsets 30..79):
      // the watermark filter must drop 30..49.
      source.addData(msgs(30, 80): _*)
      q.processAllAvailable()
      assert(t.scan().count() == 80, "overlap must be exactly-once")
      assert(t.currentVersion == v1 + 1, "one snapshot per micro-batch")

      // Pure replay: no new snapshot rows.
      source.addData(msgs(0, 80): _*)
      q.processAllAvailable()
      assert(t.scan().count() == 80)
    } finally q.stop()
  }

  test("streaming ingest keeps flowing through a mid-stream ALTER TABLE ADD COLUMN") {
    val dir = tmpDir("stream-evo")
    val t = TokenTable.create(spark, dir)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[RawMessage]
    val q = StreamingIngest.start(t, source.toDS(), tmpDir("ckpt-evo"),
      Trigger.ProcessingTime(0L))
    try {
      source.addData(msgs(0, 40): _*)
      q.processAllAvailable()
      assert(t.scan().count() == 40)
      // A concurrent operator evolves the table between micro-batches:
      // the stream's core-column appends are a SUBSET of the evolved
      // physical schema, so nothing breaks and post-ALTER reads
      // null-fill the new column for every streamed row.
      t.alterSchema(Seq(
        org.apache.spark.sql.connector.catalog.TableChange.addColumn(
          Array("lang"), org.apache.spark.sql.types.StringType, true)))
      source.addData(msgs(40, 90): _*)
      q.processAllAvailable()
      val scan = t.scanLogical()
      assert(scan.count() == 90, "stream must keep appending after ALTER")
      assert(scan.columns.contains("lang"))
      assert(scan.filter(org.apache.spark.sql.functions.col("lang").isNull)
        .count() == 90)
    } finally q.stop()
  }

  test("inline maintenance: small-file swamp auto-compacts between micro-batches") {
    val dir = tmpDir("stream-auto")
    val t = TokenTable.create(spark, dir)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[RawMessage]
    // Every micro-batch writes tiny files; threshold 4 small files.
    val q = StreamingIngest.start(t, source.toDS(), tmpDir("ckpt-auto"),
      Trigger.ProcessingTime(0L),
      maintenance = Some(MaintenancePolicy(
        smallFileBytes = 1L << 20, maxSmallFiles = 4, targetBytes = 8L << 20)))
    try {
      (0 until 6).foreach { b =>
        source.addData(msgs(b * 20, b * 20 + 20): _*)
        q.processAllAvailable()
      }
      assert(t.scan().count() == 120, "every batch's rows present")
      // Compaction fired at least once: some retained version carries
      // the compact op, and the live file count stays bounded by the
      // policy instead of growing one-per-batch.
      val ops = (0L to t.currentVersion).map(v => t.snapshotAt(v).operation)
      assert(ops.contains("compact"), s"no auto-compaction in $ops")
      val files = t.filesLocal(t.current)
      assert(files.size < 6, s"file count should stay bounded, got ${files.size}")
      // Exactness: the compacted table equals the direct union of batches.
      assert(t.scan().select("doc_id").distinct().count() == 120)
    } finally q.stop()
  }

  test("inline maintenance: auto-recluster keeps the swamp in ByDocId layout") {
    val dir = tmpDir("stream-recluster")
    val t = TokenTable.create(spark, dir)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[RawMessage]
    // Recluster as soon as ANY bytes mutually overlap (threshold 1):
    // each batch's appends overlap the prior run lexicographically, so
    // passes fire and consolidate; once consolidated into one run the
    // gate reads zero and quiesces (convergence is the point of the
    // overlap-within-rewrite-set gate).
    val q = StreamingIngest.start(t, source.toDS(), tmpDir("ckpt-recluster"),
      Trigger.ProcessingTime(0L),
      maintenance = Some(MaintenancePolicy(
        smallFileBytes = 1L << 20, maxSmallFiles = 1000, // compact stays quiet
        targetBytes = 32L << 10, reclusterBytes = Some(1L))))
    try {
      (0 until 6).foreach { b =>
        source.addData(msgs(b * 40, b * 40 + 40): _*)
        q.processAllAvailable()
      }
      assert(t.scan().count() == 240, "every batch's rows present")
      val ops = (0L to t.currentVersion).map(v => t.snapshotAt(v).operation)
      assert(ops.count(_ == "cluster-by-docid") >= 2,
        s"auto-recluster should fire repeatedly, ops=$ops")
      // Layout: live files sorted by minDocId are mostly disjoint.
      val files = t.filesLocal(t.current).sortBy(_.minDocId)
      val pairs = files.sliding(2).collect { case Seq(a, b) => (a, b) }.toSeq
      if (pairs.nonEmpty) {
        val disjoint = pairs.count { case (a, b) => a.maxDocId < b.minDocId }
        assert(disjoint.toDouble / pairs.size >= 0.5,
          s"only $disjoint/${pairs.size} consecutive pairs disjoint after auto-recluster")
      }
      assert(t.scan().select("doc_id").distinct().count() == 240)
    } finally q.stop()
  }

  test("inline maintenance: expiry bounds live versions and files over a long swamp") {
    val dir = tmpDir("stream-expire")
    val t = TokenTable.create(spark, dir)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[RawMessage]
    // Aggressive policy: compact at 4 small files, expire at 6 live
    // versions, zero grace (no concurrent writers in the test).
    val q = StreamingIngest.start(t, source.toDS(), tmpDir("ckpt-expire"),
      Trigger.ProcessingTime(0L),
      maintenance = Some(MaintenancePolicy(
        smallFileBytes = 1L << 20, maxSmallFiles = 4, targetBytes = 8L << 20,
        maxLiveVersions = 6, retainVersions = 2, gcGraceMs = 0L)))
    try {
      (0 until 12).foreach { b =>
        source.addData(msgs(b * 20, b * 20 + 20): _*)
        q.processAllAvailable()
      }
      // 12 ingest commits + compactions would leave 15+ versions and
      // every superseded pre-compaction file without expiry.
      val live = graft.table.Format.liveVersionCount(dir)
      assert(live <= 6 + 3, s"live version count must stay bounded, got $live")
      val onDisk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir, "data"))
      val dataFiles =
        try {
          import scala.jdk.CollectionConverters._
          onDisk.iterator().asScala.count(p =>
            p.getFileName.toString.endsWith(".parquet"))
        } finally onDisk.close()
      val referenced = t.filesLocal(t.current).size
      assert(dataFiles <= referenced + 4,
        s"orphaned pre-compaction files must be GC'd: $dataFiles on disk, $referenced referenced")
      // Rows exact through compaction + expiry.
      assert(t.scan().count() == 240)
      assert(t.scan().select("doc_id").distinct().count() == 240)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups a keyed event stream") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(java.sql.Timestamp, String, Int)]
    val deduped = StreamingIngest.dedupWithinWatermark(
      source.toDS().toDF("ts", "k", "v"), "ts", "k", "10 seconds")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      def ts(s: Int) = new java.sql.Timestamp(t0.getTime + s * 1000L)
      source.addData((ts(0), "a", 1), (ts(1), "a", 2), (ts(2), "b", 3))
      q.processAllAvailable()
      source.addData((ts(3), "a", 4), (ts(4), "c", 5))
      q.processAllAvailable()
      val rows = spark.table("dedup_out").select($"k", $"v")
        .as[(String, Int)].collect().toMap
      assert(rows.keySet == Set("a", "b", "c"))
      assert(rows("a") == 1, "first occurrence must win")
    } finally q.stop()
  }

  test("windowed event-time aggregation emits per-window counts") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(java.sql.Timestamp, String)]
    val counts = StreamingIngest.windowedCounts(
      source.toDS().toDF("ts", "k"), "ts", "k", "1 minute", "10 seconds")
    val q = counts.writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      def ts(s: Int) = new java.sql.Timestamp(t0.getTime + s * 1000L)
      source.addData((ts(5), "x"), (ts(10), "x"), (ts(70), "x"), (ts(15), "y"))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select($"k", $"n").as[(String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      assert(rows == Map("x" -> 3L, "y" -> 1L))
    } finally q.stop()
  }
}
