package graft.maintain

import graft.functions.{Search, SearchOps}
import graft.lineage.Lineage
import graft.table.{DataFile, Snapshot, TokenTable}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** MERGE INTO dedup-upsert keyed on `doc_id` (north-star M6), compiled
  * through Spark SQL over temp views.
  *
  * Plan:
  *  1. First-wins dedup of the source batch on `doc_id` — the
  *     reference's D1 semantics (`/root/reference/src/pipeline/mod.rs:58-80`:
  *     first occurrence wins, duplicates silently dropped), expressed as
  *     `row_number() over (partition by doc_id order by precedence) = 1`.
  *  2. File pruning: join source key bounds against manifest min/max —
  *     only data files whose [minDocId, maxDocId] can contain a source
  *     key are touched; everything else carries over untouched (no IO).
  *  3. Rewrite: `touched LEFT ANTI JOIN source ON doc_id` ∪ `source`
  *     (upsert = matched rows replaced, unmatched inserted), via
  *     `spark.sql` so Catalyst plans the join (broadcast when the source
  *     is small, AQE skew-split otherwise).
  *  4. One atomic snapshot: new files + untouched survivors.
  */
object Merge {

  case class Result(snapshot: Snapshot, touchedFiles: Int, untouchedFiles: Int,
      sourceRows: Long)

  /** First-wins dedup on doc_id ordered by `precedenceCol` asc (the
    * arrival-order stand-in; ties broken by token hash for determinism).
    */
  def dedupFirstWins(source: DataFrame, precedenceCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col(precedenceCol).asc, xxhash64(col("tokens")).asc)
    source
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** File pruning via manifest min/max stats (M3 pays off here) —
    * WITHOUT a join: a non-equi `min<=k<=max` join has no equi-key, so
    * Spark plans BroadcastNestedLoopJoin = O(#files x #source-keys) —
    * 10^12 comparisons at 10^6 files x 10^6 keys. Instead:
    *
    *  1. The sorted distinct file endpoints form elementary segments;
    *     `seg(k) = #(endpoints <= k)` (one O(log B) codegen'd binary
    *     search per key). Two keys with equal seg relate identically to
    *     every file interval, since all interval endpoints are segment
    *     boundaries.
    *  2. One distinct-aggregate collects the HIT segments — bounded by
    *     2x#files+1 ints regardless of source size (map-side partial
    *     distinct; at 10^6 files this is a few MB).
    *  3. Each file intersects the hit set iff a hit seg falls in
    *     [seg(min), seg(max)] — O(#files log #hits) on the driver,
    *     which already holds the file list for planning.
    *
    * Over-approximates only between a file's max and the next endpoint
    * (a pruning false positive reads an extra file; never misses one).
    */
  def pruneTouched(files: Seq[DataFile], srcKeys: DataFrame): Set[String] = {
    val spark = srcKeys.sparkSession
    import spark.implicits._
    if (files.isEmpty) return Set.empty
    // Files without doc_id stats can never be pruned.
    val (statted, unstatted) =
      files.partition(f => f.minDocId != null && f.maxDocId != null)
    val bounds: Array[String] = statted.flatMap(f => Seq(f.minDocId, f.maxDocId))
      .distinct.sorted(Search.utf8Ordering).toArray
    val hitSegs: Array[Int] =
      if (bounds.isEmpty) Array.empty
      else srcKeys
        .select(SearchOps.bucketOfStr(col("doc_id"), bounds).as("seg"))
        .distinct().as[Int].collect().sorted
    val u8 = bounds.map(UTF8String.fromString)
    def anyHitIn(lo: Int, hi: Int): Boolean = {
      var a = 0; var b = hitSegs.length
      while (a < b) { val m = (a + b) >>> 1; if (hitSegs(m) < lo) a = m + 1 else b = m }
      a < hitSegs.length && hitSegs(a) <= hi
    }
    val touched = statted.filter { f =>
      anyHitIn(
        Search.upperBoundUtf8(u8, UTF8String.fromString(f.minDocId)),
        Search.upperBoundUtf8(u8, UTF8String.fromString(f.maxDocId)))
    }
    (touched ++ unstatted).map(_.path).toSet
  }

  def mergeInto(table: TokenTable, source: DataFrame,
      precedenceCol: String, jobId: String): Result = {
    val spark = table.spark
    import spark.implicits._
    val parent = table.current
    val all = table.filesLocal(parent)

    val src = dedupFirstWins(source, precedenceCol)
      .select("doc_id", "tokens", "n_tok", "source")
      .cache()
    val srcRows = src.count()

    val touchedPaths: Set[String] = pruneTouched(all, src.select($"doc_id"))

    val touched = all.filter(f => touchedPaths.contains(f.path))
    val untouched = all.filterNot(f => touchedPaths.contains(f.path))

    val target =
      if (touched.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], table.schema)
      else spark.read.schema(table.schema)
        .parquet(touched.map(f => s"${table.location}/${f.path}"): _*)

    // --- the upsert, compiled through Spark SQL ---
    val tv = s"graft_merge_target_${jobId.replaceAll("[^A-Za-z0-9_]", "_")}"
    val sv = s"graft_merge_source_${jobId.replaceAll("[^A-Za-z0-9_]", "_")}"
    target.createOrReplaceTempView(tv)
    src.createOrReplaceTempView(sv)
    val merged = spark.sql(
      s"""SELECT t.doc_id, t.tokens, t.n_tok, t.source
         |FROM $tv t LEFT ANTI JOIN $sv s ON t.doc_id = s.doc_id
         |UNION ALL
         |SELECT doc_id, tokens, n_tok, source FROM $sv""".stripMargin)

    // Version-scoped output dir (same rationale as Compact/Cluster).
    val out = table.writeDataFilesTo(merged, s"data/$jobId-v${parent.version}",
      overwrite = true, sortBy = Some("doc_id"))
    Lineage.completeTask(table, Lineage.TaskRecord(
      jobId, "merge", touched.map(_.path), out,
      rows = out.map(_.rows).sum, tokenCount = out.map(_.sumNtok).sum,
      status = "done", durationMs = 0L))
    val manifest = table.writeManifest(untouched ++ out)
    val snap = table.commit(Some(parent), "merge",
      addManifests = Seq(manifest), keepManifests = Nil,
      removedPaths = touchedPaths,
      summary = Map(
        "source-rows" -> srcRows.toString,
        "touched-files" -> touched.size.toString,
        "untouched-files" -> untouched.size.toString))
    src.unpersist()
    spark.catalog.dropTempView(tv)
    spark.catalog.dropTempView(sv)
    Result(snap, touched.size, untouched.size, srcRows)
  }
}
