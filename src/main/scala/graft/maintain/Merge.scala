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
      sourceRows: Long, touchedBytes: Long = 0L,
      decodedBytes: Long = 0L, coldCopiedBytes: Long = 0L,
      fullyColdFiles: Int = 0)

  /** Segment-index pruning output: the touched file set plus the
    * machinery to classify individual ROWS by hit-segment membership
    * (bounds = sorted distinct file endpoints; hitSegs = sorted segments
    * containing at least one source key), plus the per-segment
    * source-key EXTENTS (extLo/extHi, parallel arrays sorted by lo,
    * disjoint — segments are disjoint intervals): `[extLo(i), extHi(i)]`
    * together cover every source key, so a file or row group whose
    * range intersects NO extent provably matches no key. The extent
    * test is strictly tighter than hit-segment membership (a segment
    * spans from the previous endpoint, so segment granularity spills
    * below each extent's lo).
    */
  case class Prune(touchedPaths: Set[String], bounds: Array[String],
      hitSegs: Array[Int], extLo: Array[String] = Array.empty,
      extHi: Array[String] = Array.empty)

  /** Does [lo, hi] intersect any source-key extent? Extents are sorted
    * by lo and disjoint: find the first extent whose hi >= lo (binary
    * search on the parallel hi array, also sorted); intersect iff its
    * lo <= hi. Missing stats (null) ⇒ true (conservative).
    */
  def intersectsExtents(lo: String, hi: String,
      extLo: Array[UTF8String], extHi: Array[UTF8String]): Boolean = {
    if (lo == null || hi == null) return true
    if (extLo.isEmpty) return false
    val l = UTF8String.fromString(lo); val h = UTF8String.fromString(hi)
    // first i with extHi(i) >= l
    var a = 0; var b = extHi.length
    while (a < b) {
      val m = (a + b) >>> 1
      if (extHi(m).compareTo(l) < 0) a = m + 1 else b = m
    }
    a < extLo.length && extLo(a).compareTo(h) <= 0
  }

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
    *  1. A segmentation of the keyspace is built from the sorted
    *     distinct file endpoints PLUS a capped deterministic sample of
    *     the source keys; `seg(k) = #(bounds <= k)` is one O(log B)
    *     codegen'd binary search per key. The sampled keys split wide
    *     file segments at actual key positions — endpoints alone fuse
    *     disjoint key clusters inside one segment into an extent
    *     spanning the dead gap between them.
    *  2. One bounded aggregation collects, per segment, the actual
    *     source-key EXTENT [min key, max key] — output rows bounded by
    *     the segment count regardless of source size (map-side partial
    *     agg). The extents are disjoint, sorted, and together cover
    *     every source key.
    *  3. A file is touched iff its [min,max] INTERSECTS some extent
    *     ([[intersectsExtents]]: one binary search + one compare per
    *     file, on the driver, which streams the file list for
    *     planning). The same test classifies row GROUPS for the
    *     bytewise cold copy and — as a codegen'd column expression —
    *     individual ROWS for the hot/cold rewrite split in
    *     [[mergeInto]].
    *
    * Over-approximates only within an extent between actual keys (a
    * false positive reads or anti-joins extra rows; never misses a
    * match).
    */
  def pruneTouched(files: Seq[DataFile], srcKeys: DataFrame): Set[String] =
    pruneTouchedFull(files, srcKeys).touchedPaths

  def pruneTouchedFull(files: Seq[DataFile], srcKeys: DataFrame): Prune = {
    val spark = srcKeys.sparkSession
    import spark.implicits._
    planPrune(() => files.iterator, srcKeys,
      () => spark.createDataset(files)).prune
  }

  /** Pruning output plus what [[mergeInto]] plans with: the touched
    * DataFiles (driver memory tracks the TOUCHED count, not the file
    * count) and the total inventory size.
    */
  case class PrunePlan(prune: Prune, touched: Seq[DataFile], totalFiles: Long)

  /** Endpoint-array cap: above this many distinct file endpoints the
    * exact driver-side endpoint collection switches to a distributed
    * every-k-th coarsening — a SUBSET of true endpoints is still a valid
    * (coarser) partition of the keyspace, so pruning stays sound and
    * merely over-approximates between kept endpoints.
    */
  val DefaultBoundsCap: Int = 1 << 17

  /** Max per-gap cold output partitions before falling back to a single
    * cold partition ([[mergeInto]]'s partCol): bounds the dynamic
    * partition count of the rewrite write.
    */
  val MaxGapPartitions: Int = 64

  /** Source-row cap under which the anti join's key set broadcasts
    * (conf `graft.merge.broadcastKeyRows` overrides). Keys-only build
    * rows are ~50 bytes framed, so the default builds a ~100MB hash
    * relation — comfortably inside executor memory at any deployment
    * size, far under Spark's 8GB broadcast cap, and it removes the
    * full-table exchange+sort from the rewrite (guide §3.1).
    */
  val DefaultBroadcastKeyRows: Long = 2000000L

  /** Cap on the source-key sample mixed into the extent segmentation
    * (bounds the extent arrays the classifiers broadcast and binary-
    * search; 4k splits resolve any realistic cluster structure while
    * keeping the per-task array payload ~100KB).
    */
  val KeySampleCap: Int = 1 << 12

  /** Streaming, bounded-memory segment-index construction (VERDICT r3
    * task 4): two driver passes over the manifest-row ITERATOR (never a
    * materialized Seq), holding at most `boundsCap` endpoints plus the
    * touched files. `filesDS` is consulted only on endpoint overflow,
    * where coarsening runs as Spark jobs.
    */
  def planPrune(filesIt: () => Iterator[DataFile], srcKeys: DataFrame,
      filesDS: () => org.apache.spark.sql.Dataset[DataFile],
      boundsCap: Int = DefaultBoundsCap,
      knownSrcCount: Long = -1L): PrunePlan = {
    val spark = srcKeys.sparkSession
    import spark.implicits._
    // Pass 1: endpoints (bounded) + inventory count.
    val epb = scala.collection.mutable.ArrayBuffer.empty[String]
    var overflow = false
    var anyStatted = false
    var total = 0L
    val it = filesIt()
    while (it.hasNext) {
      val f = it.next(); total += 1
      if (f.minDocId != null && f.maxDocId != null) {
        anyStatted = true
        if (!overflow) {
          epb += f.minDocId; epb += f.maxDocId
          if (epb.length > 2 * boundsCap) { overflow = true; epb.clear() }
        }
      }
    }
    if (total == 0L)
      return PrunePlan(Prune(Set.empty, Array.empty, Array.empty), Nil, 0L)
    if (!anyStatted) {
      // No stats anywhere: every file is touched (never prunable).
      val all = filesIt().toSeq
      return PrunePlan(Prune(all.map(_.path).toSet, Array.empty, Array.empty),
        all, total)
    }
    val fileBounds: Array[String] =
      if (!overflow) epb.distinct.sorted(Search.utf8Ordering).toArray
      else coarseEndpoints(filesDS(), boundsCap)
    // Segmentation for the EXTENT aggregation: file endpoints PLUS a
    // capped deterministic sample of the source keys themselves. File
    // endpoints alone make one extent per file segment, which fuses
    // disjoint key clusters inside a wide segment into one range
    // spanning the dead gap between them (a 2-cluster update inside one
    // file classified ~everything between the clusters hot). Sampled
    // keys split such segments at actual key positions, so empty slices
    // between clusters produce NO extent. String keyspaces have no
    // numeric gap metric — key-anchored splitting is the scale-safe way
    // to discover cluster structure.
    val srcCount = if (knownSrcCount >= 0) knownSrcCount else srcKeys.count()
    val keySample: Array[String] =
      if (srcCount == 0) Array.empty
      else if (srcCount <= KeySampleCap)
        srcKeys.distinct().as[String].collect()
      else srcKeys
        .sample(withReplacement = false,
          math.min(1.0, KeySampleCap.toDouble * 1.2 / srcCount), seed = 42L)
        .distinct().as[String].collect()
    val extBounds: Array[String] =
      (fileBounds ++ keySample).distinct.sorted(Search.utf8Ordering).toArray
    // Per-segment source-key extents: ONE aggregation, output bounded by
    // the segment count.
    val segExtents: Array[(Int, String, String)] = srcKeys
      .select(SearchOps.bucketOfStr(col("doc_id"), extBounds).as("seg"),
        col("doc_id"))
      .groupBy($"seg")
      .agg(min($"doc_id").as("lo"), max($"doc_id").as("hi"))
      .as[(Int, String, String)].collect()
    // Refined endpoint set: file endpoints + actual key extents.
    val bounds: Array[String] =
      (fileBounds ++ segExtents.flatMap(r => Seq(r._2, r._3)))
        .distinct.sorted(Search.utf8Ordering).toArray
    val u8 = bounds.map(UTF8String.fromString)
    // Hot refined segments: for each original hit segment, every refined
    // segment between its key extents (inclusive — keys sit ON the new
    // endpoints).
    val hot = scala.collection.mutable.SortedSet.empty[Int]
    segExtents.foreach { case (_, lo, hi) =>
      val a = Search.upperBoundUtf8(u8, UTF8String.fromString(lo))
      val b = Search.upperBoundUtf8(u8, UTF8String.fromString(hi))
      var s = a
      while (s <= b) { hot += s; s += 1 }
    }
    val hitSegs: Array[Int] = hot.toArray
    // Source-key extents sorted by lo (disjoint — per-segment min/max
    // of disjoint segments): the TIGHT file/row-group hot test.
    val extSorted = segExtents.map(r => (r._2, r._3))
      .sortBy(_._1)(Search.utf8Ordering)
    val extLo = extSorted.map(_._1)
    val extHi = extSorted.map(_._2)
    val extLoU8 = extLo.map(UTF8String.fromString)
    val extHiU8 = extHi.map(UTF8String.fromString)
    // Pass 2: touched selection — files without stats can never be
    // pruned; statted files keep iff their range intersects a
    // source-key extent.
    val touched = scala.collection.mutable.ArrayBuffer.empty[DataFile]
    filesIt().foreach { f =>
      if (intersectsExtents(f.minDocId, f.maxDocId, extLoU8, extHiU8))
        touched += f
    }
    PrunePlan(Prune(touched.map(_.path).toSet, bounds, hitSegs, extLo, extHi),
      touched.toSeq, total)
  }

  /** Distributed endpoint coarsening: every k-th of the distinct sorted
    * endpoints (Spark's string sort IS UTF8 binary order), k sized so at
    * most `cap` survive. Runs only when the exact endpoint set would
    * not fit the driver budget.
    */
  private def coarseEndpoints(files: org.apache.spark.sql.Dataset[DataFile],
      cap: Int): Array[String] = {
    val spark = files.sparkSession
    import spark.implicits._
    val eps = files.toDF()
      .select(explode(array(col("minDocId"), col("maxDocId"))).as("e"))
      .where(col("e").isNotNull)
      .distinct().sort("e").as[String]
    val n = eps.count()
    val k = math.max(1L, math.ceil(n.toDouble / cap).toLong)
    eps.rdd.zipWithIndex().filter(_._2 % k == 0).map(_._1).collect()
      .sorted(Search.utf8Ordering)
  }

  def mergeInto(table: TokenTable, source: DataFrame,
      precedenceCol: String, jobId: String): Result = {
    val spark = table.spark
    import spark.implicits._
    val parent = table.current

    // Align the source to the table's PHYSICAL schema first (sources
    // address evolved tables by LOGICAL names; missing added columns
    // null-fill — SchemaEvolution.alignToPhysical), then dedup. The
    // schema comes from the PINNED parent snapshot — one read; a
    // concurrent ALTER mid-job can then never make the projection, the
    // target read schema and the committed snapshot disagree (the
    // commit's CAS still aborts on any concurrent version).
    val physSchema = graft.table.Format.schemaOf(parent)
    val physFields = physSchema.fieldNames.toIndexedSeq
    val src = dedupFirstWins(
        graft.table.SchemaEvolution.alignToPhysical(
          source, physSchema, keep = Seq(precedenceCol)),
        precedenceCol)
      .select(physFields.map(col): _*)
      .cache()
    val srcRows = src.count()
    // Keys-only projection cached separately: planning (key sample,
    // per-segment extents) and the broadcast build consume ONLY doc_id,
    // but reading it through the full-row cache decompresses the token
    // payload every pass (~1.5s per planning job at bench scale vs
    // ~0.1s off a ~15MB key cache).
    val srcKeys = src.select($"doc_id").cache()

    // Streamed planning: the driver holds the endpoint array (capped)
    // and the TOUCHED files — never the full inventory. The cap is
    // conf-overridable (graft.merge.boundsCap) so deployments — and the
    // coarse-path correctness spec — can tune where exact endpoint
    // collection hands over to distributed coarsening.
    val boundsCap = spark.conf.getOption("graft.merge.boundsCap")
      .map(_.toInt).getOrElse(DefaultBoundsCap)
    val plan = planPrune(() => table.filesStream(parent),
      srcKeys, () => table.files(parent), boundsCap,
      knownSrcCount = srcRows)
    val prune = plan.prune
    val touchedPaths = prune.touchedPaths
    val touched = plan.touched
    val untouchedCount = plan.totalFiles - touched.size

    // Hot/cold split gate: classify rows/row-groups only when the
    // update is SPARSE relative to the touched data — if source keys
    // cover most touched rows (dense update), "everything hot" is the
    // correct degenerate answer and the classifier is pure per-row
    // cost. Rows-based, so it needs no string-keyspace metric (extent
    // arrays can be per-key singletons, which made any segment-count
    // coverage ratio meaningless). Sound for rows of UNSTATTED files
    // too: extents cover every source key, so a row outside all extents
    // cannot equal any key no matter which file held it.
    val touchedRows = touched.map(_.rows).sum
    val split = prune.extLo.nonEmpty && srcRows * 2 <= touchedRows

    // Row-GROUP-level cold copy (below the file-level prune, above the
    // row-level classifier): each touched file's row groups carry their
    // own doc_id bounds, so groups intersecting no hot segment carry
    // into the new snapshot as a bytewise column-chunk copy — zero
    // decode, zero re-encode — and only hot groups enter the join
    // rewrite. Fully-cold files (file-level prune was over-approximate)
    // survive untouched with zero IO. Hot extracts are temporaries,
    // deleted after the commit.
    val coldDir = s"data/$jobId-v${parent.version}-cold"
    val hotxDir = s"data/$jobId-v${parent.version}-hotx"
    val rgSplits: Seq[graft.table.RowGroupCopy.Split] =
      if (split && touched.nonEmpty)
        graft.table.RowGroupCopy.planAll(spark, table.location,
          touched.map(_.path), coldDir, hotxDir, prune.extLo, prune.extHi)
      else Nil
    val byPathTouched = touched.map(f => f.path -> f).toMap
    val fullyCold = rgSplits.filter(_.allCold).map(s => byPathTouched(s.origPath))
    val coldFiles = rgSplits.flatMap(_.coldFiles)
    val decodeRels: Seq[String] =
      if (split) rgSplits.flatMap(_.decodeRel)
      else touched.map(_.path)
    val decodedBytes =
      if (split) rgSplits.map(_.decodeBytes).sum
      else touched.map(_.bytes).sum

    val target =
      if (decodeRels.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], physSchema)
      else spark.read.schema(physSchema)
        .parquet(decodeRels.map(p => s"${table.location}/$p"): _*)

    // --- the upsert ---
    // JOIN STRATEGY (optimization guide §3.1): the anti join only needs
    // the source's doc_id KEYS on its build side — ~tens of bytes per
    // source row regardless of payload width. When the batch is bounded
    // (srcRows <= graft.merge.broadcastKeyRows, default 2M keys ~100MB
    // built), BROADCAST the key set: the touched data is then NEVER
    // shuffled (the previous sort-merge plan exchanged and sorted every
    // decoded byte — measured 2.4GB of shuffle for a 1.2GB table at
    // bench scale — just to match ~15MB of keys). Catalyst won't pick
    // this itself: the temp-view source's size estimate exceeds
    // autoBroadcastJoinThreshold long before the key projection does.
    // Unbounded batches keep the sort-merge path below, whose composite
    // hot/cold key handles shuffle skew.
    val bcKeyRowsCap = spark.conf.getOption("graft.merge.broadcastKeyRows")
      .map(_.toLong).getOrElse(DefaultBroadcastKeyRows)
    val useBroadcast = srcRows <= bcKeyRowsCap
    val tv = s"graft_merge_target_${jobId.replaceAll("[^A-Za-z0-9_]", "_")}"
    val sv = s"graft_merge_source_${jobId.replaceAll("[^A-Za-z0-9_]", "_")}"
    if (!useBroadcast) src.createOrReplaceTempView(sv)
    val merged =
      if (useBroadcast) {
        // No hot/cold row classifier needed: with a broadcast build
        // side every row pays one hash probe — the classifier existed
        // to keep cold rows out of the *shuffled* join and to bound its
        // skew, both moot without an exchange.
        target.join(broadcast(srcKeys), Seq("doc_id"), "left_anti")
          .select(physFields.map(col): _*)
          .unionByName(src.select(physFields.map(col): _*))
      } else if (split) {
        // Row-level hot test by EXTENT intersection (same tightness as
        // the file/row-group test): idx = #(extent lows <= doc_id) via
        // the codegen binary search; hot iff the greatest such extent
        // also bounds the key from above. Tighter than hit-segment
        // membership, which marked everything down to the previous file
        // endpoint hot — rows provably outside every extent skip the
        // anti join entirely.
        val idx = SearchOps.bucketOfStr(col("doc_id"), prune.extLo)
        // when() evaluates branches lazily per row — element_at never
        // sees index 0 (an ANSI error).
        val hotCol = when(idx >= 1,
          col("doc_id") <= element_at(lit(prune.extHi), idx))
          .otherwise(lit(false))
        // Cold rows partition by which extent GAP they fall in ('c'+idx):
        // a single cold partition would produce files whose [min,max]
        // straddle the hot ranges (interval stats cannot express holes),
        // and the NEXT merge over the same keys would re-touch them —
        // per-gap files keep every cold output provably outside every
        // extent. Gap count is bounded by the extent count; above
        // MaxGapPartitions (an enormous update — file explosion risk)
        // fall back to one cold partition and let the next merge re-prune.
        val partCol =
          if (prune.extLo.length <= MaxGapPartitions)
            when(hotCol, lit("h"))
              .otherwise(concat(lit("c"), idx.cast("string")))
          else when(hotCol, lit("h")).otherwise(lit("c"))
        target.withColumn("__part", partCol).createOrReplaceTempView(tv)
        // Cold rows bypass the anti join via a COMPOSITE equi key
        // (doc_id, hot-flag) against the source's constant flag 0: a
        // cold row's (doc_id, 1) can never match, so it always survives
        // — in ONE pass over the touched data. The earlier NULL-key
        // bypass (CASE ... END with no ELSE) had a hash-skew trap: when
        // cold rows dominate (tight extents + a wide touched set), every
        // NULL key hashes to ONE shuffle partition and the sort-merge
        // join serializes on a single task; the composite key keeps cold
        // rows distributed by doc_id.
        // Column lists come from the table schema (physical names), so
        // evolved columns ride through the rewrite untouched.
        val colsT = physFields.map(n => s"t.`$n`").mkString(", ")
        val colsP = physFields.map(n => s"`$n`").mkString(", ")
        spark.sql(
          s"""SELECT $colsT, t.__part
             |FROM $tv t LEFT ANTI JOIN (SELECT doc_id, 0 AS __k FROM $sv) s
             |  ON t.doc_id = s.doc_id
             | AND (CASE WHEN t.__part = 'h' THEN 0 ELSE 1 END) = s.__k
             |UNION ALL
             |SELECT $colsP, 'h' AS __part FROM $sv""".stripMargin)
      } else {
        target.createOrReplaceTempView(tv)
        val colsT = physFields.map(n => s"t.`$n`").mkString(", ")
        val colsP = physFields.map(n => s"`$n`").mkString(", ")
        spark.sql(
          s"""SELECT $colsT
             |FROM $tv t LEFT ANTI JOIN $sv s ON t.doc_id = s.doc_id
             |UNION ALL
             |SELECT $colsP FROM $sv""".stripMargin)
      }

    // Placement of the rewrite output (broadcast path): without the
    // sort-merge exchange the map-only rewrite would emit one file per
    // scan task, each spanning its task's doc_id range — post-curve-
    // clustering that is the FULL keyspace per file, so every later
    // doc_id-keyed operation (ranged DELETE, the next merge) grazes
    // every rewrite output. One explicit range exchange on sampled
    // doc_id boundaries (the runByDocId machinery: exact hash-preimage
    // placement, no RangePartitioning double-execution) restores tight
    // per-file [min,max] — measured at bench scale it turns the
    // following 2%-range delete from a ~1.1GB near-full rewrite into a
    // pruned few-file one. The exchange moves only the DECODED bytes
    // (cost tracks the update footprint, like the rest of the rewrite).
    // Measured head-to-head at bench scale (MergeProbe, adjacent runs):
    // exchange = merge 12.3-12.8s / next-delete 1.3s / 60 files;
    // map-only partitionBy(8 ranges) = 11.8-17.0s / 1.6-2.4s / 568 files;
    // no placement = 8.4s merge but 5.3-7.8s next-delete (full-range
    // files defeat all later doc_id pruning); old sort-merge join =
    // 23.2-23.5s / 6.6s. Range exchange is the overall winner and
    // matches Iceberg's write.distribution-mode=range rationale
    // (guide §6): one shuffle buys prunable layout AND right-sized files.
    val placement = spark.conf.getOption("graft.merge.placement")
      .getOrElse("exchange")
    def rangeBounds(nOut: Int): Array[String] = {
      val fraction = math.min(1.0, 200000.0 / math.max(1L, touchedRows))
      val sampleKeys =
        if (nOut <= 1 || decodeRels.isEmpty) Array.empty[String]
        else target.select($"doc_id")
          .sample(withReplacement = false, fraction, seed = 42L)
          .as[String].collect().sorted(Search.utf8Ordering)
      if (sampleKeys.isEmpty) Array.empty
      else (1 until nOut)
        .map(i => sampleKeys(
          (i.toLong * sampleKeys.length / nOut).toInt.min(sampleKeys.length - 1)))
        .distinct.toArray
    }
    // Extent-aligned split points: the source-key extents, coarsened to
    // at most `cap` clusters, each contributing [lo, succ(hi)) bounds —
    // so HOT key ranges land in their own output files and every cold
    // output's [min,max] provably excludes them. Without these, a small
    // rewrite (one quantile range) emits one file spanning hot and cold
    // rows alike, and the NEXT merge/delete over the same keys re-grazes
    // all of it (the tight-cold-stats invariant the round-4/5 split
    // partitioning established; PruningSpec pins it). succ(hi) =
    // hi + ' ' (a strict upper bound just above the extent's last
    // key: a shorter string precedes its extensions in binary order).
    def extentClusterBounds(cap: Int): Array[String] = {
      val n = prune.extLo.length
      if (n == 0) Array.empty
      else {
        val step = math.max(1, (n + cap - 1) / cap)
        val b = Array.newBuilder[String]
        var i = 0
        while (i < n) {
          b += prune.extLo(i)
          b += prune.extHi(math.min(n - 1, i + step - 1)) + " "
          i += step
        }
        b.result()
      }
    }
    val maxPart = spark.sessionState.conf.filesMaxPartitionBytes
    val (rewriteDF, partCols) =
      if (!useBroadcast) (merged, if (split) Seq("__part") else Nil)
      else placement match {
        case "none" => (merged, Nil)
        case "exchange" =>
          val nOut = math.max(1L, math.min(
            (decodedBytes + maxPart - 1) / math.max(1L, maxPart),
            4L * spark.sessionState.conf.numShufflePartitions)).toInt
          val bounds = (rangeBounds(nOut) ++ extentClusterBounds(32))
            .distinct.sorted(Search.utf8Ordering)
          if (bounds.isEmpty) (merged, Nil)
          else (Cluster.exchangeByPid(merged,
            SearchOps.bucketOfStr(col("doc_id"), bounds), bounds.length + 1), Nil)
        case _ => // "partition": map-only, dynamic range-partition files
          val groups = spark.conf.getOption("graft.merge.rangeGroups")
            .map(_.toInt).getOrElse(8)
          val bounds = rangeBounds(groups)
          if (bounds.isEmpty) (merged, Nil)
          else (merged.withColumn("__part",
            concat(lit("r"), SearchOps.bucketOfStr(col("doc_id"), bounds)
              .cast("string"))), Seq("__part"))
      }
    // Plan-evidence hook (zero-cost unless GRAFT_PLAN_DUMP is set):
    // writes the rewrite's formatted physical plan so optimization
    // claims are checkable offline against plans/r06/.
    sys.env.get("GRAFT_PLAN_DUMP").foreach { d =>
      val tag = if (!useBroadcast) "smj" else s"broadcast_$placement"
      val p = java.nio.file.Paths.get(d, s"ns_merge_rewrite_$tag.txt")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, rewriteDF.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    // Version-scoped output dir (same rationale as Compact/Cluster).
    val out = table.writeDataFilesTo(rewriteDF, s"data/$jobId-v${parent.version}",
      overwrite = true, sortBy = Some("doc_id"),
      partitionBy = partCols)
    Lineage.completeTask(table, Lineage.TaskRecord(
      jobId, "merge", touched.map(_.path), out,
      rows = out.map(_.rows).sum, tokenCount = out.map(_.sumNtok).sum,
      status = "done", durationMs = 0L))
    // Survivors = all - removed (untouched + fully-cold originals kept
    // verbatim), plus bytewise cold copies and the rewrite's output —
    // written without materializing the survivor list on the driver.
    val removed = touchedPaths -- fullyCold.map(_.path)
    val manifest = table.writeSurvivorManifest(parent, removed, coldFiles ++ out)
    val snap = table.commit(Some(parent), "merge",
      addManifests = Seq(manifest), keepManifests = Nil,
      removedPaths = removed,
      summary = Map(
        "source-rows" -> srcRows.toString,
        "touched-files" -> touched.size.toString,
        "untouched-files" -> untouchedCount.toString,
        "touched-bytes" -> touched.map(_.bytes).sum.toString,
        "decoded-bytes" -> decodedBytes.toString,
        "cold-copied-bytes" -> coldFiles.map(_.bytes).sum.toString,
        "fully-cold-files" -> fullyCold.size.toString))
    src.unpersist()
    srcKeys.unpersist()
    if (!useBroadcast) {
      spark.catalog.dropTempView(tv)
      spark.catalog.dropTempView(sv)
    }
    // Hot extracts served only the rewrite job: drop them now (orphan GC
    // would also collect them, but leaving temporaries to GC hides bugs).
    if (rgSplits.exists(s => !s.allCold && s.coldFiles.nonEmpty)) {
      val hx = new org.apache.hadoop.fs.Path(s"${table.location}/$hotxDir")
      hx.getFileSystem(spark.sessionState.newHadoopConf()).delete(hx, true)
    }
    Result(snap, touched.size, untouchedCount.toInt, srcRows,
      touchedBytes = touched.map(_.bytes).sum,
      decodedBytes = decodedBytes,
      coldCopiedBytes = coldFiles.map(_.bytes).sum,
      fullyColdFiles = fullyCold.size)
  }
}
