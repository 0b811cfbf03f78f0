package graft.maintain

import graft.lineage.Lineage
import graft.table.{DataFile, ManifestFileIndex, Snapshot, TokenTable}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.Filter

/** Predicate DELETE (M9) — row-level delete as copy-on-write, the
  * lakehouse operation a training-data table needs for contamination /
  * PII / takedown removal (drop every sequence of a poisoned source,
  * delete a list of flagged doc_ids) that the reference's append-only
  * ingest loop has no answer to (kafka-delta-rs never mutates committed
  * data; `src/pipeline/mod.rs` only appends).
  *
  * Three-way file classification from manifest stats — ONE streamed
  * metadata pass, zero data IO for two of the three classes:
  *
  *   - `!mightMatch(pred, f)`  → UNTOUCHED: no row can match; the file
  *     survives verbatim (not even opened).
  *   - `mustMatchAll(pred, f)` → DROPPED: every row provably matches;
  *     the file leaves the snapshot METADATA-ONLY (a whole-partition
  *     delete — e.g. `source = 'bad-crawl'` on ByDocId/Z-order-clustered
  *     data — touches no bytes at all).
  *   - otherwise               → REWRITTEN: scan only these files, keep
  *     `NOT pred` rows, write survivors as fresh tightly-statted files.
  *
  * Both decision procedures are the SAME implementation the scan path
  * prunes with ([[ManifestFileIndex.mightMatch]] /
  * [[ManifestFileIndex.mustMatchAll]]), so delete planning inherits the
  * scan's UTF8-binary string ordering and its no-stats sentinel
  * handling, and clustering (M2) makes deletes cheap for exactly the
  * same reason it makes scans cheap: tight [min,max] per file.
  *
  * At 10^12-sequence scale: classification streams manifest rows (driver
  * holds only the touched subset, as Merge does), the rewrite reads only
  * partially-matching files, and the commit is one atomic CAS snapshot
  * (concurrent appends rebase; conflicting rewrites abort loudly).
  * The deleted-row count falls out of the stats delta (dropped rows +
  * rewritten-input rows - rewritten-output rows) — no counting query.
  */
object Delete {

  case class Result(snapshot: Snapshot, droppedFiles: Int, rewrittenFiles: Int,
      untouchedFiles: Long, deletedRows: Long, rewrittenBytes: Long)

  /** Delete every row satisfying `predicate` (over doc_id / tokens /
    * n_tok / source) from the table's current snapshot. Returns the
    * parent snapshot unchanged when nothing can match (a no-op delete
    * commits nothing, like Iceberg).
    */
  def deleteWhere(table: TokenTable, predicate: Column, jobId: String): Result = {
    val spark = table.spark
    val parent = table.current

    // Resolve the predicate against the table schema once, on a scan
    // plan, so classification sees bound AttributeReferences (names +
    // types checked here — an unknown column fails loudly now, not
    // mid-rewrite). ConstantFolding + LikeSimplification normalize the
    // shapes the classifier recognizes (LIKE 'p%' → StartsWith, literal
    // arithmetic folded) without running the full optimizer, whose
    // other rules could dissolve the Filter node itself.
    val analyzed = table.scan(parent).filter(predicate).queryExecution.analyzed
    val simplified = org.apache.spark.sql.catalyst.optimizer.LikeSimplification(
      org.apache.spark.sql.catalyst.optimizer.ConstantFolding(analyzed))
    val cond: Expression =
      simplified.collectFirst { case f: Filter => f.condition }
        .getOrElse(sys.error(s"unexpected analyzed delete plan: $simplified"))

    // One streamed classification pass; the driver retains only the
    // dropped + rewritten file lists (the predicate's touch set).
    var untouched = 0L
    val dropped = Seq.newBuilder[DataFile]
    val rewrite = Seq.newBuilder[DataFile]
    table.filesStream(parent).foreach { f =>
      if (!ManifestFileIndex.mightMatch(cond, f)) untouched += 1
      else if (ManifestFileIndex.mustMatchAll(cond, f)) dropped += f
      else rewrite += f
    }
    val drop = dropped.result()
    val rw = rewrite.result()

    if (drop.isEmpty && rw.isEmpty)
      return Result(parent, 0, 0, untouched, 0L, 0L)

    // Copy-on-write rewrite of partially-matching files only: read them
    // directly (their row groups may additionally prune on the pushed
    // NOT-predicate's bounds), keep survivors, preserve doc_id order
    // within files.
    val out: Seq[DataFile] =
      if (rw.isEmpty) Nil
      else {
        val paths = rw.map(f => s"${table.location}/${f.path}")
        val survivors = spark.read.schema(table.schema).parquet(paths: _*)
          .filter(!predicate)
        table.writeDataFilesTo(survivors, s"data/$jobId-v${parent.version}",
          overwrite = true, sortBy = Some("doc_id"))
      }

    Lineage.completeTask(table, Lineage.TaskRecord(
      jobId, "delete", (drop ++ rw).map(_.path), out,
      rows = out.map(_.rows).sum, tokenCount = out.map(_.sumNtok).sum,
      status = "done", durationMs = 0L))

    val removed = (drop ++ rw).map(_.path).toSet
    val deletedRows = drop.map(_.rows).sum + rw.map(_.rows).sum - out.map(_.rows).sum
    val manifest = table.writeSurvivorManifest(parent, removed, out)
    val snap = table.commit(Some(parent), "delete",
      addManifests = Seq(manifest), keepManifests = Nil,
      removedPaths = removed,
      summary = Map(
        "deleted-rows" -> deletedRows.toString,
        "dropped-files" -> drop.size.toString,
        "rewritten-files" -> rw.size.toString,
        "untouched-files" -> untouched.toString,
        "rewritten-bytes" -> rw.map(_.bytes).sum.toString))
    Result(snap, drop.size, rw.size, untouched, deletedRows,
      rewrittenBytes = rw.map(_.bytes).sum)
  }

  /** [[deleteWhere]] on a DataFrame of doc_ids (the contamination /
    * takedown list shape). Small lists inline into an IN predicate —
    * prunable per-value against file stats; large lists fall back to a
    * broadcast anti join over the files that might hold ANY listed id
    * (range-pruned via the list's [min,max]).
    */
  def deleteByDocIds(table: TokenTable, docIds: DataFrame, jobId: String,
      inlineLimit: Int = 10000): Result = {
    import org.apache.spark.sql.functions._
    val spark = table.spark
    val distinctIds = docIds.select(col("doc_id")).distinct()
    // limit+1 caps the driver materialization at the inline threshold.
    val sample = distinctIds.limit(inlineLimit + 1).collect().map(_.getString(0))
    if (sample.length <= inlineLimit) {
      if (sample.isEmpty)
        return Result(table.current, 0, 0,
          table.filesStream(table.current).size, 0L, 0L)
      deleteWhere(table, col("doc_id").isin(sample.toIndexedSeq: _*), jobId)
    } else {
      // Too many keys to inline: bound the touch set by the list's
      // overall [min,max] range, and rewrite with an anti join.
      val mm = distinctIds.agg(min("doc_id"), max("doc_id")).head()
      val (lo, hi) = (mm.getString(0), mm.getString(1))
      val parent = table.current
      var untouched = 0L
      val rewrite = Seq.newBuilder[DataFile]
      val ord = graft.functions.Search.utf8Ordering
      table.filesStream(parent).foreach { f =>
        val outside = f.minDocId != null && f.maxDocId != null &&
          (ord.gt(f.minDocId, hi) || ord.lt(f.maxDocId, lo))
        if (outside) untouched += 1 else rewrite += f
      }
      val rw = rewrite.result()
      if (rw.isEmpty) return Result(parent, 0, 0, untouched, 0L, 0L)
      val paths = rw.map(f => s"${table.location}/${f.path}")
      // No broadcast hint: beyond the inline threshold the list's size
      // is unbounded, so AQE picks broadcast vs shuffled anti join from
      // the measured build side.
      val survivors = spark.read.schema(table.schema).parquet(paths: _*)
        .join(distinctIds, Seq("doc_id"), "left_anti")
      val out = table.writeDataFilesTo(survivors, s"data/$jobId-v${parent.version}",
        overwrite = true, sortBy = Some("doc_id"))
      Lineage.completeTask(table, Lineage.TaskRecord(
        jobId, "delete", rw.map(_.path), out,
        rows = out.map(_.rows).sum, tokenCount = out.map(_.sumNtok).sum,
        status = "done", durationMs = 0L))
      val removed = rw.map(_.path).toSet
      val deletedRows = rw.map(_.rows).sum - out.map(_.rows).sum
      val manifest = table.writeSurvivorManifest(parent, removed, out)
      val snap = table.commit(Some(parent), "delete",
        addManifests = Seq(manifest), keepManifests = Nil,
        removedPaths = removed,
        summary = Map(
          "deleted-rows" -> deletedRows.toString,
          "dropped-files" -> "0",
          "rewritten-files" -> rw.size.toString,
          "untouched-files" -> untouched.toString,
          "rewritten-bytes" -> rw.map(_.bytes).sum.toString))
      Result(snap, 0, rw.size, untouched, deletedRows, rw.map(_.bytes).sum)
    }
  }
}
