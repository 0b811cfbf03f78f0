package graft.maintain

import graft.table.{Format, TokenTable}
import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.Dataset
import scala.jdk.CollectionConverters._

/** Snapshot expiry + orphan-file GC (north-star M4).
  *
  * Reachability is a *set operation over file inventories*, kept
  * distributed (Dataset `except` = anti-join) because at 10^12-sequence
  * scale both the listing and the manifests are big data. The listing
  * itself fans out one walk task per first-level directory (executors
  * touch the 10^6 files; the driver only enumerates job dirs), and
  * deletes run inside `mapPartitions` on the orphan set — no driver-side
  * per-file loop anywhere. Deletion only ever touches files proven
  * unreachable from every retained snapshot, so a concurrent reader of
  * a retained snapshot never loses a file.
  */
object Expire {

  case class Result(expiredSnapshots: Seq[Long], deletedFiles: Long)

  /** Table-relative paths of every data/manifest file reachable from
    * the given snapshot versions.
    */
  def reachable(table: TokenTable, versions: Seq[Long]): Dataset[String] = {
    val spark = table.spark
    import spark.implicits._
    val snaps = versions.map(table.snapshotAt)
    val manifestDirs = snaps.flatMap(_.manifests).distinct
    val dataPaths =
      if (manifestDirs.isEmpty) spark.emptyDataset[String]
      else snaps.filter(_.manifests.nonEmpty)
        .map(s => table.files(s).map(_.path))
        .reduce(_ union _)
        .distinct()
    // Manifest parquet dirs contain part files; mark the dir prefix.
    dataPaths.union(manifestDirs.toDS())
  }

  /** Walk one table-relative subtree on an executor: either the data
    * files (regular *.parquet) or the manifest dirs under it. Static so
    * the task closure serializes cleanly.
    */
  def walkUnit(root: String, sub: String, dirsOnly: Boolean): Seq[String] = {
    val rootP = Paths.get(root)
    val p = rootP.resolve(sub)
    if (!Files.isDirectory(p)) return Nil
    val st = Files.walk(p)
    try {
      st.iterator().asScala
        .filter(q =>
          if (dirsOnly) Files.isDirectory(q) && q.getFileName.toString.startsWith("manifest-")
          else Files.isRegularFile(q) && q.getFileName.toString.endsWith(".parquet"))
        .map(q => rootP.relativize(q).toString)
        .toSeq
    } finally st.close()
  }

  /** All table-relative candidate paths currently on disk (data files +
    * manifest dirs), as a Dataset: the driver enumerates only the
    * first-level units (job/commit dirs — O(#jobs)); executors walk
    * them, so a 10^6-file listing is a parallel scan, not a driver
    * stall.
    */
  def listing(table: TokenTable): Dataset[String] = {
    val spark = table.spark
    import spark.implicits._
    val root = Paths.get(table.location).toAbsolutePath
    def firstLevel(sub: String): Seq[String] =
      if (!Files.isDirectory(root.resolve(sub))) Nil
      else {
        val st = Files.list(root.resolve(sub))
        try st.iterator().asScala.map(p => root.relativize(p).toString).toSeq
        finally st.close()
      }
    // (unit, dirsOnly): data units list parquet files; each manifest
    // dir is ITS OWN unit (walking the whole metadata tree as one unit
    // would serialize O(#snapshots x #manifest-files) paths through a
    // single straggler task). walkUnit on a manifest dir emits the dir
    // itself; version JSONs are not directories and emit nothing.
    val units = firstLevel(Format.DataDir).map(u => (u, false)) ++
      firstLevel(Format.Metadata).map(u => (u, true))
    val rootStr = root.toString
    val par = math.max(1, math.min(units.size, spark.sparkContext.defaultParallelism))
    spark.createDataset(units)
      .repartition(par)
      .flatMap { case (sub, dirsOnly) => walkUnit(rootStr, sub, dirsOnly) }
  }

  /** Delete one orphan if it is older than the cutoff; directories
    * (manifest dirs) are removed recursively. Returns whether a delete
    * happened. Executor-side.
    */
  def deleteIfStale(root: String, rel: String, cutoffMs: Long): Boolean = {
    val p = Paths.get(root).resolve(rel)
    val stale =
      try Files.getLastModifiedTime(p).toMillis <= cutoffMs
      catch { case _: java.io.IOException => false }
    if (!stale) return false
    if (Files.isDirectory(p)) {
      val st = Files.walk(p).sorted(java.util.Comparator.reverseOrder())
      try st.iterator().asScala.foreach(Files.deleteIfExists(_))
      finally st.close()
      true
    } else Files.deleteIfExists(p)
  }

  /** Expire all but the last `retainLast` snapshots, then GC every file
    * unreachable from the retained set. Returns what was removed.
    *
    * @param graceMs files younger than this are never deleted even when
    *                unreachable — they may belong to a concurrent
    *                not-yet-committed writer (the format explicitly
    *                supports concurrent appends via CAS rebase).
    *                Production default 1h; tests pass 0.
    */
  def run(table: TokenTable, retainLast: Int,
      graceMs: Long = 3600L * 1000): Result = {
    val spark = table.spark
    import spark.implicits._
    val head = table.currentVersion
    val allVersions = (0L to head).filter(v =>
      Files.exists(Format.versionFile(table.location, v)))
    val retained = allVersions.takeRight(math.max(1, retainLast))
    val expired = allVersions.diff(retained)

    val keep = reachable(table, retained)
    val cutoff = System.currentTimeMillis() - graceMs
    val rootStr = Paths.get(table.location).toAbsolutePath.toString
    // except = distributed anti-join; deletes fan out per partition. A
    // path is orphaned only if no retained manifest references it and it
    // is not inside a retained manifest dir.
    val deleted = listing(table).except(keep)
      .mapPartitions { it =>
        var n = 0L
        it.foreach(rel => if (deleteIfStale(rootStr, rel, cutoff)) n += 1)
        Iterator.single(n)
      }.collect().sum

    // Expired snapshot JSONs: O(#snapshots), metadata-only.
    expired.foreach(v => Files.deleteIfExists(Format.versionFile(table.location, v)))
    Result(expired, deleted)
  }
}
