package graft.maintain

import graft.table.{Format, TokenTable}
import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.Dataset
import scala.jdk.CollectionConverters._

/** Snapshot expiry + orphan-file GC (north-star M4).
  *
  * Reachability is a *set operation over file inventories*, kept
  * distributed (Dataset `except` = anti-join) because at 10^12-sequence
  * scale both the listing and the manifests are big data. Deletion only
  * ever touches files proven unreachable from every retained snapshot,
  * so a concurrent reader of a retained snapshot never loses a file.
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

  /** All table-relative candidate paths currently on disk (data files +
    * manifest dirs). Listing is materialized as a Dataset so the GC
    * `except` stays a Spark anti-join.
    */
  def listing(table: TokenTable): Dataset[String] = {
    val spark = table.spark
    import spark.implicits._
    val root = Paths.get(table.location).toAbsolutePath
    def walk(sub: String, dirsOnly: Boolean): Seq[String] = {
      val p = root.resolve(sub)
      if (!Files.isDirectory(p)) return Nil
      val st = Files.walk(p)
      try {
        st.iterator().asScala
          .filter(q =>
            if (dirsOnly) Files.isDirectory(q) && q.getFileName.toString.startsWith("manifest-")
            else Files.isRegularFile(q) && q.getFileName.toString.endsWith(".parquet"))
          .map(q => root.relativize(q).toString)
          .toSeq
      } finally st.close()
    }
    (walk(Format.DataDir, dirsOnly = false) ++
      walk(Format.Metadata, dirsOnly = true)).toDS()
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
    val orphans = listing(table).except(keep).as[String].collect()
      .filter { rel =>
        val p = Paths.get(table.location).resolve(rel)
        try Files.getLastModifiedTime(p).toMillis <= cutoff
        catch { case _: java.io.IOException => false }
      }

    val root = Paths.get(table.location).toAbsolutePath
    var deleted = 0L
    orphans.foreach { rel =>
      // A data file is orphaned only if no retained manifest references
      // it AND it is not inside a retained manifest dir.
      val p = root.resolve(rel)
      if (Files.isDirectory(p)) {
        val st = Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        try st.iterator().asScala.foreach(Files.deleteIfExists(_))
        finally st.close()
        deleted += 1
      } else if (Files.deleteIfExists(p)) deleted += 1
    }
    // Drop now-empty data dirs + expired snapshot JSONs.
    expired.foreach(v => Files.deleteIfExists(Format.versionFile(table.location, v)))
    Result(expired, deleted)
  }
}
