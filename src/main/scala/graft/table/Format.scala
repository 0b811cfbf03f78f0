package graft.table

import com.fasterxml.jackson.annotation.JsonInclude
import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** On-disk table format ("TokenTable") — an Iceberg-style metadata layer
  * built from scratch over Parquet + JSON because the sandbox ships no
  * Iceberg/Delta runtime (SURVEY.md §7 P0).
  *
  * Layout:
  * {{{
  * table/
  *   data/<commit-uuid>/part-*.parquet      immutable data files
  *   metadata/v<N>.json                     snapshots (atomic CAS commit)
  *   metadata/manifest-<uuid>.parquet       immutable manifest files
  *   lineage/<job-id>/...                   per-job checkpoint markers
  * }}}
  *
  * Mirrors the reference's single-atomic-commit-per-flush discipline
  * (`/root/reference/src/delta/mod.rs:35-63` — one `flush_and_commit`
  * per batch): every maintenance job produces exactly one new snapshot.
  */

/** Per-data-file manifest row with min/max column stats (north-star M3).
  * Paths are relative to the table root so tables are relocatable.
  * `groups` is the file's parquet row-group count (0 = unknown, for
  * manifests written before the field existed): compaction uses it to
  * decide CONCAT (cheap, preserves groups) vs RE-ENCODE (consolidates
  * fragmented groups) per bin without opening footers at plan time.
  */
case class DataFile(
    path: String,
    bytes: Long,
    rows: Long,
    minDocId: String,
    maxDocId: String,
    minNtok: Int,
    maxNtok: Int,
    sumNtok: Long,
    minSource: String,
    maxSource: String,
    groups: Int = 0) {
  /** Average row-group size; unknown group counts assume one group per
    * file (the common shape of small ingest files — and the
    * conservative direction: overestimating group size keeps the cheap
    * concat path, i.e. round-4 behavior).
    */
  def avgGroupBytes: Long = bytes / math.max(1, groups)
}

/** A snapshot: the complete table state at a version. File inventory
  * lives in immutable manifest Parquet files (readable as a DataFrame —
  * at 10^12-sequence scale the manifest itself is big data); the JSON
  * stays O(#manifests).
  */
case class Snapshot(
    version: Long,
    parentVersion: Long, // -1 = none
    schemaJson: String,
    operation: String,
    manifests: Seq[String], // relative paths of manifest parquet files
    summary: Map[String, String],
    timestampMs: Long)

object Format {
  val Metadata = "metadata"
  val DataDir = "data"
  val LineageDir = "lineage"

  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m.setSerializationInclusion(JsonInclude.Include.ALWAYS)
    m
  }

  def toJson(s: Snapshot): String =
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(s)
  def fromJson(json: String): Snapshot =
    mapper.readValue(json, classOf[Snapshot])

  def versionFile(tableDir: String, v: Long): Path =
    Paths.get(tableDir, Metadata, s"v$v.json")

  import scala.jdk.CollectionConverters._
  private val VersionRe = "v(\\d+)\\.json".r

  /** Latest committed version, or -1 for an empty metadata dir. */
  def currentVersion(tableDir: String): Long = {
    val md = Paths.get(tableDir, Metadata)
    if (!Files.isDirectory(md)) return -1L
    val st = Files.list(md)
    try {
      st.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case VersionRe(n) => n.toLong }
        .foldLeft(-1L)(math.max)
    } finally st.close()
  }

  /** Number of live (non-expired) snapshot JSONs — one metadata-dir
    * listing; the cheap gate streaming inline expiry checks per batch.
    */
  def liveVersionCount(tableDir: String): Int = {
    val md = Paths.get(tableDir, Metadata)
    if (!Files.isDirectory(md)) return 0
    val st = Files.list(md)
    try st.iterator().asScala.count(p =>
      VersionRe.matches(p.getFileName.toString))
    finally st.close()
  }

  def readSnapshot(tableDir: String, v: Long): Snapshot =
    fromJson(Files.readString(versionFile(tableDir, v)))

  /** Live (non-expired) snapshot versions, ascending — the shared
    * enumeration behind time travel and the history procedures.
    */
  def liveVersions(tableDir: String): Seq[Long] = {
    val head = currentVersion(tableDir)
    (0L to head).filter(v => Files.exists(versionFile(tableDir, v)))
  }

  /** The snapshot's physical schema, parsed. */
  def schemaOf(s: Snapshot): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.DataType.fromJson(s.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]

  /** Atomic, exclusive publish of v<N+1>.json.
    *
    * `Files.move(..., ATOMIC_MOVE)` maps to rename(2), which *replaces*
    * an existing target — that is atomic but not exclusive. CAS
    * semantics need link(2): `Files.createLink` fails with
    * `FileAlreadyExistsException` if another writer won the race.
    * Returns false on lost race (caller re-reads latest and rebases or
    * aborts — north-rule commit-conflict requirement; analog of the
    * reference's commit-retry loop `src/kafka/mod.rs:191-228`).
    *
    * Portability boundary: this is the ONE primitive that binds the
    * format to its storage's atomicity model, deliberately isolated
    * here. On HDFS the same contract is `FileSystem.create(path,
    * overwrite=false)` (exclusive create); on object stores it is a
    * conditional put (S3 If-None-Match / GCS precondition) or, like
    * Iceberg and Delta, a small catalog/DynamoDB-style mutex service.
    * Everything above this function — rebase, watermark merge,
    * conflict abort — is storage-agnostic.
    */
  def tryPublish(tableDir: String, snapshot: Snapshot): Boolean = {
    val md = Paths.get(tableDir, Metadata)
    Files.createDirectories(md)
    val tmp = md.resolve(s".tmp-v${snapshot.version}-${java.util.UUID.randomUUID()}")
    Files.writeString(tmp, toJson(snapshot))
    val target = versionFile(tableDir, snapshot.version)
    try {
      Files.createLink(target, tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally {
      Files.deleteIfExists(tmp)
    }
  }

  /** Per-(topic/partition) offset watermark codec for snapshot
    * summaries (the table-side Kafka-offset-commit analog, X1).
    */
  val WatermarksKey = "watermarks"

  def parseWatermarks(summary: Map[String, String]): Map[String, Long] =
    summary.getOrElse(WatermarksKey, "").split(';').filter(_.nonEmpty)
      .map { kv => val Array(k, v) = kv.split('='); k -> v.toLong }.toMap

  def encodeWatermarks(w: Map[String, Long]): String =
    w.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(";")

  /** Max-merge of two watermark maps (used when an append rebases onto a
    * concurrent commit: neither side's offsets may be lost).
    */
  def mergeWatermarks(a: Map[String, String], b: Map[String, String]): Map[String, Long] = {
    val wa = parseWatermarks(a); val wb = parseWatermarks(b)
    (wa.keySet ++ wb.keySet).map { k =>
      k -> math.max(wa.getOrElse(k, -1L), wb.getOrElse(k, -1L))
    }.toMap
  }

  /** Atomic write of a small marker/JSON file (last-writer-wins is fine;
    * used for lineage task markers where content is deterministic).
    */
  def atomicWrite(target: Path, content: String): Unit = {
    Files.createDirectories(target.getParent)
    val tmp = target.getParent.resolve(s".tmp-${java.util.UUID.randomUUID()}")
    Files.writeString(tmp, content)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
  }
}

/** Commit conflict that cannot be auto-rebased (overlapping file sets);
  * caller must re-plan against the new table state. Mirrors the
  * reference's hard error after exhausted commit retries
  * (`src/kafka/mod.rs:224-228`).
  */
class CommitConflictException(msg: String) extends RuntimeException(msg)
