package graft.sql

import graft.maintain.{Cluster, Compact, Expire}
import graft.table.{Format, TokenTable}
import java.util
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL stored procedures for the maintenance engine — the DSv2
  * `ProcedureCatalog` surface (SPARK-44167), so every north-star op is
  * callable from plain SQL once the catalog is registered:
  *
  *   CALL graft.system.compact(table => '/path', target_bytes => 134217728)
  *   CALL graft.system.cluster(table => '/path', curve => 'zorder')
  *   CALL graft.system.expire_snapshots(table => '/path', retain_last => 5)
  *   CALL graft.system.snapshots('/path')            -- history listing
  *
  * Mirrors the `CALL catalog.system.<proc>` convention users know from
  * other lakehouse formats. Each procedure returns a one-row (or, for
  * `snapshots`, one-row-per-version) result relation via [[LocalScan]];
  * the heavy lifting stays in the maintain package — a procedure is a
  * thin SQL binding, not a second implementation. The reference has no
  * SQL surface at all (its ops run from `main`,
  * `/root/reference/src/main.rs:22-68`); this is the Spark-native
  * equivalent of invoking those maintenance entry points.
  */
object GraftProcedures {

  private val SystemNs = Seq("system")

  def list(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(SystemNs))
      all.keys.map(n => Identifier.of(SystemNs.toArray, n)).toArray
    else Array.empty

  def load(ident: Identifier): UnboundProcedure = {
    val ok = ident.namespace().isEmpty || ident.namespace().sameElements(SystemNs)
    if (!ok) throw new IllegalArgumentException(
      s"unknown procedure namespace ${ident.namespace().mkString(".")}; use graft.system")
    all.getOrElse(ident.name(), throw new IllegalArgumentException(
      s"unknown procedure '${ident.name()}'; available: ${all.keys.toSeq.sorted.mkString(", ")}"))
  }

  private lazy val all: Map[String, GraftProcedure] = Seq(
    CompactProc, ClusterProc, ExpireProc, SnapshotsProc, FilesProc,
    RollbackProc, SchemaHistoryProc)
    .map(p => p.name -> p).toMap

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  private def in(name: String, dt: DataType, default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  // InternalRow getters return 0/false for NULL slots — every accessor
  // must guard, or `target_bytes => NULL` silently becomes 0 (which
  // would drive bucket math to Int.MaxValue) instead of failing loudly.
  private def requireSet(r: InternalRow, i: Int): Unit =
    if (r.isNullAt(i)) throw new IllegalArgumentException(
      "procedure argument must not be NULL (argument index " + i + ")")

  private def utf8(r: InternalRow, i: Int): String = {
    requireSet(r, i); r.getUTF8String(i).toString
  }
  private def long(r: InternalRow, i: Int): Long = { requireSet(r, i); r.getLong(i) }
  private def int(r: InternalRow, i: Int): Int = { requireSet(r, i); r.getInt(i) }
  private def bool(r: InternalRow, i: Int): Boolean = {
    requireSet(r, i); r.getBoolean(i)
  }
  private def positive(v: Long, name: String): Long = {
    if (v <= 0) throw new IllegalArgumentException(s"$name must be positive, got $v")
    v
  }

  /** Unbound+bound in one object (the parameter list is static — there
    * is nothing to specialize against the input schema).
    */
  sealed abstract class GraftProcedure(
      override val name: String,
      override val description: String,
      params: Seq[ProcedureParameter],
      outSchema: StructType) extends UnboundProcedure with BoundProcedure {

    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false

    protected def run(spark: SparkSession, input: InternalRow): Seq[InternalRow]

    override def call(input: InternalRow): util.Iterator[Scan] = {
      val result = run(SparkSession.active, input).toArray
      util.List.of[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = result
        override def readSchema(): StructType = outSchema
      }).iterator()
    }
  }

  private object CompactProc extends GraftProcedure(
    "compact",
    "Bin-pack small files into ~target_bytes outputs (bytewise row-group " +
      "concat); rechunk => true re-encodes fragmented files to consolidate " +
      "small row groups",
    Seq(in("table", StringType),
      in("target_bytes", LongType, (128L * 1024 * 1024).toString),
      in("parallelism", IntegerType, "8"),
      in("rechunk", BooleanType, "false")),
    StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("bins_rewritten", IntegerType, nullable = false),
      StructField("files_in", IntegerType, nullable = false),
      StructField("files_out", IntegerType, nullable = false),
      StructField("bytes_in", LongType, nullable = false)))) {
    override protected def run(spark: SparkSession, in: InternalRow): Seq[InternalRow] = {
      val t = TokenTable.open(spark, utf8(in, 0))
      val r = Compact.run(t, positive(long(in, 1), "target_bytes"), "sql-compact",
        parallelism = positive(int(in, 2), "parallelism").toInt,
        rechunk = bool(in, 3))
      Seq(InternalRow(r.snapshot.version, r.binsRewritten, r.filesIn, r.filesOut, r.bytesIn))
    }
  }

  private object ClusterProc extends GraftProcedure(
    "cluster",
    "Re-cluster the table: curve one of 'zorder', 'hilbert', 'by_doc_id'; " +
      "by_doc_id is incremental unless full => true",
    Seq(in("table", StringType),
      in("curve", StringType, "'zorder'"),
      in("target_bytes", LongType, (128L * 1024 * 1024).toString),
      in("full", BooleanType, "false")),
    StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("buckets", IntegerType, nullable = false),
      StructField("salted_buckets", IntegerType, nullable = false),
      StructField("carried_files", IntegerType, nullable = false),
      StructField("bytes_rewritten", LongType, nullable = false)))) {
    override protected def run(spark: SparkSession, in: InternalRow): Seq[InternalRow] = {
      val t = TokenTable.open(spark, utf8(in, 0))
      val curve = utf8(in, 1).toLowerCase match {
        case "zorder" => Cluster.ZOrder
        case "hilbert" => Cluster.Hilbert
        case "by_doc_id" | "bydocid" => Cluster.ByDocId
        case other => throw new IllegalArgumentException(
          s"unknown curve '$other'; use zorder | hilbert | by_doc_id")
      }
      val r = Cluster.run(t, curve, "sql-cluster",
        targetBytes = positive(long(in, 2), "target_bytes"),
        incremental = !bool(in, 3))
      Seq(InternalRow(r.snapshot.version, r.buckets, r.saltedBuckets,
        r.carriedFiles, r.rewrittenBytes))
    }
  }

  private object ExpireProc extends GraftProcedure(
    "expire_snapshots",
    "Expire all but the last retain_last snapshots and GC unreachable files older than grace_ms",
    Seq(in("table", StringType),
      in("retain_last", IntegerType, "5"),
      in("grace_ms", LongType, (3600L * 1000).toString)),
    StructType(Seq(
      StructField("expired_snapshots", IntegerType, nullable = false),
      StructField("deleted_files", LongType, nullable = false)))) {
    override protected def run(spark: SparkSession, in: InternalRow): Seq[InternalRow] = {
      val t = TokenTable.open(spark, utf8(in, 0))
      val r = Expire.run(t, positive(int(in, 1), "retain_last").toInt, long(in, 2))
      Seq(InternalRow(r.expiredSnapshots.size, r.deletedFiles))
    }
  }

  private object FilesProc extends GraftProcedure(
    "files",
    "List the file inventory with per-file stats for a snapshot (version -1 = current)",
    Seq(in("table", StringType), in("version", LongType, "-1")),
    StructType(Seq(
      StructField("path", StringType, nullable = false),
      StructField("bytes", LongType, nullable = false),
      StructField("rows", LongType, nullable = false),
      StructField("min_doc_id", StringType, nullable = true),
      StructField("max_doc_id", StringType, nullable = true),
      StructField("min_n_tok", IntegerType, nullable = false),
      StructField("max_n_tok", IntegerType, nullable = false),
      StructField("sum_n_tok", LongType, nullable = false)))) {
    override protected def run(spark: SparkSession, in: InternalRow): Seq[InternalRow] = {
      val t = TokenTable.open(spark, utf8(in, 0))
      val v = long(in, 1)
      val snap = if (v < 0) t.current else t.snapshotAt(v)
      // Driver materialization is O(#files) — the same planning-class
      // floor as any maintenance plan; for set ops over huge
      // inventories use the distributed `TokenTable.files` Dataset.
      t.filesStream(snap).map { f =>
        InternalRow(UTF8String.fromString(f.path), f.bytes, f.rows,
          UTF8String.fromString(f.minDocId), UTF8String.fromString(f.maxDocId),
          f.minNtok, f.maxNtok, f.sumNtok)
      }.toSeq
    }
  }

  private object RollbackProc extends GraftProcedure(
    "rollback",
    "Roll the table back to an ancestor version: commits a new snapshot " +
      "referencing that version's files (history stays time-travelable)",
    Seq(in("table", StringType), in("version", LongType)),
    StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("rolled_back_to", LongType, nullable = false)))) {
    override protected def run(spark: SparkSession, in: InternalRow): Seq[InternalRow] = {
      val t = TokenTable.open(spark, utf8(in, 0))
      val v = long(in, 1)
      val snap = t.rollbackTo(v)
      Seq(InternalRow(snap.version, v))
    }
  }

  private object SnapshotsProc extends GraftProcedure(
    "snapshots",
    "List live snapshots: version, parent, operation, commit timestamp, summary",
    Seq(in("table", StringType)),
    StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("parent_version", LongType, nullable = false),
      StructField("operation", StringType, nullable = false),
      StructField("timestamp_ms", LongType, nullable = false),
      StructField("manifests", IntegerType, nullable = false)))) {
    override protected def run(spark: SparkSession, in: InternalRow): Seq[InternalRow] = {
      val loc = utf8(in, 0)
      // Fail loudly like every other procedure (TokenTable.open's
      // guard), not "0 snapshots" for a mistyped path.
      if (Format.currentVersion(loc) < 0)
        throw new IllegalArgumentException(s"no table at $loc")
      Format.liveVersions(loc)
        .map { v =>
          val s = Format.readSnapshot(loc, v)
          InternalRow(s.version, s.parentVersion,
            UTF8String.fromString(s.operation), s.timestampMs, s.manifests.size)
        }
    }
  }

  /** The operational view schema evolution needs: which version changed
    * the schema to what — so an operator can pick the right rollback
    * target after a bad ALTER without replaying snapshot JSONs by hand.
    */
  private object SchemaHistoryProc extends GraftProcedure(
    "schema_history",
    "List each live snapshot's user-visible schema: version, operation, " +
      "schema DDL string, and whether it changed from the parent",
    Seq(in("table", StringType)),
    StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("operation", StringType, nullable = false),
      StructField("schema", StringType, nullable = false),
      StructField("changed", BooleanType, nullable = false)))) {
    override protected def run(spark: SparkSession, in: InternalRow): Seq[InternalRow] = {
      val loc = utf8(in, 0)
      if (Format.currentVersion(loc) < 0)
        throw new IllegalArgumentException(s"no table at $loc")
      val live = Format.liveVersions(loc).map(v => Format.readSnapshot(loc, v))
      live.map { s =>
        val ddl = graft.table.SchemaEvolution
          .logicalSchema(Format.schemaOf(s)).toDDL
        // "changed" keys on the RAW schemaJson vs the live parent (an
        // expired parent compares against the nearest live ancestor =
        // the previous live row, which is what the listing shows).
        val prev = live.takeWhile(_.version < s.version).lastOption
        InternalRow(s.version, UTF8String.fromString(s.operation),
          UTF8String.fromString(ddl),
          prev.forall(_.schemaJson != s.schemaJson))
      }
    }
  }
}
