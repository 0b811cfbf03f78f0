package graft.sql

import graft.table.{Format, Snapshot, TokenTable}
import java.util
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column => SqlColumn, DataFrame, Row, SparkSession, SQLContext}
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 `TableCatalog` for TokenTables (VERDICT r3 task 5):
  * register once —
  * `spark.conf.set("spark.sql.catalog.graft", "graft.sql.GraftCatalog")`
  * — and plain SQL works in ANY session, no manual rule application:
  *
  *   - `CREATE TABLE graft.`/path`` (token schema enforced)
  *   - `INSERT INTO graft.`/path` SELECT ...` (one atomic snapshot)
  *   - `SELECT ... FROM graft.`/path`` with filter/column pushdown
  *   - `SELECT ... FROM graft.`/path` VERSION AS OF n` (time travel)
  *   - `DROP TABLE graft.`/path``
  *   - `MERGE INTO graft.`/path`` via [[graft.plans.TokenTableResolution]]
  *     (the extensions rule recognizes the catalog-resolved relation too)
  *
  * The catalog is PATH-BASED (like `delta.`/path``): the identifier IS
  * the table location; there is no namespace metadata to list.
  *
  * Read path: a DSv2 scan that falls back to V1 ([[V1Scan]]) by
  * replaying pushed filters and column pruning onto the engine's own
  * [[TokenTable.scan]] DataFrame — so catalog reads go through the SAME
  * [[graft.table.ManifestFileIndex]] file pruning and parquet pushdown
  * as API reads, rather than a parallel (and slower) DSv2 reader stack.
  * Write path: [[V1Write]] → [[InsertableRelation]] → `TokenTable.append`
  * (CAS snapshot commit; concurrent INSERTs auto-rebase).
  */
class GraftCatalog extends TableCatalog with ProcedureCatalog {
  private var catalogName: String = "graft"

  // --- ProcedureCatalog: CALL graft.system.<proc>(...) — see
  // [[GraftProcedures]] for the procedure set.
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(ident)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.list(namespace)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  private def path(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(".")

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty // path-based catalog: no enumerable namespace

  override def tableExists(ident: Identifier): Boolean =
    TokenTable.exists(path(ident))

  override def loadTable(ident: Identifier): Table = {
    val p = path(ident)
    if (!TokenTable.exists(p)) throw new NoSuchTableException(ident)
    new GraftTable(p, None)
  }

  /** `VERSION AS OF v`. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val p = path(ident)
    if (!TokenTable.exists(p)) throw new NoSuchTableException(ident)
    new GraftTable(p, Some(version.toLong))
  }

  /** `TIMESTAMP AS OF ts` (micros since epoch): latest snapshot at or
    * before the timestamp.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val p = path(ident)
    if (!TokenTable.exists(p)) throw new NoSuchTableException(ident)
    val tsMs = timestamp / 1000L
    val head = Format.currentVersion(p)
    val v = (0L to head)
      .filter(v => java.nio.file.Files.exists(Format.versionFile(p, v)))
      .map(v => v -> Format.readSnapshot(p, v).timestampMs)
      .filter(_._2 <= tsMs)
      .lastOption
      .getOrElse(throw new NoSuchTableException(ident))._1
    new GraftTable(p, Some(v))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    val p = path(ident)
    if (TokenTable.exists(p)) throw new TableAlreadyExistsException(ident)
    if (partitions.nonEmpty)
      throw new UnsupportedOperationException(
        "graft tables cluster via maintenance (Z-order/ByDocId), not Hive partitioning")
    val expected = TokenTable.tokenSchema
    // Nullability flags vary by DDL spelling (NOT NULL, ARRAY element
    // nullability); the format enforces non-null at write — compare
    // names + base types only.
    val same = schema.fields.length == expected.fields.length &&
      schema.fields.zip(expected.fields).forall { case (a, b) =>
        a.name == b.name && a.dataType.simpleString == b.dataType.simpleString
      }
    if (!same)
      throw new IllegalArgumentException(
        s"graft tables have the fixed token schema ${expected.simpleString}; got ${schema.simpleString}")
    TokenTable.create(SparkSession.active, p)
    new GraftTable(p, None)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER TABLE is unsupported: the token schema is fixed (schema evolution is a recorded non-goal)")

  override def dropTable(ident: Identifier): Boolean = {
    val p = path(ident)
    if (!TokenTable.exists(p)) return false
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(SparkSession.active.sessionState.newHadoopConf())
      .delete(hp, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "RENAME is unsupported for path-based tables; move the directory instead")
}

/** One TokenTable (optionally pinned to a snapshot version) as a DSv2
  * [[Table]].
  */
class GraftTable(val location: String, versionAsOf: Option[Long])
    extends Table with SupportsRead with SupportsWrite {

  private def snapshot(spark: SparkSession): Snapshot = {
    val t = TokenTable.open(spark, location)
    versionAsOf.map(t.snapshotAt).getOrElse(t.current)
  }

  override def name(): String = s"graft.`$location`"

  override def schema(): StructType = TokenTable.tokenSchema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE)

  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    m.put(TableCatalog.PROP_LOCATION, location)
    versionAsOf.foreach(v => m.put("graft.version-as-of", v.toString))
    m
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(this)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    if (versionAsOf.nonEmpty)
      throw new UnsupportedOperationException("cannot write to a time-travel snapshot")
    new WriteBuilder {
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              if (overwrite)
                throw new UnsupportedOperationException(
                  "INSERT OVERWRITE is unsupported; tables rewrite through MERGE/compaction")
              val t = TokenTable.open(data.sparkSession, location)
              t.append(data.select("doc_id", "tokens", "n_tok", "source"))
            }
          }
      }
    }
  }

  /** The engine's own scan (ManifestFileIndex-backed) for this table's
    * pinned snapshot.
    */
  private[sql] def innerScan(spark: SparkSession): DataFrame =
    TokenTable.open(spark, location).scan(snapshot(spark))
}

/** Scan builder: collects column pruning + pushable filters, then falls
  * back to V1 by replaying both onto the inner DataFrame — Catalyst then
  * pushes them through to the manifest prune and the parquet reader.
  */
class GraftScanBuilder(table: GraftTable) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = TokenTable.tokenSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => GraftScanBuilder.toColumn(f).isDefined)
    // Return everything as post-scan filters: Spark re-evaluates them
    // above the scan, so a translation subtlety can never change results
    // — the pushdown is purely an IO reduction.
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new V1Scan {
    private val schema = required
    override def readSchema(): StructType = schema
    override def toV1TableScan[T <: BaseRelation with TableScan](
        context: SQLContext): T =
      new BaseRelation with TableScan {
        override def sqlContext: SQLContext = context
        override def schema: StructType =
          if (required.isEmpty) new StructType() else required
        override def buildScan(): RDD[Row] = {
          val spark = context.sparkSession
          var df = table.innerScan(spark)
          pushed.flatMap(GraftScanBuilder.toColumn).foreach(c => df = df.filter(c))
          val out =
            if (required.isEmpty) df.select()
            else df.select(required.fieldNames.map(col).toIndexedSeq: _*)
          out.rdd
        }
      }.asInstanceOf[T]
  }
}

object GraftScanBuilder {
  /** Conservative V1-filter → Column translation; None = not pushed
    * (Spark evaluates it above the scan; correctness unaffected).
    */
  def toColumn(f: Filter): Option[SqlColumn] = f match {
    case sources.EqualTo(a, v) => Some(col(a) === lit(v))
    case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sources.LessThan(a, v) => Some(col(a) < lit(v))
    case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case sources.In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case sources.IsNotNull(a) => Some(col(a).isNotNull)
    case sources.IsNull(a) => Some(col(a).isNull)
    case sources.StringStartsWith(a, p) => Some(col(a).startsWith(p))
    case sources.And(l, r) =>
      for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
    case sources.Or(l, r) =>
      for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
    case sources.Not(inner) => toColumn(inner).map(!_)
    case _ => None
  }
}
