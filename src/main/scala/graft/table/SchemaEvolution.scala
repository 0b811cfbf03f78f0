package graft.table

import org.apache.spark.sql.connector.catalog.TableChange
import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}

/** Schema evolution for TokenTables — ALTER TABLE ADD / DROP / RENAME
  * COLUMN without rewriting a single data file (the reference's own
  * TODO, `/root/reference/README.md:285`; semantics follow Iceberg's
  * schema-evolution contract).
  *
  * DESIGN — physical vs logical names. The snapshot's `schemaJson`
  * stores the PHYSICAL schema: fields keyed by the immutable name the
  * column's parquet data was written under. A renamed column keeps its
  * physical name forever and carries the user-visible name in field
  * metadata (`graft.logical`); an added column gets a fresh physical
  * name suffixed with a unique tag so it can never collide with the
  * residual parquet data of a same-named column that was dropped
  * earlier (the failure Iceberg prevents with field ids — a dropped
  * column's bytes stay in old files, and a by-name reader would
  * resurrect them). Everything below the SQL surface — file stats,
  * manifest pruning, DML planning, compaction's bytewise concat —
  * addresses columns physically and never changes; only the DSv2
  * catalog layer and [[TokenTable.scanLogical]] translate.
  *
  * WHY THIS IS ZERO-REWRITE AT 100 TB. ADD: old files simply lack the
  * new column and the parquet reader null-fills it from the read schema
  * (every data file's columns are a SUBSET of the snapshot's physical
  * schema — the engine's standing invariant). DROP: the column leaves
  * the read schema; old bytes are dead weight that the next compaction
  * re-encode naturally sheds. RENAME: pure metadata. No ALTER ever
  * schedules a Spark job.
  *
  * INVARIANTS enforced here:
  *   - The four core columns (doc_id/tokens/n_tok/source) can be
  *     RENAMED (logical-only; the machinery uses physical names) but
  *     never DROPPED — maintenance planning and file stats require them.
  *   - Added columns are NULLABLE, defaultless, top-level. (NOT NULL
  *     would make every pre-ALTER row invalid; defaults would need
  *     default-aware readers.)
  *   - No NON-core column may take a core column's LOGICAL name: the
  *     aggregate-pushdown planner treats the core names as
  *     provably-non-null / stats-backed, and a nullable column shadowing
  *     `doc_id` would turn a metadata COUNT into a wrong answer.
  */
object SchemaEvolution {
  /** Field-metadata key carrying the user-visible name when it differs
    * from the physical (storage) name.
    */
  val LogicalKey = "graft.logical"

  /** The physical names the maintenance machinery addresses directly. */
  val CoreFields: Set[String] = Set("doc_id", "tokens", "n_tok", "source")

  def logicalName(f: StructField): String =
    if (f.metadata.contains(LogicalKey)) f.metadata.getString(LogicalKey)
    else f.name

  /** The user-visible schema: physical fields re-labelled with their
    * logical names. Only the rename-mapping key is stripped; the rest
    * of the metadata (column comments etc.) stays visible.
    */
  def logicalSchema(physical: StructType): StructType =
    StructType(physical.fields.map { f =>
      val meta =
        if (f.metadata.contains(LogicalKey))
          new MetadataBuilder().withMetadata(f.metadata).remove(LogicalKey).build()
        else f.metadata
      f.copy(name = logicalName(f), metadata = meta)
    })

  /** True when no column was ever renamed — the common case, where the
    * logical view IS the physical scan and aliasing is skipped.
    */
  def isIdentity(physical: StructType): Boolean =
    physical.fields.forall(f => !f.metadata.contains(LogicalKey))

  /** logical-name (lowercased) → physical-name map. */
  def logicalToPhysical(physical: StructType): Map[String, String] =
    physical.fields.map(f => logicalName(f).toLowerCase -> f.name).toMap

  private def resolve(physical: StructType, logical: String): Option[StructField] =
    physical.fields.find(f => logicalName(f).equalsIgnoreCase(logical))

  /** A NEW logical name must not equal any field's logical OR physical
    * name: alignToPhysical resolves physical-name-first, so a logical
    * name shadowing another column's storage name would silently bind
    * producer data to the wrong column.
    */
  private def nameTaken(physical: StructType, name: String,
      ignore: StructField): Boolean =
    physical.fields.exists(f => (f ne ignore) &&
      (logicalName(f).equalsIgnoreCase(name) || f.name.equalsIgnoreCase(name)))

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  private def singleName(parts: Array[String], what: String): String = {
    if (parts.length != 1)
      fail(s"$what: nested fields are not supported (got ${parts.mkString(".")})")
    parts(0)
  }

  /** Apply DSv2 [[TableChange]]s to a physical schema, returning the
    * evolved physical schema. Pure function — commit/retry lives in
    * [[TokenTable.alterSchema]].
    */
  def evolve(physical: StructType, changes: Seq[TableChange]): StructType =
    changes.foldLeft(physical)(applyOne)

  private def applyOne(schema: StructType, change: TableChange): StructType = change match {
    case add: TableChange.AddColumn =>
      val logical = singleName(add.fieldNames(), "ADD COLUMN")
      if (!add.isNullable)
        fail(s"ADD COLUMN $logical: new columns must be nullable " +
          "(pre-existing rows have no value for them)")
      if (add.defaultValue() != null)
        fail(s"ADD COLUMN $logical: default values are not supported")
      if (add.position() != null)
        fail(s"ADD COLUMN $logical: explicit positions (FIRST/AFTER) are " +
          "not supported; new columns append at the end")
      if (nameTaken(schema, logical, ignore = null))
        fail(s"ADD COLUMN $logical: the name collides with an existing " +
          "column's logical or storage name")
      if (CoreFields.exists(_.equalsIgnoreCase(logical)))
        fail(s"ADD COLUMN $logical: the core column names " +
          s"(${CoreFields.mkString(", ")}) are reserved even after a core " +
          "column is renamed — a nullable shadow would corrupt " +
          "stats-backed aggregate pushdown")
      // Unique physical name: immune to dropped-column data resurrection
      // (old files may still hold bytes under any previously-used name).
      val physName =
        s"${logical}_${java.util.UUID.randomUUID().toString.replace("-", "").take(8)}"
      val meta = new MetadataBuilder().putString(LogicalKey, logical).build()
      val comment = Option(add.comment())
      val field0 = StructField(physName, add.dataType(), nullable = true, meta)
      StructType(schema.fields :+
        comment.map(field0.withComment).getOrElse(field0))

    case del: TableChange.DeleteColumn =>
      val logical = singleName(del.fieldNames(), "DROP COLUMN")
      resolve(schema, logical) match {
        case None =>
          if (del.ifExists()) schema
          else fail(s"DROP COLUMN $logical: no such column")
        case Some(f) if CoreFields.contains(f.name) =>
          fail(s"DROP COLUMN $logical: ${f.name} is a core column " +
            "(file stats and maintenance planning depend on it)")
        case Some(f) =>
          StructType(schema.fields.filterNot(_ eq f))
      }

    case ren: TableChange.RenameColumn =>
      val logical = singleName(ren.fieldNames(), "RENAME COLUMN")
      val f = resolve(schema, logical).getOrElse(
        fail(s"RENAME COLUMN $logical: no such column"))
      val to = ren.newName()
      if (nameTaken(schema, to, ignore = f))
        fail(s"RENAME COLUMN $logical TO $to: the name collides with an " +
          "existing column's logical or storage name")
      if (!CoreFields.contains(f.name) && CoreFields.exists(_.equalsIgnoreCase(to)))
        fail(s"RENAME COLUMN $logical TO $to: the core column names are " +
          "reserved for the core columns themselves")
      val meta =
        if (to == f.name) // renamed back to its physical name: drop the alias
          new MetadataBuilder().withMetadata(f.metadata).remove(LogicalKey).build()
        else new MetadataBuilder().withMetadata(f.metadata)
          .putString(LogicalKey, to).build()
      StructType(schema.fields.map(x => if (x eq f) x.copy(metadata = meta) else x))

    case cmt: TableChange.UpdateColumnComment =>
      val logical = singleName(cmt.fieldNames(), "ALTER COLUMN ... COMMENT")
      val f = resolve(schema, logical).getOrElse(
        fail(s"ALTER COLUMN $logical COMMENT: no such column"))
      StructType(schema.fields.map(x =>
        if (x eq f) x.withComment(cmt.newComment()) else x))

    case other =>
      throw new UnsupportedOperationException(
        s"ALTER TABLE: unsupported change ${other.getClass.getSimpleName} " +
          "(supported: ADD COLUMN, DROP COLUMN, RENAME COLUMN, COMMENT; " +
          "type changes and nullability changes are rejected — data files " +
          "are immutable and the writer enforces non-null core columns)")
  }

  /** Re-label a PHYSICAL-named DataFrame with logical column names — a
    * pure Project of aliases (identity when nothing was renamed), which
    * Catalyst pushes filters and pruning straight through.
    */
  def aliasToLogical(df: org.apache.spark.sql.DataFrame,
      physical: StructType): org.apache.spark.sql.DataFrame =
    if (isIdentity(physical)) df
    else df.select(physical.fields.map(f =>
      org.apache.spark.sql.functions.col(f.name).as(logicalName(f))).toIndexedSeq: _*)

  /** Align a user-facing DataFrame (logical column names) to the table's
    * PHYSICAL schema: each physical field is taken from the input by
    * physical name, else by logical name, else null-filled when nullable
    * (added columns a pre-evolution producer doesn't know about).
    * `keep` columns (e.g. a precedence column) pass through untouched.
    * Used by MERGE to accept sources written against the logical view.
    */
  def alignToPhysical(df: org.apache.spark.sql.DataFrame, physical: StructType,
      keep: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val have = df.columns.map(c => c.toLowerCase -> c).toMap
    val cols = physical.fields.map { f =>
      have.get(f.name.toLowerCase).map(col(_).as(f.name))
        .orElse(have.get(logicalName(f).toLowerCase).map(col(_).as(f.name)))
        .getOrElse {
          if (f.nullable) lit(null).cast(f.dataType).as(f.name)
          else throw new IllegalArgumentException(
            s"source is missing required column ${logicalName(f)}")
        }
    } ++ keep.map(col)
    df.select(cols.toIndexedSeq: _*)
  }
}
