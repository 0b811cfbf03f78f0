package graft

import graft.ingest.TokenGen
import graft.maintain.{Cluster, Compact, Delete, Expire, Merge}
import graft.table.TokenTable
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-contract query implementations (SparkEntry delegates here).
  *
  * The maintenance queries are END-TO-END oracle checks: they build a
  * real TokenTable from the driver's `documents` parquet, run the
  * maintenance operator, scan the result back, and project columns whose
  * DuckDB oracle is the *direct tokenization of the input* — because
  * every maintenance op must preserve table state exactly (the
  * byte-equal token-array invariant). A hash mismatch in ANY of these
  * means the engine corrupted data.
  */
object Queries {

  /** Deterministic cross-engine "tokenizer" over documents.text: token i
    * = length of the i-th whitespace-separated word. Mirrored 1:1 in
    * DuckDB SQL (`list_transform(regexp_extract_all(...), w -> len(w))`).
    */
  def tokenizedDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val words = regexp_extract_all(col("text"), lit("\\S+"), lit(0))
    docs.select(
      format_string("doc_%012d", col("doc_id")).as("doc_id"),
      transform(words, w => length(w).cast("int")).as("tokens"),
      size(words).cast("int").as("n_tok"),
      col("source"))
  }

  /** The scan projection compared against DuckDB: per-row token checksum
    * without shipping the array through the comparator.
    */
  def scanProjection(scan: DataFrame): DataFrame =
    scan.select(
      col("doc_id"),
      col("source"),
      col("n_tok").cast("long").as("n_tok"),
      aggregate(col("tokens"), lit(0L), (a, x) => a + x).as("tok_sum"))

  /** Oracle for every state-preserving maintenance query. */
  val tokenizedDocsSql: String =
    """SELECT printf('doc_%012d', doc_id) AS doc_id,
      |       source,
      |       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok,
      |       CAST(coalesce(list_sum(list_transform(regexp_extract_all(text, '\S+'), w -> len(w))), 0) AS BIGINT) AS tok_sum
      |FROM documents""".stripMargin

  /** Build (or rebuild) a scratch TokenTable from `documents`, ingesting
    * in `commits` small batches so compaction has real work to do.
    * Deterministic location per (name, dir); wiped on entry so queries
    * are idempotent across Verify/Bench runs.
    */
  /** Deterministic per-(name, dir) scratch location, wiped on entry so
    * queries are idempotent across Verify/Bench runs.
    */
  def freshQueryDir(name: String, dir: String): String = {
    val loc = s"${System.getProperty("java.io.tmpdir")}/graft_q/${name}_" +
      math.abs(dir.hashCode).toString
    val p = Paths.get(loc)
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val st = Files.walk(p).sorted(java.util.Comparator.reverseOrder())
      try st.iterator().asScala.foreach(Files.deleteIfExists(_))
      finally st.close()
    }
    loc
  }

  def buildTable(spark: SparkSession, dir: String, name: String,
      commits: Int): TokenTable = {
    val loc = freshQueryDir(name, dir)
    val t = TokenTable.create(spark, loc)
    val rows = tokenizedDocs(spark, dir)
      .withColumn("__c", pmod(xxhash64(col("doc_id")), lit(commits.toLong)))
    (0 until commits).foreach { c =>
      t.append(rows.filter(col("__c") === c).drop("__c"))
    }
    t
  }

  // ------------------------------------------------- maintenance queries

  def m1CompactScan(spark: SparkSession, dir: String): DataFrame = {
    val t = buildTable(spark, dir, "m1", commits = 8)
    val res = Compact.run(t, targetBytes = 8L * 1024 * 1024, jobId = "q-m1")
    require(res.binsRewritten > 0, "compaction found nothing to do")
    scanProjection(t.scan())
  }

  def m2ZorderScan(spark: SparkSession, dir: String): DataFrame = {
    val t = buildTable(spark, dir, "m2", commits = 6)
    Cluster.run(t, Cluster.ZOrder, "q-m2", targetBytes = 64L * 1024)
    scanProjection(t.scan())
  }

  def m2HilbertScan(spark: SparkSession, dir: String): DataFrame = {
    val t = buildTable(spark, dir, "m2h", commits = 6)
    Cluster.run(t, Cluster.Hilbert, "q-m2h", targetBytes = 64L * 1024)
    scanProjection(t.scan())
  }

  /** MERGE INTO: updates for doc_id%7==0 (tokens := [n_chars%50, 1, 2]),
    * inserts for doc_id%13==0 (re-keyed +1000000, same tokens). The
    * oracle reproduces the post-merge state in pure SQL.
    */
  def m6MergeScan(spark: SparkSession, dir: String): DataFrame = {
    val t = buildTable(spark, dir, "m6", commits = 4)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val updates = docs.filter(col("doc_id") % 7 === 0).select(
      format_string("doc_%012d", col("doc_id")).as("doc_id"),
      array(pmod(col("n_chars"), lit(50)).cast("int"), lit(1), lit(2)).as("tokens"),
      lit(3).as("n_tok"),
      col("source"))
    val inserts = tokenizedDocs(spark, dir)
      .filter(expr("CAST(substring(doc_id, 5) AS BIGINT) % 13 = 0"))
      .withColumn("doc_id",
        format_string("doc_%012d", expr("CAST(substring(doc_id, 5) AS BIGINT) + 1000000")))
    val source = updates.unionByName(inserts)
      .withColumn("precedence", monotonically_increasing_id())
    Merge.mergeInto(t, source, "precedence", "q-m6")
    scanProjection(t.scan())
  }

  val m6MergeSql: String =
    """WITH toks AS (
      |  SELECT doc_id AS raw_id, printf('doc_%012d', doc_id) AS doc_id, source,
      |         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok,
      |         CAST(coalesce(list_sum(list_transform(regexp_extract_all(text, '\S+'), w -> len(w))), 0) AS BIGINT) AS tok_sum,
      |         n_chars
      |  FROM documents
      |), updates AS (
      |  SELECT doc_id, source, CAST(3 AS BIGINT) AS n_tok,
      |         CAST(n_chars % 50 + 3 AS BIGINT) AS tok_sum
      |  FROM toks WHERE raw_id % 7 = 0
      |), inserts AS (
      |  SELECT printf('doc_%012d', raw_id + 1000000) AS doc_id, source, n_tok, tok_sum
      |  FROM toks WHERE raw_id % 13 = 0
      |)
      |SELECT doc_id, source, n_tok, tok_sum FROM toks WHERE raw_id % 7 <> 0
      |UNION ALL SELECT * FROM updates
      |UNION ALL SELECT * FROM inserts""".stripMargin

  /** M6 via NATIVE SQL TEXT: the same updates/inserts as
    * [[m6MergeScan]], but executed through
    * `MERGE INTO graft.\`path\` ... WHEN MATCHED THEN UPDATE SET * WHEN
    * NOT MATCHED THEN INSERT *` — parsed by Spark's SQL parser,
    * compiled by [[graft.plans.TokenTableResolution]] into
    * [[graft.plans.GraftMergeCommand]], executed by Merge.mergeInto.
    * The driver session has no graft extensions injected, so the rule
    * is applied to the parsed plan explicitly here; a session created
    * with `spark.sql.extensions=graft.GraftExtensions` gets the same
    * conversion on plain `spark.sql(...)`
    * (TokenTableResolutionSpec covers that wiring).
    */
  def m6MergeSqlScan(spark: SparkSession, dir: String): DataFrame = {
    val t = buildTable(spark, dir, "m6sql", commits = 4)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val updates = docs.filter(col("doc_id") % 7 === 0).select(
      format_string("doc_%012d", col("doc_id")).as("doc_id"),
      array(pmod(col("n_chars"), lit(50)).cast("int"), lit(1), lit(2)).as("tokens"),
      lit(3).as("n_tok"),
      col("source"))
    val inserts = tokenizedDocs(spark, dir)
      .filter(expr("CAST(substring(doc_id, 5) AS BIGINT) % 13 = 0"))
      .withColumn("doc_id",
        format_string("doc_%012d", expr("CAST(substring(doc_id, 5) AS BIGINT) + 1000000")))
    updates.unionByName(inserts).createOrReplaceTempView("graft_m6_sql_src")
    val sql =
      s"""MERGE INTO graft.`${t.location}` AS t
         |USING graft_m6_sql_src AS s
         |ON t.doc_id = s.doc_id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin
    val parsed = spark.sessionState.sqlParser.parsePlan(sql)
    val vBefore = t.currentVersion
    org.apache.spark.sql.GraftSqlBridge
      .ofRows(spark, plans.TokenTableResolution(spark)(parsed)).collect()
    require(t.currentVersion > vBefore, "SQL MERGE must commit a snapshot")
    scanProjection(t.scan())
  }

  /** The FULL catalog surface end-to-end (DSv2 [[graft.sql.GraftCatalog]],
    * SURVEY.md §4.2's last SQL gap): the table is created and populated
    * by PLAIN SQL through the registered catalog — `CREATE TABLE` then
    * two `INSERT INTO ... SELECT` commits (each one atomic snapshot) —
    * time-traveled with `VERSION AS OF`, upserted with the same MERGE as
    * m6, and read back by a catalog `SELECT`. Oracle: identical
    * post-merge state to m6 ([[m6MergeSql]]).
    */
  def m8CatalogSqlScan(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
    val loc = freshQueryDir("m8cat", dir)
    spark.sql(s"CREATE TABLE graft.`$loc` (doc_id STRING NOT NULL, " +
      "tokens ARRAY<INT> NOT NULL, n_tok INT NOT NULL, source STRING NOT NULL)")
    tokenizedDocs(spark, dir).createOrReplaceTempView("graft_m8_docs")
    spark.sql(s"INSERT INTO graft.`$loc` " +
      "SELECT * FROM graft_m8_docs WHERE pmod(xxhash64(doc_id), 2) = 0")
    val v1 = TokenTable.open(spark, loc).currentVersion
    spark.sql(s"INSERT INTO graft.`$loc` " +
      "SELECT * FROM graft_m8_docs WHERE pmod(xxhash64(doc_id), 2) = 1")
    val n1 = spark.sql(s"SELECT count(*) FROM graft.`$loc` VERSION AS OF $v1")
      .head().getLong(0)
    val nAll = spark.sql(s"SELECT count(*) FROM graft.`$loc`").head().getLong(0)
    require(n1 > 0 && n1 < nAll, "VERSION AS OF must see only the first INSERT")

    // The m6 updates/inserts through MERGE SQL (manual rule application;
    // GraftCatalogSpec covers the injected-extensions path).
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val updates = docs.filter(col("doc_id") % 7 === 0).select(
      format_string("doc_%012d", col("doc_id")).as("doc_id"),
      array(pmod(col("n_chars"), lit(50)).cast("int"), lit(1), lit(2)).as("tokens"),
      lit(3).as("n_tok"),
      col("source"))
    val inserts = tokenizedDocs(spark, dir)
      .filter(expr("CAST(substring(doc_id, 5) AS BIGINT) % 13 = 0"))
      .withColumn("doc_id",
        format_string("doc_%012d", expr("CAST(substring(doc_id, 5) AS BIGINT) + 1000000")))
    updates.unionByName(inserts).createOrReplaceTempView("graft_m8_src")
    val mergeSql =
      s"""MERGE INTO graft.`$loc` AS t
         |USING graft_m8_src AS s
         |ON t.doc_id = s.doc_id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin
    val parsed = spark.sessionState.sqlParser.parsePlan(mergeSql)
    org.apache.spark.sql.GraftSqlBridge
      .ofRows(spark, plans.TokenTableResolution(spark)(parsed)).collect()

    // Final state read back through the catalog, not the API.
    spark.sql(
      s"""SELECT doc_id, source, CAST(n_tok AS BIGINT) AS n_tok,
         |       aggregate(tokens, CAST(0 AS BIGINT), (a, x) -> a + x) AS tok_sum
         |FROM graft.`$loc`""".stripMargin)
  }

  /** M8b: the full maintenance cycle driven ONLY by SQL stored
    * procedures (`CALL graft.system.*` — the DSv2 ProcedureCatalog
    * surface): compact, re-cluster, expire history, then read the state
    * back through the catalog. Oracle: the unchanged base tokenization
    * (every procedure is state-preserving on rows).
    */
  def m8CallProceduresScan(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
    val t = buildTable(spark, dir, "m8proc", commits = 8)
    val loc = t.location
    val c = spark.sql(
      s"CALL graft.system.compact(table => '$loc', target_bytes => ${8L * 1024 * 1024})")
      .head()
    require(c.getAs[Int]("files_in") > c.getAs[Int]("files_out"),
      "SQL compact found nothing to pack")
    spark.sql(s"CALL graft.system.cluster('$loc', 'zorder', ${64L * 1024})").collect()
    spark.sql(
      s"CALL graft.system.expire_snapshots(table => '$loc', retain_last => 1, grace_ms => 0)")
      .collect()
    require(spark.sql(s"CALL graft.system.snapshots('$loc')").count() == 1,
      "expire_snapshots must leave exactly one live version")
    scanProjection(spark.sql(
      s"SELECT doc_id, tokens, n_tok, source FROM graft.`$loc`"))
  }

  def m2DocIdClusterScan(spark: SparkSession, dir: String): DataFrame = {
    val t = buildTable(spark, dir, "m2d", commits = 6)
    Cluster.run(t, Cluster.ByDocId, "q-m2d", targetBytes = 64L * 1024)
    scanProjection(t.scan())
  }

  /** M9 predicate DELETE via NATIVE SQL TEXT on a ByDocId-clustered
    * table: the doc_id range term hits the clustered files' tight
    * [min,max] stats (leading files drop metadata-only or rewrite at
    * the boundary), the n_tok term forces residual row-level deletes
    * inside overlapping files. Oracle: the base tokenization minus the
    * predicate. DeleteSpec pins the three-way classification counts on
    * a controlled layout; here only the row effect is asserted (file
    * geometry varies with scale factor).
    */
  def m9DeleteSqlScan(spark: SparkSession, dir: String): DataFrame = {
    val t = buildTable(spark, dir, "m9", commits = 4)
    Cluster.run(t, Cluster.ByDocId, "q-m9-cluster", targetBytes = 64L * 1024)
    val sql =
      s"""DELETE FROM graft.`${t.location}`
         |WHERE doc_id < 'doc_000000000100' OR n_tok > 88""".stripMargin
    val parsed = spark.sessionState.sqlParser.parsePlan(sql)
    val row = org.apache.spark.sql.GraftSqlBridge
      .ofRows(spark, plans.TokenTableResolution(spark)(parsed)).collect()(0)
    require(row.getLong(1) > 0, "DELETE must remove rows")
    require(t.currentVersion > 0, "DELETE must commit a snapshot")
    scanProjection(t.scan())
  }

  /** M5/M8 ROLLBACK — the operator's undo after a bad DML: a native SQL
    * DELETE removes a slice, `CALL graft.system.rollback` restores the
    * pre-delete version as a NEW head snapshot, and the scan must read
    * the FULL base tokenization again (oracle: [[tokenizedDocsSql]]).
    * The deleted state stays time-travelable at its own version.
    */
  def m5RollbackScan(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
    val t = buildTable(spark, dir, "m5rb", commits = 4)
    val v0 = t.currentVersion
    val parsed = spark.sessionState.sqlParser.parsePlan(
      s"DELETE FROM graft.`${t.location}` WHERE n_tok > 50")
    val row = org.apache.spark.sql.GraftSqlBridge
      .ofRows(spark, plans.TokenTableResolution(spark)(parsed)).collect()(0)
    require(row.getLong(1) > 0, "rollback fixture DELETE must remove rows")
    val vDel = t.currentVersion
    require(vDel == v0 + 1, s"DELETE must commit one snapshot, at v$vDel")
    val r = spark.sql(
      s"CALL graft.system.rollback(table => '${t.location}', version => $v0)").head()
    require(r.getLong(0) == vDel + 1 && r.getLong(1) == v0,
      s"rollback must commit a new head referencing v$v0, got $r")
    // Bad state remains reachable at its version; head is restored.
    require(t.scan(t.snapshotAt(vDel)).count() < t.scan().count(),
      "the deleted state must stay time-travelable after rollback")
    scanProjection(t.scan())
  }

  /** M5 INCREMENTAL (CDC-style) read: three appends split by doc_id
    * mod 3, then `scanChanges(head-2, head)` — the rows of the LAST TWO
    * commits only, planned purely from the manifest-list delta (zero
    * data IO to plan; the read goes through the same pruned FileIndex
    * as any scan). Oracle: the base tokenization restricted to the same
    * mod classes. The SQL spelling (`graft_changes_vA_vB.\`path\``) is
    * spec-covered; the oracle checks the API row set.
    */
  def m5IncrementalScan(spark: SparkSession, dir: String): DataFrame = {
    val loc = freshQueryDir("m5inc", dir)
    val t = TokenTable.create(spark, loc)
    val rows = tokenizedDocs(spark, dir)
      .withColumn("__m", expr("CAST(substring(doc_id, 5) AS BIGINT) % 3"))
    (0 until 3).foreach { c =>
      t.append(rows.filter(col("__m") === c).drop("__m"))
    }
    val head = t.currentVersion
    require(t.scanChanges(head, head).count() == 0, "empty delta must be empty")
    scanProjection(t.scanChanges(head - 2, head))
  }

  val m5IncrementalSql: String =
    tokenizedDocsSql + "\nWHERE doc_id % 3 <> 0"

  /** M5 METADATA AGGREGATES (aggregate pushdown): unfiltered count /
    * min / max / sum through the catalog answer from MANIFEST STATS
    * with zero data IO — proven inside the fixture by DELETING every
    * data file from disk before the aggregate runs (if pushdown ever
    * regressed to a scan, this query would error, not drift). At 10^12
    * rows this turns `SELECT count(*), sum(n_tok)` from a 100 TB scan
    * into a metadata read. Oracle: the same aggregates over the base
    * tokenization in DuckDB.
    */
  def m5AggPushdownScan(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
    val t = buildTable(spark, dir, "m5agg", commits = 4)
    // Remove the data files: only manifest stats remain.
    import scala.jdk.CollectionConverters._
    val st = java.nio.file.Files.walk(java.nio.file.Paths.get(s"${t.location}/data"))
    try st.iterator().asScala.toSeq
      .filter(p => p.toString.endsWith(".parquet"))
      .foreach(java.nio.file.Files.delete)
    finally st.close()
    spark.sql(
      s"""SELECT count(*) AS n_rows, min(doc_id) AS min_doc,
         |       max(doc_id) AS max_doc, min(n_tok) AS min_ntok,
         |       max(n_tok) AS max_ntok, sum(n_tok) AS tok_total,
         |       min(source) AS min_src, max(source) AS max_src
         |FROM graft.`${t.location}`""".stripMargin)
      .select(col("n_rows"), col("min_doc"), col("max_doc"),
        col("min_ntok").cast("long").as("min_ntok"),
        col("max_ntok").cast("long").as("max_ntok"),
        col("tok_total"), col("min_src"), col("max_src"))
  }

  val m5AggPushdownSql: String =
    """WITH toks AS (
      |  SELECT printf('doc_%012d', doc_id) AS doc_id,
      |         len(regexp_extract_all(text, '\S+')) AS nt, source
      |  FROM documents)
      |SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |       min(doc_id) AS min_doc, max(doc_id) AS max_doc,
      |       CAST(min(nt) AS BIGINT) AS min_ntok,
      |       CAST(max(nt) AS BIGINT) AS max_ntok,
      |       CAST(sum(nt) AS BIGINT) AS tok_total,
      |       min(source) AS min_src, max(source) AS max_src
      |FROM toks""".stripMargin

  /** M9 predicate UPDATE via NATIVE SQL TEXT: retag one source's docs
    * and truncate their token arrays — the "re-label and redact a bad
    * crawl slice" shape. The n_tok term in the WHERE exercises stats
    * pruning on the non-key column; assignments reference existing
    * columns (`slice(tokens, ...)`), proving value expressions bind to
    * the row. Oracle: the same transformation in SQL over the base
    * tokenization.
    */
  def m9UpdateSqlScan(spark: SparkSession, dir: String): DataFrame = {
    val t = buildTable(spark, dir, "m9u", commits = 4)
    Cluster.run(t, Cluster.ByDocId, "q-m9u-cluster", targetBytes = 64L * 1024)
    val sql =
      s"""UPDATE graft.`${t.location}`
         |SET source = 'retagged', tokens = slice(tokens, 1, 5),
         |    n_tok = least(n_tok, 5)
         |WHERE source = 'src3' AND n_tok > 20""".stripMargin
    val parsed = spark.sessionState.sqlParser.parsePlan(sql)
    val row = org.apache.spark.sql.GraftSqlBridge
      .ofRows(spark, plans.TokenTableResolution(spark)(parsed)).collect()(0)
    require(row.getLong(1) > 0, "UPDATE must touch rows")
    scanProjection(t.scan())
  }

  val m9UpdateSql: String =
    """WITH toks AS (
      |  SELECT printf('doc_%012d', doc_id) AS doc_id, source AS src0,
      |         list_transform(regexp_extract_all(text, '\S+'), w -> len(w)) AS toks0,
      |         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS nt0
      |  FROM documents)
      |SELECT doc_id,
      |       CASE WHEN src0 = 'src3' AND nt0 > 20 THEN 'retagged' ELSE src0 END AS source,
      |       CASE WHEN src0 = 'src3' AND nt0 > 20 THEN least(nt0, 5) ELSE nt0 END AS n_tok,
      |       CAST(coalesce(list_sum(CASE WHEN src0 = 'src3' AND nt0 > 20
      |              THEN toks0[1:5] ELSE toks0 END), 0) AS BIGINT) AS tok_sum
      |FROM toks""".stripMargin

  val m9DeleteSql: String =
    """SELECT printf('doc_%012d', doc_id) AS doc_id,
      |       source,
      |       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok,
      |       CAST(coalesce(list_sum(list_transform(regexp_extract_all(text, '\S+'), w -> len(w))), 0) AS BIGINT) AS tok_sum
      |FROM documents
      |WHERE NOT (printf('doc_%012d', doc_id) < 'doc_000000000100'
      |           OR len(regexp_extract_all(text, '\S+')) > 88)""".stripMargin

  /** M10 SCHEMA EVOLUTION end-to-end (ALTER TABLE ADD/RENAME COLUMN,
    * [[graft.table.SchemaEvolution]]): even-id docs ingest BEFORE the
    * column exists (reads must null-fill), odd-id docs after it, with
    * `lang = substr(source, 1, 2)`; the column is then RENAMED to
    * `language` (logical-only — physical files never change), and a
    * compaction rewrites bins MIXING pre- and post-ALTER parquet
    * schemas. The oracle replays the final logical view in pure SQL, so
    * null-fill, logical re-labelling and evolved-column preservation
    * through maintenance are all hash-checked.
    */
  def m10SchemaEvolutionScan(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
    val loc = freshQueryDir("m10", dir)
    val t = TokenTable.create(spark, loc)
    val docs = tokenizedDocs(spark, dir)
      .withColumn("__raw", expr("CAST(substring(doc_id, 5) AS BIGINT)"))
    t.append(docs.filter(col("__raw") % 2 === 0).drop("__raw"))
    spark.sql(s"ALTER TABLE graft.`$loc` ADD COLUMN lang STRING")
    t.append(docs.filter(col("__raw") % 2 === 1).drop("__raw")
      .withColumn("lang", substring(col("source"), 1, 2)))
    spark.sql(s"ALTER TABLE graft.`$loc` RENAME COLUMN lang TO language")
    val res = Compact.run(t, targetBytes = 8L * 1024 * 1024, jobId = "q-m10")
    require(res.binsRewritten > 0, "m10 compaction found nothing to do")
    t.scanLogical().select(
      col("doc_id"),
      col("source"),
      col("n_tok").cast("long").as("n_tok"),
      aggregate(col("tokens"), lit(0L), (a, x) => a + x).as("tok_sum"),
      col("language"))
  }

  val m10SchemaEvolutionSql: String =
    """SELECT printf('doc_%012d', doc_id) AS doc_id,
      |       source,
      |       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok,
      |       CAST(coalesce(list_sum(list_transform(regexp_extract_all(text, '\S+'), w -> len(w))), 0) AS BIGINT) AS tok_sum,
      |       CASE WHEN doc_id % 2 = 1 THEN substr(source, 1, 2) END AS language
      |FROM documents""".stripMargin

  /** M7 lineage metrics after a compaction job. The per-task breakdown
    * depends on bin planning (spec-tested in MaintainSpec), but the
    * lineage INVARIANT is oracle-checkable: with a target far above any
    * file size every input file lands in a bin, so the task records'
    * row/token sums must equal the table's own totals — i.e. the direct
    * tokenization of `documents`. A mismatch means lineage lost or
    * double-counted a task.
    */
  def m7LineageMetrics(spark: SparkSession, dir: String): DataFrame = {
    val t = buildTable(spark, dir, "m7", commits = 8)
    val res = Compact.run(t, targetBytes = 1L << 30, jobId = "q-m7")
    require(res.binsRewritten > 0, "compaction planned no bins")
    graft.lineage.Lineage.metrics(spark, t, res.execId)
      .filter(col("status") === "done")
      .agg(
        sum(col("rows")).as("rows_total"),
        sum(col("token_count")).as("tokens_total"))
  }

  val m7Sql: String =
    """SELECT CAST(count(*) AS BIGINT) AS rows_total,
      |       CAST(coalesce(sum(len(regexp_extract_all(text, '\S+'))), 0) AS BIGINT) AS tokens_total
      |FROM documents""".stripMargin

  /** M5 time travel, driver-visible: scan the PRE-merge snapshot after
    * a merge has rewritten the current version. The historical scan
    * must equal the direct tokenization of the input even though the
    * live table no longer does — copy-on-write means old versions stay
    * byte-exact until expired.
    */
  def m5TimeTravelScan(spark: SparkSession, dir: String): DataFrame = {
    val t = buildTable(spark, dir, "m5t", commits = 4)
    val vIngested = t.currentVersion
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val updates = docs.filter(col("doc_id") % 3 === 0).select(
      format_string("doc_%012d", col("doc_id")).as("doc_id"),
      array(lit(9), lit(9)).as("tokens"),
      lit(2).as("n_tok"),
      col("source"))
      .withColumn("precedence", monotonically_increasing_id())
    Merge.mergeInto(t, updates, "precedence", "q-m5t")
    require(t.currentVersion > vIngested, "merge must commit a new version")
    scanProjection(t.scan(t.snapshotAt(vIngested)))
  }

  def m4ExpireScan(spark: SparkSession, dir: String): DataFrame = {
    val t = buildTable(spark, dir, "m4", commits = 6)
    Compact.run(t, targetBytes = 8L * 1024 * 1024, jobId = "q-m4")
    val res = Expire.run(t, retainLast = 1, graceMs = 0)
    require(res.deletedFiles > 0, "expiry found no orphans after compaction")
    scanProjection(t.scan())
  }

  // ------------------------------------------------ reference-op queries

  /** D1 first-wins dedup as a driver-visible SQL query: first event per
    * (user_id, event_type) in event_id (offset) order.
    */
  def d1DedupFirstWins(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("event_id"))
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
  }

  val d1Sql: String =
    """SELECT event_id, user_id, event_type, value FROM (
      |  SELECT event_id, user_id, event_type, value,
      |         row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
      |  FROM events) WHERE rn = 1""".stripMargin

  /** D2 sort + limit (offset order). */
  def d2SortLimit(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")
      .orderBy(col("event_id"))
      .select(col("event_id"), col("user_id"), col("event_type"))
      .limit(100)

  val d2Sql: String =
    "SELECT event_id, user_id, event_type FROM events ORDER BY event_id LIMIT 100"

  /** T1 batch trigger analog: max_buffer_size=1000 batch boundaries. */
  def t1BatchTrigger(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")
      .groupBy((col("event_id") / 1000).cast("long").as("batch_id"))
      .agg(count(lit(1)).as("batch_rows"),
        min(col("event_id")).as("first_offset"),
        max(col("event_id")).as("last_offset"))

  val t1Sql: String =
    """SELECT CAST(event_id // 1000 AS BIGINT) AS batch_id,
      |       count(*) AS batch_rows,
      |       min(event_id) AS first_offset, max(event_id) AS last_offset
      |FROM events GROUP BY 1""".stripMargin

  /** P1b generic typed payload parse (TypedParse): payloads with date /
    * RFC3339-timestamp / array / map / string fields plus seeded error
    * rows are built deterministically from `events.event_id`, parsed
    * against an arbitrary StructType, and emitted as valid+dead-letter
    * union — so the DuckDB oracle verifies BOTH the full reference type
    * matrix (`/root/reference/src/utils/mod.rs:45-118`) and the S2
    * quarantine taxonomy end-to-end:
    *  - event_id%10==3 -> field `d` missing      -> MissingField: d
    *  - event_id%10==7 -> `d` not a date         -> TypeMismatch: d
    *  - event_id%10==5 -> explicit null `s`      -> valid, s IS NULL
    */
  def p1TypedParse(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val eid = col("event_id")
    val dStr = format_string("\"2024-01-%02d\"", eid % 28 + 1)
    val d = when(eid % 10 === 7, lit("\"not-a-date\""))
      .otherwise(dStr)
    val ts = format_string("\"2024-03-05T12:34:%02d.%06dZ\"", eid % 60, eid % 1000000)
    val xs = format_string("[%d,%d,%d]", eid % 7, eid % 11, eid % 13)
    val m = format_string("{\"a\":%d}", eid % 17)
    val s = when(eid % 10 === 5, lit("null"))
      .otherwise(format_string("\"ev-%d\"", eid))
    val payload = when(eid % 10 === 3,
        format_string("""{"ts":%s,"xs":%s,"m":%s,"s":%s}""", ts, xs, m, s))
      .otherwise(
        format_string("""{"d":%s,"ts":%s,"xs":%s,"m":%s,"s":%s}""", d, ts, xs, m, s))
    val msgs = spark.read.parquet(s"$dir/events.parquet")
      .select(lit("e").as("topic"), lit(0).as("partition"),
        eid.as("offset"), lit(null.asInstanceOf[String]).as("key"),
        payload.as("value"))
      .as[graft.ingest.RawMessage]
    val schema = StructType(Seq(
      StructField("d", DateType),
      StructField("ts", TimestampType),
      StructField("xs", ArrayType(LongType)),
      StructField("m", MapType(StringType, LongType)),
      StructField("s", StringType)))
    val (valid, dead) = graft.ingest.TypedParse.parse(msgs, schema)
    valid.select(
        col("offset").as("event_id"),
        lit(null.asInstanceOf[String]).as("err"),
        col("d").cast("string").as("d_str"),
        unix_micros(col("ts")).as("ts_us"),
        aggregate(col("xs"), lit(0L), (a, x) => a + x).as("xs_sum"),
        element_at(col("m"), "a").as("m_a"),
        col("s"))
      .unionByName(dead.select(
        col("offset").as("event_id"),
        col("error").as("err"),
        lit(null.asInstanceOf[String]).as("d_str"),
        lit(null).cast("long").as("ts_us"),
        lit(null).cast("long").as("xs_sum"),
        lit(null).cast("long").as("m_a"),
        lit(null.asInstanceOf[String]).as("s")))
  }

  val p1TypedSql: String =
    """SELECT event_id,
      |  CASE WHEN event_id % 10 = 3 THEN 'MissingField: d'
      |       WHEN event_id % 10 = 7 THEN 'TypeMismatch: d'
      |       ELSE NULL END AS err,
      |  CASE WHEN event_id % 10 IN (3, 7) THEN NULL
      |       ELSE printf('2024-01-%02d', event_id % 28 + 1) END AS d_str,
      |  CASE WHEN event_id % 10 IN (3, 7) THEN NULL
      |       ELSE epoch_us(TIMESTAMP '2024-03-05 12:34:00')
      |            + (event_id % 60) * 1000000 + event_id % 1000000 END AS ts_us,
      |  CASE WHEN event_id % 10 IN (3, 7) THEN NULL
      |       ELSE event_id % 7 + event_id % 11 + event_id % 13 END AS xs_sum,
      |  CASE WHEN event_id % 10 IN (3, 7) THEN NULL
      |       ELSE event_id % 17 END AS m_a,
      |  CASE WHEN event_id % 10 IN (3, 5, 7) THEN NULL
      |       ELSE 'ev-' || event_id END AS s
      |FROM events""".stripMargin

  /** P2 proto3 wire-format parse (the reference's `MessageFormat::Grpc`
    * arm, a `todo!()` stub there — see [[graft.ingest.ProtoCodec]]).
    * Payloads are built with the native proto_encode expression from
    * `events` columns, with deterministic fault injection exercising
    * the full taxonomy: eid%10==3 null d -> absent field -> MissingField;
    * eid%10==5 null s -> MissingField; eid%10==7 ts encoded as a string
    * (wrong wire type) -> TypeMismatch; eid%10==9 payload truncated by
    * one byte -> ParseError. The DuckDB oracle replays the arithmetic —
    * the same contract as p1_typed_parse.
    */
  def p2ProtoParse(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    import graft.functions.proto
    val eid = col("event_id")
    // 1709642040000000 = epoch µs of 2024-03-05T12:34:00Z
    val tsUs = lit(1709642040000000L) + (eid % 60) * 1000000L + eid % 1000000
    val d = when(eid % 10 === 3, lit(null).cast(DateType))
      .otherwise(to_date(format_string("2024-01-%02d", eid % 28 + 1)))
    val ts = timestamp_micros(tsUs)
    val xs = array((eid % 7).cast("long"), (eid % 11).cast("long"),
      (eid % 13).cast("long"))
    val m = map(lit("a"), (eid % 17).cast("long"))
    val s = when(eid % 10 === 5, lit(null.asInstanceOf[String]))
      .otherwise(format_string("ev-%d", eid))
    val good = proto.encode(struct(d.as("d"), ts.as("ts"), xs.as("xs"),
      m.as("m"), s.as("s")))
    // same field numbers, ts mis-typed as a string -> LEN where VARINT expected
    val badTs = proto.encode(struct(d.as("d"), lit("not-a-ts").as("ts"),
      xs.as("xs"), m.as("m"), s.as("s")))
    val msgs = spark.read.parquet(s"$dir/events.parquet")
      .select(lit("e").as("topic"), lit(0).as("partition"),
        eid.as("offset"), lit(null.asInstanceOf[String]).as("key"),
        when(eid % 10 === 7, badTs).otherwise(good).as("__p"))
      .select(col("topic"), col("partition"), col("offset"), col("key"),
        when(col("offset") % 10 === 9,
          expr("substring(__p, 1, length(__p) - 1)"))
          .otherwise(col("__p")).as("value"))
      .as[graft.ingest.RawProtoMessage]
    val schema = StructType(Seq(
      StructField("d", DateType),
      StructField("ts", TimestampType),
      StructField("xs", ArrayType(LongType)),
      StructField("m", MapType(StringType, LongType)),
      StructField("s", StringType)))
    val (valid, dead) = graft.ingest.ProtoParse.parse(msgs, schema)
    valid.select(
        col("offset").as("event_id"),
        lit(null.asInstanceOf[String]).as("err"),
        col("d").cast("string").as("d_str"),
        unix_micros(col("ts")).as("ts_us"),
        aggregate(col("xs"), lit(0L), (a, x) => a + x).as("xs_sum"),
        element_at(col("m"), "a").as("m_a"),
        col("s"))
      .unionByName(dead.select(
        col("offset").as("event_id"),
        col("error").as("err"),
        lit(null.asInstanceOf[String]).as("d_str"),
        lit(null).cast("long").as("ts_us"),
        lit(null).cast("long").as("xs_sum"),
        lit(null).cast("long").as("m_a"),
        lit(null.asInstanceOf[String]).as("s")))
  }

  val p2ProtoSql: String =
    """SELECT event_id,
      |  CASE WHEN event_id % 10 = 3 THEN 'MissingField: d'
      |       WHEN event_id % 10 = 5 THEN 'MissingField: s'
      |       WHEN event_id % 10 = 7 THEN 'TypeMismatch: ts'
      |       WHEN event_id % 10 = 9 THEN 'ParseError: length past end of payload'
      |       ELSE NULL END AS err,
      |  CASE WHEN event_id % 10 IN (3, 5, 7, 9) THEN NULL
      |       ELSE printf('2024-01-%02d', event_id % 28 + 1) END AS d_str,
      |  CASE WHEN event_id % 10 IN (3, 5, 7, 9) THEN NULL
      |       ELSE 1709642040000000 + (event_id % 60) * 1000000
      |            + event_id % 1000000 END AS ts_us,
      |  CASE WHEN event_id % 10 IN (3, 5, 7, 9) THEN NULL
      |       ELSE event_id % 7 + event_id % 11 + event_id % 13 END AS xs_sum,
      |  CASE WHEN event_id % 10 IN (3, 5, 7, 9) THEN NULL
      |       ELSE event_id % 17 END AS m_a,
      |  CASE WHEN event_id % 10 IN (3, 5, 7, 9) THEN NULL
      |       ELSE 'ev-' || event_id END AS s
      |FROM events""".stripMargin

  /** P1 JSON parse + projection (the reference's payload path). */
  def p1ParseProject(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))

  val p1Sql: String =
    "SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k FROM events"

  /** M3 stats aggregation: per-source min/max/sum (the manifest-rewrite
    * aggregation over the documents analog).
    */
  def m3StatsAgg(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("file_rows"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"),
        min(col("n_chars")).as("min_n"),
        max(col("n_chars")).as("max_n"),
        sum(col("n_chars")).as("sum_n"))

  val m3Sql: String =
    """SELECT source, count(*) AS file_rows,
      |       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
      |       min(n_chars) AS min_n, max(n_chars) AS max_n,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_n
      |FROM documents GROUP BY source""".stripMargin

  /** M4 orphan-set computation as a driver-visible set op: orders with
    * no lineitems (left anti join — the GC reachability pattern).
    */
  def m4OrphanAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val l = spark.read.parquet(s"$dir/lineitem.parquet")
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_anti")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
  }

  val m4Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)""".stripMargin
}
