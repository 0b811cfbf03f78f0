package graft.maintain

import graft.SparkSpec
import graft.ingest.TokenGen
import graft.table.TokenTable
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.functions._

/** M9 predicate UPDATE: stats-pruned copy-on-write column rewrite with
  * simultaneous-assignment SQL semantics.
  */
class UpdateSpec extends SparkSpec {

  private def clustered(prefix: String, rows: Int = 1600): TokenTable = {
    val dir = tmpDir(prefix)
    val t = TokenTable.create(spark, dir)
    (0 until 8).foreach { i =>
      t.append(TokenGen.asTokenRows(TokenGen.generate(
        spark, rows / 8, idOffset = i * (rows / 8).toLong, numPartitions = 2)))
    }
    Cluster.run(t, Cluster.ByDocId, s"$prefix-cluster", targetBytes = 64L * 1024)
    t
  }

  test("update: doc_id-ranged predicate rewrites only the touched files") {
    val t = clustered("updprune")
    val files = t.filesLocal(t.current).sortBy(_.minDocId)
    assert(files.size >= 4)
    val cut = files.head.maxDocId
    val expect = t.scan().where(col("doc_id") <= cut).count()
    val res = Update.updateWhere(t,
      Seq("source" -> lit("patched")), col("doc_id") <= lit(cut), "updprune-job")
    assert(res.updatedRows == expect && expect > 0)
    assert(res.untouchedFiles >= files.size - 2,
      s"tail files must not rewrite: $res of ${files.size}")
    assert(t.scan().where(col("source") === "patched").count() == expect)
    assert(t.scan().count() == 1600, "UPDATE must not change row count")
  }

  test("update: all assignments see the ORIGINAL row (simultaneous semantics)") {
    val t = clustered("updsim", rows = 800)
    // SET source = 'x', tokens = slice(tokens,1,1) WHERE source =
    // <original>: if the source assignment applied first, the tokens
    // assignment's predicate would no longer match and tokens would
    // keep their old length.
    val orig = t.scan().select("source").head().getString(0)
    val expect = t.scan().where(col("source") === orig).count()
    val res = Update.updateWhere(t,
      Seq("source" -> lit("swapped"), "tokens" -> slice(col("tokens"), 1, 1)),
      col("source") === orig, "updsim-job")
    assert(res.updatedRows == expect)
    assert(t.scan().where(col("source") === "swapped" && col("n_tok") === 1 &&
        size(col("tokens")) === 1).count() == expect,
      "both assignments must land on every matched row, n_tok derived")
  }

  test("update: tokens-only assignment derives n_tok (invariant held)") {
    val t = clustered("updself", rows = 800)
    val before = t.scan().agg(sum(col("n_tok").cast("long"))).head().getLong(0)
    // RHS references the row's own columns; n_tok is NOT assigned — the
    // engine must derive it from the new array or sum(n_tok) silently
    // diverges from sum(size(tokens)) (VERDICT r4).
    Update.updateWhere(t,
      Seq("tokens" -> concat(col("tokens"), array(lit(7)))),
      lit(true), "updself-job")
    val after = t.scan()
      .agg(sum(col("n_tok").cast("long")),
        sum(size(col("tokens")).cast("long"))).head()
    assert(after.getLong(0) == before + 800, "each row grew by one token")
    assert(after.getLong(0) == after.getLong(1),
      "n_tok == size(tokens) must hold after a tokens-only UPDATE")
    // Manifest bookkeeping must agree with the data (sumNtok feeds
    // packing / domain mix / bench tokens-per-sec).
    assert(t.filesLocal(t.current).map(_.sumNtok).sum == after.getLong(0))
  }

  test("update: n_tok-only assignment is rejected (derived column)") {
    val t = clustered("updntok", rows = 400)
    intercept[IllegalArgumentException] {
      Update.updateWhere(t, Seq("n_tok" -> (col("n_tok") + lit(1))),
        lit(true), "updntok-job")
    }
  }

  test("update: assignment values are cast to the table column type") {
    val t = clustered("updcast", rows = 400)
    // Int value into the string `source` column: legal ANSI cast — the
    // written files must still carry a STRING source column (an uncast
    // projection would commit an int column and corrupt the table).
    val res = Update.updateWhere(t, Seq("source" -> col("n_tok")),
      lit(true), "updcast-job")
    assert(res.updatedRows == 400)
    assert(t.scan().schema("source").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(t.scan().where(col("source") === col("n_tok").cast("string"))
      .count() == 400)
    // A second update over the rewritten files proves they re-read
    // cleanly with the table schema (type corruption would throw here).
    assert(checksum(t.scan())._1 == 400)
    // Impossible cast fails loudly at plan time, before any rewrite.
    intercept[IllegalArgumentException] {
      Update.updateWhere(t, Seq("tokens" -> lit(5)), lit(true), "updbad-job")
    }
  }

  test("update: doc_id is not assignable; no-op predicate commits nothing") {
    val t = clustered("updkey", rows = 800)
    intercept[IllegalArgumentException] {
      Update.updateWhere(t, Seq("doc_id" -> lit("x")), lit(true), "updkey-job")
    }
    val v = t.currentVersion
    val res = Update.updateWhere(t, Seq("source" -> lit("x")),
      col("doc_id") === "absent", "updnoop-job")
    assert(res.updatedRows == 0L && t.currentVersion == v)
  }

  test("update: narrow mid-range decodes only hot row groups; cold bytes copy") {
    import spark.implicits._
    spark.conf.set("graft.write.rowGroupBytes", (32 * 1024).toString)
    try {
      val dir = tmpDir("upd_rg")
      val t = TokenTable.create(spark, dir)
      t.append(TokenGen.asTokenRows(TokenGen.generate(
        spark, 6000, minLen = 32, maxLen = 64, numPartitions = 1)
        .repartition(1).sortWithinPartitions("doc_id")))
      val lo = f"doc_${3000}%012d"; val hi = f"doc_${3049}%012d"
      val outside = checksum(t.scan().filter($"doc_id" < lo || $"doc_id" > hi))

      val res = Update.updateWhere(t, Seq("source" -> lit("patched")),
        col("doc_id") >= lo && col("doc_id") <= hi, "updrg-job")
      assert(res.updatedRows == 50)
      assert(res.coldCopiedBytes > 0, "cold row groups must byte-copy")
      assert(res.decodedBytes < res.rewrittenBytes / 2,
        s"update must decode only the hot slice: ${res.decodedBytes} of ${res.rewrittenBytes}")
      assert(t.scan().count() == 6000)
      assert(t.scan().filter($"source" === "patched").count() == 50)
      assert(checksum(t.scan().filter($"doc_id" < lo || $"doc_id" > hi)) == outside,
        "rows outside the range must be byte-identical")
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(
        s"$dir/data/updrg-job-v${res.snapshot.parentVersion}-hotx")))
    } finally spark.conf.unset("graft.write.rowGroupBytes")
  }

  test("SQL UPDATE graft.`path` SET ... WHERE ... (manual rule application)") {
    val t = clustered("updsql", rows = 800)
    val expect = t.scan().where(col("n_tok") > 100).count()
    assert(expect > 0)
    val parsed = spark.sessionState.sqlParser.parsePlan(
      s"UPDATE graft.`${t.location}` SET tokens = slice(tokens, 1, 3), " +
        "n_tok = 3 WHERE n_tok > 100")
    val row = GraftSqlBridge.ofRows(spark,
      graft.plans.TokenTableResolution(spark)(parsed)).collect()(0)
    assert(row.getLong(1) == expect)
    assert(t.scan().where(col("n_tok") > 100).count() == 0)
    assert(t.scan().where(col("n_tok") === 3 && size(col("tokens")) === 3)
      .count() >= expect, "updated rows carry the truncated arrays")
  }
}
