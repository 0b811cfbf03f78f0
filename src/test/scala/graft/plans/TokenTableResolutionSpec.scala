package graft.plans

import graft.SparkSpec
import graft.ingest.TokenGen
import graft.table.TokenTable
import org.apache.spark.sql.GraftSqlBridge

/** SQL text reaches TokenTables through the Catalyst resolution rule:
  * `graft.`/path`` = current snapshot, `graft_v<N>.`/path`` = time
  * travel. The rule is injected session-wide via GraftExtensions; here
  * it is applied to parsed plans directly (the shared test session was
  * built without extensions).
  */
class TokenTableResolutionSpec extends SparkSpec {

  private def sql(q: String) = GraftSqlBridge.ofRows(spark,
    TokenTableResolution(spark)(spark.sessionState.sqlParser.parsePlan(q)))

  test("graft.`path` resolves to the current snapshot") {
    val dir = tmpDir("res")
    val t = TokenTable.create(spark, dir)
    t.append(TokenGen.asTokenRows(TokenGen.generate(spark, 100, numPartitions = 1)))
    t.append(TokenGen.asTokenRows(
      TokenGen.generate(spark, 50, idOffset = 1000, numPartitions = 1)))
    val r = sql(s"SELECT count(*) AS n, sum(n_tok) AS s FROM graft.`$dir`").head()
    assert(r.getLong(0) == 150)
    assert(r.getLong(1) == checksum(t.scan())._2)
  }

  test("graft_vN.`path` time-travels; joins and filters compose") {
    val dir = tmpDir("res2")
    val t = TokenTable.create(spark, dir)
    t.append(TokenGen.asTokenRows(TokenGen.generate(spark, 100, numPartitions = 1)))
    val v1 = t.currentVersion
    t.append(TokenGen.asTokenRows(
      TokenGen.generate(spark, 60, idOffset = 1000, numPartitions = 1)))
    assert(sql(s"SELECT count(*) FROM graft_v$v1.`$dir`").head().getLong(0) == 100)
    // Self-join across versions: rows added after v1.
    val added = sql(
      s"""SELECT count(*) FROM graft.`$dir` c
         |LEFT ANTI JOIN graft_v$v1.`$dir` o ON c.doc_id = o.doc_id""".stripMargin)
      .head().getLong(0)
    assert(added == 60)
  }

  test("MERGE INTO graft.`path` SQL text executes the dedup-upsert end-to-end") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = tmpDir("res_merge")
    val t = TokenTable.create(spark, dir)
    t.append(TokenGen.asTokenRows(TokenGen.generate(spark, 200, numPartitions = 2)))
    val before = t.scan().count()
    // 10 updates (existing ids, new tokens) + 5 inserts (fresh ids).
    val upd = t.scan().filter(pmod(xxhash64($"doc_id"), lit(20)) === 0)
      .select($"doc_id", array(lit(7), lit(7)).as("tokens"), lit(2).as("n_tok"),
        lit("merged").as("source"))
    val ins = (0 until 5).map(i => (f"zzz_new_$i%04d", Seq(1, 2, 3), 3, "merged"))
      .toDF("doc_id", "tokens", "n_tok", "source")
    upd.unionByName(ins).createOrReplaceTempView("res_merge_src")
    val nUpd = upd.count()
    val out = sql(
      s"""MERGE INTO graft.`$dir` AS t USING res_merge_src AS s
         |ON t.doc_id = s.doc_id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).head()
    assert(out.getLong(3) == nUpd + 5, "source_rows")
    val after = t.scan()
    assert(after.count() == before + 5)
    assert(after.filter($"source" === "merged").count() == nUpd + 5)
    // Updated rows really replaced: every matched id now has tokens [7,7].
    assert(after.filter($"source" === "merged" && $"n_tok" === 2).count() == nUpd)
  }

  test("unsupported MERGE shapes fail loudly") {
    val dir = tmpDir("res_merge_bad")
    val t = TokenTable.create(spark, dir)
    t.append(TokenGen.asTokenRows(TokenGen.generate(spark, 10, numPartitions = 1)))
    spark.range(1).selectExpr("'x' AS doc_id", "array(1) AS tokens",
      "1 AS n_tok", "'s' AS source").createOrReplaceTempView("res_merge_bad_src")
    // The error must be OUR taxonomy (naming the supported form), not
    // Spark's generic unsupported-DDL fallback for unconverted merges.
    def failsWithSupportedForm(q: String): Unit = {
      val e = intercept[UnsupportedOperationException](sql(q))
      assert(e.getMessage.contains("supported form"), e.getMessage)
    }
    // DELETE clause: not the engine's upsert.
    failsWithSupportedForm(
      s"""MERGE INTO graft.`$dir` t USING res_merge_bad_src s
         |ON t.doc_id = s.doc_id
         |WHEN MATCHED THEN DELETE""".stripMargin)
    // Non-doc_id key.
    failsWithSupportedForm(
      s"""MERGE INTO graft.`$dir` t USING res_merge_bad_src s
         |ON t.source = s.source
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
  }

  test("non-graft relations pass through untouched") {
    val plan = spark.sessionState.sqlParser.parsePlan("SELECT * FROM some_missing_tbl")
    val out = TokenTableResolution(spark)(plan)
    assert(out.collect {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation => u
    }.nonEmpty, "unrelated unresolved relations must remain for the normal analyzer")
  }
}
