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

  test("non-graft relations pass through untouched") {
    val plan = spark.sessionState.sqlParser.parsePlan("SELECT * FROM some_missing_tbl")
    val out = TokenTableResolution(spark)(plan)
    assert(out.collect {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation => u
    }.nonEmpty, "unrelated unresolved relations must remain for the normal analyzer")
  }
}
