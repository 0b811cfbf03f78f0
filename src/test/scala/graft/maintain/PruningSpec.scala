package graft.maintain

import graft.SparkSpec
import graft.ingest.TokenGen
import graft.table.TokenTable

/** The point of clustering: after Z-order, stats-based pruning skips
  * files for source / n_tok predicates that pre-clustering layouts
  * cannot skip — and pruned results equal unpruned results exactly.
  */
class PruningSpec extends SparkSpec {

  test("zorder makes source and n_tok scans prune files; results stay exact") {
    val dir = tmpDir("prune")
    val t = TokenTable.create(spark, dir)
    (0 until 8).foreach { i =>
      t.append(TokenGen.asTokenRows(TokenGen.generate(
        spark, 400, idOffset = i * 400L, numPartitions = 2)))
    }
    // Pre-clustering: every file spans all sources -> no pruning possible.
    val (_, preRead, preTotal) = t.scanWhereSource("forums")
    assert(preRead == preTotal, "random layout should not prune (sanity)")
    val expectSrc = checksum(t.scan().filter(org.apache.spark.sql.functions
      .col("source") === "forums"))
    val expectLen = checksum(t.scan().filter(org.apache.spark.sql.functions
      .col("n_tok") <= 32))

    Cluster.run(t, Cluster.ZOrder, "job-prune", targetBytes = 48L * 1024)

    val (srcDf, srcRead, srcTotal) = t.scanWhereSource("forums")
    assert(srcRead < srcTotal,
      s"source scan must prune after zorder: read $srcRead of $srcTotal")
    assert(checksum(srcDf) == expectSrc, "pruning must not change results")

    val (lenDf, lenRead, lenTotal) = t.scanWhereNtok(16, 32)
    assert(lenRead < lenTotal,
      s"n_tok scan must prune after zorder: read $lenRead of $lenTotal")
    assert(checksum(lenDf) == expectLen)
  }
}
