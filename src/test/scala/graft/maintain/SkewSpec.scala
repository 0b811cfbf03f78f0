package graft.maintain

import graft.SparkSpec
import graft.table.TokenTable
import org.apache.spark.sql.functions._

/** Salt-based skew splitting (north_rule): clustering must not let a
  * pathologically hot key range stall one partition. Builds a table
  * where ~60% of rows pile onto 3 doc_ids, clusters ByDocId, and
  * asserts the hot range was split across multiple files.
  */
class SkewSpec extends SparkSpec {

  private def skewedTable(): TokenTable = {
    val dir = tmpDir("skew")
    val t = TokenTable.create(spark, dir)
    import spark.implicits._
    // 3000 rows: 40% unique ids, 60% concentrated on 3 hot ids with
    // varying tokens (duplicate *keys*, not duplicate rows).
    val df = spark.range(3000).select(
      when(pmod(col("id"), lit(10)) < 6,
        concat(lit("hot_"), pmod(col("id"), lit(3)).cast("string")))
        .otherwise(format_string("doc_%012d", col("id"))).as("doc_id"),
      transform(sequence(lit(0), pmod(xxhash64(col("id")), lit(48)) + 16),
        j => pmod(xxhash64(col("id"), j), lit(50257)).cast("int")).as("tokens"),
      (pmod(xxhash64(col("id")), lit(48)) + 17).cast("int").as("n_tok"),
      lit("web").as("source"))
    (0 until 4).foreach { i =>
      t.append(df.filter(pmod(col("id"), lit(4)) === i).drop("id"))
    }
    t
  }

  test("ByDocId clustering salts hot key ranges instead of stalling one partition") {
    val t = skewedTable()
    val before = checksum(t.scan())
    // Target small enough that one hot key (20% of rows) exceeds bucket
    // capacity — boundaries cannot split identical values, so only the
    // salt can (equi-depth boundaries alone absorb milder skew).
    val res = Cluster.run(t, Cluster.ByDocId, "job-skew", targetBytes = 8L * 1024)
    assert(checksum(t.scan()) == before)
    assert(res.saltedBuckets > 0, "the hot range must trigger salt splitting")
    // The 1800 hot rows must not land in a single file.
    val files = t.filesLocal(t.current)
    val hotFiles = files.count(f => f.minDocId <= "hot_2" && f.maxDocId >= "hot_0")
    assert(hotFiles > 1, s"hot range confined to $hotFiles file(s): salting failed")
    // And no file should hold more than ~2x the mean row count.
    val mean = files.map(_.rows).sum.toDouble / files.size
    val maxRows = files.map(_.rows).max
    assert(maxRows <= 3 * mean,
      s"skewed partition: max=$maxRows mean=$mean files=${files.map(_.rows).sorted.reverse.take(5)}")
  }
}
