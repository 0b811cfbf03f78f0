package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-management operators a large-scale training-data pipeline
  * needs around dedup: deterministic train/val/test splitting and
  * train-vs-eval contamination detection (decontamination). Same
  * engineering rules as [[Dedup]]: one md5-derived 60-bit hash per
  * key/shingle, integer arithmetic end-to-end, hot keys capped before
  * any self/cross join, exact DuckDB oracle mirrors.
  */
object Corpus {

  // ------------------------------------------------------------- split

  /** Deterministic hash split: a document's split follows it forever
    * (stable across runs, machines, and table layouts — the property a
    * training pipeline needs so eval rows can never drift into train).
    * h = hash60("split:" + doc_id) mod 100; [0,80) train, [80,90) val,
    * [90,100) test by default.
    */
  def splitCol(docId: Column, pctTrain: Int = 80, pctVal: Int = 10): Column = {
    val h = pmod(Dedup.hash60(concat(lit("split:"), docId.cast("string"))), lit(100L))
    when(h < pctTrain, "train")
      .when(h < pctTrain + pctVal, "val")
      .otherwise("test")
  }

  def splitSql(docId: String, pctTrain: Int = 80, pctVal: Int = 10): String =
    s"""CASE WHEN ${Dedup.hash60Sql(s"'split:' || $docId::VARCHAR")} % 100 < $pctTrain THEN 'train'
       | WHEN ${Dedup.hash60Sql(s"'split:' || $docId::VARCHAR")} % 100 < ${pctTrain + pctVal} THEN 'val'
       | ELSE 'test' END""".stripMargin.replace("\n", "")

  /** Driver query: split sizes per (source, split) — verifies the
    * assignment function and its determinism in one aggregate.
    */
  def splitCounts(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), splitCol(col("doc_id")).as("split"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n"))

  val splitCountsSql: String =
    s"""SELECT source, ${splitSql("doc_id")} AS split, count(*) AS n
       |FROM documents GROUP BY 1, 2""".stripMargin

  // --------------------------------------------------- decontamination

  /** Train-vs-eval contamination: eval documents sharing >= minShared
    * distinct (DF-capped) shingles with a train document — the
    * candidates a decontamination pass would drop from train. Shape is
    * the n-gram Jaccard kernel restricted to CROSS-corpus pairs: capped
    * shingle inverted index, train-side x eval-side equi-join (never
    * all-pairs), integer shared-shingle counts.
    */
  def contamination(train: DataFrame, eval: DataFrame,
      minShared: Int = 3): DataFrame = {
    // Cap BOTH sides: an uncapped hot shingle on either side emits
    // df_other x df_this join rows; the symmetric cap bounds every
    // bucket to cap^2 (the same invariant the Dedup kernels hold).
    def sh(df: DataFrame, idAs: String) = Dedup.explodedShingles(df)
      .withColumnRenamed("doc_id", idAs)
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("s"))))
      .filter(col("df") <= Dedup.ShingleDfCap)
      .drop("df")
    val t = sh(train, "train_id")
    val e = sh(eval, "eval_id")
    t.join(e, "s")
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** Driver query over the augmented corpus: doc_id%17==0 is the eval
    * set, the rest is train — the planted exact/near duplicates that
    * straddle the boundary are true contamination.
    */
  def contaminationQuery(spark: SparkSession, dir: String): DataFrame = {
    val aug = Dedup.augmented(spark, dir)
    contamination(
      train = aug.filter(col("doc_id") % 17 =!= 0),
      eval = aug.filter(col("doc_id") % 17 === 0))
  }

  val contaminationSql: String =
    s"""WITH aug AS (SELECT * FROM ${Dedup.augSql} a),
       |tsh AS (
       |  SELECT doc_id AS train_id, s FROM (
       |    SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df FROM (
       |      SELECT doc_id, unnest(list_distinct(${Dedup.ShinglesSql})) AS s
       |      FROM aug WHERE doc_id % 17 <> 0)
       |  ) WHERE df <= ${Dedup.ShingleDfCap}
       |), esh AS (
       |  SELECT doc_id AS eval_id, s FROM (
       |    SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df FROM (
       |      SELECT doc_id, unnest(list_distinct(${Dedup.ShinglesSql})) AS s
       |      FROM aug WHERE doc_id % 17 = 0)
       |  ) WHERE df <= ${Dedup.ShingleDfCap}
       |)
       |SELECT t.train_id, e.eval_id, count(*) AS shared
       |FROM tsh t JOIN esh e ON t.s = e.s
       |GROUP BY 1, 2 HAVING count(*) >= 3""".stripMargin
}
