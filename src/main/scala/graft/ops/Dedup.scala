package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline: exact
  * (hash-groupBy), MinHash+LSH, SimHash, n-gram Jaccard. Everything is
  * engineered to be *cross-engine exact* so DuckDB oracles verify it:
  * string-min MinHash signatures (md5 lexicographic min — no custom
  * hash arithmetic), integer-only outputs (intersection/union counts
  * instead of float Jaccard), ascii-based nibble math for SimHash.
  *
  * Because the driver's `documents` table has no duplicates, each query
  * first augments it with deterministic near/exact duplicates (same
  * construction in the oracle SQL) so true positives are exercised.
  */
object Dedup {

  /** 3-word shingles over normalized words; whole text if < 3 words. */
  def shingles(text: Column): Column = {
    val w = TextOps.words(text)
    when(size(w) < 3, array(array_join(w, " ")))
      .otherwise(transform(sequence(lit(0), size(w) - 3), i =>
        concat_ws(" ",
          element_at(w, i + 1), element_at(w, i + 2), element_at(w, i + 3))))
  }

  val ShinglesSql: String =
    """CASE WHEN len(regexp_extract_all(lower(text), '[a-z0-9]+')) < 3
      | THEN [array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+'), ' ')]
      | ELSE list_transform(range(1, len(regexp_extract_all(lower(text), '[a-z0-9]+')) - 1),
      |   i -> regexp_extract_all(lower(text), '[a-z0-9]+')[i] || ' ' ||
      |        regexp_extract_all(lower(text), '[a-z0-9]+')[i+1] || ' ' ||
      |        regexp_extract_all(lower(text), '[a-z0-9]+')[i+2])
      | END""".stripMargin.replace("\n", "")

  // ------------------------------------------------------------ exact

  /** Exact dedup via hash-groupBy on the text digest: one row per
    * duplicate group with the first-wins representative (min doc_id) and
    * the group size. Scale path: a single hash aggregate — map-side
    * partial agg + one shuffle on the digest; no pairwise work.
    */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)

  // ---------------------------------------------------------- minhash

  val MinhashK = 12 // signature length
  val MinhashBands = 4 // x 3 rows/band

  /** MinHash signatures via explode + aggregate: sig_j = lexicographic
    * min of md5("j:" + shingle) — the permutation family is "sort by
    * keyed md5", which needs no cross-engine integer hash.
    *
    * Deliberately NOT a nested higher-order-function expression:
    * Catalyst does no common-subexpression elimination inside lambda
    * bodies, so an `array(transform(shingles(text), ...) x K)` tree
    * re-evaluates the shingle regex O(K * n) times per row. Exploding
    * shingles to rows evaluates it once, and the K mins become one
    * hash aggregate (map-side partial agg + a single shuffle on doc_id
    * — the shape that scales).
    */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val sh = docs.select(col("doc_id"),
      explode(array_distinct(shingles(col("text")))).as("s"))
    val aggs = (0 until MinhashK).map(j =>
      min(md5(concat(lit(s"$j:"), col("s")))).as(s"sig$j"))
    sh.groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until MinhashK).map(j => col(s"sig$j")): _*).as("sig"))
  }

  /** MinHash+LSH near-dup pairs: band on md5 of 3 consecutive sigs,
    * candidate pairs from band-bucket self-join (this is the shuffle —
    * pairs only form inside a bucket, never all-pairs), then estimated
    * similarity = #matching signature positions, kept if >= minMatches.
    *
    * Scale path: explode is K_bands rows/doc; the self-join key
    * (band_idx, band_hash) is high-cardinality -> well-distributed
    * shuffle; hot buckets (boilerplate docs) would be capped/salted in a
    * production config.
    */
  def minhashLsh(docs: DataFrame, minMatches: Int = 6): DataFrame = {
    val sigs = minhashSignatures(docs)
    val bands = sigs.select(col("doc_id"), col("sig"),
      posexplode(array((0 until MinhashBands).map(b =>
        md5(concat(element_at(col("sig"), b * 3 + 1),
          element_at(col("sig"), b * 3 + 2),
          element_at(col("sig"), b * 3 + 3)))): _*)).as(Seq("band_idx", "band_hash")))
    val a = bands.select(col("doc_id").as("a"), col("sig").as("sig_a"),
      col("band_idx"), col("band_hash"))
    val b = bands.select(col("doc_id").as("b"), col("sig").as("sig_b"),
      col("band_idx"), col("band_hash"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1L).otherwise(0L)), lit(0L), (acc, v) => acc + v)
          .as("sig_matches"))
      .distinct()
      .filter(col("sig_matches") >= minMatches)
  }

  // ---------------------------------------------------------- simhash

  /** Per-word 16-bit hash from the first 4 hex nibbles of md5(word),
    * via ascii arithmetic (identical in DuckDB).
    */
  private def word16(w: Column): Column = {
    def nib(i: Int): Column = {
      val a = ascii(substring(w, i + 1, 1)) // operates on the md5 hex below
      when(a <= 57, a - 48).otherwise(a - 87)
    }
    // w is already md5(word) when called
    (nib(0) + nib(1) * 16 + nib(2) * 256 + nib(3) * 4096).cast("int")
  }

  /** 16-bit SimHash over the word multiset via explode + aggregate
    * (same CSE rationale as [[minhashSignatures]]): bit b set iff the
    * sum of (2*bit_b(word16)-1) over words is positive. Docs with no
    * words get simhash 0 (matching the oracle's coalesce).
    */
  def simhashed(docs: DataFrame): DataFrame = {
    val w = docs.select(col("doc_id"),
      explode(TextOps.words(col("text"))).as("w"))
      .withColumn("h16", word16(md5(col("w"))))
    val aggs = (0 until 16).map(b =>
      sum((shiftright(col("h16"), b).bitwiseAND(lit(1)) * 2 - 1).cast("long")).as(s"b$b"))
    val perDoc = w.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        (0 until 16).map(b =>
          when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _).as("simhash"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("simhash"), lit(0L)).as("simhash"))
  }

  /** SimHash dup groups: documents sharing an identical 16-bit simhash
    * (hamming distance 0; banded hamming<=k joins are the production
    * extension). Output: per-group simhash + first-wins id + size.
    */
  def simhashDups(docs: DataFrame): DataFrame =
    simhashed(docs).groupBy(col("simhash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)

  // ---------------------------------------------------- ngram jaccard

  /** Exact n-gram Jaccard near-dup pairs, restricted to candidates that
    * share >= 1 shingle (the explode/self-join prunes the quadratic
    * space). Integer outputs: intersection and union sizes; the
    * threshold test inter/union >= t is done in integer arithmetic
    * (inter*100 >= t100*union) so no float crosses the oracle boundary.
    */
  def ngramJaccard(docs: DataFrame, thresholdPct: Int = 60): DataFrame = {
    val sh = docs.select(col("doc_id"),
      explode(array_distinct(shingles(col("text")))).as("s"))
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val pairs = sh.as("x").join(sh.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(counts.withColumnRenamed("doc_id", "a").withColumnRenamed("n_sh", "na"), "a")
      .join(counts.withColumnRenamed("doc_id", "b").withColumnRenamed("n_sh", "nb"), "b")
      .select(col("a"), col("b"), col("inter"),
        (col("na") + col("nb") - col("inter")).as("uni"))
      .filter(col("inter") * 100 >= col("uni") * thresholdPct)
  }

  // ------------------------------------------------- augmented inputs

  /** documents + exact duplicates of every 4th doc (re-keyed +200000)
    * and near-duplicates (one appended word) of every 5th (+100000).
    * Deterministic; mirrored 1:1 in [[augSql]].
    */
  def augmented(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    docs
      .unionByName(docs.filter(col("doc_id") % 4 === 0)
        .select((col("doc_id") + 200000).as("doc_id"), col("text")))
      .unionByName(docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" zzduplicatemarker")).as("text")))
  }

  val augSql: String =
    """(SELECT doc_id, text FROM documents
      | UNION ALL SELECT doc_id + 200000, text FROM documents WHERE doc_id % 4 = 0
      | UNION ALL SELECT doc_id + 100000, text || ' zzduplicatemarker' FROM documents WHERE doc_id % 5 = 0)""".stripMargin.replace("\n", "")

  // ------------------------------------------------------------ oracle SQL

  val exactSql: String =
    s"""SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS dup_count
       |FROM $augSql aug GROUP BY 1 HAVING count(*) > 1""".stripMargin

  val minhashSql: String = {
    val sigExprs = (0 until MinhashK).map(j =>
      s"list_min(list_transform(sh, s -> md5('$j:' || s)))").mkString(", ")
    val bandExprs = (0 until MinhashBands).map(b =>
      s"md5(sig[${b * 3 + 1}] || sig[${b * 3 + 2}] || sig[${b * 3 + 3}])").mkString(", ")
    s"""WITH sigs AS (
       |  SELECT doc_id, [$sigExprs] AS sig
       |  FROM (SELECT doc_id, $ShinglesSql AS sh FROM $augSql aug)
       |), bands AS (
       |  SELECT doc_id, sig, unnest(range(0, $MinhashBands)) AS band_idx,
       |         unnest([$bandExprs]) AS band_hash
       |  FROM sigs
       |)
       |SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
       |  CAST(list_sum(list_transform(range(1, ${MinhashK + 1}),
       |       i -> CASE WHEN x.sig[i] = y.sig[i] THEN 1 ELSE 0 END)) AS BIGINT) AS sig_matches
       |FROM bands x JOIN bands y
       |  ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id
       |WHERE list_sum(list_transform(range(1, ${MinhashK + 1}),
       |       i -> CASE WHEN x.sig[i] = y.sig[i] THEN 1 ELSE 0 END)) >= 6""".stripMargin
  }

  val simhashSql: String = {
    val w16 =
      """(CASE WHEN ascii(substr(md5(w),1,1)) <= 57 THEN ascii(substr(md5(w),1,1)) - 48 ELSE ascii(substr(md5(w),1,1)) - 87 END
        | + (CASE WHEN ascii(substr(md5(w),2,1)) <= 57 THEN ascii(substr(md5(w),2,1)) - 48 ELSE ascii(substr(md5(w),2,1)) - 87 END) * 16
        | + (CASE WHEN ascii(substr(md5(w),3,1)) <= 57 THEN ascii(substr(md5(w),3,1)) - 48 ELSE ascii(substr(md5(w),3,1)) - 87 END) * 256
        | + (CASE WHEN ascii(substr(md5(w),4,1)) <= 57 THEN ascii(substr(md5(w),4,1)) - 48 ELSE ascii(substr(md5(w),4,1)) - 87 END) * 4096)""".stripMargin.replace("\n", "")
    val bits = (0 until 16).map(b =>
      s"(CASE WHEN coalesce(list_sum(list_transform(wh, h -> ((h >> $b) & 1) * 2 - 1)), 0) > 0 THEN ${1L << b} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH hashed AS (
       |  SELECT doc_id, CAST($bits AS BIGINT) AS simhash
       |  FROM (SELECT doc_id,
       |          list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'), w -> $w16) AS wh
       |        FROM $augSql aug)
       |)
       |SELECT simhash, min(doc_id) AS keep_id, count(*) AS dup_count
       |FROM hashed GROUP BY 1 HAVING count(*) > 1""".stripMargin
  }

  val ngramJaccardSql: String =
    s"""WITH sh AS (
       |  SELECT doc_id, unnest(list_distinct($ShinglesSql)) AS s FROM $augSql aug
       |), cnt AS (
       |  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
       |), pairs AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
       |  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT a, b, inter, ca.n_sh + cb.n_sh - inter AS uni
       |FROM pairs JOIN cnt ca ON ca.doc_id = a JOIN cnt cb ON cb.doc_id = b
       |WHERE inter * 100 >= (ca.n_sh + cb.n_sh - inter) * 60""".stripMargin
}
