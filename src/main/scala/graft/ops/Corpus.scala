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

  // ---------------------------------------------------- sequence packing

  /** Tokens per training sequence. 2^11 — the classic context-window
    * granularity; any positive value works (integer `div`, no shifts).
    */
  val PackBudget: Long = 2048L

  /** Concat-and-chunk sequence packing — the standard LLM pretraining
    * layout: documents are concatenated in a deterministic
    * (hash-shuffled) order and the token stream is cut into
    * fixed-[[PackBudget]] sequences, documents spanning cuts. Output
    * per doc: the sequence its first token lands in (`seq_id`), the
    * offset inside it (`seq_pos`), and how many sequences it spans.
    *
    * The global prefix sum is NOT a single-partition window (the naive
    * `Window.orderBy` with no partition key serializes the whole table
    * through one task — the textbook scale-killer). Two-phase scalable
    * prefix sum instead:
    *   1. the order key is already a uniform 60-bit hash, so a
    *      DETERMINISTIC range bucket is just `k div width` — a pure
    *      column expression, no boundary sampling, balanced by
    *      construction, identical across jobs (spark_partition_id()
    *      after repartitionByRange would NOT be: each action re-plans
    *      the exchange and may re-sample different boundaries);
    *   2. per-bucket token totals (one partially-aggregated pass, B
    *      rows) become per-bucket start offsets on the driver — O(B);
    *   3. in-bucket window cumsum + broadcast-joined bucket offset =
    *      the exact global prefix, because every smaller key lives in a
    *      smaller-or-equal bucket. One full-data shuffle total.
    *
    * Zero-token docs are excluded (nothing to pack) — deterministic,
    * mirrored in the oracle.
    */
  /** The cached 3-column projection of the most recent [[packSequences]]
    * call. The returned DataFrame references it lazily, so it cannot be
    * unpersisted inside packSequences itself; instead each new call
    * releases the previous one (bounding the cache to ONE projection per
    * session regardless of how many pack queries run back-to-back), and
    * [[releasePackCache]] lets a caller whose terminal action has run
    * (Bench between queries, long-lived sessions) drop the last one too.
    */
  @volatile private var lastPackCache: Option[DataFrame] = None

  /** Blocking-free release of the cached pack projection (safe if the
    * caller's action already ran; a later re-action recomputes).
    */
  def releasePackCache(): Unit = synchronized {
    lastPackCache.foreach(_.unpersist(blocking = false))
    lastPackCache = None
  }

  def packSequences(docs: DataFrame, budget: Long = PackBudget): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val nBuckets = spark.sessionState.conf.numShufflePartitions.max(1)
    val width = (1L << 60) / nBuckets + 1
    // Persisted: the totals pass below and the caller's final action
    // would otherwise BOTH recompute the whole upstream plan (for a
    // composed pipeline that means re-running its regex-heavy filter
    // stages). The cached projection is three longs per doc (~24
    // bytes/doc — 24 GB per 10^9 docs, spilled to disk if needed),
    // cheap at any scale relative to re-reading the corpus.
    val keyed = docs
      .select(col("doc_id"), TextOps.tokenCountWs(col("text")).as("n_tok"),
        Dedup.hash60(concat(lit("pack:"), col("doc_id").cast("string"))).as("k"))
      .filter(col("n_tok") > 0)
      .withColumn("pid", expr(s"k div $width"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    synchronized {
      lastPackCache.foreach(_.unpersist(blocking = false))
      lastPackCache = Some(keyed)
    }

    val totals = keyed.groupBy(col("pid"))
      .agg(sum(col("n_tok")).as("t"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val offsets = totals.scanLeft((0L, 0L)) { case ((_, acc), (pid, t)) => (pid, acc + t) }
      .init.zip(totals).map { case ((_, off), (pid, _)) => (pid, off) }
    val offDf = offsets.toSeq.toDF("pid", "bucket_off")

    val w = Window.partitionBy(col("pid")).orderBy(col("k"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyed.join(broadcast(offDf), "pid")
      .withColumn("cum", sum(col("n_tok")).over(w) + col("bucket_off"))
      .withColumn("start", col("cum") - col("n_tok"))
      // long `div`, not floor(a/b): double division drifts past 2^53
      // tokens, which a 100 TB corpus exceeds.
      .selectExpr("doc_id", "n_tok",
        s"start div $budget AS seq_id",
        s"start % $budget AS seq_pos",
        s"((cum - 1) div $budget) - (start div $budget) + 1 AS spans")
  }

  def packQuery(spark: SparkSession, dir: String): DataFrame =
    packSequences(spark.read.parquet(s"$dir/documents.parquet"))

  /** Pack oracle over an arbitrary source relation (must expose
    * `doc_id, text`) so composed pipelines can reuse it verbatim.
    */
  def packSqlOver(rel: String): String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tok,
       |         ${Dedup.hash60Sql("'pack:' || doc_id::VARCHAR")} AS k
       |  FROM $rel
       |  WHERE len(regexp_extract_all(text, '\\S+')) > 0
       |), c AS (
       |  SELECT doc_id, n_tok,
       |         CAST(sum(n_tok) OVER (ORDER BY k, doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM t
       |)
       |SELECT doc_id, n_tok,
       |       CAST((cum - n_tok) // $PackBudget AS BIGINT) AS seq_id,
       |       CAST((cum - n_tok) % $PackBudget AS BIGINT) AS seq_pos,
       |       CAST(((cum - 1) // $PackBudget) - ((cum - n_tok) // $PackBudget) + 1 AS BIGINT) AS spans
       |FROM c""".stripMargin

  val packSql: String = packSqlOver("documents")

  // --------------------------------------------------- stratified sample

  /** Per-language sampling rates (percent kept): the corpus-rebalancing
    * move every multilingual pretraining mix makes — downsample the
    * dominant language, keep the rest. Unlisted languages keep 100%.
    */
  val SampleRates: Map[String, Int] = Map("en" -> 50, "zh" -> 25)

  /** Deterministic stratified sample: doc kept iff
    * hash60("sample:" + doc_id) mod 100 < rate(lang). Layout- and
    * run-independent (same survivor set forever — reproducible data
    * mixes), no sampling RNG, no extra shuffle: the filter is a pure
    * projection predicate evaluated inside the scan stage.
    */
  def stratifiedSample(docs: DataFrame, rates: Map[String, Int] = SampleRates): DataFrame = {
    val h = pmod(Dedup.hash60(concat(lit("sample:"), col("doc_id").cast("string"))), lit(100L))
    val rate = rates.foldLeft(lit(100)) { case (acc, (lang, pct)) =>
      when(col("lang") === lang, lit(pct)).otherwise(acc)
    }
    docs.filter(h < rate)
  }

  /** Driver query: survivor counts per (lang, source) — verifies the
    * hash-threshold assignment over every stratum in one aggregate.
    */
  def sampleQuery(spark: SparkSession, dir: String): DataFrame =
    stratifiedSample(spark.read.parquet(s"$dir/documents.parquet"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"))

  /** The sample predicate as a reusable SQL fragment (needs `doc_id`
    * and `lang` in scope).
    */
  val samplePredicateSql: String = {
    val rate = "CASE lang " +
      SampleRates.map { case (l, p) => s"WHEN '$l' THEN $p" }.mkString(" ") +
      " ELSE 100 END"
    s"${Dedup.hash60Sql("'sample:' || doc_id::VARCHAR")} % 100 < $rate"
  }

  val sampleSql: String =
    s"""SELECT lang, source, count(*) AS n FROM documents
       |WHERE $samplePredicateSql
       |GROUP BY 1, 2""".stripMargin

  // -------------------------------------------------------- domain mixing

  /** Per-mille target weights for the driver mixing query (the
    * remaining sources drop — mixing is also a domain filter).
    */
  val MixWeights: Seq[(String, Int)] = Seq(
    "src0" -> 400, "src1" -> 300, "src2" -> 200, "src3" -> 100)

  /** Per-source acceptance rates (parts-per-million) hitting the target
    * mixture as closely as the inventory allows: the output size T is
    * bounded by the scarcest weighted source (taken in full); every
    * other source downsamples to its share of T. ALL-INTEGER math
    * (floor division, positive operands) so the DuckDB oracle replays
    * it bit-for-bit — no float accumulation divergence.
    */
  def domainMixRates(counts: Map[String, Long],
      weightsPerMille: Seq[(String, Int)]): Map[String, Long] = {
    val present = weightsPerMille.filter { case (s, w) =>
      w > 0 && counts.getOrElse(s, 0L) > 0L }
    if (present.isEmpty) return Map.empty
    val t = present.map { case (s, w) => counts(s) * 1000L / w }.min
    present.map { case (s, w) =>
      s -> math.min(1000000L, w * t * 1000L / counts(s))
    }.toMap
  }

  /** Domain mixing (Pile/DoReMi-style source reweighting): deterministic
    * per-source hash-threshold acceptance so the output's source shares
    * match `weightsPerMille`. One O(#sources) count aggregate plans the
    * rates; the acceptance itself is a scan-stage predicate — zero data
    * shuffles, stable under re-runs and layout changes (keyed on
    * doc_id, like [[stratifiedSample]] and [[splitCol]]).
    */
  def domainMix(docs: DataFrame,
      weightsPerMille: Seq[(String, Int)] = MixWeights): DataFrame = {
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap // O(#sources)
    val rates = domainMixRates(counts, weightsPerMille)
    if (rates.isEmpty) return docs.filter(lit(false))
    val ppm = rates.toSeq.sortBy(_._1).foldLeft(lit(0L)) { case (acc, (s, p)) =>
      when(col("source") === s, lit(p)).otherwise(acc)
    }
    val h = pmod(Dedup.hash60(concat(lit("mix:"), col("doc_id").cast("string"))),
      lit(1000000L))
    docs.filter(h < ppm)
  }

  /** Driver query: post-mix survivor counts per source. */
  def domainMixQuery(spark: SparkSession, dir: String): DataFrame =
    domainMix(spark.read.parquet(s"$dir/documents.parquet"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))

  val domainMixSql: String = {
    val caseW = "CASE source " +
      MixWeights.map { case (s, w) => s"WHEN '$s' THEN $w" }.mkString(" ") +
      " ELSE 0 END"
    s"""WITH counts AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1
       |), w AS (
       |  SELECT source, n, CAST($caseW AS BIGINT) AS wm FROM counts
       |), t AS (
       |  SELECT min(n * 1000 // wm) AS t FROM w WHERE wm > 0
       |), r AS (
       |  SELECT source, LEAST(1000000, wm * (SELECT t FROM t) * 1000 // n) AS ppm
       |  FROM w WHERE wm > 0
       |)
       |SELECT d.source, CAST(count(*) AS BIGINT) AS n_kept
       |FROM documents d JOIN r ON d.source = r.source
       |WHERE ${Dedup.hash60Sql("'mix:' || d.doc_id::VARCHAR")} % 1000000 < r.ppm
       |GROUP BY 1""".stripMargin
  }

  // ------------------------------------------------------ quality filter

  /** C4-style quality filter: per-doc keep/drop verdict with the FIRST
    * failing rule as the reason (ordered, so the verdict is
    * deterministic). Pure codegen'd column expressions — at 100 TB this
    * is a scan-stage predicate, no shuffle at all. Rules (integer
    * arithmetic only, exact in DuckDB):
    *   too_short    — fewer than 5 normalized words,
    *   punct_soup   — punctuation > 30% of characters,
    *   long_words   — mean word length > 12 chars (lorem-style junk),
    *   repetitive   — > 30% of 3-gram positions are duplicates (the
    *                  Gopher repetition-removal signal: spam loops,
    *                  keyword stuffing, boilerplate),
    *   no_stopwords — >= 20 words but zero stopword hits in EVERY
    *                  language marker set (langId 'und'): long
    *                  stretches of text with no function words in any
    *                  covered language are gibberish / non-prose.
    */
  /** Verdict over a pre-materialized word-array ATTRIBUTE `w` — the hot
    * path. The shingle lambda references its word input three times per
    * position and Catalyst performs no CSE inside lambda bodies, so
    * passing `TextOps.words(text)` inline re-runs the word regex O(3n)
    * per document (measured 8x on the composed pipeline); callers must
    * project the word array in its own select first (CollapseProject
    * keeps a multiply-referenced non-cheap alias as a projection
    * barrier).
    */
  def qualityVerdictOfWords(text: Column, w: Column): Column = {
    val nWords = size(w).cast("long")
    val nChars = length(text).cast("long")
    val nPunct = size(regexp_extract_all(text, lit("[^a-zA-Z0-9\\s]"), lit(0))).cast("long")
    val sh = Dedup.shinglesOfWords(w)
    val nSh = size(sh).cast("long")
    val nDup = (size(sh) - size(array_distinct(sh))).cast("long")
    when(nWords < 5, "too_short")
      .when(nPunct * 100 > nChars * 30, "punct_soup")
      .when(nChars > nWords * 12, "long_words")
      .when(nDup * 100 > nSh * 30, "repetitive")
      .when(nWords >= 20 && TextOps.langId(text) === "und", "no_stopwords")
      .otherwise("keep")
  }

  /** Convenience form for small inputs and tests; see
    * [[qualityVerdictOfWords]] for why large scans must materialize the
    * word array first.
    */
  def qualityVerdict(text: Column): Column =
    qualityVerdictOfWords(text, TextOps.words(text))

  /** Adds a `verdict` column the scalable way: word array materialized
    * in its own projection, then the verdict computed over the
    * attribute. Still fuses into the scan stage — no shuffle.
    */
  def withVerdict(docs: DataFrame): DataFrame =
    docs.withColumn("__w", TextOps.words(col("text")))
      .withColumn("verdict", qualityVerdictOfWords(col("text"), col("__w")))
      .drop("__w")

  def qualityFilterQuery(spark: SparkSession, dir: String): DataFrame =
    withVerdict(spark.read.parquet(s"$dir/documents.parquet"))
      .select(col("doc_id"), col("verdict"),
        TextOps.qualityScore(col("text")).as("quality"))

  /** The verdict as a reusable SQL fragment (needs `text` in scope). */
  val qualityVerdictCaseSql: String = {
    val nWords = "CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)"
    val nChars = "CAST(length(text) AS BIGINT)"
    val nPunct = "CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS BIGINT)"
    val de = s"len(regexp_extract_all(lower(text), '\\b(${TextOps.DeStops.mkString("|")})\\b'))"
    val en = s"len(regexp_extract_all(lower(text), '\\b(${TextOps.EnStops.mkString("|")})\\b'))"
    val es = s"len(regexp_extract_all(lower(text), '\\b(${TextOps.EsStops.mkString("|")})\\b'))"
    val fr = s"len(regexp_extract_all(lower(text), '\\b(${TextOps.FrStops.mkString("|")})\\b'))"
    val isUnd = s"greatest($de,$en,$es,$fr) = 0"
    val nSh = s"CAST(len(${Dedup.ShinglesSql}) AS BIGINT)"
    val nDup = s"CAST(len(${Dedup.ShinglesSql}) - len(list_distinct(${Dedup.ShinglesSql})) AS BIGINT)"
    s"""CASE WHEN $nWords < 5 THEN 'too_short'
       |     WHEN $nPunct * 100 > $nChars * 30 THEN 'punct_soup'
       |     WHEN $nChars > $nWords * 12 THEN 'long_words'
       |     WHEN $nDup * 100 > $nSh * 30 THEN 'repetitive'
       |     WHEN $nWords >= 20 AND $isUnd THEN 'no_stopwords'
       |     ELSE 'keep' END""".stripMargin
  }

  val qualityFilterSql: String = {
    val nWords = "CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)"
    val nChars = "CAST(length(text) AS BIGINT)"
    val nPunct = "CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS BIGINT)"
    val nStops = s"CAST(len(regexp_extract_all(lower(text), '\\b(${TextOps.EnStops.mkString("|")})\\b')) AS BIGINT)"
    s"""SELECT doc_id,
       |  $qualityVerdictCaseSql AS verdict,
       |  CAST(greatest(0, least(100,
       |    least($nWords, 50)
       |    + least($nStops * 5, 30)
       |    + CASE WHEN $nWords > 0 THEN least($nChars // $nWords, 20) ELSE 0 END
       |    - least($nPunct * 100 // greatest($nChars, 1), 30)
       |  )) AS BIGINT) AS quality
       |FROM documents""".stripMargin
  }

  // --------------------------------------------- end-to-end pipeline

  /** The composed corpus-to-training-data pipeline — what a user of
    * this engine actually runs, chained in ONE declarative DataFrame
    * program (Catalyst fuses the scan-stage predicates; the only
    * shuffles are the exact-dedup window and packing's single
    * exchange):
    *
    *   1. quality filter (keep only 'keep' verdicts),
    *   2. exact dedup (first-wins on md5(text)),
    *   3. stratified per-language sampling,
    *   4. deterministic train split,
    *   5. sequence packing of the surviving train corpus.
    *
    * Every stage is individually oracle-checked elsewhere; this query
    * verifies their COMPOSITION end-to-end against one composed oracle.
    */
  def pipelineQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val kept = withVerdict(docs).filter(col("verdict") === "keep").drop("verdict")
    val deduped = kept
      .withColumn("__rn", row_number().over(
        Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
      .filter(col("__rn") === 1).drop("__rn")
    val sampled = stratifiedSample(deduped)
    val train = sampled.filter(splitCol(col("doc_id")) === "train")
    packSequences(train)
  }

  val pipelineSql: String = {
    val inner =
      s"""SELECT doc_id, text FROM (
         |  SELECT doc_id, text, lang,
         |         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |  FROM documents
         |  WHERE $qualityVerdictCaseSql = 'keep'
         |) WHERE rn = 1 AND $samplePredicateSql
         |  AND ${splitSql("doc_id")} = 'train'""".stripMargin
    packSqlOver(s"($inner)")
  }
}
