package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * Catalyst column expressions (codegen'd, no UDFs) with exact DuckDB
  * SQL mirrors so the driver's oracle verifies them bit-for-bit.
  */
object TextOps {

  /** Normalized word list: lowercase alphanumeric runs. */
  def words(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  /** Whitespace token count (size of '\S+' matches — exact cross-engine
    * semantics, unlike split() whose trailing-empty behavior differs).
    */
  def tokenCountWs(text: Column): Column =
    size(regexp_extract_all(text, lit("\\S+"), lit(0))).cast("long")

  /** BPE-ish subword count: greedy <=4-char lowercase chunks plus one
    * token per non-letter symbol — a deterministic stand-in for a real
    * BPE vocab (the container has no tokenizer lib), with the right
    * scaling behavior (longer words -> more subwords).
    */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z0-9]{1,4}|[^a-z0-9\\s]"), lit(0))).cast("long")

  /** Stopword hit count for a language's marker set. */
  private def hits(text: Column, stopwords: Seq[String]): Column = {
    val pat = "\\b(" + stopwords.mkString("|") + ")\\b"
    size(regexp_extract_all(lower(text), lit(pat), lit(0))).cast("long")
  }

  val EnStops = Seq("the", "a", "of", "and", "to", "in", "is")
  val EsStops = Seq("el", "la", "de", "y", "que", "en", "los")
  val FrStops = Seq("le", "la", "de", "et", "que", "en", "les")
  val DeStops = Seq("der", "die", "das", "und", "zu", "den", "ist")

  /** n-gram/stopword-heuristic language ID: argmax of per-language
    * marker-word hit counts, 'und' (undetermined) when all are zero.
    * Deterministic tie-break by language code order (de<en<es<fr).
    */
  def langId(text: Column): Column = {
    val de = hits(text, DeStops); val en = hits(text, EnStops)
    val es = hits(text, EsStops); val fr = hits(text, FrStops)
    val best = greatest(de, en, es, fr)
    when(best === 0, "und")
      .when(de === best, "de")
      .when(en === best, "en")
      .when(es === best, "es")
      .otherwise("fr")
  }

  /** Quality score in [0,100]: rewards reasonable length, average word
    * length and stopword density; penalizes punctuation soup. Integer
    * arithmetic end-to-end so the oracle matches exactly.
    */
  def qualityScore(text: Column): Column = {
    val nWords = size(words(text)).cast("long")
    val nChars = length(text).cast("long")
    val nPunct = size(regexp_extract_all(text, lit("[^a-zA-Z0-9\\s]"), lit(0))).cast("long")
    val nStops = hits(text, EnStops)
    val lengthPts = least(nWords, lit(50L)) // up to 50
    val stopPts = least(nStops * 5, lit(30L)) // up to 30
    // floor() because Spark's `/` on longs is double division; floor of a
    // correctly-rounded positive quotient == integer floor-div (DuckDB //).
    val punctPenalty = least(
      floor(nPunct * 100 / greatest(nChars, lit(1L))).cast("long"), lit(30L))
    val wordLenPts = when(nWords > 0,
      least(floor(nChars / nWords).cast("long"), lit(20L))).otherwise(lit(0L)) // up to 20
    greatest(lit(0L), least(lit(100L), lengthPts + stopPts + wordLenPts - punctPenalty))
  }

  /** Document fingerprint (key-collision normalization a la
    * OpenRefine/Google fingerprint): md5 of the sorted, distinct,
    * normalized word set — robust to word order and duplication.
    */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(words(text))), " "))

  /** Corpus vocabulary statistics — the tokenizer-training preamble:
    * per-word global occurrence count and document frequency, top-k by
    * (count desc, word asc) so the cut is total-ordered and
    * deterministic. Scale shape: one hash aggregate over exploded words
    * (map-side partial combine) and a TakeOrdered top-k — the global
    * sort is never materialized, only k rows leave the executors.
    */
  /** Top-k cut size shared by [[vocab]]'s default and [[vocabSql]] —
    * interpolated in both so operator and oracle cannot desynchronize.
    */
  val VocabK = 100

  def vocab(docs: DataFrame, k: Int = VocabK): DataFrame =
    docs.select(col("doc_id"), explode(words(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("occurrences"),
        countDistinct(col("doc_id")).as("doc_freq"))
      .orderBy(col("occurrences").desc, col("word"))
      .limit(k)

  def vocabQuery(spark: SparkSession, dir: String): DataFrame =
    vocab(spark.read.parquet(s"$dir/documents.parquet"))

  val vocabSql: String =
    s"""SELECT word, count(*) AS occurrences,
       |       count(DISTINCT doc_id) AS doc_freq
       |FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
       |      FROM documents)
       |GROUP BY word ORDER BY occurrences DESC, word LIMIT $VocabK""".stripMargin

  // ----------------------------------------------------------- scrubbing

  /** C4-style PII/link scrub patterns. Deliberately restricted to
    * explicit character classes and greedy `+` quantifiers — the subset
    * where Java regex (Spark) and RE2 (DuckDB) match byte-identically
    * (no backreferences, no lookaround, no dot-any), so the scrubbed
    * text itself is oracle-checkable, not just the counts.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[A-Za-z0-9./_%+-]+"

  /** PII/link scrubbing over a corpus: emails then URLs replaced with
    * redaction tokens, with per-doc match counts — the standard
    * pre-training hygiene pass (C4 filters lines by badwords/braces;
    * production pipelines additionally redact addresses and links).
    * Pure scan-stage projection: zero shuffles, codegen'd regex ops.
    * Output keeps the scrubbed text's md5 (small, exactly checkable)
    * rather than shipping the text through the comparator.
    */
  def scrub(docs: DataFrame): DataFrame = {
    val noEmail = regexp_replace(col("text"), EmailRe, "<EMAIL>")
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col("text"), lit(UrlRe), lit(0)))
        .cast("long").as("n_urls"),
      md5(regexp_replace(noEmail, UrlRe, "<URL>")).as("scrubbed_hash"))
  }

  /** Driver query over documents augmented with PLANTED contact lines
    * (the synthetic corpus contains no emails/URLs, so true positives
    * must be planted — same pattern as Dedup.augmented): every 3rd doc
    * gains an email + URL; every 9th gains a second email.
    */
  def scrubQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" contact doc"), col("doc_id"),
              lit("@example.com via https://ex.org/d/"), col("doc_id")))
            .otherwise(lit("")),
          when(col("doc_id") % 9 === 0,
            concat(lit(" cc admin+"), col("doc_id"), lit("@ex.net")))
            .otherwise(lit(""))).as("text"))
    scrub(docs)
  }

  val scrubSql: String = {
    // DuckDB standard strings don't process backslash escapes: the
    // runtime pattern (single backslash) interpolates verbatim.
    val email = EmailRe
    val url = UrlRe
    s"""WITH aug AS (
       |  SELECT doc_id, text
       |    || CASE WHEN doc_id % 3 = 0
       |            THEN ' contact doc' || doc_id || '@example.com via https://ex.org/d/' || doc_id
       |            ELSE '' END
       |    || CASE WHEN doc_id % 9 = 0
       |            THEN ' cc admin+' || doc_id || '@ex.net'
       |            ELSE '' END AS text
       |  FROM documents
       |)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(text, '$url')) AS BIGINT) AS n_urls,
       |  md5(regexp_replace(regexp_replace(text, '$email', '<EMAIL>', 'g'),
       |      '$url', '<URL>', 'g')) AS scrubbed_hash
       |FROM aug""".stripMargin
  }

  // ------------------------------------------------------------- queries

  /** Within-doc line dedup (native [[graft.functions.LineDedupDoc]]
    * kernel): repeated boilerplate lines INSIDE one document collapse
    * first-wins at scan stage — zero shuffles. Driver query plants
    * repetitions (a nav line around every doc, and even docs' own text
    * duplicated as a line) since the synthetic corpus has none; the
    * oracle replays the exact first-occurrence-wins split/join
    * semantics in SQL.
    */
  def lineDedupDocQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextGrams
    val aug = spark.read.parquet(s"$dir/documents.parquet").select(
      col("doc_id"),
      concat(lit("NAV MENU"), lit("\n"), col("text"), lit("\n"), lit("NAV MENU"),
        when(col("doc_id") % 2 === 0, concat(lit("\n"), col("text")))
          .otherwise(lit(""))).as("text"))
    val dedup = TextGrams.lineDedupDoc(col("text"))
    aug.select(
      format_string("doc_%012d", col("doc_id")).as("doc_id"),
      size(split(col("text"), "\n", -1)).cast("long").as("n_lines"),
      size(split(dedup, "\n", -1)).cast("long").as("n_kept"),
      md5(dedup).as("dedup_md5"))
  }

  val lineDedupDocSql: String =
    """WITH aug AS (
      |  SELECT doc_id,
      |         concat('NAV MENU', chr(10), text, chr(10), 'NAV MENU',
      |                CASE WHEN doc_id % 2 = 0 THEN concat(chr(10), text) ELSE '' END) AS text
      |  FROM documents
      |), e AS (
      |  SELECT doc_id,
      |         unnest(string_split(text, chr(10))) AS line,
      |         generate_subscripts(string_split(text, chr(10)), 1) AS pos
      |  FROM aug
      |), q AS (
      |  SELECT doc_id, line, pos,
      |         row_number() OVER (PARTITION BY doc_id, line ORDER BY pos) AS rn,
      |         count(*) OVER (PARTITION BY doc_id) AS n_lines
      |  FROM e
      |)
      |SELECT printf('doc_%012d', doc_id) AS doc_id,
      |       CAST(max(n_lines) AS BIGINT) AS n_lines,
      |       CAST(count(*) AS BIGINT) AS n_kept,
      |       md5(string_agg(line, chr(10) ORDER BY pos)) AS dedup_md5
      |FROM q WHERE rn = 1
      |GROUP BY doc_id""".stripMargin

  def analyze(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet").select(
      col("doc_id"),
      tokenCountWs(col("text")).as("tok_ws"),
      tokenCountBpe(col("text")).as("tok_bpe"),
      langId(col("text")).as("lang_pred"),
      qualityScore(col("text")).as("quality"),
      fingerprint(col("text")).as("fp"))

  private def sqlHits(stops: Seq[String]): String =
    s"len(regexp_extract_all(lower(text), '\\b(${stops.mkString("|")})\\b'))"

  /** The langId expression as DuckDB SQL (shared by analyze and the
    * confusion-matrix oracle).
    */
  private lazy val langCaseSql: String = {
    val de = sqlHits(DeStops); val en = sqlHits(EnStops)
    val es = sqlHits(EsStops); val fr = sqlHits(FrStops)
    s"""CASE WHEN greatest($de,$en,$es,$fr) = 0 THEN 'und'
       |     WHEN $de = greatest($de,$en,$es,$fr) THEN 'de'
       |     WHEN $en = greatest($de,$en,$es,$fr) THEN 'en'
       |     WHEN $es = greatest($de,$en,$es,$fr) THEN 'es'
       |     ELSE 'fr' END""".stripMargin
  }

  /** Language-ID confusion matrix against the corpus's ground-truth
    * `lang` column: one row per (actual, predicted) pair with counts —
    * the evaluation harness for the n-gram langId heuristic. One hash
    * aggregate over a scan projection.
    */
  def langConfusionQuery(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"), langId(col("text")).as("lang_pred"))
      .groupBy("lang", "lang_pred")
      .agg(count(lit(1)).cast("long").as("n"))

  val langConfusionSql: String =
    s"""SELECT lang, $langCaseSql AS lang_pred, CAST(count(*) AS BIGINT) AS n
       |FROM documents GROUP BY 1, 2""".stripMargin

  val analyzeSql: String = {
    val de = sqlHits(DeStops); val en = sqlHits(EnStops)
    val es = sqlHits(EsStops); val fr = sqlHits(FrStops)
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS tok_ws,
       |  CAST(len(regexp_extract_all(lower(text), '[a-z0-9]{1,4}|[^a-z0-9\\s]')) AS BIGINT) AS tok_bpe,
       |  $langCaseSql AS lang_pred,
       |  CAST(greatest(0, least(100,
       |    least(len(regexp_extract_all(lower(text), '[a-z0-9]+')), 50)
       |    + least($en * 5, 30)
       |    + CASE WHEN len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0
       |           THEN least(length(text) // len(regexp_extract_all(lower(text), '[a-z0-9]+')), 20)
       |           ELSE 0 END
       |    - least(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) * 100 // greatest(length(text), 1), 30)
       |  )) AS BIGINT) AS quality,
       |  md5(array_to_string(list_sort(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))), ' ')) AS fp
       |FROM documents""".stripMargin
  }

  /** Gopher-style within-document repetition signals (Rae et al. 2021,
    * appendix A1.1): duplicate fractions of words, sliding 2-/3-grams
    * and lines, as integer PERMILLE (float-free — the oracle hashes
    * values exactly). Zero-shuffle scan projection; the word and line
    * arrays materialize once per document (projection barrier), grams
    * come from the codegen [[graft.functions.WordGrams]] kernel whose
    * n < width whole-text collapse the SQL mirrors. The reference has
    * no text analysis at all; these extend the C4/Gopher quality
    * filters with the repetition family they were missing.
    */
  def repetitionQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextGrams
    val base = spark.read.parquet(s"$dir/documents.parquet").select(
      col("doc_id"),
      words(col("text")).as("ws"),
      regexp_extract_all(col("text"), lit("[^\n]+"), lit(0)).as("ls"))
    val g = base.select(
      col("doc_id"), col("ws"), col("ls"),
      TextGrams.sliding(col("ws"), 2).as("g2"),
      TextGrams.sliding(col("ws"), 3).as("g3"))
      .withColumn("top2", TextGrams.topCount(col("g2")))
    g.select(
      col("doc_id"),
      size(col("ws")).cast("long").as("n_words"),
      expr("CASE WHEN size(ws) = 0 THEN 0L ELSE (CAST(size(ws) AS BIGINT) - size(array_distinct(ws))) * 1000L div size(ws) END")
        .as("dup_word_pm"),
      expr("(CAST(size(g2) AS BIGINT) - size(array_distinct(g2))) * 1000L div size(g2)")
        .as("dup_2gram_pm"),
      expr("(CAST(size(g3) AS BIGINT) - size(array_distinct(g3))) * 1000L div size(g3)")
        .as("dup_3gram_pm"),
      expr("CASE WHEN size(ls) = 0 THEN 0L ELSE (CAST(size(ls) AS BIGINT) - size(array_distinct(ls))) * 1000L div size(ls) END")
        .as("dup_line_pm"),
      expr("CAST(top2 AS BIGINT) * 1000L div size(g2)").as("top_2gram_pm"))
  }

  val repetitionSql: String =
    s"""WITH base AS (
       |  SELECT doc_id,
       |    regexp_extract_all(lower(text), '[a-z0-9]+') AS ws,
       |    regexp_extract_all(text, '[^\\n]+') AS ls
       |  FROM documents
       |), g AS (
       |  SELECT doc_id, ws, ls,
       |    CASE WHEN len(ws) < 2 THEN [array_to_string(ws, ' ')]
       |         ELSE list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) END AS g2,
       |    CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
       |         ELSE list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END AS g3
       |  FROM base
       |)
       |SELECT doc_id,
       |  CAST(len(ws) AS BIGINT) AS n_words,
       |  CAST(CASE WHEN len(ws) = 0 THEN 0 ELSE (len(ws) - len(list_distinct(ws))) * 1000 // len(ws) END AS BIGINT) AS dup_word_pm,
       |  CAST((len(g2) - len(list_distinct(g2))) * 1000 // len(g2) AS BIGINT) AS dup_2gram_pm,
       |  CAST((len(g3) - len(list_distinct(g3))) * 1000 // len(g3) AS BIGINT) AS dup_3gram_pm,
       |  CAST(CASE WHEN len(ls) = 0 THEN 0 ELSE (len(ls) - len(list_distinct(ls))) * 1000 // len(ls) END AS BIGINT) AS dup_line_pm,
       |  CAST(list_max(list_transform(list_distinct(g2), x -> len(list_filter(g2, y -> y = x)))) * 1000 // len(g2) AS BIGINT) AS top_2gram_pm
       |FROM g""".stripMargin
}
