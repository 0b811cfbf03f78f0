package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Brute-force cosine top-k is the exact baseline
  * (broadcast the query set, one pass over the corpus — no shuffle
  * until the per-query top-k aggregation); random-hyperplane LSH is the
  * scale path (bucket join instead of full cross product).
  *
  * Cross-engine exactness: embeddings are quantized once to integers
  * (`floor(v*100 + 0.5)`), every dot product / norm / LSH sign test is
  * then 64-bit integer arithmetic, and the only float op left is the
  * final rank score `dot / sqrt(na*nb)` — computed from identical
  * integers with identical IEEE ops in both engines, so the DuckDB
  * oracle verifies the ANN queries bit-for-bit (round 1 left them
  * rows-only because xxhash64 hyperplanes had no DuckDB mirror).
  */
object Similarity {

  /** Cosine similarity of two float arrays, computed in double — the
    * library's general-purpose scorer (pure Catalyst, codegen'd).
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) =>
        p.cast("double") * q.cast("double")), lit(0.0d), (acc, v) => acc + v)
    dot(a, b) / sqrt(dot(a, a)) / sqrt(dot(b, b))
  }

  // ------------------------------------------------- quantized kernel

  val QuantScale = 100 // |v|<=~1.0 -> |q|<=~100; dim 64 -> |dot|<=~6.6e5

  /** Integer quantization: q_j = floor(v_j*100 + 0.5) (deterministic in
    * both engines — float->double is exact, the multiply/add/floor are
    * IEEE-identical). Native codegen kernel
    * ([[graft.functions.QuantizeVec]]): the `transform` HOF it replaces
    * is interpreted per element.
    */
  def quantize(emb: Column): Column =
    graft.functions.VecOps.quantize(emb, QuantScale)

  val quantizeSql: String =
    s"list_transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * $QuantScale + 0.5) AS BIGINT))"

  /** Exact integer dot product of two quantized vectors — native
    * codegen kernel ([[graft.functions.QDotVec]]). The ANN signature
    * stage evaluates dim x nPlanes of these per row; the
    * `aggregate(zip_with(...))` HOF form was interpreted per element
    * and dominated every similarity query.
    */
  def qdot(a: Column, b: Column): Column =
    graft.functions.VecOps.qdot(a, b)

  /** Rank score: dot / sqrt(na*nb) in double. Identical integer inputs
    * + identical IEEE ops = identical ranking across engines.
    */
  private def qsim(dot: Column, na: Column, nb: Column): Column =
    dot.cast("double") / sqrt((na * nb).cast("double"))

  /** Input with planted duplicates so the dedup query has true
    * positives (the driver's embeddings table has none): every 10th
    * vector is duplicated verbatim under vec_id+1000000 (same id-offset
    * margin as Dedup.augmented — large enough that planted ids cannot
    * collide with real vec_ids at any fixture scale). Mirrored 1:1 in
    * [[augEmbSql]].
    */
  val PlantedIdOffset = 1000000L

  def augmentedEmb(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding"))
      .unionByName(emb.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + PlantedIdOffset).as("vec_id"), col("embedding")))

  val augEmbSql: String =
    s"""(SELECT vec_id, embedding FROM embeddings
       | UNION ALL SELECT vec_id + $PlantedIdOffset, embedding FROM embeddings WHERE vec_id % 10 = 0)""".stripMargin.replace("\n", "")

  // ------------------------------------------------------- brute force

  /** Exact top-k neighbors for the query vectors (vec_id < nQueries) by
    * quantized cosine. Output is rank-only (ints) so the oracle
    * comparison never crosses a float boundary; ties broken by vec_id.
    * Plan: query side broadcast, corpus streamed once, per-query top-k
    * via window over the (tiny) nQueries*corpus score set.
    */
  def bruteForceTopK(emb: DataFrame, nQueries: Int = 5, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qe = emb.select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("nq", qdot(col("q"), col("q")))
      .filter(col("nq") > 0)
    val queries = qe.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("nq").as("nqq"))
    val joined = qe.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        qsim(qdot(col("qq"), col("q")), col("nqq"), col("nq")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
  }

  /** Integer dot product over DuckDB lists (index-based — works for any
    * dim without zip).
    */
  private def dotSql(a: String, b: String): String =
    s"CAST(list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])) AS BIGINT)"

  val bruteForceSql: String =
    s"""WITH qe AS (
       |  SELECT vec_id, $quantizeSql AS q FROM embeddings
       |), qn AS (
       |  SELECT vec_id, q, ${dotSql("q", "q")} AS nq FROM qe
       |), qnn AS (SELECT * FROM qn WHERE nq > 0
       |), scored AS (
       |  SELECT qs.vec_id AS query_id, e.vec_id AS neighbor_id,
       |         CAST(${dotSql("qs.q", "e.q")} AS DOUBLE) / sqrt(CAST(qs.nq * e.nq AS DOUBLE)) AS sim
       |  FROM qnn e CROSS JOIN (SELECT * FROM qnn WHERE vec_id < 5) qs
       |  WHERE e.vec_id <> qs.vec_id
       |)
       |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
       |  SELECT query_id, neighbor_id,
       |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM scored) WHERE rank <= 10""".stripMargin

  // -------------------------------------------------------- LSH planes

  /** Deterministic hyperplane component: first 15 hex chars of
    * md5("p:j") read as a 60-bit int, mod 2001, minus 1000 — a public,
    * engine-independent formula. The matrix is tiny (planes x dim
    * ints), so it is materialized once on the driver and inlined as
    * literals in BOTH engines: no per-row digest work, nothing to
    * broadcast at any scale, and the DuckDB oracle sees the exact same
    * numbers.
    */
  def planeVal(p: Int, j: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hex = d.digest(s"$p:$j".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16) % 2001L - 1000L
  }

  def plane(p: Int, dim: Int): Array[Long] =
    Array.tabulate(dim)(j => planeVal(p, j))

  /** Sign-bit signature of a quantized vector against planes
    * [first, first+nPlanes): bit p set iff the integer dot product with
    * plane (first+p) is positive.
    */
  def lshSignature(qemb: Column, dim: Int, first: Int, nPlanes: Int): Column =
    (0 until nPlanes).map { p =>
      val dotC = qdot(qemb, lit(plane(first + p, dim)))
      when(dotC > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** SQL literal for the plane matrix rows [0, nPlanes). */
  private def planesSqlLit(nPlanes: Int, dim: Int): String =
    (0 until nPlanes).map(p => plane(p, dim).mkString("[", ",", "]"))
      .mkString("[", ", ", "]")

  /** ANN via multi-table LSH: L independent tables of m hyperplanes
    * each; a corpus vector is a candidate if it shares a bucket with the
    * query in ANY table (classic recall amplification: 1-(1-p^m)^L).
    * Candidates are deduped, then exact quantized cosine ranks them.
    * Returns (query_id, neighbor_id, rank) like the brute-force
    * baseline; recall vs brute force is additionally asserted in
    * OpsSpec.
    *
    * Scale path: the bucket join touches ~L * corpus/2^m rows per query
    * instead of the full corpus; (table, bucket) is a well-spread
    * shuffle key; the query side broadcasts. `dim` is a parameter (the
    * embedding dimension is pipeline config, not something a scan
    * should run a driver action to discover).
    */
  def lshTopK(emb: DataFrame, nQueries: Int = 5, k: Int = 10,
      planesPerTable: Int = 6, nTables: Int = 8, dim: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qe = emb.select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("nq", qdot(col("q"), col("q")))
      .filter(col("nq") > 0)
    val sigged = qe
      .withColumn("sigs", array((0 until nTables).map(t =>
        lshSignature(col("q"), dim, t * planesPerTable, planesPerTable)): _*))
      .select(col("vec_id"), col("q"), col("nq"),
        posexplode(col("sigs")).as(Seq("tbl", "sig")))
    val queries = sigged.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qq"),
        col("nq").as("nqq"), col("tbl"), col("sig"))
    val candidates = sigged.join(broadcast(queries), Seq("tbl", "sig"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("qq"), col("nqq"), col("q"), col("nq"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = candidates
      .select(col("query_id"), col("neighbor_id"),
        qsim(qdot(col("qq"), col("q")), col("nqq"), col("nq")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
  }

  def lshTopKSql(nQueries: Int = 5, k: Int = 10,
      planesPerTable: Int = 6, nTables: Int = 8, dim: Int = 64): String = {
    val n = nTables * planesPerTable
    s"""WITH qe AS (
       |  SELECT vec_id, $quantizeSql AS q FROM embeddings
       |), qn AS (
       |  SELECT vec_id, q, ${dotSql("q", "q")} AS nq FROM qe
       |), qnn AS (SELECT * FROM qn WHERE nq > 0
       |), pl AS (
       |  SELECT unnest(range(0, $n)) AS pid,
       |         unnest(${planesSqlLit(n, dim)}) AS pvec
       |), dots AS (
       |  SELECT vec_id, pid, ${dotSql("q", "pvec")} AS d
       |  FROM qnn CROSS JOIN pl
       |), sigt AS (
       |  SELECT vec_id, pid // $planesPerTable AS tbl,
       |         CAST(sum(CASE WHEN d > 0 THEN (1 << (pid % $planesPerTable)) ELSE 0 END) AS BIGINT) AS sig
       |  FROM dots GROUP BY 1, 2
       |), cand AS (
       |  SELECT DISTINCT qs.vec_id AS query_id, e.vec_id AS neighbor_id
       |  FROM sigt e JOIN (SELECT * FROM sigt WHERE vec_id < $nQueries) qs
       |    ON e.tbl = qs.tbl AND e.sig = qs.sig AND e.vec_id <> qs.vec_id
       |), scored AS (
       |  SELECT c.query_id, c.neighbor_id,
       |         CAST(${dotSql("a.q", "b.q")} AS DOUBLE) / sqrt(CAST(a.nq * b.nq AS DOUBLE)) AS sim
       |  FROM cand c JOIN qnn a ON a.vec_id = c.query_id JOIN qnn b ON b.vec_id = c.neighbor_id
       |)
       |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
       |  SELECT query_id, neighbor_id,
       |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM scored) WHERE rank <= $k""".stripMargin
  }

  // ----------------------------------------------------------- IVF ANN

  /** ANN via an inverted-file (IVF) index — the second scale path next
    * to LSH, with opposite trade-offs (data-adaptive cells vs oblivious
    * hashes):
    *
    *  1. centroids are trained by [[lloydIters]] iterations of SAMPLED
    *     Lloyd's k-means (the MLlib pattern: centroids broadcast each
    *     round, assignment distributed over a deterministic sample,
    *     only the C x dim per-(centroid, dim) sums collected — O(C*dim)
    *     driver rows per round regardless of corpus size). Seeds are
    *     the smallest-md5-hash corpus vectors (deterministic, seedless);
    *     new centroids are elementwise truncating-division integer
    *     means, so the whole construction stays in the exact integer
    *     kernel and the DuckDB oracle replays it verbatim
    *     ([[ivfTopKSql]] unrolls the same iterations as CTEs). A cell
    *     that captures no sample vectors keeps its previous centroid.
    *  2. every vector joins its best trained centroid (one broadcast
    *     join + a per-vector top-1 window — the "inverted list"
    *     assignment);
    *  3. each query probes its nProbe nearest cells; candidates are the
    *     union of those cells' lists, ranked by exact quantized cosine.
    *
    * All scoring is the integer-quantized kernel, so the DuckDB oracle
    * reproduces the result bit-for-bit. Recall vs brute force (and vs
    * the untrained hash-pick centroids, lloydIters = 0) is additionally
    * asserted in OpsSpec. At a real corpus size nCentroids should grow
    * with the data (rule of thumb ~sqrt(N) cells, nProbe a few % of
    * them) — a parameter here because cell count is pipeline config.
    */
  /** Cell count for a corpus of n vectors: the standard IVF rule of
    * thumb ~sqrt(n) (each cell holds ~sqrt(n) vectors; probing nProbe
    * cells scans ~nProbe*sqrt(n) candidates), floored at 16 so tiny
    * corpora keep a meaningful index. The oracle-checked driver query
    * pins nCentroids=16 (its SQL is generated for a fixed C); pipelines
    * sizing an index for a real corpus pass `adaptiveCentroids(count)`.
    */
  def adaptiveCentroids(n: Long): Int =
    math.max(16, math.sqrt(n.toDouble).toInt)

  def ivfTopK(emb: DataFrame, nQueries: Int = 5, k: Int = 10,
      nCentroids: Int = 16, nProbe: Int = 4,
      lloydIters: Int = 2, sampleMod: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = emb.sparkSession
    import spark.implicits._
    val qe = emb.select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("nq", qdot(col("q"), col("q")))
      .filter(col("nq") > 0)

    // ---- k-means training (driver-coordinated, assignment distributed)
    // Seed collect is O(nCentroids); per-round collect is O(C * dim).
    val seed: Seq[(Long, Seq[Long])] = qe
      .withColumn("ch", Dedup.hash60(concat(lit("c:"), col("vec_id").cast("string"))))
      .orderBy(col("ch"), col("vec_id")).limit(nCentroids)
      .select(col("vec_id"), col("q")).as[(Long, Seq[Long])].collect().toSeq
    var cents: Seq[(Long, Seq[Long])] = seed
    val samp = qe.filter(col("vec_id") % sampleMod === 0)
    for (_ <- 1 to lloydIters) {
      val cdf = cents.toDF("cid", "cq")
        .withColumn("cnq", qdot(col("cq"), col("cq")))
      val aw = Window.partitionBy(col("vec_id"))
        .orderBy(affinity(col("q"), col("cq"), col("cnq")).desc, col("cid").asc)
      val assigned = samp.crossJoin(broadcast(cdf))
        .withColumn("crank", row_number().over(aw))
        .filter(col("crank") === 1)
      val sums: Array[(Long, Int, Long, Long)] = assigned
        .select(col("cid"), posexplode(col("q")).as(Seq("d", "v")))
        .groupBy(col("cid"), col("d"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
        .as[(Long, Int, Long, Long)].collect()
      val byCid = sums.groupBy(_._1)
      cents = cents.map { case (cid, old) =>
        byCid.get(cid) match {
          case Some(rows) =>
            val arr = old.toArray
            // Long `/` truncates toward zero — mirrored in the oracle's
            // sign-split `//` (DuckDB `//` floors, so the split keeps
            // both engines on trunc semantics for negative sums).
            rows.foreach { case (_, d, s, c) => arr(d) = s / c }
            (cid, arr.toSeq)
          case None => (cid, old) // empty cell keeps its previous centroid
        }
      }
    }

    // ---- IVF over the trained centroids
    val cdf = cents.toDF("cid", "cq")
      .withColumn("cnq", qdot(col("cq"), col("cq")))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(affinity(col("q"), col("cq"), col("cnq")).desc, col("cid").asc)
    val ranked = qe.crossJoin(broadcast(cdf))
      .withColumn("crank", row_number().over(w))
      .select(col("vec_id"), col("q"), col("nq"), col("cid"), col("crank"))
    val assigned = ranked.filter(col("crank") === 1) // inverted lists
      .select(col("cid"), col("vec_id"), col("q"), col("nq"))
    val probes = ranked.filter(col("vec_id") < nQueries && col("crank") <= nProbe)
      .select(col("cid"), col("vec_id").as("query_id"))
    val queries = qe.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("nq").as("nqq"))
    val candidates = assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .dropDuplicates("query_id", "vec_id")
      .join(broadcast(queries), Seq("query_id"))
    val rescored = candidates.select(col("query_id"), col("vec_id").as("neighbor_id"),
      qsim(qdot(col("qq"), col("q")), col("nqq"), col("nq")).as("sim"))
    val rw = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    rescored.withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
  }

  /** Vector-to-centroid affinity: cos-proportional dot/sqrt(|c|^2)
    * (the per-vector norm is constant within a ranking so it cannot
    * reorder); a degenerate zero centroid (integer mean collapse) sorts
    * last deterministically instead of producing NaN.
    */
  private def affinity(q: Column, cq: Column, cnq: Column): Column =
    when(cnq > 0, qdot(q, cq).cast("double") / sqrt(cnq.cast("double")))
      .otherwise(lit(-1e300))

  /** Affinity SQL mirror of [[affinity]]. */
  private def affinitySql(q: String, cq: String, cnq: String): String =
    s"CASE WHEN $cnq > 0 THEN CAST(${dotSql(q, cq)} AS DOUBLE) / sqrt(CAST($cnq AS DOUBLE)) ELSE -1e300 END"

  /** Oracle mirror of [[ivfTopK]]: the same lloydIters Lloyd rounds
    * unrolled as CTE chains (assign -> per-dim sums via zipped unnest ->
    * trunc-division integer means -> coalesce empty cells), then the
    * identical IVF probe/re-rank.
    */
  def ivfTopKSql(nQueries: Int = 5, k: Int = 10,
      nCentroids: Int = 16, nProbe: Int = 4,
      lloydIters: Int = 2, sampleMod: Int = 4): String = {
    val base =
      s"""WITH qe AS (
         |  SELECT vec_id, $quantizeSql AS q FROM embeddings
         |), qn AS (
         |  SELECT vec_id, q, ${dotSql("q", "q")} AS nq FROM qe
         |), qnn AS (SELECT * FROM qn WHERE nq > 0
         |), samp AS (SELECT * FROM qnn WHERE vec_id % $sampleMod = 0
         |), cents0 AS (
         |  SELECT vec_id AS cid, q AS cq FROM qnn
         |  ORDER BY ('0x' || substr(md5('c:' || vec_id::VARCHAR),1,15))::BIGINT, vec_id
         |  LIMIT $nCentroids
         |)""".stripMargin
    val rounds = (1 to lloydIters).map { r =>
      val prev = s"cents${r - 1}"
      s""", cn$r AS (
         |  SELECT cid, cq, ${dotSql("cq", "cq")} AS cnq FROM $prev
         |), asg$r AS (
         |  SELECT cid, q FROM (
         |    SELECT c.cid, s.q,
         |           row_number() OVER (PARTITION BY s.vec_id
         |             ORDER BY ${affinitySql("s.q", "c.cq", "c.cnq")} DESC, c.cid ASC) AS crank
         |    FROM samp s CROSS JOIN cn$r c) WHERE crank = 1
         |), sums$r AS (
         |  SELECT cid, d, CAST(sum(v) AS BIGINT) AS s, count(*) AS c FROM (
         |    SELECT cid, unnest(q) AS v, unnest(range(0, len(q))) AS d FROM asg$r)
         |  GROUP BY 1, 2
         |), newc$r AS (
         |  SELECT cid, list(CAST(CASE WHEN s >= 0 THEN s // c ELSE -((-s) // c) END AS BIGINT) ORDER BY d) AS cq
         |  FROM sums$r GROUP BY cid
         |), cents$r AS (
         |  SELECT p.cid, coalesce(n.cq, p.cq) AS cq
         |  FROM $prev p LEFT JOIN newc$r n ON p.cid = n.cid
         |)""".stripMargin
    }.mkString
    val fin = s"cents$lloydIters"
    base + rounds +
      s""", cents AS (
         |  SELECT cid, cq, ${dotSql("cq", "cq")} AS cnq FROM $fin
         |), ranked AS (
         |  SELECT v.vec_id, c.cid,
         |         row_number() OVER (PARTITION BY v.vec_id
         |           ORDER BY ${affinitySql("v.q", "c.cq", "c.cnq")} DESC,
         |                    c.cid ASC) AS crank
         |  FROM qnn v CROSS JOIN cents c
         |), assigned AS (
         |  SELECT cid, vec_id FROM ranked WHERE crank = 1
         |), probes AS (
         |  SELECT cid, vec_id AS query_id FROM ranked
         |  WHERE vec_id < $nQueries AND crank <= $nProbe
         |), cand AS (
         |  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
         |  FROM assigned a JOIN probes p ON a.cid = p.cid AND a.vec_id <> p.query_id
         |), scored AS (
         |  SELECT c.query_id, c.neighbor_id,
         |         CAST(${dotSql("a.q", "b.q")} AS DOUBLE) / sqrt(CAST(a.nq * b.nq AS DOUBLE)) AS sim
         |  FROM cand c JOIN qnn a ON a.vec_id = c.query_id JOIN qnn b ON b.vec_id = c.neighbor_id
         |)
         |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
         |  SELECT query_id, neighbor_id,
         |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
         |  FROM scored) WHERE rank <= $k""".stripMargin
  }

  // ------------------------------------------------- embedding dedup

  val DupBucketCap = 500 // max vectors per LSH bucket before it is dropped

  /** Embedding near-dup pairs: quantized cosine >= 0.95 among LSH-bucket
    * candidates (the embedding-space analog of MinHash). The threshold
    * test is division-free integer arithmetic:
    * dot>0 && dot^2 * 10000 >= 9025 * na * nb  ==  cos >= 0.95.
    * Buckets over [[DupBucketCap]] are dropped before the self-join
    * (hot-bucket cap, same rationale as Dedup).
    */
  def embeddingDups(emb: DataFrame, nPlanes: Int = 8, dim: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qe = augmentedEmb(emb)
      .select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("nq", qdot(col("q"), col("q")))
      .filter(col("nq") > 0)
    val sigged = qe.withColumn("sig", lshSignature(col("q"), dim, 0, nPlanes))
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy(col("sig"))))
      .filter(col("bsz") <= DupBucketCap)
    val l = sigged.select(col("sig"), col("vec_id").as("a"), col("q").as("qa"), col("nq").as("na"))
    val r = sigged.select(col("sig"), col("vec_id").as("b"), col("q").as("qb"), col("nq").as("nb"))
    l.join(r, Seq("sig")).filter(col("a") < col("b"))
      .withColumn("dot", qdot(col("qa"), col("qb")))
      .filter(col("dot") > 0 &&
        col("dot") * col("dot") * 10000L >= lit(9025L) * col("na") * col("nb"))
      .select(col("a"), col("b"))
  }

  def embeddingDupsSql(nPlanes: Int = 8, dim: Int = 64): String =
    s"""WITH aug AS (
       |  SELECT vec_id, embedding FROM $augEmbSql
       |), qe AS (
       |  SELECT vec_id, $quantizeSql AS q FROM aug
       |), qn AS (
       |  SELECT vec_id, q, ${dotSql("q", "q")} AS nq FROM qe
       |), qnn AS (SELECT * FROM qn WHERE nq > 0
       |), pl AS (
       |  SELECT unnest(range(0, $nPlanes)) AS pid,
       |         unnest(${planesSqlLit(nPlanes, dim)}) AS pvec
       |), dots AS (
       |  SELECT vec_id, pid, ${dotSql("q", "pvec")} AS d
       |  FROM qnn CROSS JOIN pl
       |), sigs AS (
       |  SELECT vec_id, CAST(sum(CASE WHEN d > 0 THEN (1 << pid) ELSE 0 END) AS BIGINT) AS sig
       |  FROM dots GROUP BY 1
       |), capped AS (
       |  SELECT * FROM (
       |    SELECT vec_id, sig, count(*) OVER (PARTITION BY sig) AS bsz FROM sigs)
       |  WHERE bsz <= $DupBucketCap
       |)
       |SELECT x.vec_id AS a, y.vec_id AS b
       |FROM capped x JOIN capped y ON x.sig = y.sig AND x.vec_id < y.vec_id
       |JOIN qnn qa ON qa.vec_id = x.vec_id JOIN qnn qb ON qb.vec_id = y.vec_id
       |WHERE ${dotSql("qa.q", "qb.q")} > 0
       |  AND ${dotSql("qa.q", "qb.q")} * ${dotSql("qa.q", "qb.q")} * 10000
       |      >= 9025 * qa.nq * qb.nq""".stripMargin
}
