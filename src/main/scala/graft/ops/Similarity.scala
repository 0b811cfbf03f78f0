package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Brute-force cosine top-k is the exact baseline
  * (broadcast the query set, one pass over the corpus — no shuffle
  * until the per-query top-k aggregation); random-hyperplane LSH is the
  * scale path (bucket join instead of full cross product).
  */
object Similarity {

  /** Cosine similarity of two float arrays, computed in double.
    * Pure Catalyst (`zip_with` + `aggregate`) — codegen'd, no UDF.
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) =>
        p.cast("double") * q.cast("double")), lit(0.0d), (acc, v) => acc + v)
    dot(a, b) / sqrt(dot(a, a)) / sqrt(dot(b, b))
  }

  /** Exact top-k neighbors for the query vectors (vec_id < nQueries) by
    * cosine. Output is rank-only (ints) so the oracle comparison never
    * crosses a float boundary; ties broken by vec_id.
    */
  def bruteForceTopK(emb: DataFrame, nQueries: Int = 5, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val joined = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("q_emb"), col("embedding")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
  }

  val bruteForceSql: String =
    """WITH q AS (
      |  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5
      |), scored AS (
      |  SELECT q.query_id, e.vec_id AS neighbor_id,
      |         list_cosine_similarity(q.q_emb::DOUBLE[], e.embedding::DOUBLE[]) AS sim
      |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id
      |)
      |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
      |  SELECT query_id, neighbor_id,
      |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
      |  FROM scored) WHERE rank <= 10""".stripMargin

  /** Random-hyperplane LSH signature: bit p = sign of <v, h_p> where
    * hyperplane component h_p[j] = (xxhash64(p, j) mod 2001) - 1000 —
    * deterministic, seedless, computed inline with Catalyst expressions
    * (no materialized plane matrix; at 10^12 scale nothing to broadcast).
    */
  def lshSignature(emb: Column, dim: Int, nPlanes: Int = 12): Column = {
    val planes = (0 until nPlanes).map { p =>
      val dotC = aggregate(
        zip_with(emb, sequence(lit(0), lit(dim - 1)), (v, j) =>
          v.cast("double") *
            (pmod(xxhash64(lit(p), j), lit(2001L)) - 1000L).cast("double")),
        lit(0.0d), (acc, v) => acc + v)
      when(dotC > 0, lit(1L << p)).otherwise(lit(0L))
    }
    planes.reduce(_ + _)
  }

  /** Per-table signatures: table t uses planes [t*m, (t+1)*m). Returns
    * an array<long> of length nTables.
    */
  def lshTableSignatures(emb: Column, dim: Int, planesPerTable: Int,
      nTables: Int): Column =
    array((0 until nTables).map { t =>
      val bits = (0 until planesPerTable).map { p =>
        val planeId = t * planesPerTable + p
        val dotC = aggregate(
          zip_with(emb, sequence(lit(0), lit(dim - 1)), (v, j) =>
            v.cast("double") *
              (pmod(xxhash64(lit(planeId), j), lit(2001L)) - 1000L).cast("double")),
          lit(0.0d), (acc, v) => acc + v)
        when(dotC > 0, lit(1L << p)).otherwise(lit(0L))
      }
      bits.reduce(_ + _)
    }: _*)

  /** ANN via multi-table LSH: L independent tables of m hyperplanes
    * each; a corpus vector is a candidate if it shares a bucket with the
    * query in ANY table (classic recall amplification: 1-(1-p^m)^L).
    * Candidates are deduped, then exact cosine ranks them. Returns
    * (query_id, neighbor_id, rank) like the brute-force baseline; recall
    * is asserted against brute force in OpsSpec, not the oracle.
    *
    * Scale path: the bucket join touches ~L * corpus/2^m rows per query
    * instead of the full corpus; table/bucket is a well-spread shuffle
    * key; the query side broadcasts.
    */
  def lshTopK(emb: DataFrame, nQueries: Int = 5, k: Int = 10,
      planesPerTable: Int = 6, nTables: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val sigged = emb
      .withColumn("sigs", lshTableSignatures(col("embedding"), dim, planesPerTable, nTables))
      .select(col("vec_id"), col("embedding"),
        posexplode(col("sigs")).as(Seq("tbl", "sig")))
    val queries = sigged.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("tbl"), col("sig"))
    val candidates = sigged.join(broadcast(queries), Seq("tbl", "sig"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("q_emb"), col("embedding"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = candidates
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("q_emb"), col("embedding")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
  }

  /** Embedding near-dup pairs: cosine above a high threshold among
    * LSH-bucket candidates (the embedding-space analog of MinHash).
    */
  def embeddingDups(emb: DataFrame, nPlanes: Int = 8,
      simThreshold: Double = 0.95): DataFrame = {
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val sigged = emb.withColumn("sig", lshSignature(col("embedding"), dim, nPlanes))
    val l = sigged.select(col("sig"), col("vec_id").as("a"), col("embedding").as("ea"))
    val r = sigged.select(col("sig"), col("vec_id").as("b"), col("embedding").as("eb"))
    l.join(r, Seq("sig")).filter(col("a") < col("b"))
      .withColumn("sim", cosine(col("ea"), col("eb")))
      .filter(col("sim") >= simThreshold)
      .select(col("a"), col("b"))
  }
}
