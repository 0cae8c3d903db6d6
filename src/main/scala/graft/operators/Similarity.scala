package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._
import graft.Tables.{load => T}

/** Similarity search over the `embeddings` table (north-star Ext2).
  *
  * Two paths:
  *  - `sim_topk_bruteforce`: exact cosine top-k for a bounded query set.
  *    The query side is tiny and broadcast, so the big side streams through
  *    a map-side join with no shuffle of the corpus; top-k per query is one
  *    window shuffle on the (small) joined result. At 100 TB the corpus
  *    scan is embarrassingly parallel.
  *  - `sim_ann_lsh`: random-hyperplane (sign) LSH — corpus is bucketed by a
  *    deterministic bit signature, queries probe only their own bucket
  *    (plus the exact-rerank inside it). Sub-linear candidate set at scale;
  *    recall is measured against brute force in the scalatest suite rather
  *    than oracle-matched (the hyperplane construction is not
  *    SQL-expressible in DuckDB).
  */
object Similarity {

  type Q = (SparkSession, String) => DataFrame

  private val K = 5
  private val NQueries = 10

  /** Exact brute-force cosine top-k for vec_id < NQueries. */
  private val bruteforce: Q = (s, d) => {
    val e = T(s, d, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val joined = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("sim", cosine(col("qv"), col("v")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    joined.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("sim"), 4).as("sim"))
  }

  private val Planes = 8

  /** Deterministic pseudo-random hyperplanes: component d of plane p is
    * derived from xxhash64 of (p, d) — reproducible across runs and
    * cluster layouts, no driver-side randomness.
    */
  private def planeComponent(p: Int, dim: Int) = {
    // xxhash64 of the (p, dim) pair folded to [-1, 1)
    val h = xxhash64(lit(p), lit(dim))
    (h % 1000000).cast("double") / 1000000.0
  }

  /** Sign-LSH bucket signature for a vector column (array<double>). */
  def lshSignature(v: org.apache.spark.sql.Column, dims: Int)
      : org.apache.spark.sql.Column =
    (0 until Planes).map { p =>
      val proj = (0 until dims).map(dim =>
        element_at(v, dim + 1) * planeComponent(p, dim)).reduce(_ + _)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** ANN: bucket corpus + queries by sign-LSH signature, exact-rerank
    * within the bucket. Rows-only check (recall vs brute force in tests).
    */
  private val annLsh: Q = (s, d) => {
    val e = T(s, d, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val dims = 64
    val bucketed = e.withColumn("bucket", lshSignature(col("v"), dims))
    val q = bucketed.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("bucket"))
    val joined = bucketed.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", cosine(col("qv"), col("v")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    joined.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("sim"), 4).as("sim"))
  }

  val queries: Map[String, Q] = Map(
    "sim_topk_bruteforce" -> bruteforce,
    "sim_ann_lsh" -> annLsh,
  )

  val oracles: Map[String, String] = Map(
    "sim_topk_bruteforce" ->
      s"""SELECT q_id, neighbor_id, rank, round(sim, 4) AS sim FROM (
         |  SELECT q.vec_id AS q_id, e.vec_id AS neighbor_id,
         |    list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS sim,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC,
         |               e.vec_id) AS rank
         |  FROM embeddings q JOIN embeddings e ON q.vec_id <> e.vec_id
         |  WHERE q.vec_id < $NQueries)
         |WHERE rank <= $K""".stripMargin,
    // sim_ann_lsh: intentionally no oracle — hyperplane hashing is not
    // reproducible in DuckDB; correctness = recall test in SimilaritySpec.
  )
}
