package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the near-dup similarity graph (the LSH pair
  * set): which documents are the HUBS of their duplicate neighborhoods?
  * PageRank's stationary mass is the principled centrality for
  * canonical-document selection — an alternative to
  * `dedup_keep_best`'s longest-doc rule that prefers the doc most
  * connected to its cluster — and the classic iterative-graph workload
  * an analytics engine is expected to run at scale.
  *
  * Arithmetic is ENTIRELY integer (ranks scaled by [[Scale]], damping
  * applied as `(85 · x) div 100`, per-neighbor contributions as
  * `rank div degree`): no float summation order anywhere, so Spark and
  * DuckDB agree bit-for-bit on every intermediate and the oracle
  * hash-matches without rounding guards. Mass bounds: total rank mass
  * stays ≤ nodes · Scale, so a 64-bit sum never overflows below ~10^11
  * participating docs.
  *
  * Scale shape: per iteration one equi-join of the edge list with the
  * rank table and one map-side-combinable sum — the standard
  * distributed PageRank round. Three unrolled rounds keep the single
  * DAG shallow; a production run loops with the checkpoint-per-
  * generation machinery of [[Dedup.connectedComponentsWithRounds]].
  */
object GraphOps {

  type Q = (SparkSession, String) => DataFrame

  private val Scale = 1000000L
  private val Iters = 3

  private val pagerank: Q = (s, d) =>
    pagerankOn(Dedup.lshPairs(s, d).select(col("a_id"), col("b_id")))

  /** The iteration body on an arbitrary undirected `(a_id, b_id)` pair
    * frame — split out so the integer arithmetic is testable on a
    * literal graph.
    */
  private[graft] def pagerankOn(pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val e = edges.join(deg, Seq("src"))
    val r0 = deg.select(col("src").as("doc_id"), lit(Scale).as("rank"))
    (1 to Iters).foldLeft(r0) { (ranks, _) =>
      e.join(ranks.withColumnRenamed("doc_id", "src"), Seq("src"))
        .select(col("dst"), expr("rank DIV deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("sc"))
        .select(col("dst").as("doc_id"),
          (lit(15L * Scale / 100) + expr("(85 * sc) DIV 100")).as("rank"))
    }
  }

  val queries: Map[String, Q] = Map(
    "graph_pagerank" -> pagerank,
  )

  /** The same three integer rounds in SQL over the embedded LSH pair
    * CTE; `//` and `DIV` both truncate toward zero on nonnegative
    * operands, and every operand here is nonnegative.
    */
  private val pagerankOracle: String = {
    val rounds = (1 to Iters).map { i =>
      s"""r$i AS (
         |  SELECT e.dst AS doc_id,
         |    CAST(${15L * Scale / 100} + (85 * sum(r.rank // d.deg)) // 100
         |         AS BIGINT) AS rank
         |  FROM edges e JOIN deg d ON e.src = d.src
         |  JOIN r${i - 1} r ON r.doc_id = e.src
         |  GROUP BY e.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (SELECT a_id, b_id FROM (${Dedup.minhashOracle})),
       |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
       |          UNION ALL
       |          SELECT b_id AS src, a_id AS dst FROM pairs),
       |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
       |r0 AS (SELECT src AS doc_id, CAST($Scale AS BIGINT) AS rank FROM deg),
       |$rounds
       |SELECT doc_id, rank FROM r$Iters""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "graph_pagerank" -> pagerankOracle,
  )
}
