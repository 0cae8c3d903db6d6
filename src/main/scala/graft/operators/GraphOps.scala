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
    // pin the pair derivation ONCE: the unrolled plan references the
    // edge frame once per iteration plus once for degrees, and without
    // materialization each reference re-executes the upstream pipeline
    // (for the registry query, the whole LSH banding — measured 3.5 s
    // vs <1 s pinned at sf0.1)
    val p = Dedup.materialize(pairs.toDF("a_id", "b_id"))
    val edges = p.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(p.select(col("b_id").as("src"), col("a_id").as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val e = Dedup.materialize(edges.join(deg, Seq("src")))
    val r0 = deg.select(col("src").as("doc_id"), lit(Scale).as("rank"))
    (1 to Iters).foldLeft(r0) { (ranks, _) =>
      e.join(ranks.withColumnRenamed("doc_id", "src"), Seq("src"))
        .select(col("dst"), expr("rank DIV deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("sc"))
        .select(col("dst").as("doc_id"),
          (lit(15L * Scale / 100) + expr("(85 * sc) DIV 100")).as("rank"))
    }
  }

  private val triangles: Q = (s, d) =>
    trianglesOn(Dedup.lshPairs(s, d).select(col("a_id"), col("b_id")))

  /** Per-node triangle participation + degree over an undirected,
    * id-normalized (`a_id < b_id`, distinct) pair frame — the local
    * clustering signal (`2·n_tri / (deg·(deg−1))` is derivable from the
    * two integer columns, which stay exactly hash-comparable where the
    * float quotient would not).
    *
    * Enumeration is ORIENTED: every triangle `u<v<w` is found exactly
    * once as two oriented wedge edges `(u,v),(v,w)` closed by `(u,w)` —
    * two equi-joins, no candidate is generated twice, no post-hoc
    * dedup. At 100 TB scale the standard hardening is to orient by
    * DEGREE (low→high, ties by id) instead of id, which bounds each
    * join's fan-out by the graph's arboricity and tames hub skew; id
    * orientation keeps this instance deterministic and oracle-exact,
    * and the join shape is identical.
    */
  private[graft] def trianglesOn(pairs: DataFrame): DataFrame = {
    // the wedge join references the edge frame three times and the
    // degree count twice more — pin the derivation once (see
    // [[pagerankOn]])
    val e = Dedup.materialize(
      pairs.select(col("a_id").as("u"), col("b_id").as("v")))
    val tri = e.join(e.toDF("v", "w"), Seq("v"))
      .join(e.toDF("u", "w"), Seq("u", "w"))
    val corners = tri.select(col("u").as("doc_id"))
      .union(tri.select(col("v").as("doc_id")))
      .union(tri.select(col("w").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_tri"))
    val deg = e.select(col("u").as("doc_id"))
      .union(e.select(col("v").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("deg"))
    deg.join(corners, Seq("doc_id"), "left")
      .select(col("doc_id"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }

  val queries: Map[String, Q] = Map(
    "graph_pagerank" -> pagerank,
    "graph_triangles" -> triangles,
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

  private val trianglesOracle: String =
    s"""WITH pairs AS (SELECT a_id, b_id FROM (${Dedup.minhashOracle})),
       |e AS (SELECT a_id AS u, b_id AS v FROM pairs),
       |tri AS (
       |  SELECT e1.u, e1.v, e2.w
       |  FROM e e1
       |  JOIN (SELECT u AS v, v AS w FROM e) e2 USING (v)
       |  JOIN (SELECT u, v AS w FROM e) e3 USING (u, w)),
       |corners AS (
       |  SELECT u AS doc_id FROM tri
       |  UNION ALL SELECT v FROM tri
       |  UNION ALL SELECT w FROM tri),
       |tc AS (SELECT doc_id, count(*) AS n_tri FROM corners GROUP BY 1),
       |deg AS (
       |  SELECT doc_id, count(*) AS deg
       |  FROM (SELECT u AS doc_id FROM e UNION ALL SELECT v FROM e)
       |  GROUP BY 1)
       |SELECT d.doc_id, d.deg, coalesce(tc.n_tri, 0) AS n_tri
       |FROM deg d LEFT JOIN tc USING (doc_id)""".stripMargin

  val oracles: Map[String, String] = Map(
    "graph_pagerank" -> pagerankOracle,
    "graph_triangles" -> trianglesOracle,
  )
}
