package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._
import graft.Tables.{load => T}

/** Hybrid retrieval: reciprocal-rank fusion (RRF) of a lexical (BM25)
  * ranking and a dense-vector (cosine) ranking over the same document
  * id space — the standard two-tower retrieval shape (keyword recall +
  * semantic recall) every RAG / contamination-triage pipeline runs, and
  * the step that turns the engine's separate BM25 and ANN legs into one
  * ranked answer.
  *
  * Semantics: each leg independently ranks its top-`ListDepth` docs
  * (BM25 over the fixed term query, cosine against the query document's
  * embedding); a doc's fused score is Σ 1/(RrfK + rank) over the lists
  * that contain it (Cormack et al.'s RRF with the conventional k = 60);
  * final answer is the top-`TopK` by fused score. Docs in only one list
  * keep that list's single term — RRF's absent-list contribution is 0.
  *
  * Cross-engine float parity: each term is ONE IEEE division of small
  * exact integers, summed in fixed lex-then-vec order, rounded to 6 —
  * bit-identical in any IEEE-754 engine, so the fused ordering (with
  * the doc_id tie-break) is deterministic and the DuckDB oracle
  * hash-matches. The cosine leg ranks by `round(sim, 4)` on BOTH sides
  * so a last-ulp summation difference cannot flip adjacent ranks; the
  * rounding ties it creates are broken by vec_id identically.
  *
  * Scale shape: the BM25 leg is one token scan + map-side-combinable
  * aggregation (shared with `text_bm25_topk`); the vector leg streams
  * the corpus through a broadcast 1-row query join (no corpus shuffle).
  * Each leg ends in `orderBy(...).limit(ListDepth)` — planned as
  * TakeOrdered: per-partition top-k, never a global sort of the corpus.
  * Only the two ≤ListDepth-row ranked lists meet in the full-outer
  * fusion join, so the fusion itself is O(ListDepth) regardless of
  * corpus size.
  */
object HybridRetrieval {

  type Q = (SparkSession, String) => DataFrame

  private val RrfK = 60 // the conventional RRF damping constant
  private val ListDepth = 50 // per-leg candidate list length
  private val TopK = 20
  private val QueryDoc = 0L // the "more like this" query document

  /** Rank the top-`ListDepth` rows of `scored` by (score desc, id asc)
    * as `(doc_id, <rankName>)`. TakeOrdered prunes distributively; the
    * explicit rank is then a window over the surviving ≤ListDepth rows
    * (single-partition by construction — a constant-size frame).
    */
  private def rankTop(scored: DataFrame, score: String, id: String,
      rankName: String): DataFrame = {
    val top = scored.orderBy(col(score).desc, col(id)).limit(ListDepth)
    top.select(col(id).as("doc_id"),
      row_number().over(Window.orderBy(col(score).desc, col(id)))
        .cast("long").as(rankName))
  }

  /** Lexical leg: the shared BM25 score frame, ranked. */
  private def lexRanked(s: SparkSession, d: String): DataFrame =
    rankTop(TextAnalysis.bm25Scored(s, d), "bm25", "doc_id", "lex_rank")

  /** Vector leg: cosine against the query doc's embedding, ranked.
    * The 1-row query side is broadcast — the corpus never shuffles.
    */
  private def vecRanked(s: SparkSession, d: String): DataFrame = {
    val e = T(s, d, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm2(col("v")))
    val q = e.filter(col("vec_id") === QueryDoc)
      .select(col("v").as("qv"), col("nrm").as("qn"))
    val scored = e.filter(col("vec_id") =!= QueryDoc)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 4)
          .as("sim"))
    rankTop(scored, "sim", "vec_id", "vec_rank")
  }

  /** The fusion body on arbitrary ranked lists — split out so the RRF
    * arithmetic and absent-list semantics are testable with literal
    * frames. Both inputs: `(doc_id, <rank>)`.
    */
  private[graft] def rrfFuse(lex: DataFrame, vec: DataFrame,
      topK: Int): DataFrame =
    lex.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(RrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("vec_rank")), lit(0.0)), 6))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(topK)
      .select(col("doc_id"), col("rrf"), col("lex_rank"), col("vec_rank"))

  private val hybrid: Q = (s, d) =>
    rrfFuse(lexRanked(s, d), vecRanked(s, d), TopK)

  val queries: Map[String, Q] = Map(
    "hybrid_rrf" -> hybrid,
  )

  /** The same two legs and fusion in DuckDB SQL: the BM25 CTEs are the
    * shared [[TextAnalysis.bm25ScoredCtes]] twin; ranks are computed
    * over the full scored sets then LIMITed — identical to rank-within-
    * the-TakeOrdered-prefix because both orderings are total (score
    * desc, id asc).
    */
  private val hybridOracle: String =
    s"""WITH ${TextAnalysis.bm25ScoredCtes},
       |lex AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT)
       |      AS lex_rank
       |  FROM scored ORDER BY bm25 DESC, doc_id LIMIT $ListDepth),
       |vec AS (
       |  SELECT e.vec_id AS doc_id,
       |    CAST(row_number() OVER (ORDER BY
       |      round(list_cosine_similarity(q.embedding::DOUBLE[],
       |                                   e.embedding::DOUBLE[]), 4) DESC,
       |      e.vec_id) AS BIGINT) AS vec_rank
       |  FROM embeddings e JOIN embeddings q
       |    ON q.vec_id = $QueryDoc AND e.vec_id <> $QueryDoc
       |  ORDER BY vec_rank LIMIT $ListDepth)
       |SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
       |  round(coalesce(1.0::DOUBLE / ($RrfK + l.lex_rank), 0.0)
       |      + coalesce(1.0::DOUBLE / ($RrfK + v.vec_rank), 0.0), 6) AS rrf,
       |  l.lex_rank, v.vec_rank
       |FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
       |ORDER BY rrf DESC, doc_id LIMIT $TopK""".stripMargin

  val oracles: Map[String, String] = Map(
    "hybrid_rrf" -> hybridOracle,
  )
}
