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

  private val NdcgKs = Seq(5L, 10L, 20L)
  private val NdcgScale = 1000000L

  /** Discount weights `round(1e6 / log2(i+1))` for positions 1..TopK —
    * computed ONCE here and embedded as integer literals in BOTH
    * engines, so nDCG needs no runtime logarithm anywhere: libm `log`
    * rounding differs across engines (the reason BM25 uses the odds
    * ratio), but a constant table of pre-scaled discounts makes the
    * whole report exact-integer arithmetic.
    */
  private[graft] val ndcgWeights: IndexedSeq[Long] =
    (1 to TopK).map(i => BigDecimal(
      NdcgScale.toDouble / (math.log(i + 1.0) / math.log(2.0)))
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)

  /** Prefix sums `P(0)=0, P(j)=Σ_{i≤j} W_i` — the ideal-DCG lookup:
    * `IDCG@k = P(min(k, n_rel))`.
    */
  private[graft] val ndcgPrefix: IndexedSeq[Long] =
    ndcgWeights.scanLeft(0L)(_ + _)

  /** RETRIEVAL QUALITY as a gate invariant: nDCG@k of the fused
    * ranking, graded by the labeled eval signal the corpus already
    * carries (`embeddings.label` — a fused doc is relevant iff it
    * shares the query doc's label; docs without an embedding row grade
    * 0). Emits `(k, dcg_scaled, idcg_scaled, n_rel)` — all exact
    * integers via the constant discount table, so ranking-quality
    * regressions fail the hash gate the way `sim_*_recall` does for
    * ANN; nDCG itself is the ratio of the two emitted columns.
    *
    * Scale shape: the fused list is ≤TopK rows; labels reach it by one
    * equi-join against the (vec_id, label) projection; the query label
    * and the relevant-total are broadcast single-row scalars (the
    * governance-allowlisted pattern).
    */
  private val hybridNdcg: Q = (s, d) => {
    val fused = hybrid(s, d).select(col("doc_id"), col("rrf"))
    val pos = fused.withColumn("pos", row_number()
      .over(Window.orderBy(col("rrf").desc, col("doc_id"))).cast("long"))
    val lbl = T(s, d, "embeddings").select(col("vec_id"), col("label"))
    val q = lbl.filter(col("vec_id") === QueryDoc)
      .select(col("label").as("q_label"))
    val rel = pos.join(lbl, pos("doc_id") === lbl("vec_id"), "left")
      .crossJoin(broadcast(q))
      .withColumn("rel", when(col("label") === col("q_label"), 1L)
        .otherwise(0L))
      .withColumn("w",
        element_at(typedLit(ndcgWeights), col("pos").cast("int")))
    val nRel = lbl.filter(col("vec_id") =!= QueryDoc)
      .crossJoin(broadcast(q))
      .agg(sum(when(col("label") === col("q_label"), 1L).otherwise(0L))
        .as("n_rel"))
    // ONE aggregate pass computes every k's DCG — a per-k union would
    // re-run the whole fused-ranking lineage once per cutoff (the same
    // inline-lineage trap the PQ training hit); the k rows then unfold
    // from a literal array
    val dcgCols = NdcgKs.map(k =>
      coalesce(sum(when(col("pos") <= k && col("rel") === 1L, col("w"))),
        lit(0L)).as(s"dcg_$k"))
    rel.agg(dcgCols.head, dcgCols.tail: _*)
      .crossJoin(broadcast(nRel))
      .select(explode(array(NdcgKs.map(k =>
        struct(lit(k).as("k"), col(s"dcg_$k").as("dcg_scaled"))): _*))
        .as("kd"), col("n_rel"))
      .select(col("kd.k").as("k"), col("kd.dcg_scaled").as("dcg_scaled"),
        element_at(typedLit(ndcgPrefix),
          least(col("kd.k"), col("n_rel")).cast("int") + 1)
          .as("idcg_scaled"),
        col("n_rel"))
  }

  /** Query-set size and cutoff for the GROUPED eval. */
  private val GroupQueries = 10L
  private val GroupK = 10L

  /** GROUPED RETRIEVAL EVAL — [[hybridNdcg]] extended from one query to
    * a query SET, the shape every real eval harness runs (per-query
    * nDCG, then the MACRO average across queries — a single-query gate
    * can't see a ranker that trades one query's quality for another's).
    * Queries are the registry's standing `vec_id < 10` set; each grades
    * its own vector-leg ranking (cosine desc, id asc — the
    * `sim_topk_*` total order) by shared-label relevance at
    * k = [[GroupK]], through the SAME Scala-generated integer discount
    * table as [[hybridNdcg]] — exact integers end to end. Emits one row
    * per query `(q_id, dcg_scaled, idcg_scaled, n_rel, ndcg_bp)` plus
    * the macro summary row `q_id = −1` (ndcg_bp = integer mean of the
    * per-query basis points), so both the per-group detail and the
    * headline number live in one hash-checked result.
    *
    * Scale shape: the query set broadcasts against one corpus scan
    * (the allowlisted ≤10-row build side); ONE window pass partitioned
    * by q_id ranks every query's candidates simultaneously; the
    * per-query collapse is map-side; the summary row folds ≤10 rows.
    */
  private val ndcgGrouped: Q = (s, d) => {
    val e = T(s, d, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"),
        col("label"))
      .withColumn("nrm", norm2(col("v")))
    val q = e.filter(col("vec_id") < GroupQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("label").as("q_label"))
    val byQ = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    val graded = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim",
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 4))
      .withColumn("pos", row_number().over(byQ).cast("long"))
      .withColumn("rel",
        when(col("label") === col("q_label"), 1L).otherwise(0L))
    val perQ = graded.groupBy(col("q_id"))
      .agg(
        coalesce(sum(when(col("pos") <= GroupK && col("rel") === 1L,
          element_at(typedLit(ndcgWeights), col("pos").cast("int")))),
          lit(0L)).as("dcg_scaled"),
        sum(col("rel")).as("n_rel"))
      .withColumn("idcg_scaled",
        element_at(typedLit(ndcgPrefix),
          least(lit(GroupK), col("n_rel")).cast("int") + 1))
      .withColumn("ndcg_bp", expr(
        "CASE WHEN idcg_scaled > 0 THEN dcg_scaled * 10000 div idcg_scaled" +
          " ELSE 0 END"))
      .select(col("q_id"), col("dcg_scaled"), col("idcg_scaled"),
        col("n_rel"), col("ndcg_bp"))
    val summary = perQ.agg(
      lit(-1L).as("q_id"),
      sum(col("dcg_scaled")).as("dcg_scaled"),
      sum(col("idcg_scaled")).as("idcg_scaled"),
      sum(col("n_rel")).as("n_rel"),
      expr("sum(ndcg_bp) div count(1)").as("ndcg_bp"))
    perQ.unionByName(summary)
  }

  /** The vector leg's per-query candidate ranking over the standing
    * query set — shared by [[ndcgGrouped]] (which grades it raw) and
    * [[hybridNdcgGrouped]] (which fuses it with the lexical leg).
    * `(q_id, doc_id, vec_rank ≤ [[ListDepth]])`, self excluded.
    */
  private def vecRankedGrouped(s: SparkSession, d: String): DataFrame = {
    val e = T(s, d, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm2(col("v")))
    val q = e.filter(col("vec_id") < GroupQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val byQ = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim",
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 4))
      .withColumn("vec_rank", row_number().over(byQ).cast("long"))
      .filter(col("vec_rank") <= ListDepth)
      .select(col("q_id"), col("vec_id").as("doc_id"), col("vec_rank"))
  }

  /** GROUPED HYBRID EVAL — the full two-tower pipeline per query: each
    * standing query document retrieves with its OWN BM25 term set
    * ([[TextAnalysis.bm25GroupedScored]] — the inverted-index leg) AND
    * its own embedding (the vector leg), the two rank lists fuse by
    * RRF per query, and the fused ranking grades as nDCG@[[GroupK]]
    * with the macro summary row — [[hybridNdcg]] generalized from one
    * broadcast query to the query set, which is what an actual ranker
    * rollout gates on (per-query detail catches the query the fusion
    * hurt; the macro mean is the headline). Output shape and integer
    * discipline are [[ndcgGrouped]]'s exactly, so the two reports
    * read side by side: fused-vs-vector-only is one diff.
    *
    * Scale shape: both legs are per-query TOP-[[ListDepth]] lists
    * (window-pruned), fusion is a (q_id, doc_id) full-outer equi-join
    * on ≤ 2·ListDepth rows per query, and grading joins labels by one
    * broadcast — nothing after the legs touches the corpus.
    */
  /** The lexical leg's per-query ranking — shared by
    * [[hybridNdcgGrouped]] and the damping sweep.
    */
  private def lexRankedGrouped(s: SparkSession, d: String): DataFrame = {
    val lexW = Window.partitionBy(col("q_id"))
      .orderBy(col("bm25_scaled").desc, col("doc_id"))
    TextAnalysis.bm25GroupedScored(s, d)
      .withColumn("lex_rank", row_number().over(lexW).cast("long"))
      .filter(col("lex_rank") <= ListDepth)
      .select(col("q_id"), col("doc_id"), col("lex_rank"))
  }

  private val hybridNdcgGrouped: Q = (s, d) => {
    val lex = lexRankedGrouped(s, d)
    val vec = vecRankedGrouped(s, d)
    val fusedW = Window.partitionBy(col("q_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    val fused = lex.join(vec, Seq("q_id", "doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(RrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("vec_rank")), lit(0.0)), 6))
      .withColumn("pos", row_number().over(fusedW).cast("long"))
      .filter(col("pos") <= TopK)
    val lbl = T(s, d, "embeddings").select(col("vec_id"), col("label"))
    val q = lbl.filter(col("vec_id") < GroupQueries)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"))
    val graded = fused
      .join(lbl, fused("doc_id") === lbl("vec_id"), "left")
      .join(q, Seq("q_id"))
      .withColumn("rel",
        when(col("label") === col("q_label"), 1L).otherwise(0L))
    // per-query relevant totals come from the corpus, not the fused list
    val nRel = lbl.crossJoin(broadcast(q.withColumnRenamed("q_id", "qq")))
      .filter(col("vec_id") =!= col("qq"))
      .groupBy(col("qq").as("q_id"))
      .agg(sum(when(col("label") === col("q_label"), 1L).otherwise(0L))
        .as("n_rel"))
    val perQ = graded.groupBy(col("q_id"))
      .agg(coalesce(sum(when(col("pos") <= GroupK && col("rel") === 1L,
        element_at(typedLit(ndcgWeights), col("pos").cast("int")))),
        lit(0L)).as("dcg_scaled"))
      .join(nRel, Seq("q_id"))
      .withColumn("idcg_scaled",
        element_at(typedLit(ndcgPrefix),
          least(lit(GroupK), col("n_rel")).cast("int") + 1))
      .withColumn("ndcg_bp", expr(
        "CASE WHEN idcg_scaled > 0 THEN dcg_scaled * 10000 div idcg_scaled" +
          " ELSE 0 END"))
      .select(col("q_id"), col("dcg_scaled"), col("idcg_scaled"),
        col("n_rel"), col("ndcg_bp"))
    val summary = perQ.agg(
      lit(-1L).as("q_id"),
      sum(col("dcg_scaled")).as("dcg_scaled"),
      sum(col("idcg_scaled")).as("idcg_scaled"),
      sum(col("n_rel")).as("n_rel"),
      expr("sum(ndcg_bp) div count(1)").as("ndcg_bp"))
    perQ.unionByName(summary)
  }

  /** Damping constants swept by [[rrfSweep]] — k = 60 is the
    * conventional default ([[RrfK]]), so that row must equal the
    * grouped face's macro summary (cross-checked in spec).
    */
  private val RrfSweepKs = Seq(10L, 30L, 60L, 120L)

  /** THE RRF-DAMPING TUNING CURVE — the fifth tuning-curve gate (after
    * nprobe, LSH banding, BPE merges, session gaps): macro nDCG@
    * [[GroupK]] of the fused grouped ranking at damping k ∈
    * {10, 30, 60, 120}. Small k lets a single #1 rank dominate the
    * fusion; large k flattens both legs toward equal votes — the exact
    * trade a fusion rollout tunes, now a hash-checked curve instead of
    * a notebook. Both legs are computed ONCE and the damping fans out
    * by explode on the joined lists (the `sim_ann_tradeoff` move), so
    * the sweep costs one fusion pass, not four pipelines. The k = 60
    * row must restate `hybrid_ndcg_grouped`'s macro summary
    * (spec-pinned cross-check).
    */
  private val rrfSweep: Q = (s, d) => {
    val legs = lexRankedGrouped(s, d)
      .join(vecRankedGrouped(s, d), Seq("q_id", "doc_id"), "full_outer")
      .withColumn("rrf_k", explode(array(RrfSweepKs.map(lit(_)): _*)))
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (col("rrf_k") + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (col("rrf_k") + col("vec_rank")), lit(0.0)),
        6))
    val byKQ = Window.partitionBy(col("rrf_k"), col("q_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    val topped = legs
      .withColumn("pos", row_number().over(byKQ).cast("long"))
      .filter(col("pos") <= GroupK)
    val lbl = T(s, d, "embeddings").select(col("vec_id"), col("label"))
    val q = lbl.filter(col("vec_id") < GroupQueries)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"))
    val nRel = lbl.crossJoin(broadcast(q.withColumnRenamed("q_id", "qq")))
      .filter(col("vec_id") =!= col("qq"))
      .groupBy(col("qq").as("q_id"))
      .agg(sum(when(col("label") === col("q_label"), 1L).otherwise(0L))
        .as("n_rel"))
    val perQ = topped
      .join(lbl, topped("doc_id") === lbl("vec_id"), "left")
      .join(q, Seq("q_id"))
      .withColumn("rel",
        when(col("label") === col("q_label"), 1L).otherwise(0L))
      .groupBy(col("rrf_k"), col("q_id"))
      .agg(coalesce(sum(when(col("rel") === 1L,
        element_at(typedLit(ndcgWeights), col("pos").cast("int")))),
        lit(0L)).as("dcg_scaled"))
      .join(nRel, Seq("q_id"))
      .withColumn("idcg_scaled",
        element_at(typedLit(ndcgPrefix),
          least(lit(GroupK), col("n_rel")).cast("int") + 1))
      .withColumn("ndcg_bp", expr(
        "CASE WHEN idcg_scaled > 0 THEN dcg_scaled * 10000 div idcg_scaled" +
          " ELSE 0 END"))
    perQ.groupBy(col("rrf_k"))
      .agg(sum(col("dcg_scaled")).as("sum_dcg_scaled"),
        expr("sum(ndcg_bp) div count(1)").as("macro_ndcg_bp"))
  }

  /** Frozen integer weights of the linear RERANKER — the cross-encoder
    * SLOT in the retrieval stack: production rerankers score each
    * retrieved candidate with a better (slower) model and reorder; the
    * engine's plumbing for that step is exercised here with a frozen
    * linear model over the legs' rank features (the calibrated-LTR
    * baseline a rollout compares the cross-encoder against), the
    * `text_quality_classifier` discipline — frozen integer weights, no
    * training loop in the gate. Features per candidate: the rank GAIN
    * of each leg (`ListDepth + 1 − rank`, 0 when absent — higher is
    * better, absent is weakest) and the both-legs agreement bit (two
    * independent retrievers agreeing is the strongest relevance
    * evidence the legs alone carry).
    */
  private val RerankWLex = 10L
  private val RerankWVec = 14L
  private val RerankWBoth = 300L

  /** RERANK EVAL — nDCG@[[GroupK]] of the frozen linear reranker over
    * the fused candidate pool, per query NEXT TO the RRF baseline on
    * the SAME pool, plus the delta — the report a reranker rollout
    * actually gates on ("did reordering the same candidates help, and
    * on which queries did it hurt"). Emits
    * `(q_id, rerank_ndcg_bp, rrf_ndcg_bp, delta_bp)` per query and the
    * macro summary row `q_id = −1`; the baseline column must restate
    * `hybrid_ndcg_grouped`'s per-query `ndcg_bp` exactly
    * (spec-pinned cross-check — same pool, same grading).
    *
    * Scale shape: the pool is ≤ 2·[[ListDepth]] rows per query (the
    * legs' window-pruned lists full-outer joined); both rankings are
    * ONE window pass each over that pool; grading is the grouped
    * eval's broadcast-label joins. Nothing touches the corpus after
    * the legs.
    */
  private val hybridRerank: Q = (s, d) => {
    val pool = lexRankedGrouped(s, d)
      .join(vecRankedGrouped(s, d), Seq("q_id", "doc_id"), "full_outer")
      .withColumn("score",
        lit(RerankWLex) *
          coalesce(lit(ListDepth + 1L) - col("lex_rank"), lit(0L)) +
        lit(RerankWVec) *
          coalesce(lit(ListDepth + 1L) - col("vec_rank"), lit(0L)) +
        when(col("lex_rank").isNotNull && col("vec_rank").isNotNull,
          lit(RerankWBoth)).otherwise(lit(0L)))
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(RrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("vec_rank")), lit(0.0)), 6))
    val byScore = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("doc_id"))
    val byRrf = Window.partitionBy(col("q_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    val positioned = pool
      .withColumn("pos_rr", row_number().over(byScore).cast("long"))
      .withColumn("pos_rrf", row_number().over(byRrf).cast("long"))
      .filter(col("pos_rr") <= GroupK || col("pos_rrf") <= GroupK)
    val lbl = T(s, d, "embeddings").select(col("vec_id"), col("label"))
    val q = lbl.filter(col("vec_id") < GroupQueries)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"))
    val graded = positioned
      .join(lbl, positioned("doc_id") === lbl("vec_id"), "left")
      .join(q, Seq("q_id"))
      .withColumn("rel",
        when(col("label") === col("q_label"), 1L).otherwise(0L))
    val nRel = lbl.crossJoin(broadcast(q.withColumnRenamed("q_id", "qq")))
      .filter(col("vec_id") =!= col("qq"))
      .groupBy(col("qq").as("q_id"))
      .agg(sum(when(col("label") === col("q_label"), 1L).otherwise(0L))
        .as("n_rel"))
    val perQ = graded.groupBy(col("q_id"))
      .agg(
        coalesce(sum(when(col("pos_rr") <= GroupK && col("rel") === 1L,
          element_at(typedLit(ndcgWeights), col("pos_rr").cast("int")))),
          lit(0L)).as("rr_dcg"),
        coalesce(sum(when(col("pos_rrf") <= GroupK && col("rel") === 1L,
          element_at(typedLit(ndcgWeights), col("pos_rrf").cast("int")))),
          lit(0L)).as("rrf_dcg"))
      .join(nRel, Seq("q_id"))
      .withColumn("idcg",
        element_at(typedLit(ndcgPrefix),
          least(lit(GroupK), col("n_rel")).cast("int") + 1))
      .withColumn("rerank_ndcg_bp", expr(
        "CASE WHEN idcg > 0 THEN rr_dcg * 10000 div idcg ELSE 0 END"))
      .withColumn("rrf_ndcg_bp", expr(
        "CASE WHEN idcg > 0 THEN rrf_dcg * 10000 div idcg ELSE 0 END"))
      .select(col("q_id"), col("rerank_ndcg_bp"), col("rrf_ndcg_bp"),
        (col("rerank_ndcg_bp") - col("rrf_ndcg_bp")).as("delta_bp"))
    val summary = perQ.agg(
      lit(-1L).as("q_id"),
      expr("sum(rerank_ndcg_bp) div count(1)").as("rerank_ndcg_bp"),
      expr("sum(rrf_ndcg_bp) div count(1)").as("rrf_ndcg_bp"))
      .withColumn("delta_bp",
        col("rerank_ndcg_bp") - col("rrf_ndcg_bp"))
    perQ.unionByName(summary)
  }

  val queries: Map[String, Q] = Map(
    "hybrid_rrf" -> hybrid,
    "hybrid_ndcg" -> hybridNdcg,
    "retrieval_ndcg_grouped" -> ndcgGrouped,
    "hybrid_ndcg_grouped" -> hybridNdcgGrouped,
    "hybrid_rrf_sweep" -> rrfSweep,
    "hybrid_rerank" -> hybridRerank,
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

  /** The nDCG report in SQL: the fused CTE is [[hybridOracle]] itself;
    * the discount and prefix tables are the SAME Scala-generated
    * integer literals the Spark side embeds, so the report is pure
    * integer arithmetic in both engines.
    */
  private val ndcgOracle: String = {
    val wts = ndcgWeights.zipWithIndex
      .map { case (w, i) => s"(${i + 1}, $w)" }.mkString(", ")
    val pre = ndcgPrefix.zipWithIndex
      .map { case (p, j) => s"($j, $p)" }.mkString(", ")
    val ks = NdcgKs.map(k => s"($k)").mkString(", ")
    s"""WITH fused AS ($hybridOracle),
       |p AS (SELECT doc_id,
       |        CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT)
       |          AS pos
       |      FROM fused),
       |ql AS (SELECT label FROM embeddings WHERE vec_id = $QueryDoc),
       |r AS (SELECT p.pos,
       |        CASE WHEN e.label = (SELECT label FROM ql) THEN 1 ELSE 0 END
       |          AS rel
       |      FROM p LEFT JOIN embeddings e ON e.vec_id = p.doc_id),
       |wts(pos, w) AS (VALUES $wts),
       |pre(j, s) AS (VALUES $pre),
       |nrel AS (SELECT count(CASE WHEN label = (SELECT label FROM ql)
       |                     THEN 1 END) AS n_rel
       |         FROM embeddings WHERE vec_id <> $QueryDoc),
       |ks(k) AS (VALUES $ks)
       |SELECT CAST(k AS BIGINT) AS k,
       |  CAST((SELECT coalesce(sum(w), 0) FROM r JOIN wts ON wts.pos = r.pos
       |        WHERE r.pos <= k AND r.rel = 1) AS BIGINT) AS dcg_scaled,
       |  CAST((SELECT s FROM pre
       |        WHERE j = least(k, (SELECT n_rel FROM nrel))) AS BIGINT)
       |    AS idcg_scaled,
       |  (SELECT n_rel FROM nrel) AS n_rel
       |FROM ks""".stripMargin
  }

  /** The grouped eval in SQL — the same broadcast-query-set ranking,
    * the same literal discount/prefix tables, the same summary-row
    * UNION; integer `//` on nonnegative operands throughout.
    */
  private val ndcgGroupedOracle: String = {
    val wts = ndcgWeights.zipWithIndex
      .map { case (w, i) => s"(${i + 1}, $w)" }.mkString(", ")
    val pre = ndcgPrefix.zipWithIndex
      .map { case (p, j) => s"($j, $p)" }.mkString(", ")
    s"""WITH g AS (
       |  SELECT q.vec_id AS q_id, e.vec_id,
       |    CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |      round(list_cosine_similarity(q.embedding::DOUBLE[],
       |                                   e.embedding::DOUBLE[]), 4) DESC,
       |      e.vec_id) AS BIGINT) AS pos,
       |    CASE WHEN e.label = q.label THEN 1 ELSE 0 END AS rel
       |  FROM embeddings q JOIN embeddings e
       |    ON q.vec_id < $GroupQueries AND e.vec_id <> q.vec_id),
       |wts(pos, w) AS (VALUES $wts),
       |pre(j, s) AS (VALUES $pre),
       |perq AS (
       |  SELECT g.q_id,
       |    CAST(coalesce(sum(CASE WHEN g.pos <= $GroupK AND g.rel = 1
       |      THEN w.w END), 0) AS BIGINT) AS dcg_scaled,
       |    CAST(sum(g.rel) AS BIGINT) AS n_rel
       |  FROM g LEFT JOIN wts w ON w.pos = g.pos
       |  GROUP BY 1),
       |scored AS (
       |  SELECT q_id, dcg_scaled,
       |    CAST((SELECT s FROM pre
       |          WHERE j = least($GroupK, n_rel)) AS BIGINT)
       |      AS idcg_scaled,
       |    n_rel
       |  FROM perq),
       |rated AS (
       |  SELECT q_id, dcg_scaled, idcg_scaled, n_rel,
       |    CAST(CASE WHEN idcg_scaled > 0
       |      THEN dcg_scaled * 10000 // idcg_scaled ELSE 0 END AS BIGINT)
       |      AS ndcg_bp
       |  FROM scored)
       |SELECT * FROM rated
       |UNION ALL
       |SELECT CAST(-1 AS BIGINT), CAST(sum(dcg_scaled) AS BIGINT),
       |  CAST(sum(idcg_scaled) AS BIGINT), CAST(sum(n_rel) AS BIGINT),
       |  CAST(sum(ndcg_bp) // count(*) AS BIGINT)
       |FROM rated""".stripMargin
  }

  /** The grouped hybrid eval in SQL: the inverted-index BM25 CTEs
    * (the `text_bm25_grouped` derivation verbatim), the per-query
    * cosine leg, RRF fusion, and the grading tail of
    * [[ndcgGroupedOracle]] — same literal tables, same summary row.
    */
  private val hybridNdcgGroupedOracle: String = {
    val wts = ndcgWeights.zipWithIndex
      .map { case (w, i) => s"(${i + 1}, $w)" }.mkString(", ")
    val pre = ndcgPrefix.zipWithIndex
      .map { case (p, j) => s"($j, $p)" }.mkString(", ")
    val gq = TextAnalysis.Bm25GroupQueries
    val gs = TextAnalysis.Bm25GroupScale
    s"""WITH tok AS (SELECT doc_id,
       |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
       |  FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |stats AS (SELECT count(*) AS n, sum(dl) AS total FROM dl),
       |qt AS (SELECT doc_id AS q_id, term FROM tf WHERE doc_id < $gq),
       |sc AS (
       |  SELECT q.q_id, t.doc_id,
       |    CAST(sum(((2*s.n - 2*f.df + 1) * 22 * t.tf * s.total * $gs) //
       |      ((2*f.df + 1) * (10*t.tf*s.total + 3*s.total + 9*l.dl*s.n)))
       |      AS BIGINT) AS bm25_scaled
       |  FROM qt q JOIN tf t ON t.term = q.term AND t.doc_id <> q.q_id
       |  JOIN df f ON f.term = q.term
       |  JOIN dl l ON l.doc_id = t.doc_id
       |  CROSS JOIN stats s
       |  GROUP BY 1, 2),
       |lex AS (
       |  SELECT q_id, doc_id, lex_rank FROM (
       |    SELECT q_id, doc_id,
       |      CAST(row_number() OVER (PARTITION BY q_id
       |        ORDER BY bm25_scaled DESC, doc_id) AS BIGINT) AS lex_rank
       |    FROM sc) WHERE lex_rank <= $ListDepth),
       |vec AS (
       |  SELECT q_id, doc_id, vec_rank FROM (
       |    SELECT q.vec_id AS q_id, e.vec_id AS doc_id,
       |      CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        round(list_cosine_similarity(q.embedding::DOUBLE[],
       |                                     e.embedding::DOUBLE[]), 4)
       |          DESC, e.vec_id) AS BIGINT) AS vec_rank
       |    FROM embeddings q JOIN embeddings e
       |      ON q.vec_id < $GroupQueries AND e.vec_id <> q.vec_id)
       |  WHERE vec_rank <= $ListDepth),
       |fused AS (
       |  SELECT coalesce(l.q_id, v.q_id) AS q_id,
       |    coalesce(l.doc_id, v.doc_id) AS doc_id,
       |    round(coalesce(1.0::DOUBLE / ($RrfK + l.lex_rank), 0.0)
       |        + coalesce(1.0::DOUBLE / ($RrfK + v.vec_rank), 0.0), 6)
       |      AS rrf
       |  FROM lex l FULL OUTER JOIN vec v
       |    ON v.q_id = l.q_id AND v.doc_id = l.doc_id),
       |topped AS (
       |  SELECT q_id, doc_id, pos FROM (
       |    SELECT q_id, doc_id,
       |      CAST(row_number() OVER (PARTITION BY q_id
       |        ORDER BY rrf DESC, doc_id) AS BIGINT) AS pos
       |    FROM fused) WHERE pos <= $TopK),
       |ql AS (SELECT vec_id AS q_id, label AS q_label FROM embeddings
       |       WHERE vec_id < $GroupQueries),
       |graded AS (
       |  SELECT t.q_id, t.pos,
       |    CASE WHEN e.label = ql.q_label THEN 1 ELSE 0 END AS rel
       |  FROM topped t JOIN ql ON ql.q_id = t.q_id
       |  LEFT JOIN embeddings e ON e.vec_id = t.doc_id),
       |wts(pos, w) AS (VALUES $wts),
       |pre(j, s) AS (VALUES $pre),
       |nrel AS (
       |  SELECT ql.q_id,
       |    CAST(count(CASE WHEN e.label = ql.q_label THEN 1 END) AS BIGINT)
       |      AS n_rel
       |  FROM ql JOIN embeddings e ON e.vec_id <> ql.q_id
       |  GROUP BY 1),
       |perq AS (
       |  SELECT g.q_id,
       |    CAST(coalesce(sum(CASE WHEN g.pos <= $GroupK AND g.rel = 1
       |      THEN w.w END), 0) AS BIGINT) AS dcg_scaled
       |  FROM graded g LEFT JOIN wts w ON w.pos = g.pos
       |  GROUP BY 1),
       |scored2 AS (
       |  SELECT p.q_id, p.dcg_scaled,
       |    CAST((SELECT s FROM pre
       |          WHERE j = least($GroupK, n.n_rel)) AS BIGINT)
       |      AS idcg_scaled,
       |    n.n_rel
       |  FROM perq p JOIN nrel n ON n.q_id = p.q_id),
       |rated AS (
       |  SELECT q_id, dcg_scaled, idcg_scaled, n_rel,
       |    CAST(CASE WHEN idcg_scaled > 0
       |      THEN dcg_scaled * 10000 // idcg_scaled ELSE 0 END AS BIGINT)
       |      AS ndcg_bp
       |  FROM scored2)
       |SELECT * FROM rated
       |UNION ALL
       |SELECT CAST(-1 AS BIGINT), CAST(sum(dcg_scaled) AS BIGINT),
       |  CAST(sum(idcg_scaled) AS BIGINT), CAST(sum(n_rel) AS BIGINT),
       |  CAST(sum(ndcg_bp) // count(*) AS BIGINT)
       |FROM rated""".stripMargin
  }

  /** The damping sweep in SQL — the grouped-hybrid CTEs with the
    * damping constants fanned out by a VALUES join before fusion.
    */
  private val rrfSweepOracle: String = {
    val wts = ndcgWeights.zipWithIndex
      .map { case (w, i) => s"(${i + 1}, $w)" }.mkString(", ")
    val pre = ndcgPrefix.zipWithIndex
      .map { case (p, j) => s"($j, $p)" }.mkString(", ")
    val ks = RrfSweepKs.map(k => s"($k)").mkString(", ")
    val gq = TextAnalysis.Bm25GroupQueries
    val gs = TextAnalysis.Bm25GroupScale
    s"""WITH tok AS (SELECT doc_id,
       |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
       |  FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |stats AS (SELECT count(*) AS n, sum(dl) AS total FROM dl),
       |qt AS (SELECT doc_id AS q_id, term FROM tf WHERE doc_id < $gq),
       |sc AS (
       |  SELECT q.q_id, t.doc_id,
       |    CAST(sum(((2*s.n - 2*f.df + 1) * 22 * t.tf * s.total * $gs) //
       |      ((2*f.df + 1) * (10*t.tf*s.total + 3*s.total + 9*l.dl*s.n)))
       |      AS BIGINT) AS bm25_scaled
       |  FROM qt q JOIN tf t ON t.term = q.term AND t.doc_id <> q.q_id
       |  JOIN df f ON f.term = q.term
       |  JOIN dl l ON l.doc_id = t.doc_id
       |  CROSS JOIN stats s
       |  GROUP BY 1, 2),
       |lex AS (
       |  SELECT q_id, doc_id, lex_rank FROM (
       |    SELECT q_id, doc_id,
       |      CAST(row_number() OVER (PARTITION BY q_id
       |        ORDER BY bm25_scaled DESC, doc_id) AS BIGINT) AS lex_rank
       |    FROM sc) WHERE lex_rank <= $ListDepth),
       |vec AS (
       |  SELECT q_id, doc_id, vec_rank FROM (
       |    SELECT q.vec_id AS q_id, e.vec_id AS doc_id,
       |      CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        round(list_cosine_similarity(q.embedding::DOUBLE[],
       |                                     e.embedding::DOUBLE[]), 4)
       |          DESC, e.vec_id) AS BIGINT) AS vec_rank
       |    FROM embeddings q JOIN embeddings e
       |      ON q.vec_id < $GroupQueries AND e.vec_id <> q.vec_id)
       |  WHERE vec_rank <= $ListDepth),
       |ks(rrf_k) AS (VALUES $ks),
       |fused AS (
       |  SELECT ks.rrf_k, coalesce(l.q_id, v.q_id) AS q_id,
       |    coalesce(l.doc_id, v.doc_id) AS doc_id,
       |    round(coalesce(1.0::DOUBLE / (ks.rrf_k + l.lex_rank), 0.0)
       |        + coalesce(1.0::DOUBLE / (ks.rrf_k + v.vec_rank), 0.0), 6)
       |      AS rrf
       |  FROM lex l FULL OUTER JOIN vec v
       |    ON v.q_id = l.q_id AND v.doc_id = l.doc_id
       |  CROSS JOIN ks),
       |topped AS (
       |  SELECT rrf_k, q_id, doc_id, pos FROM (
       |    SELECT rrf_k, q_id, doc_id,
       |      CAST(row_number() OVER (PARTITION BY rrf_k, q_id
       |        ORDER BY rrf DESC, doc_id) AS BIGINT) AS pos
       |    FROM fused) WHERE pos <= $GroupK),
       |ql AS (SELECT vec_id AS q_id, label AS q_label FROM embeddings
       |       WHERE vec_id < $GroupQueries),
       |wts(pos, w) AS (VALUES $wts),
       |pre(j, s) AS (VALUES $pre),
       |nrel AS (
       |  SELECT ql.q_id,
       |    CAST(count(CASE WHEN e.label = ql.q_label THEN 1 END) AS BIGINT)
       |      AS n_rel
       |  FROM ql JOIN embeddings e ON e.vec_id <> ql.q_id
       |  GROUP BY 1),
       |perq AS (
       |  SELECT t.rrf_k, t.q_id,
       |    CAST(coalesce(sum(CASE WHEN e.label = ql.q_label
       |      THEN w.w END), 0) AS BIGINT) AS dcg_scaled
       |  FROM topped t JOIN ql ON ql.q_id = t.q_id
       |  LEFT JOIN embeddings e ON e.vec_id = t.doc_id
       |  LEFT JOIN wts w ON w.pos = t.pos
       |  GROUP BY 1, 2),
       |rated AS (
       |  SELECT p.rrf_k, p.q_id, p.dcg_scaled,
       |    CAST((SELECT s FROM pre
       |          WHERE j = least($GroupK, n.n_rel)) AS BIGINT)
       |      AS idcg_scaled
       |  FROM perq p JOIN nrel n ON n.q_id = p.q_id)
       |SELECT CAST(rrf_k AS BIGINT) AS rrf_k,
       |  CAST(sum(dcg_scaled) AS BIGINT) AS sum_dcg_scaled,
       |  CAST(sum(CASE WHEN idcg_scaled > 0
       |    THEN dcg_scaled * 10000 // idcg_scaled ELSE 0 END)
       |    // count(*) AS BIGINT) AS macro_ndcg_bp
       |FROM rated GROUP BY 1""".stripMargin
  }

  /** The rerank eval in SQL — the grouped-hybrid leg CTEs verbatim,
    * the frozen linear score and the RRF baseline over the same pool,
    * both gradings through the same literal discount/prefix tables.
    */
  private val rerankOracle: String = {
    val wts = ndcgWeights.zipWithIndex
      .map { case (w, i) => s"(${i + 1}, $w)" }.mkString(", ")
    val pre = ndcgPrefix.zipWithIndex
      .map { case (p, j) => s"($j, $p)" }.mkString(", ")
    val gq = TextAnalysis.Bm25GroupQueries
    val gs = TextAnalysis.Bm25GroupScale
    s"""WITH tok AS (SELECT doc_id,
       |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
       |  FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |stats AS (SELECT count(*) AS n, sum(dl) AS total FROM dl),
       |qt AS (SELECT doc_id AS q_id, term FROM tf WHERE doc_id < $gq),
       |sc AS (
       |  SELECT q.q_id, t.doc_id,
       |    CAST(sum(((2*s.n - 2*f.df + 1) * 22 * t.tf * s.total * $gs) //
       |      ((2*f.df + 1) * (10*t.tf*s.total + 3*s.total + 9*l.dl*s.n)))
       |      AS BIGINT) AS bm25_scaled
       |  FROM qt q JOIN tf t ON t.term = q.term AND t.doc_id <> q.q_id
       |  JOIN df f ON f.term = q.term
       |  JOIN dl l ON l.doc_id = t.doc_id
       |  CROSS JOIN stats s
       |  GROUP BY 1, 2),
       |lex AS (
       |  SELECT q_id, doc_id, lex_rank FROM (
       |    SELECT q_id, doc_id,
       |      CAST(row_number() OVER (PARTITION BY q_id
       |        ORDER BY bm25_scaled DESC, doc_id) AS BIGINT) AS lex_rank
       |    FROM sc) WHERE lex_rank <= $ListDepth),
       |vec AS (
       |  SELECT q_id, doc_id, vec_rank FROM (
       |    SELECT q.vec_id AS q_id, e.vec_id AS doc_id,
       |      CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        round(list_cosine_similarity(q.embedding::DOUBLE[],
       |                                     e.embedding::DOUBLE[]), 4)
       |          DESC, e.vec_id) AS BIGINT) AS vec_rank
       |    FROM embeddings q JOIN embeddings e
       |      ON q.vec_id < $GroupQueries AND e.vec_id <> q.vec_id)
       |  WHERE vec_rank <= $ListDepth),
       |pool AS (
       |  SELECT coalesce(l.q_id, v.q_id) AS q_id,
       |    coalesce(l.doc_id, v.doc_id) AS doc_id,
       |    $RerankWLex * coalesce($ListDepth + 1 - l.lex_rank, 0)
       |      + $RerankWVec * coalesce($ListDepth + 1 - v.vec_rank, 0)
       |      + CASE WHEN l.lex_rank IS NOT NULL AND v.vec_rank IS NOT NULL
       |             THEN $RerankWBoth ELSE 0 END AS score,
       |    round(coalesce(1.0::DOUBLE / ($RrfK + l.lex_rank), 0.0)
       |        + coalesce(1.0::DOUBLE / ($RrfK + v.vec_rank), 0.0), 6)
       |      AS rrf
       |  FROM lex l FULL OUTER JOIN vec v
       |    ON v.q_id = l.q_id AND v.doc_id = l.doc_id),
       |positioned AS (
       |  SELECT q_id, doc_id,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY score DESC, doc_id) AS BIGINT) AS pos_rr,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY rrf DESC, doc_id) AS BIGINT) AS pos_rrf
       |  FROM pool),
       |ql AS (SELECT vec_id AS q_id, label AS q_label FROM embeddings
       |       WHERE vec_id < $GroupQueries),
       |wts(pos, w) AS (VALUES $wts),
       |pre(j, s) AS (VALUES $pre),
       |nrel AS (
       |  SELECT ql.q_id,
       |    CAST(count(CASE WHEN e.label = ql.q_label THEN 1 END) AS BIGINT)
       |      AS n_rel
       |  FROM ql JOIN embeddings e ON e.vec_id <> ql.q_id
       |  GROUP BY 1),
       |graded AS (
       |  SELECT p.q_id, p.pos_rr, p.pos_rrf,
       |    CASE WHEN e.label = ql.q_label THEN 1 ELSE 0 END AS rel
       |  FROM positioned p JOIN ql ON ql.q_id = p.q_id
       |  LEFT JOIN embeddings e ON e.vec_id = p.doc_id),
       |perq AS (
       |  SELECT g.q_id,
       |    CAST(coalesce(sum(CASE WHEN g.pos_rr <= $GroupK AND g.rel = 1
       |      THEN wr.w END), 0) AS BIGINT) AS rr_dcg,
       |    CAST(coalesce(sum(CASE WHEN g.pos_rrf <= $GroupK AND g.rel = 1
       |      THEN wf.w END), 0) AS BIGINT) AS rrf_dcg
       |  FROM graded g
       |  LEFT JOIN wts wr ON wr.pos = g.pos_rr
       |  LEFT JOIN wts wf ON wf.pos = g.pos_rrf
       |  GROUP BY 1),
       |rated AS (
       |  SELECT p.q_id,
       |    CAST(CASE WHEN i.s > 0 THEN p.rr_dcg * 10000 // i.s
       |         ELSE 0 END AS BIGINT) AS rerank_ndcg_bp,
       |    CAST(CASE WHEN i.s > 0 THEN p.rrf_dcg * 10000 // i.s
       |         ELSE 0 END AS BIGINT) AS rrf_ndcg_bp
       |  FROM perq p JOIN nrel n ON n.q_id = p.q_id
       |  JOIN pre i ON i.j = least($GroupK, n.n_rel))
       |SELECT q_id, rerank_ndcg_bp, rrf_ndcg_bp,
       |  rerank_ndcg_bp - rrf_ndcg_bp AS delta_bp
       |FROM rated
       |UNION ALL
       |SELECT CAST(-1 AS BIGINT),
       |  CAST(sum(rerank_ndcg_bp) // count(*) AS BIGINT),
       |  CAST(sum(rrf_ndcg_bp) // count(*) AS BIGINT),
       |  CAST(sum(rerank_ndcg_bp) // count(*)
       |    - sum(rrf_ndcg_bp) // count(*) AS BIGINT)
       |FROM rated""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "hybrid_rrf" -> hybridOracle,
    "hybrid_ndcg" -> ndcgOracle,
    "retrieval_ndcg_grouped" -> ndcgGroupedOracle,
    "hybrid_ndcg_grouped" -> hybridNdcgGroupedOracle,
    "hybrid_rrf_sweep" -> rrfSweepOracle,
    "hybrid_rerank" -> rerankOracle,
  )
}
