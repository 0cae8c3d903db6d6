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
  private[graft] def vecRankedGrouped(s: SparkSession, d: String): DataFrame = {
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
  private[graft] def lexRankedGrouped(s: SparkSession, d: String): DataFrame = {
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

  /** Pin the face's final (tiny — per-query report rows) frame, then
    * release the large intermediate checkpoints it was derived from.
    * Verify's `spark.catalog.clearCache()` does not free localCheckpoint
    * storage, so a full registry sweep would otherwise accumulate every
    * pinned postings/pool frame in the block manager for the process
    * lifetime. The returned frame is itself pinned (the final generation
    * is the caller's to keep — the [[Dedup.releaseCheckpoint]] contract);
    * it is ≤ a few report rows per query, negligible forever.
    */
  private def pinAndRelease(result: DataFrame,
      intermediates: Seq[DataFrame]): DataFrame = {
    val out = Dedup.materialize(result)
    // INVARIANT — eager-materialize-before-release: releaseCheckpoint on
    // a localCheckpoint'd frame truncates lineage AND drops the blocks,
    // so any surviving reference that re-executes later fails with
    // "checkpoint block not found" instead of recomputing. Releasing is
    // only safe because `out` is fully materialized first (its analyzed
    // plan is the pinned LogicalRDD — possibly under the union/project
    // the caller wrapped it in, but every leaf is a LogicalRDD, never a
    // live reference into an intermediate). Assert that here so a future
    // reordering fails loudly in every spec instead of flaking at scale.
    val leaves = out.queryExecution.analyzed.collectLeaves()
    require(leaves.nonEmpty && leaves.forall(
        _.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]),
      "pinAndRelease: result must be eagerly materialized (all leaves " +
        "LogicalRDD) before its intermediates are released")
    intermediates.foreach(Dedup.releaseCheckpoint)
    out
  }

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
      // pin the fused pool: both window passes and the grading joins
      // otherwise re-derive the two legs' full postings lineage (12
      // nested loops / 58 exchanges in the r13 audit)
      .localCheckpoint(true)
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
    pinAndRelease(perQ.unionByName(summary), Seq(pool))
  }

  /** RANKER A/B EVAL — nDCG@[[GroupK]] of the Dirichlet
    * query-likelihood ranker ([[TextAnalysis.qlmRanked]]) next to the
    * BM25 ranker on the SAME corpus and label relevance, per query plus
    * the macro summary row and the delta — the report that decides a
    * lexical-ranker swap ("did QL help, and on which queries did it
    * hurt"), the [[hybridRerank]] shape applied to two independent
    * retrieval passes instead of one reordered pool. Emits
    * `(q_id, qlm_ndcg_bp, bm25_ndcg_bp, delta_bp)` per query and
    * `q_id = −1` for the macro means; the BM25 column restates the
    * grading of `text_bm25_grouped`'s ranking exactly.
    *
    * Scale shape: both legs are window-pruned per-query top-k lists
    * over the shared postings scan; grading is the broadcast ≤10-row
    * label joins; everything after the legs touches ≤ 2·k rows per
    * query.
    */
  private val qlmNdcg: Q = (s, d) => {
    val lbl = T(s, d, "embeddings").select(col("vec_id"), col("label"))
    val q = lbl.filter(col("vec_id") < GroupQueries)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"))
    def legDcg(ranked: DataFrame, out: String): DataFrame =
      ranked.filter(col("rank") <= GroupK)
        .join(lbl, ranked("doc_id") === lbl("vec_id"), "left")
        .join(broadcast(q), Seq("q_id"))
        .groupBy(col("q_id"))
        .agg(coalesce(sum(when(col("label") === col("q_label"),
          element_at(typedLit(ndcgWeights), col("rank").cast("int")))),
          lit(0L)).as(out))
    val nRel = lbl.crossJoin(broadcast(q.withColumnRenamed("q_id", "qq")))
      .filter(col("vec_id") =!= col("qq"))
      .groupBy(col("qq").as("q_id"))
      .agg(sum(when(col("label") === col("q_label"), 1L).otherwise(0L))
        .as("n_rel"))
    // the QL leg arrives pre-truncated at QlmTopK while the grading cuts
    // at GroupK: a knob change that pushed GroupK past QlmTopK would
    // silently shrink this face's DCG basis while the oracle kept
    // grading the full top-GroupK — fail at the use site instead
    require(TextAnalysis.QlmTopK >= GroupK,
      s"qlm leg truncates at ${TextAnalysis.QlmTopK} < GroupK=$GroupK — " +
        "the face's DCG basis would desynchronize from its oracle")
    // pin the postings frames once — the two ranker legs otherwise
    // re-derive the token scan through plan lineage (16 nested loops /
    // 78 exchanges in the r13 audit)
    val (tf0, dlf0, dff0, stats0) = TextAnalysis.bm25Postings(s, d)
    val Seq(tf, dlf, dff, stats) =
      Seq(tf0, dlf0, dff0, stats0).map(_.localCheckpoint(true))
    // pin the two ranked legs too: each is <= 10 queries x top-k rows,
    // and grading otherwise re-derives each leg's scoring lineage
    // (incl. its bounded broadcasts) through every downstream join
    val qlmLeg = TextAnalysis.qlmRankedFrom(tf, dlf, stats)
      .localCheckpoint(true)
    val bm25Leg = TextAnalysis.bm25GroupedRanked(
      TextAnalysis.bm25GroupedScoredFrom(tf, dlf, dff, stats))
      .localCheckpoint(true)
    val perQ = legDcg(qlmLeg, "qlm_dcg")
      .join(legDcg(bm25Leg, "bm25_dcg"), Seq("q_id"))
      .join(nRel, Seq("q_id"))
      .withColumn("idcg", element_at(typedLit(ndcgPrefix),
        least(lit(GroupK), col("n_rel")).cast("int") + 1))
      .withColumn("qlm_ndcg_bp", expr(
        "CASE WHEN idcg > 0 THEN qlm_dcg * 10000 div idcg ELSE 0 END"))
      .withColumn("bm25_ndcg_bp", expr(
        "CASE WHEN idcg > 0 THEN bm25_dcg * 10000 div idcg ELSE 0 END"))
      .select(col("q_id"), col("qlm_ndcg_bp"), col("bm25_ndcg_bp"),
        (col("qlm_ndcg_bp") - col("bm25_ndcg_bp")).as("delta_bp"))
    val summary = perQ.agg(
      lit(-1L).as("q_id"),
      expr("sum(qlm_ndcg_bp) div count(1)").as("qlm_ndcg_bp"),
      expr("sum(bm25_ndcg_bp) div count(1)").as("bm25_ndcg_bp"))
      .withColumn("delta_bp", col("qlm_ndcg_bp") - col("bm25_ndcg_bp"))
    pinAndRelease(perQ.unionByName(summary),
      Seq(tf, dlf, dff, stats, qlmLeg, bm25Leg))
  }

  /** MMR picks per query — the diversified short-list length. */
  private[graft] val MmrK = 5
  /** λ = 0.7 as integer weights: `mmr = 7·rel_norm − 3·sim`, with rel
    * min-max normalized per query and the whole combination carried at
    * the common integer denominator 10·R0·10⁴ (see [[mmrPool]]).
    * A double λ-combination looked safe (three IEEE ops on identical
    * doubles) but `round(·, 6)` landed on a decimal half-way point at
    * sf0.001 where Spark (BigDecimal of the shortest string) and
    * DuckDB (exact binary) disagree — so the combination, like every
    * other ranking in the registry, is exact integers: the rounded
    * inputs ARE 6-/4-decimal fixed-point values, recovered exactly by
    * `round(x·10^s)` (never half-way — the double sits ~1e-10 from the
    * integer).
    */
  private[graft] val MmrLamN = 7L
  private[graft] val MmrLamD = 3L

  /** DIVERSIFIED TOP-K (MMR) — Carbonell & Goldstein's maximal
    * marginal relevance over the fused candidate pool: greedily pick
    * [[MmrK]] docs, each maximizing `λ·rel − (1−λ)·max sim-to-picked`,
    * the de-facto answer-diversification step of every RAG stack (the
    * fused list is relevance-sorted but redundant — near-duplicate
    * candidates crowd out coverage; MMR trades a little relevance for
    * novelty). rel is the candidate's RRF score on the pool, min-max
    * normalized per query (see [[mmrPool]]), sim the
    * rounded pairwise cosine between candidate embeddings — both
    * recovered as exact fixed-point integers (see [[MmrLamN]]) so the
    * λ-combination, the max-penalty, and every argmax comparison are
    * integer arithmetic with the doc_id tie-break: the greedy
    * trajectory is bit-identical in DuckDB and the whole K-step
    * selection hash-checks.
    *
    * Scale shape: the pool is ≤ [[TopK]] rows per query and the
    * pairwise sim table ≤ TopK² — BOTH constant-size per query and
    * materialized once (`localCheckpoint`) before the loop, so the
    * [[MmrK]] greedy steps are joins over constant-size frames; the
    * corpus is touched only by the legs. The K-step sequential
    * dependency is inherent to MMR (each pick conditions the next);
    * what matters at 100 TB is that NO step touches the corpus.
    */
  /** The fused candidate pool MMR diversifies: the grouped RRF list cut
    * to [[TopK]], relevance recovered as exact micro-unit integers.
    * `private[graft]` so the spec can replay the greedy reference over
    * the same frame.
    */
  /** [[mmrPool]]'s plan BEFORE the pin — separated so plan governance
    * can audit the pool build's join shapes (pin-and-release truncates
    * the face's registry plan to checkpoint reads).
    */
  private[graft] def mmrPoolPlan(s: SparkSession, d: String): DataFrame = {
    val fusedW = Window.partitionBy(col("q_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    val ext = Window.partitionBy(col("q_id"))
    lexRankedGrouped(s, d)
      .join(vecRankedGrouped(s, d), Seq("q_id", "doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(RrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("vec_rank")), lit(0.0)), 6))
      .withColumn("pos", row_number().over(fusedW).cast("long"))
      .filter(col("pos") <= TopK)
      .select(col("q_id"), col("doc_id"),
        round(col("rrf") * lit(1000000d)).cast("long").as("rel_i"))
      // min-max normalize relevance PER QUERY over the cut pool (the
      // textbook MMR precondition — raw RRF magnitudes are ~30× smaller
      // than the [-1,1] cosine span, so an unnormalized combination is
      // driven almost entirely by anti-similarity): rel_norm =
      // (rel−min)/R with R = max−min, carried as exact integers by
      // cross-multiplication — rel_c = (rel−min)·10⁴ and the per-query
      // scale R0 = max(R, 1) multiply into the λ-combination so no
      // division ever happens (R0=1 when the pool's RRF ties flat,
      // where rel_norm is 0 for everyone and MMR degenerates to pure
      // diversity — the right limit).
      .withColumn("rel_c",
        (col("rel_i") - min(col("rel_i")).over(ext)) * lit(10000L))
      .withColumn("r0", greatest(
        max(col("rel_i")).over(ext) - min(col("rel_i")).over(ext), lit(1L)))
  }

  private[graft] def mmrPool(s: SparkSession, d: String): DataFrame =
    mmrPoolPlan(s, d).localCheckpoint(true)

  /** Pairwise rounded cosine between pool candidates of the same query,
    * as 1e-4 fixed-point integers — ≤ TopK² rows per query.
    * [[mmrSims]]'s pre-pin plan, audited by plan governance.
    */
  private[graft] def mmrSimsPlan(s: SparkSession, d: String,
      pool: DataFrame): DataFrame = {
    val e = T(s, d, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm2(col("v")))
    val ea = e.select(col("vec_id").as("doc_id"), col("v").as("va"),
      col("nrm").as("na"))
    val eb = e.select(col("vec_id").as("d2"), col("v").as("vb"),
      col("nrm").as("nb"))
    pool.select(col("q_id"), col("doc_id"))
      .join(pool.select(col("q_id"), col("doc_id").as("d2")), Seq("q_id"))
      .filter(col("doc_id") =!= col("d2"))
      .join(ea, Seq("doc_id"))
      .join(eb, Seq("d2"))
      .select(col("q_id"), col("doc_id"), col("d2"),
        round(round(dot(col("va"), col("vb")) / (col("na") * col("nb")),
          4) * lit(10000d)).cast("long").as("sim_i"))
  }

  private[graft] def mmrSims(s: SparkSession, d: String,
      pool: DataFrame): DataFrame =
    mmrSimsPlan(s, d, pool).localCheckpoint(true)

  private val hybridMmr: Q = (s, d) => {
    val pool = mmrPool(s, d)
    val sims = mmrSims(s, d, pool)
    val empty = pool.filter(lit(false))
      .select(col("q_id"), col("doc_id"), lit(0L).as("mmr_scaled"),
        lit(0L).as("pick_pos"))
    val byMmr = Window.partitionBy(col("q_id"))
      .orderBy(col("mmr_scaled").desc, col("doc_id"))
    val picked = (1 to MmrK).foldLeft(empty) { (sel, k) =>
      val pen = sims
        .join(sel.select(col("q_id"), col("doc_id").as("d2")),
          Seq("q_id", "d2"))
        .groupBy(col("q_id"), col("doc_id"))
        .agg(max(col("sim_i")).as("mx"))
      val pick = pool
        .join(sel.select(col("q_id"), col("doc_id")),
          Seq("q_id", "doc_id"), "left_anti")
        .join(pen, Seq("q_id", "doc_id"), "left")
        // λ·rel_norm − (1−λ)·sim, everything multiplied by the common
        // denominator 10·R0·10⁴: rel_c = (rel−min)·10⁴ covers the R0
        // division, and the 1e-4 fixed-point sim multiplies by R0 —
        // exact integers per query (the scale factor varies by query,
        // which is fine: MMR ranks within a query)
        .withColumn("mmr_scaled",
          lit(MmrLamN) * col("rel_c") -
            lit(MmrLamD) * coalesce(col("mx"), lit(0L)) * col("r0"))
        .withColumn("rn", row_number().over(byMmr))
        .filter(col("rn") === 1)
        .select(col("q_id"), col("doc_id"), col("mmr_scaled"),
          lit(k.toLong).as("pick_pos"))
      // the new generation is pinned EAGERLY before its predecessor is
      // released (the seed `empty` is lineage-only — release is a no-op)
      val next = sel.unionByName(pick).localCheckpoint(true)
      Dedup.releaseCheckpoint(sel)
      next
    }
    // the final selection IS the face's tiny pinned result; only the
    // pool and the pairwise-sim table need releasing
    Seq(pool, sims).foreach(Dedup.releaseCheckpoint)
    picked
  }

  /** Feedback depth (docs mined for expansion terms) and expansion
    * width (terms added per query) of the PRF face.
    */
  private[graft] val PrfFeedback = 3L
  private[graft] val PrfTerms = 5L

  /** Integer term weights of the expanded query: original terms count
    * double, mined terms single — the RM3 interpolation (λ ≈ 2/3)
    * expressed in exact integers so the re-scored sum stays
    * order-independent under parallel aggregation.
    */
  private[graft] val PrfWOrig = 2L
  private[graft] val PrfWExp = 1L

  /** PSEUDO-RELEVANCE-FEEDBACK QUERY EXPANSION (RM3-style) — the
    * recall lever of the lexical leg: run each standing query's BM25,
    * assume its top-[[PrfFeedback]] docs are relevant, mine the
    * [[PrfTerms]] heaviest NEW terms from them (summed tf, original
    * terms excluded), re-retrieve with the expanded weighted query
    * (original terms ×[[PrfWOrig]], mined ×[[PrfWExp]]), and grade
    * expanded-vs-base nDCG@[[GroupK]] per query plus the macro summary
    * — the report a query-expansion rollout gates on, the
    * [[hybridRerank]] shape. Emits `(q_id, prf_ndcg_bp, base_ndcg_bp,
    * delta_bp)`; `q_id = −1` is the macro row.
    *
    * Determinism: term scores are the exact-integer odds-ratio BM25
    * ([[TextAnalysis.bm25TermScore]]); expansion mining ranks by
    * `(Σtf desc, term)` — integer weight with the binary-collation
    * term tie-break, identical in both engines; the weighted re-score
    * sums integers. Scale shape: ONE token scan yields the postings
    * ([[TextAnalysis.bm25Postings]]); both retrieval passes reach
    * candidates by the term EQUI-join (fan-out = posting sizes, never
    * the corpus); mining joins [[PrfFeedback]] doc ids per query back
    * to the tf frame by doc equi-join; grading is the grouped eval's
    * broadcast-label joins.
    */
  /** The PRF weighted retrieval pass over `(q_id, term, w)` — extracted
    * so plan governance can audit its join shapes pre-checkpoint (the
    * face's registry plan truncates to checkpoint reads).
    */
  private[graft] def prfScored(qterms: DataFrame, tf: DataFrame,
      dl: DataFrame, dfT: DataFrame, stats: DataFrame): DataFrame =
    qterms.join(tf, Seq("term"))
      .filter(col("doc_id") =!= col("q_id"))
      .join(dfT, Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("ts", TextAnalysis.bm25TermScore)
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("w") * col("ts")).as("score"))

  /** The standing queries' own terms — the PRF base vocabulary. */
  private[graft] def prfQueryTerms(tf: DataFrame): DataFrame =
    tf.filter(col("doc_id") < TextAnalysis.Bm25GroupQueries)
      .select(col("doc_id").as("q_id"), col("term"))

  private def prfByScore = Window.partitionBy(col("q_id"))
    .orderBy(col("score").desc, col("doc_id"))

  /** The ranked unweighted base retrieval — pre-pin, governance-audited. */
  private[graft] def prfBasePlan(qt: DataFrame, tf: DataFrame,
      dl: DataFrame, dfT: DataFrame, stats: DataFrame): DataFrame =
    prfScored(qt.withColumn("w", lit(1L)), tf, dl, dfT, stats)
      .withColumn("pos", row_number().over(prfByScore).cast("long"))

  /** Expansion-term mining over the base ranking's feedback docs —
    * pre-pin, governance-audited.
    */
  private[graft] def prfExpansion(base: DataFrame, tf: DataFrame,
      qt: DataFrame): DataFrame = {
    val byEw = Window.partitionBy(col("q_id"))
      .orderBy(col("ew").desc, col("term"))
    base.filter(col("pos") <= PrfFeedback)
      .select(col("q_id"), col("doc_id"))
      .join(tf, Seq("doc_id"))
      .groupBy(col("q_id"), col("term"))
      .agg(sum(col("tf")).as("ew"))
      .join(qt, Seq("q_id", "term"), "left_anti")
      .withColumn("tr", row_number().over(byEw))
      .filter(col("tr") <= PrfTerms)
      .select(col("q_id"), col("term"))
  }

  private val hybridPrf: Q = (s, d) => {
    // pin the postings frames once (the BPE-curve lesson, SURVEY §13):
    // both retrieval passes, the expansion mining, and the grading all
    // re-derived the token scan through plan lineage — 16 nested
    // loops / 122 exchanges of pure re-derivation in the r13 audit
    val (tf0, dl0, df0, st0) = TextAnalysis.bm25Postings(s, d)
    val Seq(tf, dl, dfT, stats) =
      Seq(tf0, dl0, df0, st0).map(_.localCheckpoint(true))
    val qt = prfQueryTerms(tf)
    val byScore = prfByScore
    // base feeds BOTH the expansion mining and its own grading leg
    val base = prfBasePlan(qt, tf, dl, dfT, stats).localCheckpoint(true)
    val expansion = prfExpansion(base, tf, qt)
    val prf = prfScored(qt.withColumn("w", lit(PrfWOrig)).unionByName(
        expansion.withColumn("w", lit(PrfWExp))), tf, dl, dfT, stats)
      .withColumn("pos", row_number().over(byScore).cast("long"))
    // grade both rankings at GroupK — the rerank face's label joins
    val lbl = T(s, d, "embeddings").select(col("vec_id"), col("label"))
    val q = lbl.filter(col("vec_id") < GroupQueries)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"))
    def dcgOf(ranked: DataFrame, out: String): DataFrame = {
      val cut = ranked.filter(col("pos") <= GroupK)
      cut.join(lbl, cut("doc_id") === lbl("vec_id"), "left")
        .join(q, Seq("q_id"))
        .groupBy(col("q_id"))
        .agg(coalesce(sum(when(col("label") === col("q_label"),
          element_at(typedLit(ndcgWeights), col("pos").cast("int")))),
          lit(0L)).as(out))
    }
    val nRel = lbl.crossJoin(broadcast(q.withColumnRenamed("q_id", "qq")))
      .filter(col("vec_id") =!= col("qq"))
      .groupBy(col("qq").as("q_id"))
      .agg(sum(when(col("label") === col("q_label"), 1L).otherwise(0L))
        .as("n_rel"))
    val perQ = nRel
      .join(dcgOf(prf, "prf_dcg"), Seq("q_id"), "left")
      .join(dcgOf(base, "base_dcg"), Seq("q_id"), "left")
      .withColumn("idcg",
        element_at(typedLit(ndcgPrefix),
          least(lit(GroupK), col("n_rel")).cast("int") + 1))
      .withColumn("prf_ndcg_bp", expr("CASE WHEN idcg > 0 THEN" +
        " coalesce(prf_dcg, 0) * 10000 div idcg ELSE 0 END"))
      .withColumn("base_ndcg_bp", expr("CASE WHEN idcg > 0 THEN" +
        " coalesce(base_dcg, 0) * 10000 div idcg ELSE 0 END"))
      .select(col("q_id"), col("prf_ndcg_bp"), col("base_ndcg_bp"),
        (col("prf_ndcg_bp") - col("base_ndcg_bp")).as("delta_bp"))
    val summary = perQ.agg(
      lit(-1L).as("q_id"),
      expr("sum(prf_ndcg_bp) div count(1)").as("prf_ndcg_bp"),
      expr("sum(base_ndcg_bp) div count(1)").as("base_ndcg_bp"))
      .withColumn("delta_bp", col("prf_ndcg_bp") - col("base_ndcg_bp"))
    pinAndRelease(perQ.unionByName(summary),
      Seq(tf, dl, dfT, stats, base))
  }

  /** Positives and hard negatives mined per query for the contrastive
    * training set.
    */
  private[graft] val TripPos = 2L
  private[graft] val TripNeg = 5L

  /** HARD-NEGATIVE TRIPLE MINING — the training-data prep step of
    * every dense-retriever distillation run (DPR/ColBERT style): from
    * each standing query's BM25 top-[[ListDepth]], take the
    * [[TripPos]] best-ranked docs that share the query's label
    * (positives) and the [[TripNeg]] best-ranked docs that do NOT
    * (BM25-confusable = hard negatives — lexically similar yet wrong,
    * exactly the examples a contrastive loss needs), and emit every
    * (positive × negative) pair with ranks and the signed score margin
    * — negative margins are the prize: the retriever currently ranks
    * that negative ABOVE the positive. Docs with no embedding row
    * grade unlabeled and mine as negatives (conservative: unknown ≠
    * relevant).
    *
    * Determinism: ranks are windows over exact-integer BM25 with the
    * doc_id tie-break; the margin is integer subtraction. Scale shape:
    * the inverted-index retrieval pass ([[TextAnalysis
    * .bm25GroupedScored]]), label grading by one equi-join against the
    * (vec_id, label) projection, and the pos × neg fan-out is
    * per-query ≤ [[TripPos]]·[[TripNeg]] rows by an equi-join on q_id
    * — nothing quadratic in the corpus.
    */
  private val retrievalTriples: Q = (s, d) => {
    val byScore = Window.partitionBy(col("q_id"))
      .orderBy(col("bm25_scaled").desc, col("doc_id"))
    val ranked = TextAnalysis.bm25GroupedScored(s, d)
      .withColumn("rank", row_number().over(byScore).cast("long"))
      .filter(col("rank") <= ListDepth)
    val lbl = T(s, d, "embeddings").select(col("vec_id"), col("label"))
    val q = lbl.filter(col("vec_id") < GroupQueries)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"))
    val graded = ranked
      .join(lbl, ranked("doc_id") === lbl("vec_id"), "left")
      .join(q, Seq("q_id"))
      .withColumn("rel",
        when(col("label") === col("q_label"), 1L).otherwise(0L))
    val byRank = Window.partitionBy(col("q_id")).orderBy(col("rank"))
    val pos = graded.filter(col("rel") === 1L)
      .withColumn("pr", row_number().over(byRank))
      .filter(col("pr") <= TripPos)
      .select(col("q_id"), col("doc_id").as("pos_id"),
        col("rank").as("pos_rank"), col("bm25_scaled").as("pos_score"))
    val neg = graded.filter(col("rel") === 0L)
      .withColumn("nr", row_number().over(byRank))
      .filter(col("nr") <= TripNeg)
      .select(col("q_id"), col("doc_id").as("neg_id"),
        col("rank").as("neg_rank"), col("bm25_scaled").as("neg_score"))
    pos.join(neg, Seq("q_id"))
      .select(col("q_id"), col("pos_id"), col("neg_id"),
        col("pos_rank"), col("neg_rank"),
        (col("pos_score") - col("neg_score")).as("margin_scaled"))
  }

  val queries: Map[String, Q] = Map(
    "hybrid_rrf" -> hybrid,
    "hybrid_ndcg" -> hybridNdcg,
    "retrieval_ndcg_grouped" -> ndcgGrouped,
    "hybrid_ndcg_grouped" -> hybridNdcgGrouped,
    "hybrid_rrf_sweep" -> rrfSweep,
    "hybrid_rerank" -> hybridRerank,
    "hybrid_mmr" -> hybridMmr,
    "retrieval_qlm_ndcg" -> qlmNdcg,
    "hybrid_prf" -> hybridPrf,
    "retrieval_triples" -> retrievalTriples,
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

  /** Both rankings restated from the shared token CTEs — the QL leg is
    * `text_qlm_topk`'s oracle verbatim (fixed-order float products of
    * int64-exact IEEE divisions), the BM25 leg `text_bm25_grouped`'s —
    * then the rerank oracle's grading (discount/prefix literal tables,
    * label joins, bp division) applied to each leg independently.
    */
  private val qlmNdcgOracle: String = {
    val wts = ndcgWeights.zipWithIndex
      .map { case (w, i) => s"(${i + 1}, $w)" }.mkString(", ")
    val pre = ndcgPrefix.zipWithIndex
      .map { case (p, j) => s"($j, $p)" }.mkString(", ")
    val gq = TextAnalysis.Bm25GroupQueries
    val gs = TextAnalysis.Bm25GroupScale
    val mu = TextAnalysis.QlmMu
    val nqt = TextAnalysis.QlmQueryTerms
    val scale = TextAnalysis.QlmScale
    s"""WITH tok AS (SELECT doc_id,
       |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
       |  FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |stats AS (SELECT count(*) AS n, sum(dl) AS total FROM dl),
       |cf AS (SELECT term, sum(tf) AS cf FROM tf GROUP BY 1),
       |qt3 AS (SELECT doc_id AS q_id, term FROM (
       |    SELECT doc_id, term, row_number() OVER (PARTITION BY doc_id
       |        ORDER BY tf DESC, term) AS tr
       |    FROM tf WHERE doc_id < $gq) WHERE tr <= $nqt),
       |p AS (SELECT q.q_id, l.doc_id, q.term,
       |    CAST(COALESCE(t.tf, 0) * s.total + $mu * c.cf AS DOUBLE) /
       |      CAST((l.dl + $mu) * s.total AS DOUBLE) AS p
       |  FROM qt3 q JOIN cf c USING (term)
       |  CROSS JOIN dl l
       |  CROSS JOIN stats s
       |  LEFT JOIN tf t ON t.term = q.term AND t.doc_id = l.doc_id
       |  WHERE l.doc_id <> q.q_id),
       |lp AS (SELECT q_id, doc_id, list(p ORDER BY term) AS ps
       |       FROM p GROUP BY 1, 2),
       |qlmr AS (SELECT q_id, doc_id,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY ql_scaled DESC, doc_id) AS BIGINT) AS rank
       |  FROM (SELECT q_id, doc_id, CAST(floor(
       |      ps[1] * COALESCE(ps[2], 1.0) * COALESCE(ps[3], 1.0) * $scale)
       |      AS BIGINT) AS ql_scaled FROM lp)),
       |qtb AS (SELECT doc_id AS q_id, term FROM tf WHERE doc_id < $gq),
       |sc AS (
       |  SELECT q.q_id, t.doc_id,
       |    CAST(sum(((2*s.n - 2*f.df + 1) * 22 * t.tf * s.total * $gs) //
       |      ((2*f.df + 1) * (10*t.tf*s.total + 3*s.total + 9*l.dl*s.n)))
       |      AS BIGINT) AS bm25_scaled
       |  FROM qtb q JOIN tf t ON t.term = q.term AND t.doc_id <> q.q_id
       |  JOIN df f ON f.term = q.term
       |  JOIN dl l ON l.doc_id = t.doc_id
       |  CROSS JOIN stats s
       |  GROUP BY 1, 2),
       |bmr AS (SELECT q_id, doc_id,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY bm25_scaled DESC, doc_id) AS BIGINT) AS rank
       |  FROM sc),
       |qlab AS (SELECT vec_id AS q_id, label AS q_label FROM embeddings
       |         WHERE vec_id < $GroupQueries),
       |wts(pos, w) AS (VALUES $wts),
       |pre(j, s) AS (VALUES $pre),
       |nrel AS (
       |  SELECT qlab.q_id,
       |    CAST(count(CASE WHEN e.label = qlab.q_label THEN 1 END)
       |      AS BIGINT) AS n_rel
       |  FROM qlab JOIN embeddings e ON e.vec_id <> qlab.q_id
       |  GROUP BY 1),
       |qdcg AS (
       |  SELECT r.q_id, CAST(coalesce(sum(CASE WHEN e.label = qlab.q_label
       |      THEN wt.w END), 0) AS BIGINT) AS qlm_dcg
       |  FROM qlmr r JOIN qlab ON qlab.q_id = r.q_id
       |  LEFT JOIN embeddings e ON e.vec_id = r.doc_id
       |  LEFT JOIN wts wt ON wt.pos = r.rank
       |  WHERE r.rank <= $GroupK GROUP BY 1),
       |bdcg AS (
       |  SELECT r.q_id, CAST(coalesce(sum(CASE WHEN e.label = qlab.q_label
       |      THEN wt.w END), 0) AS BIGINT) AS bm25_dcg
       |  FROM bmr r JOIN qlab ON qlab.q_id = r.q_id
       |  LEFT JOIN embeddings e ON e.vec_id = r.doc_id
       |  LEFT JOIN wts wt ON wt.pos = r.rank
       |  WHERE r.rank <= $GroupK GROUP BY 1),
       |rated AS (
       |  SELECT qd.q_id,
       |    CAST(CASE WHEN i.s > 0 THEN qd.qlm_dcg * 10000 // i.s
       |         ELSE 0 END AS BIGINT) AS qlm_ndcg_bp,
       |    CAST(CASE WHEN i.s > 0 THEN bd.bm25_dcg * 10000 // i.s
       |         ELSE 0 END AS BIGINT) AS bm25_ndcg_bp
       |  FROM qdcg qd JOIN bdcg bd ON bd.q_id = qd.q_id
       |  JOIN nrel n ON n.q_id = qd.q_id
       |  JOIN pre i ON i.j = least($GroupK, n.n_rel))
       |SELECT q_id, qlm_ndcg_bp, bm25_ndcg_bp,
       |  qlm_ndcg_bp - bm25_ndcg_bp AS delta_bp
       |FROM rated
       |UNION ALL
       |SELECT CAST(-1 AS BIGINT),
       |  CAST(sum(qlm_ndcg_bp) // count(*) AS BIGINT),
       |  CAST(sum(bm25_ndcg_bp) // count(*) AS BIGINT),
       |  CAST(sum(qlm_ndcg_bp) // count(*)
       |    - sum(bm25_ndcg_bp) // count(*) AS BIGINT)
       |FROM rated""".stripMargin
  }

  /** The greedy MMR trajectory unrolled to [[MmrK]] CTE steps (K is a
    * fixed constant, so the unroll is mechanical): step k anti-joins
    * the picked set `s(k-1)`, prices every remaining candidate with
    * the max-sim penalty against it, and picks the per-query argmax
    * with the doc_id tie-break — exactly the Spark loop's joins. The
    * pool/sims CTEs restate the grouped fused pool and the pairwise
    * rounded cosine.
    */
  private val mmrOracle: String = {
    val gq = TextAnalysis.Bm25GroupQueries
    val gs = TextAnalysis.Bm25GroupScale
    val steps = (1 to MmrK).map { k =>
      s"""c$k AS (
         |  SELECT t.q_id, t.doc_id,
         |    $MmrLamN * t.rel_c
         |      - $MmrLamD * coalesce(pen.mx, 0) * t.r0 AS mmr_scaled
         |  FROM topped t
         |  LEFT JOIN (SELECT m.q_id, m.doc_id, max(m.sim_i) AS mx
         |             FROM sims m JOIN s${k - 1} s
         |               ON s.q_id = m.q_id AND s.doc_id = m.d2
         |             GROUP BY 1, 2) pen
         |    ON pen.q_id = t.q_id AND pen.doc_id = t.doc_id
         |  WHERE NOT EXISTS (SELECT 1 FROM s${k - 1} s
         |                    WHERE s.q_id = t.q_id
         |                      AND s.doc_id = t.doc_id)),
         |p$k AS (
         |  SELECT q_id, doc_id, CAST(mmr_scaled AS BIGINT) AS mmr_scaled,
         |    CAST($k AS BIGINT) AS pick_pos
         |  FROM (SELECT q_id, doc_id, mmr_scaled, row_number() OVER (
         |          PARTITION BY q_id ORDER BY mmr_scaled DESC, doc_id) AS rn
         |        FROM c$k) WHERE rn = 1),
         |s$k AS (SELECT q_id, doc_id FROM s${k - 1}
         |        UNION ALL SELECT q_id, doc_id FROM p$k)""".stripMargin
    }.mkString(",\n")
    val finalSel = (1 to MmrK)
      .map(k => s"SELECT * FROM p$k").mkString("\nUNION ALL ")
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
       |topped0 AS (
       |  SELECT q_id, doc_id,
       |    CAST(round(rrf * 1000000) AS BIGINT) AS rel_i
       |  FROM (
       |    SELECT q_id, doc_id, rrf,
       |      CAST(row_number() OVER (PARTITION BY q_id
       |        ORDER BY rrf DESC, doc_id) AS BIGINT) AS pos
       |    FROM fused) WHERE pos <= $TopK),
       |topped AS (
       |  SELECT q_id, doc_id,
       |    (rel_i - min(rel_i) OVER (PARTITION BY q_id)) * 10000 AS rel_c,
       |    greatest(max(rel_i) OVER (PARTITION BY q_id)
       |      - min(rel_i) OVER (PARTITION BY q_id), 1) AS r0
       |  FROM topped0),
       |sims AS (
       |  SELECT a.q_id, a.doc_id, b.doc_id AS d2,
       |    CAST(round(round(list_cosine_similarity(
       |      ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 4) * 10000)
       |      AS BIGINT) AS sim_i
       |  FROM topped a JOIN topped b
       |    ON a.q_id = b.q_id AND a.doc_id <> b.doc_id
       |  JOIN embeddings ea ON ea.vec_id = a.doc_id
       |  JOIN embeddings eb ON eb.vec_id = b.doc_id),
       |s0(q_id, doc_id) AS (SELECT q_id, doc_id FROM topped WHERE FALSE),
       |$steps
       |$finalSel""".stripMargin
  }

  /** The PRF pipeline in DuckDB: the shared postings CTEs, a weighted
    * generalization of the sc scorer (w = 1 base pass, 2/1 expanded
    * pass), expansion-term mining as the (Σtf desc, term) top-5 with
    * original terms anti-joined out, and the rerank oracle's grading
    * tail over both rankings.
    */
  private val prfOracle: String = {
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
       |base AS (
       |  SELECT q_id, doc_id, pos FROM (
       |    SELECT q_id, doc_id, CAST(row_number() OVER (PARTITION BY q_id
       |        ORDER BY score DESC, doc_id) AS BIGINT) AS pos
       |    FROM (
       |      SELECT q.q_id, t.doc_id,
       |        sum(((2*s.n - 2*f.df + 1) * 22 * t.tf * s.total * $gs) //
       |          ((2*f.df + 1) * (10*t.tf*s.total + 3*s.total
       |            + 9*l.dl*s.n))) AS score
       |      FROM qt q JOIN tf t ON t.term = q.term AND t.doc_id <> q.q_id
       |      JOIN df f ON f.term = q.term
       |      JOIN dl l ON l.doc_id = t.doc_id
       |      CROSS JOIN stats s
       |      GROUP BY 1, 2))),
       |exp AS (
       |  SELECT q_id, term FROM (
       |    SELECT b.q_id, t.term,
       |      row_number() OVER (PARTITION BY b.q_id
       |        ORDER BY sum(t.tf) DESC, t.term) AS tr
       |    FROM base b JOIN tf t ON t.doc_id = b.doc_id
       |    WHERE b.pos <= $PrfFeedback
       |      AND NOT EXISTS (SELECT 1 FROM qt q
       |                      WHERE q.q_id = b.q_id AND q.term = t.term)
       |    GROUP BY 1, 2) WHERE tr <= $PrfTerms),
       |eq AS (SELECT q_id, term, $PrfWOrig AS w FROM qt
       |       UNION ALL SELECT q_id, term, $PrfWExp AS w FROM exp),
       |prf AS (
       |  SELECT q_id, doc_id, pos FROM (
       |    SELECT q_id, doc_id, CAST(row_number() OVER (PARTITION BY q_id
       |        ORDER BY score DESC, doc_id) AS BIGINT) AS pos
       |    FROM (
       |      SELECT q.q_id, t.doc_id,
       |        sum(q.w * (((2*s.n - 2*f.df + 1) * 22 * t.tf * s.total
       |            * $gs) //
       |          ((2*f.df + 1) * (10*t.tf*s.total + 3*s.total
       |            + 9*l.dl*s.n)))) AS score
       |      FROM eq q JOIN tf t ON t.term = q.term AND t.doc_id <> q.q_id
       |      JOIN df f ON f.term = q.term
       |      JOIN dl l ON l.doc_id = t.doc_id
       |      CROSS JOIN stats s
       |      GROUP BY 1, 2))),
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
       |pdcg AS (
       |  SELECT p.q_id,
       |    CAST(coalesce(sum(CASE WHEN e.label = ql.q_label
       |      THEN w.w END), 0) AS BIGINT) AS prf_dcg
       |  FROM prf p JOIN ql ON ql.q_id = p.q_id
       |  JOIN wts w ON w.pos = p.pos
       |  LEFT JOIN embeddings e ON e.vec_id = p.doc_id
       |  WHERE p.pos <= $GroupK
       |  GROUP BY 1),
       |bdcg AS (
       |  SELECT b.q_id,
       |    CAST(coalesce(sum(CASE WHEN e.label = ql.q_label
       |      THEN w.w END), 0) AS BIGINT) AS base_dcg
       |  FROM base b JOIN ql ON ql.q_id = b.q_id
       |  JOIN wts w ON w.pos = b.pos
       |  LEFT JOIN embeddings e ON e.vec_id = b.doc_id
       |  WHERE b.pos <= $GroupK
       |  GROUP BY 1),
       |rated AS (
       |  SELECT n.q_id,
       |    CAST(CASE WHEN i.s > 0
       |      THEN coalesce(p.prf_dcg, 0) * 10000 // i.s
       |      ELSE 0 END AS BIGINT) AS prf_ndcg_bp,
       |    CAST(CASE WHEN i.s > 0
       |      THEN coalesce(b.base_dcg, 0) * 10000 // i.s
       |      ELSE 0 END AS BIGINT) AS base_ndcg_bp
       |  FROM nrel n
       |  LEFT JOIN pdcg p ON p.q_id = n.q_id
       |  LEFT JOIN bdcg b ON b.q_id = n.q_id
       |  JOIN pre i ON i.j = least($GroupK, n.n_rel))
       |SELECT q_id, prf_ndcg_bp, base_ndcg_bp,
       |  prf_ndcg_bp - base_ndcg_bp AS delta_bp
       |FROM rated
       |UNION ALL
       |SELECT CAST(-1 AS BIGINT),
       |  CAST(sum(prf_ndcg_bp) // count(*) AS BIGINT),
       |  CAST(sum(base_ndcg_bp) // count(*) AS BIGINT),
       |  CAST(sum(prf_ndcg_bp) // count(*)
       |    - sum(base_ndcg_bp) // count(*) AS BIGINT)
       |FROM rated""".stripMargin
  }

  /** The mining pipeline in DuckDB: the shared BM25 scorer, rank cut,
    * label grading, per-query pos/neg windows, and the pos × neg join.
    */
  private val triplesOracle: String = {
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
       |ranked AS (
       |  SELECT q_id, doc_id, bm25_scaled, rank FROM (
       |    SELECT q_id, doc_id, bm25_scaled,
       |      CAST(row_number() OVER (PARTITION BY q_id
       |        ORDER BY bm25_scaled DESC, doc_id) AS BIGINT) AS rank
       |    FROM (
       |      SELECT q.q_id, t.doc_id,
       |        CAST(sum(((2*s.n - 2*f.df + 1) * 22 * t.tf * s.total * $gs)
       |          // ((2*f.df + 1) * (10*t.tf*s.total + 3*s.total
       |            + 9*l.dl*s.n))) AS BIGINT) AS bm25_scaled
       |      FROM qt q JOIN tf t ON t.term = q.term AND t.doc_id <> q.q_id
       |      JOIN df f ON f.term = q.term
       |      JOIN dl l ON l.doc_id = t.doc_id
       |      CROSS JOIN stats s
       |      GROUP BY 1, 2)) WHERE rank <= $ListDepth),
       |ql AS (SELECT vec_id AS q_id, label AS q_label FROM embeddings
       |       WHERE vec_id < $GroupQueries),
       |graded AS (
       |  SELECT r.q_id, r.doc_id, r.bm25_scaled, r.rank,
       |    CASE WHEN e.label = ql.q_label THEN 1 ELSE 0 END AS rel
       |  FROM ranked r JOIN ql ON ql.q_id = r.q_id
       |  LEFT JOIN embeddings e ON e.vec_id = r.doc_id),
       |pos AS (
       |  SELECT q_id, doc_id AS pos_id, rank AS pos_rank,
       |    bm25_scaled AS pos_score FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |      ORDER BY rank) AS pr
       |    FROM graded WHERE rel = 1) WHERE pr <= $TripPos),
       |neg AS (
       |  SELECT q_id, doc_id AS neg_id, rank AS neg_rank,
       |    bm25_scaled AS neg_score FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |      ORDER BY rank) AS nr
       |    FROM graded WHERE rel = 0) WHERE nr <= $TripNeg)
       |SELECT p.q_id, p.pos_id, n.neg_id, p.pos_rank, n.neg_rank,
       |  p.pos_score - n.neg_score AS margin_scaled
       |FROM pos p JOIN neg n ON n.q_id = p.q_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "hybrid_rrf" -> hybridOracle,
    "hybrid_ndcg" -> ndcgOracle,
    "retrieval_ndcg_grouped" -> ndcgGroupedOracle,
    "hybrid_ndcg_grouped" -> hybridNdcgGroupedOracle,
    "hybrid_rrf_sweep" -> rrfSweepOracle,
    "hybrid_rerank" -> rerankOracle,
    "hybrid_mmr" -> mmrOracle,
    "retrieval_qlm_ndcg" -> qlmNdcgOracle,
    "hybrid_prf" -> prfOracle,
    "retrieval_triples" -> triplesOracle,
  )
}
