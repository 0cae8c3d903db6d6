package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan governance over the WHOLE registry: no query may plan an
  * unbounded nested-loop join. The allowlist names the queries where a
  * nested-loop is intentional AND bounded — a broadcast build side that
  * stays small at any corpus scale (a fixed query set, a centroid
  * table, a 5-row dim) or an explicitly-capped audit — with the reason
  * pinned here. Anything else containing a BroadcastNestedLoopJoin or
  * CartesianProduct is a scale regression and fails this spec.
  */
class PlanGovernanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private val allowedNestedLoop: Map[String, String] = Map(
    // NOTE the firing check below keeps this list honest - a first
    // draft also exempted dedup_ngram_jaccard and sim_ann_lsh, which
    // turn out to be equi-join shaped and plan no nested loop at all
    "cross_join_small" -> "deliberate cross join of two tiny dims (25 rows)",
    "sketch_theta_ops" -> ("self-join of the per-type KMV sketch table on" +
      " type inequality - both sides bounded by the event-type DOMAIN" +
      " (a handful of rows carrying k-long sketches) forever; the corpus" +
      " itself reduced map-side through MinKAggregator before the join"),
    "sim_topk_bruteforce" -> "non-equi =!= join against a BROADCAST 10-row query set",
    "sim_topk_agg" -> "same broadcast 10-row query set",
    "sim_mips" -> "same broadcast 10-row query set, integer-dot scoring",
    "sim_sq_recall" -> ("composes sim_mips (its broadcast 10-row" +
      " query-set nested loop) with the pure-equi-join SQ side; the" +
      " recall join is an equi-join on the pair key"),
    "sim_ann_ivf" -> ("crossJoin against the broadcast centroid table - the" +
      " O(n*C) quantizer training/assignment cost, linear in the corpus" +
      " per centroid, not an unbounded pair product"),
    "sim_ann_recall" -> ("composes sim_topk_bruteforce and sim_ann_ivf, so" +
      " it inherits exactly their allowlisted broadcast nested loops;" +
      " the recall join itself is an equi-join on the pair key"),
    "sim_ann_tradeoff" -> ("the recall sweep inherits the same broadcast" +
      " centroid-table and 10-row query-set nested loops as" +
      " sim_ann_recall; budgets fan out by explode and every report" +
      " join is an equi-join on the (budget, pair) key"),
    "sim_ann_ivfpq" -> ("inherits sim_ann_ivf's broadcast centroid-table" +
      " crossJoins (probe selection); the PQ pricing side is pure" +
      " (m, k) / vec_id equi-joins"),
    "sim_pq_recall" -> ("composes sim_topk_bruteforce (its broadcast" +
      " 10-row query-set nested loop) with the pure-equi-join PQ side;" +
      " the recall join is an equi-join on the pair key"),
    "embed_outliers" -> ("crossJoin against the broadcast SINGLE-ROW" +
      " norm statistics (N, Σn², Σ(n²)²) - the scalar-stats pattern," +
      " bounded at one build row forever"),
    "text_bm25_topk" -> ("crossJoin against the broadcast SINGLE-ROW corpus" +
      " stats (N, total tokens, per-term df) - how scalar statistics" +
      " reach every row; bounded at one build row forever"),
    "corpus_mix_sample" -> ("the single-row n_min crossJoin onto the" +
      " |langs|-row count domain - the scalar-stats pattern; the corpus" +
      " itself joins by lang equi-key"),
    "corpus_epoch_plan" -> ("the single-row language-count crossJoin onto" +
      " the |langs|-row plan domain - the scalar-stats pattern, bounded" +
      " at one build row forever"),
    "ts_sax_match" -> ("crossJoin against the broadcast SINGLE-ROW" +
      " min-day anchor - the scalar-stats pattern, bounded at one" +
      " build row forever"),
    "corpus_bpe_train" -> ("each training round broadcasts its 1-row" +
      " argmax merge pair onto the vocabulary - three single-row build" +
      " sides, bounded at one row forever"),
    "corpus_bpe_encode" -> ("inherits the trainer's per-round 1-row" +
      " argmax broadcasts (merge derivation) and applies each merge as" +
      " a broadcast single-row join onto the corpus token scan - every" +
      " build side bounded at one row forever"),
    // corpus_bpe_curve: its per-round states are PINNED (materialized
    // during construction), so the registry plan reads checkpointed
    // RDDs and the trainer's single-row merge-pair broadcasts never
    // appear in it - no nested loop fires and no exemption is needed
    // corpus_funnel_report: the percentile-threshold crossJoin plans as
    // a plain broadcast exchange (single-row build side under AQE), so
    // no nested loop fires and no exemption is needed - the firing
    // check below proved it
    "hybrid_rrf" -> ("the BM25 leg's single-row stats crossJoin plus the" +
      " vector leg's broadcast ONE-ROW query embedding - both bounded" +
      " at one build row forever"),
    "hybrid_ndcg" -> ("inherits hybrid_rrf's single-row crossJoins and" +
      " adds its own broadcast ONE-ROW query-label and relevant-total" +
      " scalars - every build side bounded at one row forever"),
    "retrieval_ndcg_grouped" -> ("crossJoin against the BROADCAST 10-row" +
      " query set (the sim_topk pattern) - one corpus scan ranks every" +
      " query simultaneously; the eval folds are equi-grouped"),
    "text_bm25_grouped" -> ("crossJoin against the broadcast SINGLE-ROW" +
      " corpus stats (N, total tokens) - the scalar-stats pattern; query" +
      " terms reach candidates by the term EQUI-join"),
    "hybrid_ndcg_grouped" -> ("inherits text_bm25_grouped's single-row" +
      " stats crossJoin and retrieval_ndcg_grouped's broadcast 10-row" +
      " query set - both bounded build sides; fusion and grading are" +
      " equi-joins on (q_id, doc_id)"),
    "hybrid_rrf_sweep" -> ("the same inherited bounded build sides as" +
      " hybrid_ndcg_grouped; damping constants fan out by explode on" +
      " the already-joined per-query lists"),
    // hybrid_rerank left the allowlist in r14: pinning the fused pool
    // (localCheckpoint) truncated the legs' lineage, so the inherited
    // bounded broadcasts no longer appear in its plan at the spec SF
    "retrieval_triples" -> ("inherits text_bm25_grouped's single-row" +
      " stats crossJoin; grading, the per-role windows, and the" +
      " bounded pos x neg fan-out are all equi-joins on q_id"),
    // retrieval_qlm_ndcg left the allowlist in r15: the face now pins
    // its final report (pin-and-release of the leg checkpoints), so the
    // registry plan is a checkpoint read; the legs' bounded broadcasts
    // are audited directly by the pre-checkpoint leg test below
    "text_index_ivm" -> ("the maintained-index read side scores through" +
      " text_bm25_grouped's joins, inheriting its broadcast SINGLE-ROW" +
      " merged-stats crossJoin - bounded at one build row forever;" +
      " postings/df frames union and merge by equi-key"),
    "text_index_compact" -> ("scores through the same read side as" +
      " text_index_ivm (the broadcast SINGLE-ROW merged-stats" +
      " crossJoin); compaction itself is concatenating rewrites and a" +
      " SUM equi-merge, no join at all"),
    "text_index_delete" -> ("scores through the same read side as" +
      " text_index_ivm (the broadcast SINGLE-ROW merged-stats" +
      " crossJoin); the deletion generation is semi/anti equi-joins on" +
      " doc_id plus SUM-folded negative partials, no new join shape"),
    "stream_index_delete" -> ("text_index_delete's read side (the" +
      " broadcast SINGLE-ROW merged-stats crossJoin) with the deletion" +
      " generations folded per request batch — same semi/anti" +
      " equi-join shapes, just one generation per micro-batch"),
    "lifecycle_text" -> ("the capstone's terminal text store scores" +
      " through the same read side as text_index_ivm (the broadcast" +
      " SINGLE-ROW merged-stats crossJoin, bounded at one row" +
      " forever); the replay's own folds happen at build time, not in" +
      " the registry plan"),
    "lifecycle_stream_text" -> ("the streaming capstone's terminal" +
      " text store is lifecycle_text's read side verbatim (the" +
      " broadcast SINGLE-ROW merged-stats crossJoin); the doors'" +
      " folds happen inside the replay's foreachBatch, not in the" +
      " registry plan"),
    "sim_knn_classify" -> ("inherits sim_ann_ivf's broadcast" +
      " centroid-table crossJoins (probe selection, O(n*C) linear per" +
      " centroid); voting and the confusion rollup are (vec_id, label)" +
      " equi-aggregations"),
    // sim_ann_graph pins its walk result (corpus projection + adjacency
    // pinned, released after materialization), so the registry plan is
    // a checkpoint read with no nested loop — the walk's bounded
    // broadcasts are audited directly by the pre-checkpoint
    // gnavWalkPlan entry below
    "sim_gnav_recall" -> ("composes sim_topk_bruteforce (its broadcast" +
      " 10-row query-set nested loop) with the PINNED beam-walk result;" +
      " the recall join is an equi-join on the pair key — the walk's" +
      " own joins are audited pre-checkpoint (gnavWalkPlan)"),
    "sim_gnav_tradeoff" -> ("inherits sim_topk_bruteforce's broadcast" +
      " 10-row query-set nested loop once per swept width; the walks" +
      " are pinned and audited pre-checkpoint (gnavWalkPlan)"),
    "sim_gnav_insert_recall" -> ("composes sim_topk_bruteforce (its" +
      " broadcast 10-row query-set nested loop) with the PINNED walk" +
      " over the updated adjacency; the walk's own joins are the" +
      " gnavWalkPlan shapes audited pre-checkpoint"),
    "sim_gnav_vacuum_recall" -> ("the survivor-filtered exact side is" +
      " sim_topk_bruteforce's broadcast 10-row query-set nested loop;" +
      " the walk over the vacuumed adjacency is PINNED, its joins are" +
      " the gnavWalkPlan shapes audited pre-checkpoint"),
    "text_qlm_topk" -> ("the smoothing-mass grid: a broadcast of the" +
      " <=30-row (query term, cf) frame onto the doc-length table -" +
      " bounded at queries x QlmQueryTerms build rows forever - plus" +
      " the single-row corpus-stats crossJoin; matching-term tf" +
      " arrives by LEFT equi-join on (term, doc_id)"),
    // hybrid_prf left the allowlist in r15 for the same reason:
    // final-report pinning truncates the registry plan; its weighted
    // retrieval passes are covered by the pre-checkpoint leg test
    "ngrams_heavyhitters" -> ("crossJoin against the broadcast" +
      " SINGLE-ROW stream total (the scalar-stats pattern); the exact" +
      " recount joins the <=cap sketched candidates by equi-key"),
    // embed_kmeans_mix / dedup_semantic's Lloyd-round centroid
    // crossJoins moved into the shared k-means assignment-artifact
    // BUILD; the registry queries are now plain artifact reads with
    // no nested loop in their plans
    // events_rfm's single-row day-anchor crossJoin sits inside its
    // materialize() boundary (the per-user table is pinned before the
    // three scoring passes), so the registry plan starts from the
    // checkpointed RDD and no nested loop fires
    "graph_modularity" -> ("crossJoin against the broadcast SINGLE-ROW" +
      " edge total (m) - the scalar-stats pattern, bounded at one" +
      " build row forever"),
    "bloom_semijoin" -> ("crossJoin against the broadcast SINGLE-ROW" +
      " Bloom bitset (128 KiB map) - the pre-filter that spares the" +
      " big side's exchange; bounded at one build row forever"),
    "dq_checks" -> ("each rule's report row is a crossJoin of two" +
      " SINGLE-ROW aggregates (n_checked x n_violations) - bounded at" +
      " one row per side forever"),
    "dq_schema_drift" -> ("crossJoin against the broadcast SINGLE-ROW" +
      " time-axis min/max (the version-split midpoint) - the" +
      " scalar-stats pattern, bounded at one build row forever"),
    // embed_pca_power's per-round max-normalizer crossJoins moved into
    // the shared direction-artifact BUILD; the registry query is now a
    // plain artifact read with no nested loop in its plan
  )

  test("column pruning reaches the scan on representative queries") {
    // a scan that drags unused columns multiplies bytes read at any
    // scale; pin the ReadSchema for queries whose operators touch wide
    // tables but need few columns
    val expect = Map(
      "dedup_source_matrix" -> ("documents" -> Set("doc_id", "source")),
      "events_anomaly" -> ("events" -> Set("ts", "event_type")),
      "corpus_shuffle" -> ("documents" -> Set("doc_id")),
      "corpus_token_budget" -> ("documents" ->
        Set("doc_id", "text", "source")),
      "gapfill_hours" -> ("events" -> Set("ts")),
    )
    expect.foreach { case (q, (table, cols)) =>
      val plan = SparkEntry.queries(q)(spark, SparkTestSession.sf)
        .queryExecution.executedPlan.toString
      // the scan of `table` must read exactly `cols` (other scans in
      // the same plan - shared artifacts etc. - are not constrained)
      val reads = ("FileScan parquet [^\\n]*" + table +
        "\\.parquet\\][^\\n]*ReadSchema: struct<([^>]*)>").r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
      assert(reads.nonEmpty, s"$q: no $table scan found:\n$plan")
      reads.foreach { r =>
        val got = r.split(",").map(_.split(":")(0).trim).toSet
        assert(got == cols,
          s"$q: $table scan reads $got, want $cols")
      }
    }
  }

  test("runtime-filter machinery stays armed: bloom filter injects on the " +
      "q5 star core under shuffle-join conditions") {
    // At bench scale the star joins broadcast their dims — the
    // degenerate best case of a runtime filter (the build side reaches
    // the probe as a complete hash table), so InjectRuntimeFilter has
    // nothing to add and the audit's runtime-filter column reads 0.
    // This spec pins the part that must not rot: the session leaves
    // Spark's runtime bloom filter ENABLED, and on the q5 core shape
    // (lineitem ⋈ selectively-filtered orders) under the conditions
    // where it matters at 100 TB — dims too big to broadcast, big-side
    // scan dominating — the filter actually injects. A conf regression
    // that silently disarms it fails here, not at the cluster.
    assert(spark.conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.enabled") == "true",
      "runtime bloom filter must be enabled in the tuned session")
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set(keys(0), "-1") // the 100 TB case: no broadcast
      spark.conf.set(keys(1), "0")  // sf-independent: any scan qualifies
      import org.apache.spark.sql.functions._
      val o = Tables.load(spark, sf, "orders")
        .filter(col("o_orderstatus") === "F")
      val l = Tables.load(spark, sf, "lineitem")
      val plan = PlanCheck.finalPlanString(
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(sum(col("l_quantity")).as("q")))
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter injected on the star core:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("pre-checkpoint retrieval legs keep their bounded join shapes") {
    // pin-and-release truncates the registry plans of hybrid_rerank,
    // hybrid_mmr, retrieval_qlm_ndcg, and hybrid_prf to checkpoint
    // reads, so the registry sweep below cannot see a join-strategy
    // regression UPSTREAM of the pin for those faces. Audit the leg
    // frames directly: every nested loop must be a BROADCAST build
    // (the bounded patterns named here), and a cartesian product is a
    // scale regression anywhere.
    import graft.operators.{HybridRetrieval, TextAnalysis}
    import org.apache.spark.sql.functions.lit
    val (tf, dl, dfT, st) = TextAnalysis.bm25Postings(spark, sf)
    // the MMR/PRF faces pin these frames before use — audit the plans
    // as built (mmrSims probes the REAL pinned pool, its production
    // input; the PRF frames are audited over unpinned postings, which
    // additionally covers the postings derivation itself)
    val mmrPool = HybridRetrieval.mmrPool(spark, sf)
    val qt = HybridRetrieval.prfQueryTerms(tf)
    val prfBase = HybridRetrieval.prfBasePlan(qt, tf, dl, dfT, st)
    val legs: Seq[(String, org.apache.spark.sql.DataFrame, String, Int)] =
      Seq(
        ("lexRankedGrouped", HybridRetrieval.lexRankedGrouped(spark, sf),
          "single-row corpus-stats crossJoin (scalar-stats pattern)", 2),
        ("vecRankedGrouped", HybridRetrieval.vecRankedGrouped(spark, sf),
          "broadcast 10-row query set (the sim_topk pattern)", 2),
        ("qlmLeg", TextAnalysis.qlmRankedFrom(tf, dl, st),
          "<=30-row smoothing grid + single-row stats", 2),
        ("bm25Leg", TextAnalysis.bm25GroupedRanked(
          TextAnalysis.bm25GroupedScoredFrom(tf, dl, dfT, st)),
          "single-row corpus-stats crossJoin", 2),
        ("mmrPoolPlan", HybridRetrieval.mmrPoolPlan(spark, sf),
          "both fused legs' bounded broadcasts (lex stats + vec queries)",
          4),
        ("mmrSimsPlan", HybridRetrieval.mmrSimsPlan(spark, sf, mmrPool),
          "pure equi-joins over the pinned pool", 0),
        ("prfBasePlan", prfBase,
          "single-row corpus-stats crossJoin in the scored pass", 1),
        ("prfExpansion", HybridRetrieval.prfExpansion(prfBase, tf, qt),
          "equi-joins over postings; base's stats crossJoin upstream", 1),
        ("prfRescored", HybridRetrieval.prfScored(
          qt.withColumn("w", lit(2L)), tf, dl, dfT, st),
          "single-row corpus-stats crossJoin", 1),
        // the gnav faces pin their walk results (corpus projection +
        // adjacency pinned per invocation), truncating registry plans
        // — audit the raw walk plan directly
        ("gnavWalkPlan", graft.operators.Similarity.gnavWalkPlan(spark, sf),
          "query x entry-point seeding crossJoin (<= 16x64 rows) plus" +
            " the broadcast 10-row query set per hop rescoring", 7))
    legs.foreach { case (name, frame, why, cap) =>
      val plan = PlanCheck.finalPlanString(frame)
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product ($why):\n$plan")
      // the legs' nested loops are bounded broadcasts by construction;
      // what must not regress is their NUMBER growing (a new unbounded
      // join would first appear as an extra nested-loop node)
      val n = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
      assert(n <= cap, s"$name plans $n nested loops, expected <=$cap " +
        s"(bounded: $why):\n$plan")
    }
    graft.operators.Dedup.releaseCheckpoint(mmrPool)
  }

  test("no registry query plans an unbounded nested-loop join") {
    val offenders = scala.collection.mutable.Map[String, String]()
    val fired = scala.collection.mutable.Set[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = PlanCheck.finalPlanString(fn(spark, sf))
      if (PlanCheck.hasNestedLoop(plan)) {
        if (allowedNestedLoop.contains(name)) fired += name
        else offenders(name) = plan
      }
    }
    assert(offenders.isEmpty,
      s"unexpected nested-loop joins in: ${offenders.keys.mkString(", ")}\n" +
        offenders.headOption.map(_._2).getOrElse(""))
    // keep the allowlist honest: every entry must name a registry query
    // that actually still plans a nested loop - stale exemptions would
    // silently cover future regressions
    assert(allowedNestedLoop.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(fired == allowedNestedLoop.keySet,
      s"stale allowlist entries (no nested loop fired): ${allowedNestedLoop.keySet -- fired}")
  }
}
