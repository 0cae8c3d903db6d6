package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Plan-audit artifact: dump the formatted (and cost-annotated) plans
  * of the scale-critical queries to a markdown file the round pipeline
  * archives, so pushdown/pruning/broadcast regressions are visible as
  * a DIFF between rounds instead of requiring an interactive
  * `.explain()` session. Each section leads with a one-line red-flag
  * summary (cartesian/nested-loop joins, exchange count, whole-stage
  * codegen spans, pushed-filter presence) — the grep targets of the
  * per-round plan review.
  *
  * Usage: `runMain graft.ExplainAudit [outFile] [queryName...]`
  * (defaults: `EXPLAIN_AUDIT.md`, the headline set below).
  */
object ExplainAudit {

  private val Headline = Seq(
    "q1_agg", "q3_topk_revenue", "q5_nation_revenue", "q8_market_share",
    "q18_large_orders", "f2_filter_predicate", "sort_topk",
    "dedup_minhash_lsh", "dedup_components", "dedup_split_assign",
    "dedup_cdc_chunks", "sim_topk_bruteforce", "sim_ann_ivf",
    "sim_ann_ivfpq", "embed_covariance", "text_bm25_topk", "text_novelty",
    "graph_pagerank", "graph_triangles", "graph_label_prop", "events_rfm",
    "events_ewma", "corpus_tfidf", "corpus_funnel_report",
    "corpus_mix_sample", "corpus_bpe_train", "dedup_lsh_recall",
    "hybrid_ndcg", "sim_ann_pq", "dedup_repeated_ngrams",
    "sketch_countmin", "join_skew_salted", "graph_scc",
    "join_bucketed", "sim_mips", "sketch_kmv", "graph_ppr",
    "events_holtwinters", "events_cep_match", "events_m4_downsample",
    "layout_zonemap", "text_hashing_features", "graph_mst_clusters",
    "events_rate_limit", "events_forecast_eval",
    "sketch_theta_ops", "graph_closeness", "dq_schema_drift",
    "layout_compaction", "corpus_reject_reasons", "events_ab_assign",
    "ts_sax_match", "sim_ann_tradeoff", "dedup_band_sweep",
    "corpus_epoch_plan", "mm_shard_pack", "sketch_quantile",
    "corpus_bpe_curve", "events_session_sweep",
    // r12 faces (> 1 s or plan-novel) — the rule: any new face costing
    // > 1 s enters the audit the round it lands
    "dedup_index_ivm", "sim_index_ivm", "hybrid_rrf_sweep",
    "hybrid_ndcg_grouped", "text_bm25_grouped", "sim_ann_sq",
    "ngrams_heavyhitters", "sim_knn_recall", "dedup_minhash_est",
    // r13 faces
    "hybrid_rerank", "embed_drift", "hybrid_mmr", "hybrid_prf",
    "retrieval_triples", "text_qlm_topk", "text_index_ivm",
    "retrieval_qlm_ndcg", "dedup_decontam_lsh", "corpus_bpe_encode",
    "stream_decontam",
    // r14 faces
    "dedup_cc_ivm", "stream_quality_gate", "stream_embed_drift",
    // r15 faces
    "dedup_substring", "text_index_compact", "sim_knn_classify",
    "dedup_substring_pairs", "stream_substring_gate",
    // r16 faces
    "dedup_index_compact", "sim_index_compact", "dedup_cc_compact",
    "sim_ann_graph", "sim_gnav_recall", "dedup_substring_rewrite",
    "stream_knn_classify", "sim_gnav_tradeoff",
    "stream_substring_rewrite", "text_index_delete",
    "dedup_index_delete", "sim_index_delete", "dedup_cc_delete",
    "stream_index_delete", "sim_gnav_delete", "dedup_cc_takedown",
    "sim_gnav_insert", "sim_gnav_insert_recall",
    // r17 faces
    "sim_gnav_vacuum", "sim_gnav_vacuum_recall", "stream_gnav_insert",
    "lifecycle_text", "lifecycle_dedup", "lifecycle_cc",
    "lifecycle_gnav",
    // r18 faces
    "lifecycle_stream_text", "lifecycle_stream_dedup",
    "lifecycle_stream_cc", "lifecycle_stream_gnav")

  def main(args: Array[String]): Unit = {
    val outFile = args.headOption.getOrElse("EXPLAIN_AUDIT.md")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Headline.filter(SparkEntry.queries.contains)
    val spark = GraftSession.local(4)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val sb = new StringBuilder
    sb ++= s"# Plan audit (`$dir`)\n\n"
    sb ++= "Nested loops > 0 is a scale flag unless the query is on the\n"
    sb ++= "PlanGovernanceSpec allowlist (bounded broadcast build sides).\n"
    sb ++= "Codegen spans count distinct `codegen id`s; Spark's formatted\n"
    sb ++= "explain omits the annotation on AQE-replanned stages, so 0 on\n"
    sb ++= "a multi-exchange plan means *not annotated*, not *interpreted*.\n"
    sb ++= "Runtime filters counts injected bloom probes (`might_contain`)\n"
    sb ++= "plus dynamic partition pruning subqueries. 0 on the star joins\n"
    sb ++= "is EXPECTED at this SF: their dims broadcast, the degenerate\n"
    sb ++= "best case of a runtime filter (the build side reaches the probe\n"
    sb ++= "as a complete hash table, so there is nothing left to inject).\n"
    sb ++= "PlanGovernanceSpec pins that the machinery stays armed — with\n"
    sb ++= "broadcast off (the 100 TB dim case), the q5 star core DOES\n"
    sb ++= "inject a bloom filter on l_orderkey before the exchange.\n\n"
    sb ++= "| query | nested loops | exchanges | codegen spans | pushed filters | runtime filters | sort aggs |\n"
    sb ++= "|---|---|---|---|---|---|---|\n"
    val sections = names.map { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      // run the query first (noop sink): with AQE the pre-execution plan
      // is a placeholder — codegen spans, final join strategies and
      // coalesced exchanges only appear in the isFinalPlan=true tree
      df.write.format("noop").mode("overwrite").save()
      val qe = df.queryExecution
      val formatted = qe.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val nested = "CartesianProduct|BroadcastNestedLoopJoin".r
        .findAllIn(formatted).length
      val exchanges = "\\bExchange\\b".r.findAllIn(formatted).length
      // formatted mode tags codegen membership per operator as
      // "[codegen id : N]" — count DISTINCT ids (the spans)
      val wsg = "codegen id : (\\d+)".r.findAllMatchIn(formatted)
        .map(_.group(1)).toSet.size
      val pushed = "PushedFilters: \\[[^\\]]".r.findAllIn(formatted).length
      val rf = "might_contain|dynamicpruning".r.findAllIn(formatted).length
      // a SortAggregate means a non-hash-aggregable buffer (struct
      // min/max, collect_*) forced a FULL SORT of the pre-agg rows -
      // the r15 quantizer finding; >0 on a data-sized input is a flag
      val sortAgg = "SortAggregate".r.findAllIn(formatted).length
      sb ++= s"| $n | $nested | $exchanges | $wsg | $pushed | $rf | $sortAgg |\n"
      s"\n## $n\n\n```\n$formatted```\n"
    }
    sections.foreach(sb ++= _)
    Files.write(Paths.get(outFile),
      sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"[explain-audit] wrote ${names.length} plans to $outFile")
    spark.stop()
  }
}
