package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.TopKAggregator

/** Ext2's continuous face: an exact per-query top-k similarity view
  * maintained incrementally over a STREAM of scored (query, neighbor,
  * similarity) rows — the streaming generalization of the batch
  * `sim_topk_agg` query (no reference analog; PAPERS.md direction).
  *
  * The same bounded [[TopKAggregator]] the batch query uses doubles as
  * the streaming state: per query key the state is the ≤ k-element heap,
  * O(k) per query regardless of how much corpus has streamed past —
  * never O(corpus). Partitions still reduce to ≤ k candidates before the
  * shuffle (map-side combine). In update mode each micro-batch re-emits
  * only queries whose top-k changed; a downstream upsert consumer keeps
  * the newest emission per query (the spec uses exactly that resolve).
  *
  * Because the aggregator is a commutative/associative fold, the drained
  * streaming result equals the batch aggregation over the same rows —
  * the same confluence argument `stream_inprogress` makes, checked in
  * StreamingTopKSpec against the oracle-verified `sim_topk_agg`.
  */
object StreamingTopK {

  /** (q_id, neighbor_id, sim) stream → one row per (q_id, rank≤k):
    * columns (q_id, neighbor_id, rank, sim4) with sim rounded to 4
    * decimals, matching the batch query's output shape.
    */
  def topK(scored: Dataset[(Long, Long, Double)], k: Int): DataFrame = {
    import scored.sparkSession.implicits._
    val topk = new TopKAggregator(k).toColumn
    scored.groupByKey(_._1)
      .mapValues { case (_, id, sim) => (sim, id) }
      .agg(topk.name("topk"))
      .flatMap { case (qId, items) =>
        items.zipWithIndex.map { case ((sim, id), i) =>
          (qId, id, (i + 1).toLong, sim)
        }
      }
      .toDF("q_id", "neighbor_id", "rank", "sim")
      .withColumn("sim", round(col("sim"), 4))
  }
}
