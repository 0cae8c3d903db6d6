package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.TopKAggregator
import graft.functions.VectorFunctions.{dot, norm2}

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

  /** STREAMING IVF top-k — the ANN face of the continuous query: each
    * arriving corpus vector is assigned its inverted list per-row (argmin
    * over the trained centroids, inlined as a literal sort — no stateful
    * shuffle), then scored ONLY against the queries probing that list
    * (broadcast equi-join on the list id) before entering the bounded
    * top-k state. Per-event cost is O(C·dims + probingQueries·dims)
    * instead of O(queries·dims); state stays O(k) per query. Confluence
    * with the batch `sim_ann_ivf` (same model, same candidates) is
    * spec-checked after drain.
    *
    * @param centroids the trained quantizer from
    *                  [[graft.operators.Similarity.ivfModel]], collected
    *                  (it is tiny: corpus/31 rows)
    * @param probes    (q_id, cid) — each query's NProbe nearest lists
    * @param queries   (q_id, qv, qn)
    */
  def topKIvf(
      stream: Dataset[(Long, Seq[Double])],
      centroids: Seq[(Int, Array[Double])],
      probes: DataFrame,
      queries: DataFrame,
      k: Int): DataFrame = {
    import stream.sparkSession.implicits._
    // PIN the model: probes/queries arrive as live plans rooted in the
    // IVF training DAG — joining them directly would re-execute the
    // whole training (corpus crossJoins, Lloyd averaging) on EVERY
    // micro-batch, and float-summation reorder across re-executions
    // could even flip near-tie probe lists between batches. They are
    // tiny (NQueries·NProbe and NQueries rows), so collect them once
    // into local relations.
    val probesLocal = probes.select(col("q_id"), col("cid"))
      .as[(Long, Int)].collect().toSeq.toDF("q_id", "cid")
    val queriesLocal = queries
      .select(col("q_id"), col("qv"), col("qn"))
      .as[(Long, Seq[Double], Double)].collect().toSeq
      .toDF("q_id", "qv", "qn")
    val v = col("v")
    // array of (d2, cid) structs; array_sort orders by d2 then cid, so
    // element 0 is the nearest centroid — a pure per-row expression
    // (tie-break = smallest cid, matching the batch nearestCentroid)
    val distStructs = centroids.map { case (cid, cv) =>
      val c2 = cv.map(x => x * x).sum
      struct((lit(c2) - lit(2.0) * dot(v, typedLit(cv.toSeq))).as("d2"),
        lit(cid).as("cid"))
    }
    val withCid = stream.toDF("vec_id", "v")
      .withColumn("cid",
        array_sort(array(distStructs: _*)).getItem(0).getField("cid"))
    val scored = withCid
      .join(broadcast(probesLocal), Seq("cid")) // only queries probing this list
      .filter(col("vec_id") =!= col("q_id"))
      .join(broadcast(queriesLocal), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        (dot(col("qv"), col("v")) / (col("qn") * norm2(col("v")))).as("sim"))
      .as[(Long, Long, Double)]
    topK(scored, k)
  }

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
