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

  /** A pinned IVF model: the tiny collected pieces the streaming scorer
    * needs (corpus/31 centroids, NQueries·NProbe probe rows, NQueries
    * query vectors), plus a version stamp for observability. Immutable —
    * refresh = build a new one and [[IvfModelRef.repin]] it.
    */
  case class PinnedIvfModel(
      centroids: Seq[(Int, Array[Double])],
      probes: Seq[(Long, Int)],
      queries: Seq[(Long, Seq[Double], Double)],
      version: Long)

  object PinnedIvfModel {
    /** Train + collect the model once (the ONLY place training executes
      * on the streaming path).
      */
    def pin(s: org.apache.spark.sql.SparkSession, dir: String): PinnedIvfModel = {
      import s.implicits._
      val (_, centroids, probes, q) = graft.operators.Similarity.ivfModel(s, dir)
      PinnedIvfModel(
        centroids.select(col("cid"), col("cv")).as[(Int, Seq[Double])]
          .collect().map { case (cid, cv) => (cid, cv.toArray) }.toSeq,
        probes.select(col("q_id"), col("cid")).as[(Long, Int)].collect().toSeq,
        q.select(col("q_id"), col("qv"), col("qn"))
          .as[(Long, Seq[Double], Double)].collect().toSeq,
        version = 0L)
    }
  }

  /** Driver-held handle to the current model, hot-swappable while the
    * streaming query keeps running. Works WITHOUT a query restart because
    * Structured Streaming re-serializes task closures from the driver's
    * object graph on every micro-batch — so a batch always scores against
    * the model the driver holds when that batch is planned (the standard
    * rebroadcast-per-batch refresh pattern, without foreachBatch).
    */
  final class IvfModelRef(initial: PinnedIvfModel) extends Serializable {
    @volatile private var model: PinnedIvfModel = initial
    def current: PinnedIvfModel = model
    /** Swap in a freshly-pinned model (on demand, or from a timer every
      * N batches — the cadence is the caller's policy). Version advances
      * so progress metrics can attribute batches to model generations.
      */
    def repin(next: PinnedIvfModel): Unit =
      model = next.copy(version = model.version + 1)
  }

  /** The LIVE-feed variant of [[topKIvf]]: same scoring semantics, but
    * the model is read through an [[IvfModelRef]] so it can be re-pinned
    * mid-stream (a drifting live corpus needs periodic re-training; the
    * literal-plan variant above bakes the model into the plan forever).
    * The model lookup happens inside the partition closure — the one
    * seam where a per-batch-refreshable value can live — and the plan
    * contains NO training DAG at all: training executes only inside
    * [[PinnedIvfModel.pin]], never per batch (spec-asserted).
    */
  def topKIvfLive(
      stream: Dataset[(Long, Seq[Double])],
      ref: IvfModelRef,
      k: Int): DataFrame = {
    import stream.sparkSession.implicits._
    val scored = stream.mapPartitions { it =>
      val m = ref.current // shipped with THIS batch's task closure
      val probesByCid = m.probes.groupBy(_._2).map { case (cid, qs) =>
        (cid, qs.map(_._1)) }
      val queryVecs = m.queries.map { case (qId, qv, qn) =>
        qId -> ((qv.toArray, qn)) }.toMap
      val cents = m.centroids.map { case (cid, cv) =>
        (cid, cv, cv.map(x => x * x).sum) }
      it.flatMap { case (vecId, vSeq) =>
        val v = vSeq.toArray
        // argmin centroid with the same explicit (d2, cid) tie-break as
        // the batch nearestCentroid and the literal-plan variant
        var bestCid = Int.MaxValue
        var bestD = Double.PositiveInfinity
        cents.foreach { case (cid, cv, c2) =>
          var dotv = 0.0
          var i = 0
          while (i < cv.length) { dotv += cv(i) * v(i); i += 1 }
          val d2 = c2 - 2.0 * dotv
          if (d2 < bestD || (d2 == bestD && cid < bestCid)) {
            bestD = d2; bestCid = cid
          }
        }
        var n2 = 0.0
        var i = 0
        while (i < v.length) { n2 += v(i) * v(i); i += 1 }
        val nrm = math.sqrt(n2)
        probesByCid.getOrElse(bestCid, Nil).iterator
          .filter(_ != vecId).map { qId =>
            val (qv, qn) = queryVecs(qId)
            var s = 0.0
            var j = 0
            while (j < v.length) { s += qv(j) * v(j); j += 1 }
            (qId, vecId, s / (qn * nrm))
          }
      }
    }
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
      .withColumn("sim", round(col("sim"), 4) + lit(0.0))
  }
}
