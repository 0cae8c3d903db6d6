package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorFunctions._
import graft.streaming.StreamingTopK

/** The continuously-maintained top-k (Ext2 streaming face): the corpus
  * streams in over several micro-batches, the per-query top-k state
  * updates incrementally, and after drain the result must equal the
  * batch `sim_topk_agg` — which is itself DuckDB-oracle-checked, so this
  * confluence check ties the streaming path to SQL semantics too.
  */
class StreamingTopKSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf
  import spark.implicits._

  test("streamed top-k equals the batch sim_topk_agg after drain; state is O(queries)") {
    val e = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))

    val mem = MemoryStream[(Long, Seq[Double])](spark)
    // the corpus arrives over four micro-batches
    e.as[(Long, Seq[Double])].collect().grouped(150).foreach(g => mem.addData(g.toSeq))

    val scored = mem.toDS().toDF("vec_id", "v")
      .join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosine(col("qv"), col("v")).as("sim"))
      .as[(Long, Long, Double)]

    val out = java.nio.file.Files.createTempDirectory("stream_topk").toString
    val query = StreamingTopK.topK(scored, 5)
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        b.withColumn("batch_id", lit(id)).write.mode("append").parquet(out)
      }
      .trigger(Trigger.AvailableNow()).start()
    try query.awaitTermination() finally query.stop()

    // per-query state is the bounded heap: one state row per query key
    assert(query.lastProgress.stateOperators.head.numRowsTotal == 10)

    // downstream upsert: keep each query's newest emission
    val emitted = spark.read.parquet(out)
    val fin = emitted
      .withColumn("mb", max("batch_id").over(Window.partitionBy("q_id")))
      .filter(col("batch_id") === col("mb"))
      .select("q_id", "neighbor_id", "rank", "sim")
      .as[(Long, Long, Long, Double)].collect().toSet

    val batch = graft.operators.Similarity.queries("sim_topk_agg")(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(fin == batch,
      s"streamed/batch divergence: only-stream=${fin -- batch} only-batch=${batch -- fin}")
  }

  test("streaming IVF top-k equals the batch sim_ann_ivf after drain") {
    val (_, centroidsDf, probes, queries) =
      graft.operators.Similarity.ivfModel(spark, sf)
    val centroids = centroidsDf.as[(Int, Seq[Double])].collect()
      .map { case (c, v) => (c, v.toArray) }.toSeq
    assert(centroids.nonEmpty)

    val mem = MemoryStream[(Long, Seq[Double])](spark)
    Tables.load(spark, sf, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE))")
      .as[(Long, Seq[Double])].collect()
      .grouped(150).foreach(g => mem.addData(g.toSeq))

    val out = java.nio.file.Files.createTempDirectory("stream_ivf").toString
    val query = StreamingTopK
      .topKIvf(mem.toDS(), centroids, probes, queries, 5)
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        b.withColumn("batch_id", lit(id)).write.mode("append").parquet(out)
      }
      .trigger(Trigger.AvailableNow()).start()
    try query.awaitTermination() finally query.stop()

    val fin = spark.read.parquet(out)
      .withColumn("mb", max("batch_id").over(Window.partitionBy("q_id")))
      .filter(col("batch_id") === col("mb"))
      .select("q_id", "neighbor_id", "rank", "sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    val batch = graft.operators.Similarity.queries("sim_ann_ivf")(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(fin == batch,
      s"IVF streamed/batch divergence: only-stream=${(fin -- batch).take(3)} " +
        s"only-batch=${(batch -- fin).take(3)}")
  }

  test("IVF model re-pin mid-stream: confluence holds, training never re-executes per batch") {
    import graft.streaming.StreamingTopK.{IvfModelRef, PinnedIvfModel}
    val ref = new IvfModelRef(PinnedIvfModel.pin(spark, sf))
    assert(ref.current.version == 0L)

    val mem = MemoryStream[(Long, Seq[Double])](spark)
    val corpus = Tables.load(spark, sf, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE))")
      .as[(Long, Seq[Double])].collect()
    val (first, second) = corpus.splitAt(corpus.length / 2)

    val df = StreamingTopK.topKIvfLive(mem.toDS(), ref, 5)
    // structural no-retraining guarantee: the streaming plan contains no
    // trace of the training DAG (no embeddings scan, no centroid
    // aggregation) — training can only ever run inside pin()
    val plan = df.queryExecution.analyzed.toString
    assert(!plan.contains("embeddings"),
      s"streaming plan must not embed the training pipeline:\n$plan")

    val out = java.nio.file.Files.createTempDirectory("stream_ivf_repin").toString
    val name = s"ivf_repin_${System.nanoTime()}"
    val query = df.writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        b.withColumn("batch_id", lit(id)).write.mode("append").parquet(out)
      }
      .queryName(name)
      .start()
    try {
      mem.addData(first.toSeq)
      query.processAllAvailable()
      // RE-PIN mid-stream: re-train from the (unchanged) source and swap.
      // The training is deterministic, so the new generation is
      // semantically identical — confluence must hold exactly as if the
      // model had never been swapped.
      ref.repin(PinnedIvfModel.pin(spark, sf))
      assert(ref.current.version == 1L, "re-pin must advance the generation")
      mem.addData(second.toSeq)
      query.processAllAvailable()
      // the query ran batches under BOTH generations without restart;
      // training executed exactly at the two explicit pin() calls, and
      // the version did not move again while batches were processing
      assert(ref.current.version == 1L)
    } finally query.stop()

    val fin = spark.read.parquet(out)
      .withColumn("mb", max("batch_id").over(Window.partitionBy("q_id")))
      .filter(col("batch_id") === col("mb"))
      .select("q_id", "neighbor_id", "rank", "sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    val batch = graft.operators.Similarity.queries("sim_ann_ivf")(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(fin == batch,
      s"re-pin broke confluence: only-stream=${(fin -- batch).take(3)} " +
        s"only-batch=${(batch -- fin).take(3)}")
  }
}
