package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** One-off decomposition probe for the lifecycle capstone's cc phase —
  * the 100× rung showed it superlinear (40.5 → 106.8 → 578.5 s across
  * 10×/30×/100×) while the other three families stayed ~linear; this
  * times the phase's steps in isolation so the fix targets the one
  * that actually pays. Run by hand:
  * `SPARK_GRAFT_CPUS=32 runMain graft.tools.CcProbe /tmp/graft_scale_100x_v2`.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_scale_100x_v2")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[cc-probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      a
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val ranked = docs
      .withColumn("rn", row_number().over(Window.orderBy(col("doc_id"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("bucket", expr("((rn - 1) * 4) div n"))
      .drop("rn", "n")
    val state = java.nio.file.Files.createTempDirectory("graft_ccprobe_")
    // decompose the base's inputs first: artifact adoption constants
    // vs the CC loop vs the store writes
    timed("shared tables adoption") {
      graft.operators.Dedup.sharedSigSlice(spark, d,
        ranked.filter(col("bucket") < 2).select(col("doc_id")))
        .queryExecution.executedPlan
    }
    timed("verified pairs count") {
      graft.operators.Dedup.verifiedPairsTable(spark, d).count()
    }
    timed("cc base (half corpus)") {
      graft.operators.Dedup.ccIvmBaseFromShared(spark, d,
        ranked.filter(col("bucket") < 2).select(col("doc_id")), state)
    }
    def rd(sub: String) = {
      import scala.jdk.CollectionConverters._
      val gens = java.nio.file.Files.list(state.resolve(sub)).iterator()
        .asScala.map(_.toString).toSeq.sorted
      spark.read.parquet(gens: _*)
    }
    val emptyRemap =
      spark.range(0).select(col("id").as("old"), col("id").as("root"))
    timed("cc waveA fold (quarter)") {
      graft.operators.Dedup.ccIvmBatch(
        ranked.filter(col("bucket") === 2).drop("bucket"),
        rd("sh"), rd("sig"), rd("lbl"), emptyRemap, rd("gk"),
        state, "b00000")
    }
    // optional second mode: time the full composed lifecycle replay on
    // the same dataset (the rung ladder's post-fix row)
    if (args.length > 1 && args(1) == "lifecycle")
      timed("lifecycle composed replay") {
        graft.operators.StreamingQueries.ensureLifecycle(spark, d)
      }
    spark.stop()
  }
}
