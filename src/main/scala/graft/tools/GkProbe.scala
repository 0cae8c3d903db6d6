package graft.tools

import org.apache.spark.sql.functions._

/** Depth probe for the gk shingle-set-key registry (the r17 verdict's
  * #5): the resident-side collapse is ONE skinny MIN fold
  * (`priorGk.groupBy(gkey).agg(min(doc_id))`) whose ROW count is the
  * resident corpus regardless of generation depth — depth adds only
  * file-listing and scan-open overhead. This measures that claim: fold
  * 16 constant-size batches so the store reaches base + 16 gk
  * generations, then time the skinny fold at depth 16 against the SAME
  * rows compacted to one generation, and one more full `ccIvmBatch` at
  * each layout. If depth were to dominate, the LSM move (persist
  * per-generation reps, fold reps-of-reps) would be the fix; a flat
  * table is the "no fix needed" verdict. Run by hand:
  * `SPARK_GRAFT_CPUS=32 runMain graft.tools.GkProbe /tmp/graft_scale_10x_v2`.
  */
object GkProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_scale_10x_v2")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def timed[A](label: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[gk-probe] $label%-36s $dt%8.2f s")
      (a, dt)
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val ranked = graft.operators.StreamingQueries.docQuartiles(docs)
    val state = java.nio.file.Files.createTempDirectory("graft_gkprobe_")
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
    // fold the third quartile as 16 constant-size batches → 16 gk gens
    val wave = ranked.filter(col("bucket") === 2).drop("bucket")
    val batches = 16
    (0 until batches).foreach { i =>
      graft.operators.Dedup.ccIvmBatch(
        wave.filter(pmod(xxhash64(lit("gkp"), col("doc_id")),
          lit(batches)) === i),
        rd("sh"), rd("sig"), rd("lbl"), emptyRemap, rd("gk"),
        state, f"b$i%05d")
    }
    // the skinny MIN fold at depth 16 vs the same rows at depth 0
    val (nDeep, tDeep) = timed("gk MIN fold @depth16") {
      rd("gk").groupBy(col("gkey")).agg(min(col("doc_id"))).count()
    }
    rd("gk").write.mode("overwrite")
      .parquet(state.resolve("gkflat").toString)
    val flat = spark.read.parquet(state.resolve("gkflat").toString)
    val (nFlat, tFlat) = timed("gk MIN fold @depth0 (compacted)") {
      flat.groupBy(col("gkey")).agg(min(col("doc_id"))).count()
    }
    require(nDeep == nFlat, s"rep counts diverged: $nDeep vs $nFlat")
    // one more full fold at each layout: the end-to-end depth bill
    val probeBatch = ranked.filter(col("bucket") === 3).drop("bucket")
      .filter(pmod(xxhash64(lit("gkq"), col("doc_id")), lit(batches)) === 0)
    val (_, tFold16) = timed("ccIvmBatch @gk-depth16") {
      graft.operators.Dedup.ccIvmBatch(probeBatch,
        rd("sh"), rd("sig"), rd("lbl"), emptyRemap, rd("gk"),
        state, "b00099")
    }
    println(f"| gk MIN fold @16 gens | $tDeep%.2f | @1 gen | $tFlat%.2f |" +
      f" reps $nDeep | full fold @depth16 $tFold16%.2f s |")
    spark.stop()
  }
}
