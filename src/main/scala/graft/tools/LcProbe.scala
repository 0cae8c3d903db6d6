package graft.tools

import org.apache.spark.sql.functions._

/** Decomposition probe for the lifecycle capstone's per-family cost
  * (the r17 verdict's #4): where do the ~40 s live — base builds that
  * RE-DERIVE what a shared artifact already holds, the folds, or the
  * takedown/compaction rewrites? Times each step in isolation, plus
  * the shared-artifact adoption alternative for the dedup base. Run by
  * hand:
  * `SPARK_GRAFT_CPUS=32 runMain graft.tools.LcProbe /root/testdata/sf0.1`.
  */
object LcProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[lc-probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      a
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val ranked = timed("wave schedule (rank quartiles)") {
      val r = graft.operators.StreamingQueries.docQuartiles(docs)
      r.count(); r
    }
    val baseDocs = ranked.filter(col("bucket") < 2).drop("bucket")
    val waveADocs = ranked.filter(col("bucket") === 2).drop("bucket")
    val run = java.nio.file.Files.createTempDirectory("graft_lcprobe_")
    // ---- text family ----
    val tix = run.resolve("text")
    timed("text base gen (re-derive, half)") {
      graft.operators.StreamingQueries.textIndexGen(baseDocs, tix, "base")
    }
    timed("text waveA gen (quarter)") {
      graft.operators.StreamingQueries.textIndexGen(waveADocs, tix,
        "b00000")
    }
    // ---- dedup family: re-derive vs shared-artifact slice ----
    timed("dedup base sig (re-derive, half)") {
      graft.operators.Dedup.minhashSig(
          graft.operators.Dedup.shingleRows(baseDocs))
        .write.mode("overwrite")
        .parquet(run.resolve("dedup_rederive").toString)
    }
    timed("dedup base sig (shared slice, half)") {
      graft.operators.Dedup.sharedSigSlice(spark, d,
          baseDocs.select(col("doc_id")))
        .write.mode("overwrite")
        .parquet(run.resolve("dedup_adopted").toString)
    }
    // the two must be row-identical (values by construction)
    val a = spark.read.parquet(run.resolve("dedup_rederive").toString)
    val b = spark.read.parquet(run.resolve("dedup_adopted").toString)
    println(s"[lc-probe] slice==rederive rows: " +
      s"${a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty}")
    // ---- the full composed replay, phase prints to stderr ----
    timed("lifecycle composed replay (full)") {
      graft.operators.StreamingQueries.ensureLifecycle(spark, d)
    }
    timed("lifecycle STREAM replay (full)") {
      graft.operators.StreamingQueries.ensureLifecycleStream(spark, d)
    }
    spark.stop()
  }
}
