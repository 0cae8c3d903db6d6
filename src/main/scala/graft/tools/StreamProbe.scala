package graft.tools

/** Minimal timing probe for the STREAMING lifecycle capstone alone —
  * the box shows multi-minute noise windows, so cross-run A/Bs need
  * cheap samples (one stream replay per JVM, ~1-2 min) interleaved per
  * config instead of one LcProbe sample per config. Run by hand:
  * `SPARK_GRAFT_CPUS=32 runMain graft.tools.StreamProbe /root/testdata/sf0.1`.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    // the bench's warmup shape: pay session constants before the clock
    try {
      graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem").count()
      graft.SparkEntry.queries("stream_inprogress")(
        spark, "/root/testdata/sf0.001").count()
    } catch { case _: Throwable => () }
    val t0 = System.nanoTime()
    graft.operators.StreamingQueries.ensureLifecycleStream(spark, d)
    println(f"[stream-probe] lifecycle STREAM replay " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
