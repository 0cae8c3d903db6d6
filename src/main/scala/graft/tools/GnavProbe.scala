package graft.tools

/** One-off timing probe for the gnav insert walk — decomposes
  * `gnav_insert_build`'s wall-clock (the #1 bench item) into artifact
  * adoption, the arrival walk, and the connect/re-cap write, so the
  * shave targets the segment that actually pays. Not registered
  * anywhere; run by hand:
  * `SPARK_GRAFT_CPUS=32 runMain graft.tools.GnavProbe`.
  */
object GnavProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus.toInt)
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[gnav-probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      a
    }
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val stageMs = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          stages.incrementAndGet()
          val i = sc.stageInfo
          for (a <- i.submissionTime; b <- i.completionTime) {
            stageMs.addAndGet(b - a)
            if (b - a > 400)
              println(s"[gnav-probe] SLOW stage ${i.stageId} " +
                s"${b - a}ms tasks=${i.numTasks} ${i.name.take(80)}")
          }
        }
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
      })
    def snap(label: String): Unit = {
      println(s"[gnav-probe] $label jobs=${jobs.getAndSet(0)} " +
        s"stages=${stages.getAndSet(0)} stageSec=${stageMs.getAndSet(0) / 1e3} " +
        s"taskSec=${taskMs.getAndSet(0) / 1e3}")
    }
    sys.env.get("GNAV_PROBE_CONF").foreach { kvs =>
      kvs.split(',').foreach { kv =>
        val Array(k, v) = kv.split('=')
        spark.conf.set(k, v)
        println(s"[gnav-probe] conf $k=$v")
      }
    }
    timed("gnav_shared_build")(
      graft.operators.Similarity.ensureGnavArtifact(spark, d))
    snap("shared")
    timed("gnav_insert_build")(
      graft.operators.Similarity.ensureGnavInsert(spark, d))
    snap("insert")
    timed("gnav_insert_build adopt")(
      graft.operators.Similarity.ensureGnavInsert(spark, d))
    spark.stop()
  }
}
