package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.model.MetagameEvent
import graft.streaming.WindowedAggs

class WindowedAggsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(id: String, state: String, ts: Double): MetagameEvent =
    MetagameEvent(id, 1, state, 17, 1, 40, 30, 20, 25, ts)

  test("windowed counts bucket by event-time hour") {
    val mem = MemoryStream[MetagameEvent](spark)
    val base = 1700000000.0 // falls inside some hour bucket
    val hour = (base / 3600).floor * 3600
    mem.addData(Seq(
      ev("17-1", "started", hour + 10), ev("17-2", "started", hour + 20),
      ev("17-3", "ended", hour + 30), ev("17-4", "started", hour + 3700)))
    val name = s"wc_${System.nanoTime()}"
    val q = WindowedAggs.windowedCounts(mem.toDS())
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table(name)
      .selectExpr("CAST(window_start AS LONG)", "state", "n")
      .as[(Long, String, Long)].collect().toSet
    assert(rows == Set(
      (hour.toLong, "started", 2L),
      (hour.toLong, "ended", 1L),
      (hour.toLong + 3600, "started", 1L)))
  }

  test("update mode: watermark eviction drops closed windows from state") {
    val mem = MemoryStream[MetagameEvent](spark)
    val name = s"we_${System.nanoTime()}"
    val q = WindowedAggs.windowedCounts(mem.toDS())
      .writeStream.outputMode("update").format("memory").queryName(name)
      .start()
    try {
      val base = 1700000000.0
      // four distinct hour-windows in one batch; the resulting watermark
      // (max event time - 30 min) closes the first two, and Spark's
      // no-data cleanup batch evicts them before processAllAvailable
      // returns - state holds only the 2 still-open windows, not 4
      mem.addData((0 until 4).map(h =>
        ev(s"17-$h", "started", base + h * 3600)))
      q.processAllAvailable()
      val before = q.lastProgress.stateOperators.head.numRowsTotal
      assert(before == 2,
        s"watermark must evict the 2 closed windows (4 seen), state=$before")
      // jump event time far past everything: the earlier windows all close
      mem.addData(Seq(ev("17-x", "started", base + 100 * 3600)))
      q.processAllAvailable()
      val after = q.lastProgress.stateOperators.head.numRowsTotal
      assert(after <= 1,
        s"closed windows must be evicted from state, still holding $after")
      // and every window ever opened still reached the sink (update rows)
      val emitted = spark.table(name).select("window_start").distinct().count()
      assert(emitted == 5, s"all 5 windows must have been emitted: $emitted")
    } finally q.stop()
  }

  test("session windows: streaming append emits exactly the watermark-closed batch sessions") {
    val sf = SparkTestSession.sf
    import org.apache.spark.sql.functions._
    // batch truth: session_window over the events table
    val batchDf = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("ts"))
    def canon(df: org.apache.spark.sql.DataFrame) = df.selectExpr(
      "user_id", "CAST(session_start AS STRING)",
      "CAST(session_end AS STRING)", "n")
      .as[(Long, String, String, Long)].collect().toSet
    val batch = canon(WindowedAggs.sessionWindows(batchDf))
    assert(batch.nonEmpty)
    // streaming: same rows through readStream -> session_window, append
    // mode (a session is emitted once the watermark passes its close)
    // read with the on-disk schema (long nanos in old testdata, native
    // micros in new) and normalize to a plain UTC TIMESTAMP: watermarks
    // reject TIMESTAMP_NTZ; the session runs in UTC so the rendered
    // strings match the batch NTZ side either way
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val raw0 = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sf)
    val raw = (schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw0.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => raw0.withColumn("ts", col("ts").cast("timestamp"))
    }).select(col("user_id"), col("ts"))
    val name = s"sess_${System.nanoTime()}"
    val q = WindowedAggs.sessionWindows(raw)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val streamed = canon(spark.table(name))
    // final watermark = max event time - 30 min: sessions closed before
    // it MUST be emitted; later ones legitimately stay open in state
    val wm = batchDf
      .selectExpr("CAST(max(ts) - INTERVAL 30 MINUTES AS STRING)")
      .as[String].collect()(0)
    val mustEmit = batch.filter { case (_, _, end, _) => end < wm }
    assert(mustEmit.subsetOf(streamed),
      s"missing closed sessions: ${(mustEmit -- streamed).take(3)}")
    assert(streamed.subsetOf(batch),
      s"streamed emitted sessions disagree with batch: ${(streamed -- batch).take(3)}")
  }

  test("append-mode sessions merge across batches and a sentinel drains the tail") {
    import org.apache.spark.sql.functions._
    // user 1: two separate sessions land in batch 1 (gap 3000 s > the
    // 1800 s session gap), then batch 2 drops an event BETWEEN them -
    // the engine must merge all three into ONE emitted session. user 2
    // only appears in batch 1. Batch 3 is the watermark-flush sentinel
    // (graft's streamSessionize drain move): without it the sessions
    // stay open in state and append mode emits nothing.
    val b1 = Seq((1L, 0L), (1L, 3000L), (2L, 10L))
    val b2 = Seq((1L, 1500L))
    val sentinel = Seq((-1L, 3000L + 3 * 1800L))
    val all = (b1 ++ b2).toDF("user_id", "sec")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"))
    val truth = WindowedAggs.sessionWindows(all)
      .selectExpr("user_id", "CAST(session_start AS LONG)",
        "CAST(session_end AS LONG)", "n")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(truth.map(_._1) == Set(1L, 2L) &&
      truth.count(_._1 == 1L) == 1, s"merge premise broken: $truth")

    val name = s"sessmerge_${System.nanoTime()}"
    val mem = MemoryStream[(Long, Long)](spark)
    val events = mem.toDS().toDF("user_id", "sec")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"))
    val q = WindowedAggs.sessionWindows(events)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    try {
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      mem.addData(sentinel); q.processAllAvailable()
      // one more pass so the no-data batch after the watermark advance
      // flushes the closed sessions
      q.processAllAvailable()
    } finally q.stop()

    val emitted = spark.table(name)
      .filter(col("user_id") >= 0)
      .selectExpr("user_id", "CAST(session_start AS LONG)",
        "CAST(session_end AS LONG)", "n")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(emitted == truth,
      s"streamed sessions diverged:\n got $emitted\n want $truth")
  }

  test("stream_sessionize emits the exact column types of its batch twin") {
    // r7 shipped the streaming face reading its sink back as LTZ TIMESTAMP
    // while the batch twin (sessionize_native, the shared oracle) emits
    // NTZ bounds -> driver schema_match=false. Pin: both faces must
    // declare identical (name, dataType) columns forever.
    val sf = SparkTestSession.sf
    val streaming = SparkEntry.queries("stream_sessionize")(spark, sf)
    val batch = SparkEntry.queries("sessionize_native")(spark, sf)
    val st = streaming.schema.map(f => (f.name, f.dataType))
    val bt = batch.schema.map(f => (f.name, f.dataType))
    assert(st == bt,
      s"streaming/batch sessionize schemas diverged:\n  stream: $st\n  batch:  $bt")
  }

  test("stream_late_drops: out-of-order replay drops late rows, emits only closed windows") {
    val sf = SparkTestSession.sf
    import spark.implicits._
    val got = SparkEntry.queries("stream_late_drops")(spark, sf)
      .as[(Long, String, Long)].collect()
    // append mode: every window emitted at most once
    assert(got.map(r => (r._1, r._2)).distinct.length == got.length)
    val events = Tables.load(spark, sf, "events")
    val hourly = events
      .groupBy(org.apache.spark.sql.functions.date_trunc("hour", $"ts")
        .as("h"), $"event_type")
      .count()
      .selectExpr("CAST(unix_seconds(h) AS LONG)", "event_type", "count")
      .as[(Long, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // the hash-ordered replay must produce REAL drops: strictly fewer
    // rows than arrived, and no window can exceed its true count
    assert(got.map(_._3).sum < events.count(), "no late rows were dropped")
    assert(got.forall(r => r._3 <= hourly((r._1, r._2))),
      "a window counted more rows than exist")
    // windows newer than the final watermark stay open and never emit:
    // nothing within the last hour of the stream may appear
    val maxEpoch = events
      .selectExpr("max(CAST(unix_seconds(CAST(ts AS TIMESTAMP)) AS LONG))")
      .as[Long].head()
    // end ≤ final watermark (≈ max − 1 h; 1 s slack for ms flooring)
    assert(got.forall(r => r._1 + 3600 <= maxEpoch - 3599),
      "an un-evictable window was emitted")
    assert(got.nonEmpty)
  }

  test("dropDuplicatesWithinWatermark suppresses redelivered frames") {
    val mem = MemoryStream[MetagameEvent](spark)
    val name = s"dd_${System.nanoTime()}"
    val q = WindowedAggs.dedupedWithinWatermark(mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    try {
      val e = ev("17-1", "started", 1000)
      mem.addData(Seq(e, e)) // duplicate within one batch
      q.processAllAvailable()
      mem.addData(Seq(e)) // at-least-once redelivery in a later batch
      q.processAllAvailable()
      assert(spark.table(name).count() == 1)
    } finally q.stop()
  }
}
