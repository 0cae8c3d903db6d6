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
