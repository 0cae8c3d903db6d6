package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.model.MetagameEvent
import graft.streaming.{AlertStateTable, AlertUpdate}

/** The durable foreachBatch-merge state table: create → count → remove →
  * count across micro-batches (the reference's simulate_alert harness
  * against the lake-table backend), plus idempotent re-merge.
  */
class StateTableSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(id: String, state: String, ts: Double): MetagameEvent =
    MetagameEvent(id, 1, state, 17, 1, 40, 30, 20, 25, ts)

  test("create -> count -> remove -> count across micro-batches") {
    val dir = Files.createTempDirectory("alert_table").toString
    val table = new AlertStateTable(dir)
    val mem = MemoryStream[MetagameEvent](spark)

    mem.addData(Seq(ev("17-1", "started", 1000), ev("19-2", "started", 1100)))
    val q1 = AlertStateTable.sink(mem.toDS(), table, ttlSeconds = None).start()
    try q1.awaitTermination() finally q1.stop()
    assert(table.snapshot(spark).count() == 2)

    mem.addData(Seq(ev("17-1", "ended", 2000)))
    val q2 = AlertStateTable.sink(mem.toDS(), table, ttlSeconds = None).start()
    try q2.awaitTermination() finally q2.stop()
    val live = table.snapshot(spark).select("id").as[String].collect().toSet
    assert(live == Set("19-2"))
  }

  test("late older started does not resurrect a removed key in the table") {
    val dir = Files.createTempDirectory("alert_table3").toString
    val table = new AlertStateTable(dir)
    table.merge(spark, Seq(AlertUpdate("17-1", "removed", 2, 17, 2000.0)).toDF())
    // a retried/late batch delivers the original (older) live update
    table.merge(spark, Seq(AlertUpdate("17-1", "live", 1, 17, 1000.0)).toDF())
    assert(table.snapshot(spark).count() == 0,
      "tombstone must outrank the older live update")
  }

  test("re-merging the same updates is a no-op (at-least-once safety)") {
    val dir = Files.createTempDirectory("alert_table2").toString
    val table = new AlertStateTable(dir)
    val updates = Seq(
      AlertUpdate("17-1", "live", 1, 17, 1000.0),
      AlertUpdate("19-2", "removed", 2, 19, 1100.0)).toDF()
    table.merge(spark, updates)
    val first = table.snapshot(spark).collect().map(_.toString).sorted
    table.merge(spark, updates) // redelivery
    val second = table.snapshot(spark).collect().map(_.toString).sorted
    assert(first.sameElements(second))
    assert(first.length == 1)
  }
}
