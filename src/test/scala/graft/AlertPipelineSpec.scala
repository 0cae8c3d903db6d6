package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.model.MetagameEvent
import graft.streaming.{AlertPipeline, AlertUpdate}

/** FIXTURES.md §1 scenarios for the K2/K3/T1 state machine — the Scala
  * equivalent of the reference's `simulate_alert.py` create→count→remove
  * harness, plus the out-of-order and TTL cases the reference never tests.
  */
class AlertPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(id: String, state: String, ts: Double,
      eventId: Int = 1): MetagameEvent =
    MetagameEvent(id, eventId, state, id.split("-")(0).toInt, 1,
      40, 30, 20, 25, ts)

  /** Run a batch of events through the *streaming* pipeline and return all
    * emitted updates.
    */
  private def runStream(batches: Seq[Seq[MetagameEvent]],
      ttl: Option[Long] = None): Seq[AlertUpdate] = {
    val mem = MemoryStream[MetagameEvent](spark)
    val name = s"alert_test_${System.nanoTime()}"
    val q = AlertPipeline.updates(mem.toDS(), ttlSeconds = ttl)
      .writeStream.outputMode("update").format("memory").queryName(name)
      .start()
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      // one extra empty-ish trigger so event-time timeouts fire after the
      // watermark advanced on the last data batch
      if (ttl.isDefined) {
        mem.addData(Seq.empty[MetagameEvent]); q.processAllAvailable()
      }
      spark.table(name).as[AlertUpdate].collect().toSeq
    } finally q.stop()
  }

  private def liveSet(updates: Seq[AlertUpdate]): Set[String] =
    updates.groupBy(_.id).collect {
      case (id, us) if us.maxBy(u => (u.timestamp, u.eventId)).status == "live" => id
    }.toSet

  test("scenario 1: started => key live (create-count harness)") {
    val ups = runStream(Seq(Seq(ev("17-123456", "started", 1000))))
    assert(liveSet(ups) == Set("17-123456"))
  }

  test("scenario 2+3: started then ended/cancelled => key absent") {
    val ups = runStream(Seq(
      Seq(ev("17-1", "started", 1000), ev("19-1", "started", 1000)),
      Seq(ev("17-1", "ended", 2000), ev("19-1", "cancelled", 2000))))
    assert(liveSet(ups).isEmpty)
    assert(ups.count(_.status == "removed") == 2)
  }

  test("scenario 4: ended with no prior started => no-op tombstone") {
    val ups = runStream(Seq(Seq(ev("17-9", "ended", 1000))))
    assert(liveSet(ups).isEmpty)
  }

  test("out-of-order: late started must not resurrect an ended alert") {
    val ups = runStream(Seq(
      Seq(ev("17-5", "ended", 2000)),
      Seq(ev("17-5", "started", 1000)))) // older event arrives later
    assert(liveSet(ups).isEmpty)
    // the tombstone must win INSIDE the state machine: no update in the
    // whole stream may ever claim the key live (a post-processing max-by
    // would mask a resurrection, so assert on the raw updates)
    assert(!ups.exists(_.status == "live"))
  }

  test("scenario 6: same instance on two worlds => distinct keys") {
    val ups = runStream(Seq(Seq(
      ev("17-1", "started", 1000), ev("19-1", "started", 1000))))
    assert(liveSet(ups) == Set("17-1", "19-1"))
  }

  test("scenario 5: TTL expires stale alerts via event-time timeout") {
    val base = 1700000000.0
    val ups = runStream(Seq(
      Seq(ev("17-1", "started", base)),
      // 2h later: another world's alert advances the watermark far past
      // 17-1's 5400s timeout
      Seq(ev("19-2", "started", base + 7200))),
      ttl = Some(5400))
    assert(ups.exists(u => u.id == "17-1" && u.status == "expired"))
    assert(liveSet(ups.filter(_.status != "expired")) contains "19-2")
  }

  test("streaming result == batch snapshot on a random event soup") {
    val rnd = new scala.util.Random(42)
    val soup = (1 to 300).map { i =>
      ev(s"${rnd.nextInt(5)}-${rnd.nextInt(10)}",
        if (rnd.nextBoolean()) "started" else "ended",
        1000.0 + rnd.nextInt(5000), eventId = i)
    }
    val streamed = liveSet(runStream(Seq(soup)))
    val batch = AlertPipeline.inProgressSnapshot(soup.toDS())
      .select("id").as[String].collect().toSet
    assert(streamed == batch)
  }

  test("json wire round-trip preserves every field") {
    val events = Seq(ev("17-123456", "started", 1755000000.0, 123),
      ev("19-1", "cancelled", 1755000100.5, 4))
    val json = MetagameEvent.toJsonCol(events.toDS())
    val back = MetagameEvent.fromJson(json).collect().toSeq
    assert(back.toSet == events.toSet)
    val sample = json.as[String].head
    assert(sample.contains("\"world_id\":17") && sample.contains("\"nc\":40"))
  }
}
