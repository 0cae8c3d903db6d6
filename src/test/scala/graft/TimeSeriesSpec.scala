package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TimeSeries

/** Semantics pins for the event-stream analytics the oracle can't probe
  * with interesting shapes on the clean synthetic data.
  */
class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(rows: (Long, String, Long)*) =
    rows.toDF("user_id", "event_type", "s")
      .selectExpr("user_id", "event_type", "timestamp_seconds(s) AS ts")

  test("funnel stages require strict event-time order, not mere presence") {
    // A: all three types but in REVERSE order — only the view counts
    // B: the happy path — all three stages
    // C: view then purchase with no click — purchase must not count
    //    (it needs a click BEFORE it)
    // D: view and click simultaneous — strict > excludes the click
    val funnel = TimeSeries.funnelOn(ev(
      (1L, "purchase", 100L), (1L, "click", 200L), (1L, "view", 300L),
      (2L, "view", 100L), (2L, "click", 200L), (2L, "purchase", 300L),
      (3L, "view", 100L), (3L, "purchase", 200L),
      (4L, "view", 100L), (4L, "click", 100L)))
      .as[(String, Long)].collect().toMap
    assert(funnel == Map("view" -> 4L, "click" -> 1L, "purchase" -> 1L))
  }

  test("funnel later stages pick the EARLIEST qualifying event") {
    // two clicks after the view: the purchase between them qualifies
    // only if the funnel anchors on the first click
    val funnel = TimeSeries.funnelOn(ev(
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 250L),
      (1L, "click", 300L)))
      .as[(String, Long)].collect().toMap
    assert(funnel == Map("view" -> 1L, "click" -> 1L, "purchase" -> 1L))
  }
}
