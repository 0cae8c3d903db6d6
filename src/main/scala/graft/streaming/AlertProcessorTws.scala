package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._
import graft.model.MetagameEvent

/** The K2/K3 state machine on the Spark 4-native `transformWithState`
  * API (the `StatefulProcessor` SURVEY.md §7 step 3 names as the primary
  * path; [[AlertPipeline.updates]] is the stable-API twin). Requires the
  * RocksDB state store provider. Native TTL comes from `TTLConfig` on the
  * value state (processing-time based in this API) rather than explicit
  * timers.
  *
  * CANONICAL TTL SEMANTICS: event-time, as implemented by
  * [[AlertPipeline]] — that is the path [[GraftApp]] assembles, and the
  * one the `t1_ttl_expiry` oracle checks (the reference's purge compares
  * EVENT timestamps against the 5400 s horizon, `ess_client.py:100-110`).
  * This processor's processing-time `TTLConfig` is an API constraint of
  * `transformWithState`; treat it as the RocksDB-native demonstration,
  * not the service default — replayed history would expire by wall clock
  * here, which is the wrong clock for the reference's contract.
  */
class AlertProcessorTws(ttl: TTLConfig)
    extends StatefulProcessor[String, MetagameEvent, AlertUpdate] {

  @transient private var state: ValueState[MetagameEvent] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[MetagameEvent](
      "alert", Encoders.product[MetagameEvent], ttl)

  override def handleInputRows(
      key: String,
      rows: Iterator[MetagameEvent],
      timerValues: TimerValues): Iterator[AlertUpdate] = {
    val prior = if (state.exists()) Some(state.get()) else None
    val newest = (prior ++ rows).maxBy(e => (e.timestamp, e.eventId))
    val live = newest.state == MetagameEvent.Started
    // tombstones stay in state (TTL-bounded) so a late older `started`
    // cannot resurrect a key — same LWW rule as AlertPipeline
    state.update(newest)
    Iterator.single(AlertUpdate(key,
      if (live) "live" else "removed",
      newest.eventId, newest.worldId, newest.timestamp))
  }
}

object AlertProcessorTws {

  /** transformWithState wiring; mirror of [[AlertPipeline.updates]].
    * State TTL is only legal in processing-time mode, so the time mode
    * follows the TTL configuration.
    */
  def updates(
      events: Dataset[MetagameEvent],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[AlertUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    val mode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    events.groupByKey(_.id)
      .transformWithState(new AlertProcessorTws(ttl), mode, OutputMode.Update())
  }
}
