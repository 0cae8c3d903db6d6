package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** One finalized hourly count for one event type (the append-mode
  * output of the windowed-count stage).
  */
case class HourCount(event_type: String, hour_epoch: Long, n: Long)

/** The anomaly verdict for one hour: the count, its trailing baseline
  * (`w_cnt` observed hours, `w_sum` events), and the integer-exact
  * spike flag `n·w_cnt > 2·w_sum` — the same row the batch
  * `events_anomaly` query emits.
  */
case class HourAnomaly(event_type: String, hour_epoch: Long, n: Long,
    w_cnt: Long, w_sum: Long, is_spike: Boolean)

/** Keyed trailing-window baseline over a stream of FINALIZED hourly
  * counts: per event type, a ring of the last [[window]] observed hours
  * rides in keyed state; each arriving hour is judged against the ring
  * (count vs 2× trailing mean, integer cross-multiplication) and then
  * joins it. O(window) state per key, O(batch·window) work per batch —
  * the streaming shape of the batch query's `rowsBetween(-24, -1)`
  * frame, with no re-sort of history ever.
  *
  * Ordering: append-mode watermarking guarantees hours ARRIVE in
  * ascending event-time order ACROSS batches (a window only emits once
  * the watermark passes it, and the watermark is monotone); within a
  * batch the processor sorts its rows, so the ring always extends in
  * hour order — making the fold equal to the batch window frame,
  * which is why the two faces share one oracle.
  */
class TrailingBaselineProcessor(window: Int = 24)
    extends StatefulProcessor[String, HourCount, HourAnomaly] {

  @transient private var ring: ListState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    ring = getHandle.getListState[(Long, Long)]("ring",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[HourCount],
      timerValues: TimerValues): Iterator[HourAnomaly] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    ring.get().foreach(buf += _)
    val out = scala.collection.mutable.ArrayBuffer.empty[HourAnomaly]
    rows.toArray.sortBy(_.hour_epoch).foreach { r =>
      val wSum = buf.iterator.map(_._2).sum
      out += HourAnomaly(key, r.hour_epoch, r.n, buf.length, wSum,
        buf.nonEmpty && r.n * buf.length > 2 * wSum)
      buf += ((r.hour_epoch, r.n))
      if (buf.length > window) buf.remove(0, buf.length - window)
    }
    ring.clear()
    if (buf.nonEmpty) ring.appendList(buf.toArray)
    out.iterator
  }
}

/** One EWMA-smoothed hour for one event type — the same row the batch
  * `events_ewma` query emits (`ewma_scaled` = the 1000-scaled integer
  * state).
  */
case class HourEwma(event_type: String, hour_epoch: Long, n: Long,
    ewma_scaled: Long)

/** Keyed integer EWMA (α = 1/2) over a stream of FINALIZED hourly
  * counts: per event type, ONE long of keyed state (the scaled
  * smoothed value), updated `s ← (s + n·scale) div 2` per arriving
  * hour, seeded at the first hour's `n·scale` — the streaming shape of
  * the batch query's `aggregate`-HOF recurrence, O(1) state per key.
  * The same watermark-ordering argument as
  * [[TrailingBaselineProcessor]] (hours arrive in ascending event-time
  * order across batches; within a batch the processor sorts) makes the
  * fold equal to the batch recurrence, so the two faces share one
  * oracle.
  */
class EwmaProcessor(scale: Long = 1000L)
    extends StatefulProcessor[String, HourCount, HourEwma] {

  @transient private var st: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Long]("s", Encoders.scalaLong,
      TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[HourCount],
      timerValues: TimerValues): Iterator[HourEwma] = {
    var has = st.exists()
    var s0 = if (has) st.get() else 0L
    val out = scala.collection.mutable.ArrayBuffer.empty[HourEwma]
    rows.toArray.sortBy(_.hour_epoch).foreach { r =>
      s0 = if (!has) { has = true; r.n * scale }
        else (s0 + r.n * scale) / 2
      out += HourEwma(key, r.hour_epoch, r.n, s0)
    }
    if (has) st.update(s0)
    out.iterator
  }
}
