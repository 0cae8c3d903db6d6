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

/** One smoothed hour of the seasonal recurrence. */
case class HourHw(event_type: String, hour_epoch: Long, n: Long,
    level_scaled: Long, trend_scaled: Long, seasonal_scaled: Long,
    forecast_scaled: Long)

/** The Holt-Winters carry: level, trend, and the 24-slot hour-of-day
  * seasonal vector (`has` distinguishes the pre-seed state from a real
  * zero level).
  */
case class HwState(has: Boolean, l: Long, b: Long, seas: Seq[Long])

/** Keyed Holt-Winters smoother — `events_holtwinters`' recurrence as
  * streaming state: O(26 longs) per series however long the stream,
  * each emitted row final. Hours sort within the batch and the state
  * crosses batch boundaries, so the drained output equals the batch
  * fold (the shared oracle). Slots key on TRUE hour-of-day, exactly as
  * the batch face, so replay batching can't rotate the season.
  */
class HoltWintersProcessor(scale: Long = 1000L)
    extends StatefulProcessor[String, HourCount, HourHw] {

  @transient private var st: ValueState[HwState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[HwState]("hw",
      Encoders.product[HwState], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[HourCount],
      timerValues: TimerValues): Iterator[HourHw] = {
    var s0 = if (st.exists()) st.get()
      else HwState(has = false, 0L, 0L, Seq.fill(24)(0L))
    val out = scala.collection.mutable.ArrayBuffer.empty[HourHw]
    rows.toArray.sortBy(_.hour_epoch).foreach { r =>
      val idx = ((r.hour_epoch / 3600) % 24).toInt
      val fcSlot = (idx + 1) % 24
      if (!s0.has) {
        val l = r.n * scale
        out += HourHw(key, r.hour_epoch, r.n, l, 0L, 0L,
          l + 0L + s0.seas(fcSlot))
        s0 = HwState(has = true, l, 0L, s0.seas)
      } else {
        val sOld = s0.seas(idx)
        val lp = (r.n * scale - sOld + s0.l + s0.b) / 2
        val bp = (s0.b + (lp - s0.l)) / 2
        val sn = (sOld + r.n * scale - lp) / 2
        // forecast reads the PRE-update vector (mod-24 neighbors
        // never collide), matching both the batch fold and the oracle
        out += HourHw(key, r.hour_epoch, r.n, lp, bp, sn,
          lp + bp + s0.seas(fcSlot))
        s0 = HwState(has = true, lp, bp, s0.seas.updated(idx, sn))
      }
    }
    if (s0.has) st.update(s0)
    out.iterator
  }
}
