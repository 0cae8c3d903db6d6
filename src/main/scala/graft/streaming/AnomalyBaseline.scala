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
