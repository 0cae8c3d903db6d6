package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** One finalized `(user, hour, type)` row from the windowed stage of
  * the streaming funnel: EVERY event timestamp (raw nanos) that user
  * produced for that type in that hour. The full list — not just the
  * hour's min — is required for exactness: with only the min, a click
  * at 5.2 would be rejected against a view at 5.5 even when a second
  * click at 5.8 qualifies.
  */
case class UserHourEvents(user_id: Long, hour_epoch: Long,
    event_type: String, ts_list: Seq[Long])

/** One user's funnel progress: earliest view, earliest click strictly
  * after it, earliest purchase strictly after that —
  * [[FunnelFold.Unset]] where the stage is not (yet) reached. Each
  * field is SET-ONCE under hour-ordered processing (see
  * [[FunnelFold.step]]), so any read-back aggregation (min, last)
  * recovers the final state.
  */
case class FunnelSnapshot(user_id: Long, v: Long, c: Long, p: Long)

/** The pure funnel fold — kept off the processor so the ordering
  * argument is testable without a streaming harness.
  */
object FunnelFold {
  val Unset: Long = Long.MaxValue

  /** Fold one micro-batch of finalized hour rows into the `(v, c, p)`
    * state. EXACTNESS ARGUMENT (vs the batch three-window funnel):
    * append-mode watermarking delivers hour windows in ascending
    * event-time order across batches, and this fold sorts within the
    * batch, so hours apply in order. A view in a LATER hour has a
    * larger timestamp than the current minimum and can never lower
    * `v`; hence once `v` is set it is final, and judging an hour's
    * clicks against the current `v` equals judging them against the
    * batch-global earliest view (a future-hour view would exceed any
    * current-hour click anyway — both faces reject). Within one hour,
    * views apply before clicks before purchases, which reproduces the
    * strict `>` chain exactly. The same argument chains c → p.
    */
  def step(state: (Long, Long, Long),
      rows: Seq[UserHourEvents]): (Long, Long, Long) = {
    var (v, c, p) = state
    rows.groupBy(_.hour_epoch).toSeq.sortBy(_._1).foreach { case (_, hr) =>
      def minOver(t: String, floor: Long): Long = {
        val cand = hr.iterator.filter(_.event_type == t)
          .flatMap(_.ts_list).filter(_ > floor)
        if (cand.isEmpty) Unset else cand.min
      }
      val hv = hr.iterator.filter(_.event_type == "view").flatMap(_.ts_list)
      if (hv.nonEmpty) v = math.min(v, hv.min)
      if (v != Unset && c == Unset) c = minOver("click", v)
      if (c != Unset && p == Unset) p = minOver("purchase", c)
    }
    (v, c, p)
  }
}

/** Keyed per-user funnel state machine over a stream of FINALIZED
  * `(user, hour, type, ts_list)` rows — the streaming face of the
  * batch `funnel_conversion` three-window chain. O(1) state per user
  * (three longs), O(batch) work per batch; emits a snapshot only when
  * the user's state changes, so sink volume is bounded by 3 rows per
  * user over the stream's life, not by event volume.
  */
class FunnelStageProcessor
    extends StatefulProcessor[Long, UserHourEvents, FunnelSnapshot] {

  @transient private var st: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long, Long)]("funnel",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong), TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[UserHourEvents],
      timerValues: TimerValues): Iterator[FunnelSnapshot] = {
    val before = Option(st.get())
      .getOrElse((FunnelFold.Unset, FunnelFold.Unset, FunnelFold.Unset))
    val after = FunnelFold.step(before, rows.toArray.toSeq)
    if (after == before) Iterator.empty
    else {
      st.update(after)
      Iterator.single(FunnelSnapshot(key, after._1, after._2, after._3))
    }
  }
}
