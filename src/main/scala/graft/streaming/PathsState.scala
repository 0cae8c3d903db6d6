package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** One emitted 3-step journey — the path string the batch face counts
  * (`events_paths`' `t1>t2>t3`), keyed to its user only so the sink
  * stays re-aggregable.
  */
case class PathHit(user_id: Long, path: String)

/** The last two events of one user's walk — all the state a trigram
  * emitter needs. Empty `ty` marks an unfilled slot.
  */
case class LastTwo(ts1: Long, id1: Long, ty1: String,
    ts2: Long, id2: Long, ty2: String)

/** The pure trigram walk fold — kept off the processor so the
  * ordering argument is testable without a streaming harness.
  */
object PathsFold {

  val Empty: LastTwo = LastTwo(0L, 0L, "", 0L, 0L, "")

  /** Fold one micro-batch of finalized hour rows, emitting one trigram
    * per event that has two predecessors. EXACTNESS ARGUMENT (vs the
    * batch double-lead walk): hour windows arrive in ascending
    * event-time order across batches, hours sort within the batch and
    * events within the hour by `(ts, event_id)` — the exact order the
    * batch face's window walks. A trigram depends only on three
    * CONSECUTIVE events of that order, and the two-event state carries
    * consecutiveness across every batch boundary, so the emitted
    * multiset of paths equals the batch enumeration row-for-row.
    */
  def step(key: Long, state: LastTwo, rows: Seq[UserHourTyped])
      : (LastTwo, Seq[PathHit]) = {
    var st = state
    val out = Seq.newBuilder[PathHit]
    rows.sortBy(_.hour_epoch).foreach { hr =>
      hr.evs.sortBy(e => (e.ts, e.event_id)).foreach { e =>
        if (st.ty1.nonEmpty && st.ty2.nonEmpty)
          out += PathHit(key, s"${st.ty1}>${st.ty2}>${e.event_type}")
        st = LastTwo(st.ts2, st.id2, st.ty2, e.ts, e.event_id, e.event_type)
      }
    }
    (st, out.result())
  }
}

/** Keyed per-user trigram emitter over a stream of FINALIZED
  * `(user, hour, events)` rows — the streaming face of the batch
  * `events_paths` journey walk. O(1) state per user (two events);
  * emits one row per post-warmup event, each final on emission
  * (append-clean), so the journey counts aggregate downstream without
  * replay corrections.
  */
class PathsProcessor
    extends StatefulProcessor[Long, UserHourTyped, PathHit] {

  @transient private var st: ValueState[LastTwo] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[LastTwo]("lasttwo",
      Encoders.product[LastTwo], TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[UserHourTyped],
      timerValues: TimerValues): Iterator[PathHit] = {
    val before = Option(st.get()).getOrElse(PathsFold.Empty)
    val (after, out) = PathsFold.step(key, before, rows.toArray.toSeq)
    if (after != before) st.update(after)
    out.iterator
  }
}
