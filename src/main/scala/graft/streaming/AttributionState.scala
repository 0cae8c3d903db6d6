package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** One finalized hour of one user's walk with exact-cents values — the
  * attribution topology's stage-1 row (the valued sibling of
  * [[UserHourTyped]]; the paths/state-history topology carries no
  * values, so this face stages its own).
  */
case class UserHourValued(user_id: Long, hour_epoch: Long,
    evs: Seq[ValuedEv])

case class ValuedEv(ts: Long, event_id: Long, event_type: String,
    cents: Long)

/** One credited purchase: the touch type it attributes to and its
  * exact-cents value — final on emission, so the sink re-aggregates
  * freely (the report is a groupBy over these rows).
  */
case class TouchCredit(user_id: Long, touch_type: String, cents: Long)

/** The pure last-touch fold — kept off the processor so the ordering
  * argument is testable without a streaming harness (the
  * [[PathsFold]] discipline).
  */
object AttributionFold {

  /** Walk one batch of finalized hours in event-time order: a
    * `view`/`click` becomes the carried touch, a `purchase` emits one
    * credit against the carried touch (`direct` when none yet).
    * EXACTNESS (vs the batch ignoreNulls carry window): hours arrive
    * ascending across batches (watermark monotonicity), hours sort
    * within the batch and events within the hour by `(ts, event_id)` —
    * the batch window's exact total order; the carried touch is the
    * window's `last(touch) ignoreNulls` over the strict predecessors,
    * and the one-string state carries it across every batch boundary.
    */
  def step(key: Long, state: String, rows: Seq[UserHourValued])
      : (String, Seq[TouchCredit]) = {
    var st = state
    val out = Seq.newBuilder[TouchCredit]
    rows.sortBy(_.hour_epoch).foreach { hr =>
      hr.evs.sortBy(e => (e.ts, e.event_id)).foreach { e =>
        if (e.event_type == "view" || e.event_type == "click")
          st = e.event_type
        else if (e.event_type == "purchase")
          out += TouchCredit(key, if (st.isEmpty) "direct" else st, e.cents)
      }
    }
    (st, out.result())
  }
}

/** Keyed per-user last-touch attributor — the streaming face of the
  * batch `events_attribution` carry window. O(1) state per user (one
  * string), one emitted row per purchase, each final on emission.
  */
class AttributionProcessor
    extends StatefulProcessor[Long, UserHourValued, TouchCredit] {

  @transient private var st: ValueState[String] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[String]("touch", Encoders.STRING,
      TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[UserHourValued],
      timerValues: TimerValues): Iterator[TouchCredit] = {
    val prev = if (st.exists()) st.get() else ""
    val (next, out) = AttributionFold.step(key, prev, rows.toSeq)
    if (next.nonEmpty) st.update(next)
    out.iterator
  }
}
