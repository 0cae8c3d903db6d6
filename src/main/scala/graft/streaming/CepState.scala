package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** One purchase judged against the CEP rule — final on emission (the
  * sink re-aggregates by day).
  */
case class CepVerdict(user_id: Long, te: Long, matched: Long)

/** The carried pattern context: ordinals (`te·10⁷+event_id`, the batch
  * face's total-order anchor) of the user's most recent view and error;
  * 0 = none seen yet.
  */
case class CepCarry(lastView: Long, lastError: Long)

/** The pure CEP fold — `view → purchase within 1 h with NO error in
  * between` — kept off the processor so the ordering argument is
  * testable without a streaming harness (the [[PathsFold]] discipline).
  * Events walk in `(ts, event_id)` order (hours sort within the batch,
  * events within the hour); the two-ordinal state crosses every batch
  * boundary, so a view in one micro-batch matches a purchase in a
  * later one exactly as the batch carry window would.
  */
object CepFold {

  /** The batch face's window — referenced, not duplicated, so changing
    * [[graft.operators.TimeSeries.CepWindow]] can never desynchronize
    * this fold from the batch face and their shared oracle (the
    * [[RateLimitFold]]/RlRefillSec discipline).
    */
  val WindowSec: Long = graft.operators.TimeSeries.CepWindow

  /** Guarded `(te, event_id)` packing shared with the batch face: the
    * batch side raises via its codegen'd guard; this side requires the
    * same invariant so a too-large event_id fails loudly in BOTH
    * implementations instead of silently corrupting one total order.
    */
  private[streaming] def packOrd(te: Long, eventId: Long): Long = {
    val base = graft.operators.TimeSeries.OrdBase
    require(eventId >= 0 && eventId < base,
      s"packed ordinal overflow: event_id $eventId outside [0, $base)")
    te * base + eventId
  }

  def step(key: Long, state: CepCarry, rows: Seq[UserHourTyped])
      : (CepCarry, Seq[CepVerdict]) = {
    val base = graft.operators.TimeSeries.OrdBase
    var lv = state.lastView
    var le = state.lastError
    val out = Seq.newBuilder[CepVerdict]
    rows.sortBy(_.hour_epoch).foreach { hr =>
      hr.evs.sortBy(e => (e.ts, e.event_id)).foreach { e =>
        val te = e.ts / 1000000L // micros → seconds
        val ord = packOrd(te, e.event_id)
        e.event_type match {
          case "view" => lv = ord
          case "error" => le = ord
          case "purchase" =>
            val m = lv != 0L && te - lv / base <= WindowSec &&
              (le == 0L || le < lv)
            out += CepVerdict(key, te, if (m) 1L else 0L)
          case _ => ()
        }
      }
    }
    (CepCarry(lv, le), out.result())
  }
}

/** Keyed per-user CEP matcher — the streaming face of the batch
  * `events_cep_match` carry window. O(1) state per user (two longs),
  * one emitted verdict per purchase, each final on emission.
  */
class CepProcessor
    extends StatefulProcessor[Long, UserHourTyped, CepVerdict] {

  @transient private var st: ValueState[CepCarry] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[CepCarry]("cep",
      Encoders.product[CepCarry], TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[UserHourTyped],
      timerValues: TimerValues): Iterator[CepVerdict] = {
    val prev = if (st.exists()) st.get() else CepCarry(0L, 0L)
    val (next, out) = CepFold.step(key, prev, rows.toSeq)
    st.update(next)
    out.iterator
  }
}

/** One admission decision — final on emission; the sink re-aggregates
  * per user and takes the newest `tok_after` by ordinal.
  */
case class RlVerdict(user_id: Long, ord: Long, allowed: Long,
    tok_after: Long)

/** The carried bucket: last event's epoch second (−1 = none yet) and
  * the scaled token level.
  */
case class RlCarry(pt: Long, tok: Long)

/** The pure token-bucket fold — `events_rate_limit`'s recurrence, kept
  * off the processor (the [[CepFold]] discipline). Refill accrues from
  * the previous event's time, which the carry crosses batch
  * boundaries with, so a burst split across micro-batches is charged
  * exactly as the batch fold charges it.
  */
object RateLimitFold {

  def step(key: Long, state: RlCarry, rows: Seq[UserHourTyped])
      : (RlCarry, Seq[RlVerdict]) = {
    var pt = state.pt
    var tok = state.tok
    val out = Seq.newBuilder[RlVerdict]
    rows.sortBy(_.hour_epoch).foreach { hr =>
      hr.evs.sortBy(e => (e.ts, e.event_id)).foreach { e =>
        val te = e.ts / 1000000L
        val refill = if (pt < 0) 0L
          else ((te - pt) * 1000L) / graft.operators.TimeSeries.RlRefillSec
        val before = math.min(1000L, tok + refill)
        val allowed = before >= 1000L
        tok = if (allowed) before - 1000L else before
        pt = te
        out += RlVerdict(key, CepFold.packOrd(te, e.event_id),
          if (allowed) 1L else 0L, tok)
      }
    }
    (RlCarry(pt, tok), out.result())
  }
}

/** Keyed per-user token-bucket limiter — the streaming face of the
  * batch `events_rate_limit` fold. O(2 longs) state per user, one
  * verdict per event, each final on emission.
  */
class RateLimitProcessor
    extends StatefulProcessor[Long, UserHourTyped, RlVerdict] {

  @transient private var st: ValueState[RlCarry] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[RlCarry]("rl",
      Encoders.product[RlCarry], TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[UserHourTyped],
      timerValues: TimerValues): Iterator[RlVerdict] = {
    val prev = if (st.exists()) st.get() else RlCarry(-1L, 1000L)
    val (next, out) = RateLimitFold.step(key, prev, rows.toSeq)
    st.update(next)
    out.iterator
  }
}
