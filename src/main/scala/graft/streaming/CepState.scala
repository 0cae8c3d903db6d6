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

  val WindowSec = 3600L

  def step(key: Long, state: CepCarry, rows: Seq[UserHourTyped])
      : (CepCarry, Seq[CepVerdict]) = {
    var lv = state.lastView
    var le = state.lastError
    val out = Seq.newBuilder[CepVerdict]
    rows.sortBy(_.hour_epoch).foreach { hr =>
      hr.evs.sortBy(e => (e.ts, e.event_id)).foreach { e =>
        val te = e.ts / 1000000L // micros → seconds
        val ord = te * 10000000L + e.event_id
        e.event_type match {
          case "view" => lv = ord
          case "error" => le = ord
          case "purchase" =>
            val m = lv != 0L && te - lv / 10000000L <= WindowSec &&
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
