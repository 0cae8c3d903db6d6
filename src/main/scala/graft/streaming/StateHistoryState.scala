package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** One event inside a finalized `(user, hour)` row of the streaming
  * state-history topology: timestamp in MICROSECONDS (the batch face
  * orders runs on the TIMESTAMP_NTZ `ts`, which is micros precision —
  * folding on raw nanos could order two same-micro events differently
  * than the batch twin) plus the event id tie-break and the type.
  */
case class EventAt(ts: Long, event_id: Long, event_type: String)

/** One finalized hour of one user's events — the unit the windowed
  * stage emits and [[StateHistoryFold.step]] consumes.
  */
case class UserHourTyped(user_id: Long, hour_epoch: Long,
    evs: Seq[EventAt])

/** One per-(user, version) run snapshot: the run's constant facts
  * (state, start) plus the event count SO FAR. A closed run's last
  * snapshot carries its final count; an open run re-emits on growth,
  * so `max(n_events)` per (user, version) at read-back recovers the
  * final account — the set-once/monotone read-back contract the
  * funnel snapshots established.
  */
case class RunSnapshot(user_id: Long, version: Long, state: String,
    valid_from_us: Long, n_events: Long)

/** The pure SCD2 run fold — kept off the processor so the ordering
  * argument is testable without a streaming harness.
  */
object StateHistoryFold {

  /** Empty per-user state: no run open yet (version 0). */
  val Empty: (Long, String, Long, Long) = (0L, "", 0L, 0L)

  /** Fold one micro-batch of finalized hour rows into the open-run
    * state, emitting a snapshot for every version TOUCHED this batch.
    *
    * EXACTNESS ARGUMENT (vs the batch gaps-and-islands): append-mode
    * watermarking delivers hour windows in ascending event-time order
    * across batches, this fold sorts hours within the batch and
    * events within the hour by `(ts, event_id)` — so events apply in
    * exactly the batch face's window order. Run boundaries depend
    * only on the previous event's type under that order, so versions,
    * states and starts coincide; a run's `n_events` only grows while
    * the run is the open one and is frozen by the next boundary,
    * hence per-version `max` at read-back equals the batch count.
    */
  def step(key: Long, state: (Long, String, Long, Long),
      rows: Seq[UserHourTyped])
      : ((Long, String, Long, Long), Seq[RunSnapshot]) = {
    var (ver, st, vf, n) = state
    val touched = scala.collection.mutable.LinkedHashMap[Long, RunSnapshot]()
    rows.sortBy(_.hour_epoch).foreach { hr =>
      hr.evs.sortBy(e => (e.ts, e.event_id)).foreach { e =>
        if (ver == 0L || e.event_type != st) {
          if (ver != 0L) touched(ver) = RunSnapshot(key, ver, st, vf, n)
          ver += 1; st = e.event_type; vf = e.ts; n = 1L
        } else n += 1
        touched(ver) = RunSnapshot(key, ver, st, vf, n)
      }
    }
    ((ver, st, vf, n), touched.values.toSeq)
  }
}

/** Keyed per-user SCD2 run builder over a stream of FINALIZED
  * `(user, hour, events)` rows — the streaming face of the batch
  * `events_state_history` gaps-and-islands. O(1) state per user (the
  * open run only: version, state, start, count); emits snapshots only
  * for versions a batch touches, so sink volume is bounded by runs
  * plus open-run updates, not event volume.
  */
class StateHistoryProcessor
    extends StatefulProcessor[Long, UserHourTyped, RunSnapshot] {

  @transient private var st: ValueState[(Long, String, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, String, Long, Long)]("run",
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING,
        Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[UserHourTyped],
      timerValues: TimerValues): Iterator[RunSnapshot] = {
    val before = Option(st.get()).getOrElse(StateHistoryFold.Empty)
    val (after, out) = StateHistoryFold.step(key, before, rows.toArray.toSeq)
    if (after != before) st.update(after)
    out.iterator
  }
}
