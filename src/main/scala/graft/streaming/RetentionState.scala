package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** One finalized `(user, week)` activity fact from the windowed stage
  * of the streaming retention matrix (week keyed as Monday-truncated
  * epoch day, the same integer key the batch face uses).
  */
case class WeekActive(user_id: Long, week_day: Long)

/** One retention cell contribution: the user's cohort week and an
  * active week — the read-back groups these into the
  * `(cohort_day, weeks_since)` matrix.
  */
case class RetentionCell(user_id: Long, cohort_day: Long, week_day: Long)

/** Keyed cohort assignment over a stream of FINALIZED weekly activity:
  * ONE long of state per user (the cohort week). Watermark ordering
  * delivers weeks in ascending event-time order across batches (and
  * the processor sorts within a batch), so the FIRST week a user is
  * seen in IS their min week — the batch face's `min(ts)` cohort —
  * without ever storing history. Each input row emits exactly one
  * cell, so sink volume equals the distinct `(user, week)` domain.
  */
class RetentionCohortProcessor
    extends StatefulProcessor[Long, WeekActive, RetentionCell] {

  @transient private var cohort: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    cohort = getHandle.getValueState[Long]("cohort",
      Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[WeekActive],
      timerValues: TimerValues): Iterator[RetentionCell] = {
    val sorted = rows.toArray.sortBy(_.week_day)
    if (sorted.isEmpty) Iterator.empty
    else {
      if (!cohort.exists()) cohort.update(sorted.head.week_day)
      val c = cohort.get()
      sorted.iterator.map(w => RetentionCell(key, c, w.week_day))
    }
  }
}
