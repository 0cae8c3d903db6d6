package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.MetagameEvent

/** Watermarked event-time transforms over the event stream — the
  * streaming generalizations of the reference's operational aggregates
  * (A2/A3) and of Ext1's streaming dedup.
  */
object WindowedAggs {

  /** Tumbling-window counts + per-window last event time. With a
    * watermark, state for closed windows is dropped — bounded memory at
    * any scale.
    */
  def windowedCounts(
      events: Dataset[MetagameEvent],
      window: String = "1 hour",
      watermark: String = "30 minutes"): DataFrame = {
    val withTime = events
      .withColumn("eventTime", timestamp_seconds(col("timestamp")))
    (if (events.isStreaming) withTime.withWatermark("eventTime", watermark)
     else withTime)
      .groupBy(org.apache.spark.sql.functions.window(col("eventTime"), window),
        col("state"))
      .agg(count(lit(1)).as("n"), max(col("timestamp")).as("last_event_time"))
      .select(col("window.start").as("window_start"), col("state"),
        col("n"), col("last_event_time"))
  }

  /** Gap-based session windows via the NATIVE `session_window` operator —
    * the streaming face of the batch `sessionize` query (there computed
    * with lag + running sum). Works on any frame with `user_id` and a
    * timestamp `ts`; in streaming mode a watermark bounds session state
    * and (append mode) emits a session once the watermark passes its
    * close. Sessions merge as events arrive — the state-store-backed
    * generalization the lag/sum formulation can't express incrementally.
    */
  def sessionWindows(
      df: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "30 minutes"): DataFrame = {
    val t = if (df.isStreaming) df.withWatermark("ts", watermark) else df
    t.groupBy(col("user_id"),
        session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n"))
  }

  /** Streaming exact dedup on the composite id within the watermark
    * horizon (`dropDuplicatesWithinWatermark`): the streaming face of
    * Ext1 exact dedup — state is bounded by the watermark delay instead of
    * growing forever.
    */
  def dedupedWithinWatermark(
      events: Dataset[MetagameEvent],
      watermark: String = "30 minutes"): Dataset[MetagameEvent] = {
    import events.sparkSession.implicits._
    if (!events.isStreaming) {
      events.dropDuplicates("id", "state")
    } else {
      events
        .withColumn("eventTime", timestamp_seconds(col("timestamp")))
        .withWatermark("eventTime", watermark)
        .dropDuplicatesWithinWatermark("id", "state")
        .drop("eventTime")
        .as[MetagameEvent]
    }
  }
}
