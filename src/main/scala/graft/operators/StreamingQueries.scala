package graft.operators

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.Tables.{load => T}
import graft.streaming.AlertPipeline

/** The live pipeline (SURVEY.md §3.1) exercised end-to-end as a real
  * Structured Streaming job and exposed through the batch-query contract:
  * the events table is replayed through `readStream` → stateful
  * K2/K3 routing → memory sink, and the final in-progress set is returned.
  *
  * Because the state machine's fold (last-writer-wins by event time) is
  * confluent, the result equals the batch window query — so this query
  * shares k23's DuckDB oracle: the streaming execution is hash-checked
  * against SQL semantics, which is the strongest correctness statement the
  * gate can make about the stateful path.
  */
object StreamingQueries {

  type Q = (SparkSession, String) => DataFrame

  private val counter = new AtomicInteger()

  private val streamInProgress: Q = (s, d) => {
    val name = s"graft_stream_${counter.incrementAndGet()}"
    // ask the reader for raw nanos (LongType, via nanosAsLong) and rebuild
    // the NTZ timestamp exactly as Tables.load does for batch reads
    val schema = org.apache.spark.sql.types.StructType(
      T(s, d, "events").schema.map(f =>
        if (f.name == "ts") f.copy(dataType = org.apache.spark.sql.types.LongType)
        else f))
    // the file streaming source wants a directory; glob-select the table
    val raw = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
    val events = AlertPipeline.eventsTableAsAlerts(s,
      raw.withColumn("ts",
        expr("CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)")))
    val q = AlertPipeline.updates(events, ttlSeconds = None)
      .writeStream.outputMode("update")
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // The memory table holds one update row per key per batch; keep each
    // key's newest update, then the live ones form the in-progress set.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id"))
      .orderBy(col("timestamp").desc, col("eventId").desc)
    s.table(name)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("status") === "live")
      .select(col("id").cast("long").as("user_id"),
        col("eventId").cast("long").as("last_event_id"))
  }

  /** Watermarked tumbling-window counts executed as a real streaming job
    * in UPDATE mode against a durable (parquet append-log) sink — the
    * production shape: watermark eviction keeps state bounded (spec'd in
    * WindowedAggsSpec) and nothing accumulates on the driver, unlike
    * complete-mode + memory sink. Each micro-batch appends its updated
    * windows tagged with the batch id; the read side keeps each key's
    * newest emission — exactly what a downstream upsert consumer (or the
    * log-compaction in [[graft.streaming.AlertStateTable]]) does with an
    * update stream. Hash-checked against the batch date_trunc oracle:
    * streaming window semantics must equal SQL calendar bucketing.
    */
  private val streamWindowed: Q = (s, d) => {
    // PER-PROCESS parent, previous runs of THIS process swept on entry:
    // repeated invocations in one JVM must not accumulate orphan sink
    // directories, but a fixed shared name would let a concurrent
    // process (bench and verify overlapping) delete a live sibling's
    // sink mid-query — the pid suffix makes the sweep race-free
    val parent = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"),
      s"graft_winstream_${ProcessHandle.current().pid()}")
    // reclaim siblings orphaned by crashed/killed processes: a pid that
    // no longer resolves to a live process can't own a live query, so
    // deleting its dir races nobody — without this sweep, dirs from
    // dead runs would accumulate in java.io.tmpdir forever (only each
    // live process cleans its OWN dir below)
    StreamingQueries.sweepDeadSiblings(parent.getParent)
    if (java.nio.file.Files.exists(parent)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(parent).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    java.nio.file.Files.createDirectories(parent)
    val out = java.nio.file.Files
      .createTempDirectory(parent, "run").toString
    val schema = org.apache.spark.sql.types.StructType(
      T(s, d, "events").schema.map(f =>
        if (f.name == "ts") f.copy(dataType = org.apache.spark.sql.types.LongType)
        else f))
    val raw = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val q = raw
      .withWatermark("ts", "1 hour")
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), "1 hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_seconds(col("window.start")).as("hour_epoch"),
        col("event_type"), col("n"))
      .writeStream.outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(out)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("hour_epoch"), col("event_type"))
      .orderBy(col("batch_id").desc)
    s.read.parquet(out)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("hour_epoch"), col("event_type"), col("n"))
  }

  /** Delete `<prefix><pid>` siblings whose pid is dead — shared reclaim
    * for every per-process scratch dir this library drops in tmpdir.
    */
  private[graft] def sweepDeadSiblings(tmpRoot: java.nio.file.Path,
      prefix: String = "graft_winstream_"): Unit = {
    val orphan = (java.util.regex.Pattern.quote(prefix) + raw"(\d{1,18})").r
    val self = ProcessHandle.current().pid()
    Option(tmpRoot.toFile.listFiles()).getOrElse(Array.empty).foreach { f =>
      f.getName match {
        case orphan(pid) if pid.toLong != self &&
            !ProcessHandle.of(pid.toLong).isPresent =>
          import scala.jdk.CollectionConverters._
          try java.nio.file.Files.walk(f.toPath).iterator().asScala.toSeq
            .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
          catch { case _: java.io.IOException => () } // best-effort reclaim
        case _ => ()
      }
    }
  }

  val queries: Map[String, Q] = Map(
    "stream_inprogress" -> streamInProgress,
    "stream_windowed_counts" -> streamWindowed,
  )

  /** Identical oracle to k23_inprogress_set — the streaming pipeline must
    * agree with the declarative window-query semantics.
    */
  val oracles: Map[String, String] = Map(
    "stream_inprogress" -> ReferenceOps.oracles("k23_inprogress_set"),
    "stream_windowed_counts" ->
      """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_epoch,
        |  event_type, count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,
  )
}
