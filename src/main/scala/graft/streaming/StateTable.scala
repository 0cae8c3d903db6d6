package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import graft.model.MetagameEvent

/** The durable face of the in-progress alert set: a keyed parquet table
  * maintained by `foreachBatch` merge — the reference's Mongo `alerts`
  * collection (`/root/reference/services/AlertService.py`) as a queryable
  * lake table, and the lower-risk alternative to in-flight state from
  * SURVEY.md §7 step 3.
  *
  * Merge semantics per micro-batch of [[AlertUpdate]]s: last-writer-wins
  * by (event time, eventId), matching [[AlertPipeline]]. Non-live updates
  * are kept as TOMBSTONE rows (not deleted) so a late-arriving older
  * `started` cannot resurrect a key; [[snapshot]] filters to the live
  * set. Re-merging a redelivered batch is a no-op, which makes
  * at-least-once micro-batch retries safe.
  *
  * Crash safety: each merge writes a fresh versioned directory and then
  * atomically swaps a `_CURRENT` pointer file onto it — a crash at any
  * point leaves the previous version fully readable (a production lake
  * would get the same property from Delta/Iceberg commits).
  */
class AlertStateTable(path: String) extends Serializable {

  private def pointer: Path = Paths.get(path, "_CURRENT")

  private def currentDir: Option[String] =
    if (Files.exists(pointer))
      Some(new String(Files.readAllBytes(pointer), StandardCharsets.UTF_8).trim)
        .filter(v => Files.exists(Paths.get(path, v)))
        .map(v => s"$path/$v")
    else None

  /** All retained rows — live entries and tombstones. */
  def raw(spark: SparkSession): DataFrame = currentDir match {
    case Some(d) => spark.read.parquet(d)
    case None =>
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        AlertStateTable.schema)
  }

  /** The in-progress set (what the reference's Mongo collection holds). */
  def snapshot(spark: SparkSession): DataFrame =
    raw(spark).filter(col("status") === "live")

  /** Merge one batch of updates into the table. */
  def merge(spark: SparkSession, updates: DataFrame): Unit = synchronized {
    import org.apache.spark.sql.expressions.Window
    val unioned = raw(spark).unionByName(
      updates.select(AlertStateTable.schema.fieldNames.toIndexedSeq.map(col): _*))
    // tie-break beyond (timestamp, eventId): a TTL "expired" update carries
    // the SAME event coordinates as the live row it retires, so on a dead
    // tie the non-live status must win (the deletion is causally later)
    val statusRank = when(col("status") === "live", 0).otherwise(1)
    val w = Window.partitionBy(col("id"))
      .orderBy(col("timestamp").desc, col("eventId").desc, statusRank.desc)
    val merged = unioned
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")

    val version = s"v${System.nanoTime()}"
    merged.write.mode(SaveMode.Overwrite).parquet(s"$path/$version")
    val tmp = Paths.get(path, s"_CURRENT.tmp")
    Files.write(tmp, version.getBytes(StandardCharsets.UTF_8))
    val old = currentDir
    Files.move(tmp, pointer, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    old.foreach(d => deleteRecursively(Paths.get(d)))
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
    }
}

object AlertStateTable {
  import org.apache.spark.sql.types._
  val schema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("status", StringType),
    StructField("eventId", IntegerType),
    StructField("worldId", IntegerType),
    StructField("timestamp", DoubleType)))

  /** Wire the full pipeline: events → stateful updates → durable table.
    * `AvailableNow` drains-and-stops (batch/replay mode); pass a
    * processing-time trigger for a long-running service.
    */
  def sink(
      events: Dataset[MetagameEvent],
      table: AlertStateTable,
      ttlSeconds: Option[Long] = Some(5400L),
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[AlertUpdate] =
    AlertPipeline.updates(events, ttlSeconds)
      .writeStream.outputMode("update")
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[AlertUpdate], _: Long) =>
        table.merge(batch.sparkSession, batch.toDF())
      }
}
