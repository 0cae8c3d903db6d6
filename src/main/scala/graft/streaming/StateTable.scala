package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
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
  * Merge semantics per micro-batch of [[AlertUpdate]]s (last-writer-wins
  * by event time, matching [[AlertPipeline]]):
  *  - `live`    → upsert the key          (K2, MERGE … THEN INSERT/UPDATE)
  *  - `removed` → delete the key          (K3, MERGE … THEN DELETE)
  *  - `expired` → delete the key          (T1)
  *
  * The swap is write-new-then-atomic-rename on a filesystem; a production
  * lake would use a table format with real MERGE (Delta/Iceberg) — the
  * pattern, partitioning and idempotence story are identical. Re-merging
  * the same batch is a no-op (LWW on (timestamp, eventId)), which is what
  * makes at-least-once micro-batch retries safe.
  */
class AlertStateTable(path: String) extends Serializable {

  private def dataDir = s"$path/current"

  def snapshot(spark: SparkSession): DataFrame =
    if (Files.exists(Paths.get(dataDir)))
      spark.read.parquet(dataDir)
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        AlertStateTable.schema)

  /** Merge one batch of updates into the table. */
  def merge(spark: SparkSession, updates: DataFrame): Unit = synchronized {
    import org.apache.spark.sql.expressions.Window
    val unioned = snapshot(spark).unionByName(
      updates.select(AlertStateTable.schema.fieldNames.toIndexedSeq.map(col): _*))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("timestamp").desc, col("eventId").desc)
    val merged = unioned
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("status") === "live")
      .drop("rn")

    val tmp = s"$path/next"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    val cur = Paths.get(dataDir)
    if (Files.exists(cur)) {
      val old = Paths.get(s"$path/old")
      deleteRecursively(old)
      Files.move(cur, old, StandardCopyOption.ATOMIC_MOVE)
      Files.move(Paths.get(tmp), cur, StandardCopyOption.ATOMIC_MOVE)
      deleteRecursively(old)
    } else {
      Files.createDirectories(Paths.get(path))
      Files.move(Paths.get(tmp), cur, StandardCopyOption.ATOMIC_MOVE)
    }
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
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

  /** Wire the full pipeline: events → stateful updates → durable table. */
  def sink(
      events: Dataset[MetagameEvent],
      table: AlertStateTable,
      ttlSeconds: Option[Long] = Some(5400L)): DataStreamWriter[AlertUpdate] =
    AlertPipeline.updates(events, ttlSeconds)
      .writeStream.outputMode("update")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[AlertUpdate], _: Long) =>
        table.merge(batch.sparkSession, batch.toDF())
      }
}
