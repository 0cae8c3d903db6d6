package graft.model

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's core record (`/root/reference/ess_client.py:133-144`,
  * fixture at `/root/reference/simulate_alert.py:35-46`): one metagame
  * ("alert") event.
  *
  * @param id        composite key `"{world_id}-{instance_id}"`
  *                  (`ess_client.py:126`)
  * @param eventId   metagame event *type* id
  * @param state     `started` | `ended` | `cancelled`
  * @param timestamp POSIX seconds, event time (`ess_client.py:143`)
  */
case class MetagameEvent(
    id: String,
    eventId: Int,
    state: String,
    worldId: Int,
    zoneId: Int,
    nc: Double,
    tr: Double,
    vs: Double,
    xp: Double,
    timestamp: Double)

object MetagameEvent {

  val Started = "started"

  /** Wire schema — snake_case field names exactly as published to the
    * reference's RabbitMQ sink (`ess_client.py:147-154`).
    */
  val wireSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("event_id", IntegerType),
    StructField("state", StringType),
    StructField("world_id", IntegerType),
    StructField("zone_id", IntegerType),
    StructField("nc", DoubleType),
    StructField("tr", DoubleType),
    StructField("vs", DoubleType),
    StructField("xp", DoubleType),
    StructField("timestamp", DoubleType)))

  private val wireToCamel: Seq[(String, String)] = Seq(
    "id" -> "id", "event_id" -> "eventId", "state" -> "state",
    "world_id" -> "worldId", "zone_id" -> "zoneId", "nc" -> "nc",
    "tr" -> "tr", "vs" -> "vs", "xp" -> "xp", "timestamp" -> "timestamp")

  /** Parse a DataFrame with a JSON string column `value` (the wire form)
    * into a typed Dataset — `from_json` with the declared schema, never
    * schema inference (SURVEY.md §1.3: fixed, declared ahead of time).
    *
    * Malformed frames (unparseable JSON, or parseable but missing the
    * key fields) are dropped rather than becoming null-keyed events that
    * would poison the keyed state; they are counted via `observe` under
    * the `graft_parse` observation for the metrics listener.
    *
    * `observeParse = false` parses WITHOUT the observation: when several
    * queries consume the same parsed stream (publish + state in
    * [[graft.streaming.GraftApp]]), each query executes its own copy of
    * the plan, so exactly ONE branch may carry the counter or every
    * malformed frame is counted once per query.
    */
  def fromJson(df: DataFrame, observeParse: Boolean = true): Dataset[MetagameEvent] = {
    val spark = df.sparkSession
    import spark.implicits._
    // only the KEY fields are required (id routes state, state drives the
    // machine, timestamp orders it); optional payload fields default to 0
    // like the reference would tolerate a sparse frame
    val required = Seq("id", "state", "timestamp")
      .map(f => col(s"e.$f").isNotNull).reduce(_ && _)
    val defaulted = wireToCamel.map {
      case (w, c) if Seq("id", "state").contains(w) => col(s"e.$w").as(c)
      case (w, c) => coalesce(col(s"e.$w"), lit(0)).as(c)
    }
    val parsed = df.select(from_json(col("value"), wireSchema).as("e"))
    (if (observeParse)
      parsed.observe("graft_parse",
        count(when(col("e").isNull || !required, 1)).as("malformed_frames"))
     else parsed)
      .filter(col("e").isNotNull && required)
      .select(defaulted: _*)
      .as[MetagameEvent]
  }

  /** Serialize to the wire JSON (P4, `ess_client.py:147-148`). */
  def toJsonCol(ds: Dataset[MetagameEvent]): DataFrame =
    ds.select(to_json(struct(
      wireToCamel.map { case (w, c) => col(c).as(w) }: _*)).as("value"))

  /** P2: derive the composite key from raw world/instance columns. */
  def compositeId(worldId: Column, instanceId: Column): Column =
    concat_ws("-", worldId, instanceId)
}
