package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.{load => T}

/** The reference's own operator surface (SURVEY.md §2 rows S/F/P/L/A/K/T),
  * re-expressed as declarative batch queries over the driver testdata.
  *
  * The reference pipeline (`/root/reference/ess_client.py:125-165`) is:
  * filter by event type → project/rename → derive composite key → route on
  * state into a keyed in-progress set, with TTL expiry
  * (`ess_client.py:100-110`). The `events` table plays the role of the event
  * feed (key = `user_id`, "started" = `signup`); the live streaming form of
  * K2/K3/T1 lives in [[graft.streaming.AlertPipeline]].
  *
  * Scale notes: every query here is a single scan + (at most) one shuffle;
  * filters and projections reach the parquet scan (PushedFilters/ReadSchema),
  * so at 100 TB these are embarrassingly parallel.
  */
object ReferenceOps {

  type Q = (SparkSession, String) => DataFrame

  /** Filter: event-type dispatch (F1, ess_client.py:124-125). */
  private val f1: Q = (s, d) =>
    T(s, d, "events").filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("value"))

  /** Filter: predicate scan (F2, AlertService.py:60 `$lt` pushdown).
    *
    * The filter is applied to the RAW stored column, not a derived
    * expression: a predicate on a rebuilt column cannot reach the
    * parquet scan, but `ts < const` on the stored value pushes down
    * (`PushedFilters: LessThan(ts, …)`). The stored type varies by
    * testdata generation — int64 nanos (via nanosAsLong) or a native
    * micros timestamp — so the cutoff literal is typed to match; the
    * conversion is monotonic, so the predicates are equivalent.
    */
  private val f2: Q = (s, d) => {
    val cutoff = java.time.LocalDateTime.parse("2024-01-05T00:00:00")
    val raw = s.read.parquet(s"$d/events.parquet")
    val pred = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        col("ts") < lit(cutoff.toEpochSecond(java.time.ZoneOffset.UTC)
          * 1000000000L)
      case _ => col("ts") < lit(cutoff)
    }
    raw.filter(pred).select(col("event_id"), col("event_type"))
  }

  /** Filter: point lookup by key (F3, AlertService.py:38-48 `find_one`). */
  private val f3: Q = (s, d) =>
    T(s, d, "customer").filter(col("c_custkey") === 42L)

  /** Projection / rename (P1, ess_client.py:133-144 record reshaping). */
  private val p1: Q = (s, d) =>
    T(s, d, "events").select(
      col("event_id").as("id"),
      col("event_type").as("state"),
      col("user_id").as("world_id"),
      col("value").as("xp"))

  /** Derived composite key (P2, ess_client.py:126 `UniqueEventId`). */
  private val p2: Q = (s, d) =>
    T(s, d, "events").select(
      concat_ws("-", col("user_id"), col("event_id")).as("id"),
      col("event_id"))

  /** Datetime → POSIX seconds (P3, ess_client.py:143). */
  private val p3: Q = (s, d) =>
    T(s, d, "events").select(
      col("event_id"),
      unix_seconds(col("ts").cast("timestamp")).as("ts_epoch"))

  /** Record → JSON serialization (P4, ess_client.py:147-148). */
  private val p4: Q = (s, d) =>
    T(s, d, "events").select(
      col("event_id"),
      to_json(struct(col("event_id"), col("event_type"))).as("payload"))

  /** Limit (L1, AlertService.py:62 `to_list(length=30)`). */
  private val l1: Q = (s, d) =>
    T(s, d, "customer").orderBy(col("c_custkey")).limit(30)

  /** Count with predicate (A1, AlertService.py:66-76 `count_documents`). */
  private val a1: Q = (s, d) =>
    T(s, d, "events").filter(col("event_type") === "error")
      .agg(count(lit(1)).as("cnt"))

  /** Running event counts (A2, the `total_events` Prometheus counter). */
  private val a2: Q = (s, d) =>
    T(s, d, "events").groupBy(col("event_type"))
      .agg(count(lit(1)).as("total_events"))

  /** Max-timestamp gauge (A3, `last_alert_time`). */
  private val a3: Q = (s, d) =>
    T(s, d, "events")
      .agg(unix_seconds(max(col("ts")).cast("timestamp"))
        .as("last_event_time"))

  /** The in-progress set (K2/K3): last state per key; key is live iff its
    * most recent event is the "start" state. This is the batch analog of the
    * Mongo `alerts` collection (ess_client.py:157-165) — insert on started,
    * delete on any other state (the reference's always-truthy `elif` at
    * ess_client.py:162 means *every* non-started state deletes; we implement
    * that intent). Shuffles once on the key — at 100 TB this is a single
    * hash-partitioned window, no driver state.
    */
  private val k23: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    T(s, d, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("last_event_id"))
  }

  /** In-progress count gauge (A4 — fixing the reference's dead gauge). */
  private val a4: Q = (s, d) =>
    k23(s, d).agg(count(lit(1)).as("in_progress"))

  /** TTL / stale-state expiry (T1, ess_client.py:100-110): survivors within
    * 5400 s of the newest event. The max is a one-row aggregate collected to
    * the driver (same as AQE would), then pushed as a literal filter so the
    * scan stays pruned and parallel.
    */
  private val t1: Q = (s, d) => {
    val ev = T(s, d, "events")
    val maxTs = Option(
      ev.agg(max(col("ts"))).head().getAs[java.time.LocalDateTime](0))
    val pred = maxTs.fold(lit(false))(m =>
      col("ts") >= lit(m.minusSeconds(5400)))
    ev.filter(pred)
      .select(col("event_id"), col("user_id"), col("event_type"))
  }

  /** Bulk predicate delete (K4, AlertService.py:90-100): the surviving set
    * after `DELETE WHERE event_type = 'error'`, i.e. an anti-filter.
    */
  private val k4: Q = (s, d) =>
    T(s, d, "events").filter(!(col("event_type") === "error"))
      .select(col("event_id"), col("event_type"))

  val queries: Map[String, Q] = Map(
    "f1_filter_type" -> f1,
    "f2_filter_predicate" -> f2,
    "f3_point_lookup" -> f3,
    "p1_project_rename" -> p1,
    "p2_composite_key" -> p2,
    "p3_epoch_seconds" -> p3,
    "p4_to_json" -> p4,
    "l1_limit" -> l1,
    "a1_count_where" -> a1,
    "a2_event_counts" -> a2,
    "a3_last_event_time" -> a3,
    "k23_inprogress_set" -> k23,
    "a4_inprogress_count" -> a4,
    "t1_ttl_expiry" -> t1,
    "k4_bulk_delete" -> k4,
  )

  val oracles: Map[String, String] = Map(
    "f1_filter_type" ->
      "SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase'",
    "f2_filter_predicate" ->
      "SELECT event_id, event_type FROM events WHERE ts < TIMESTAMP '2024-01-05 00:00:00'",
    "f3_point_lookup" ->
      "SELECT * FROM customer WHERE c_custkey = 42",
    "p1_project_rename" ->
      "SELECT event_id AS id, event_type AS state, user_id AS world_id, value AS xp FROM events",
    "p2_composite_key" ->
      "SELECT concat_ws('-', user_id, event_id) AS id, event_id FROM events",
    "p3_epoch_seconds" ->
      "SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch FROM events",
    "p4_to_json" ->
      "SELECT event_id, '{\"event_id\":' || event_id || ',\"event_type\":\"' || event_type || '\"}' AS payload FROM events",
    "l1_limit" ->
      "SELECT * FROM customer ORDER BY c_custkey LIMIT 30",
    "a1_count_where" ->
      "SELECT count(*) AS cnt FROM events WHERE event_type = 'error'",
    "a2_event_counts" ->
      "SELECT event_type, count(*) AS total_events FROM events GROUP BY event_type",
    "a3_last_event_time" ->
      "SELECT CAST(floor(epoch(max(ts))) AS BIGINT) AS last_event_time FROM events",
    "k23_inprogress_set" ->
      """SELECT user_id, event_id AS last_event_id FROM (
        |  SELECT user_id, event_id, event_type,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 AND event_type = 'signup'""".stripMargin,
    "a4_inprogress_count" ->
      """SELECT count(*) AS in_progress FROM (
        |  SELECT user_id, event_id, event_type,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 AND event_type = 'signup'""".stripMargin,
    "t1_ttl_expiry" ->
      "SELECT event_id, user_id, event_type FROM events WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 5400 SECOND",
    "k4_bulk_delete" ->
      "SELECT event_id, event_type FROM events WHERE NOT (event_type = 'error')",
  )
}
