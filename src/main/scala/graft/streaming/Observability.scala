package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** A2-A5 — operational aggregates, the Spark-native replacement for the
  * reference's Prometheus metrics (`/root/reference/ess_client.py:45-69`):
  *
  *  - `total_events` (Counter, A2) and `last_event_time` (Gauge, A3) come
  *    from `Dataset.observe` — computed inside the running plan, no extra
  *    pass over the data, surfaced per micro-batch via the listener;
  *  - `in_progress_alerts` (A4 — dead in the reference, fixed here) is
  *    maintained from the AlertUpdate stream;
  *  - query lifecycle (A5 service states) maps to the listener's
  *    start/progress/terminate callbacks.
  *
  * A metrics HTTP endpoint would scrape [[Metrics.snapshot]]; exporting is
  * transport, not data processing, so it stays out of scope here.
  */
object Metrics {
  private val gauges = new ConcurrentHashMap[String, Double]()

  def set(name: String, v: Double): Unit = gauges.put(name, v)
  def add(name: String, v: Double): Unit =
    gauges.merge(name, v, (a, b) => a + b)
  def snapshot: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    gauges.asScala.toMap
  }
  def reset(): Unit = gauges.clear()
}

object Observability {

  val ObservationName = "graft_metrics"

  /** Attach A2/A3 observations to an event stream (any DataFrame with a
    * `timestamp` column in POSIX seconds).
    */
  def observed(df: DataFrame): DataFrame =
    df.observe(ObservationName,
      count(lit(1)).as("total_events"),
      max(col("timestamp")).as("last_event_time"))

  val ParseObservation = "graft_parse" // from MetagameEvent.fromJson

  /** Listener folding per-batch observations into [[Metrics]].
    * `running_queries` counts live queries (A5: the service is "up" while
    * it is > 0 — a single boolean would flip to "stopped" when just one
    * of several pipeline queries ends).
    */
  class MetricsListener extends StreamingQueryListener {
    override def onQueryStarted(e: QueryStartedEvent): Unit =
      Metrics.add("running_queries", 1.0)

    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val obs = e.progress.observedMetrics
      if (obs.containsKey(ObservationName)) {
        val row = obs.get(ObservationName)
        Metrics.add("total_events", row.getAs[Long]("total_events").toDouble)
        Option(row.getAs[Any]("last_event_time")).foreach {
          case d: java.lang.Double => Metrics.set("last_event_time", d)
          case _ => ()
        }
      }
      if (obs.containsKey(ParseObservation)) {
        val n = obs.get(ParseObservation).getAs[Long]("malformed_frames")
        if (n > 0) Metrics.add("malformed_frames", n.toDouble)
      }
    }

    override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
      Metrics.add("running_queries", -1.0)
  }
}
