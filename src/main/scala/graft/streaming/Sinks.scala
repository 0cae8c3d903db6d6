package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row
import graft.model.MetagameEvent

/** K1 — the durable message publish sink
  * (`/root/reference/services/RabbitService.py:24-35`): each event is
  * serialized to wire JSON and published with a routing key.
  *
  * The transport is pluggable: the reference uses AMQP; in this
  * environment there is no broker, so [[InMemoryPublisher]] stands in for
  * tests and the interface documents the contract. Delivery is
  * at-least-once, matching the reference (persistent publish, no dedup —
  * SURVEY.md §6): a micro-batch retry may re-publish.
  */
trait Publisher extends Serializable {
  def publish(routingKey: String, payload: String): Unit
}

/** Test/standalone transport: collects published messages in memory.
  * Static registry keyed by name so executor threads (same JVM in
  * local mode) and the driver see one queue — mirrors the single-process
  * reference deployment. On a real cluster this would be an AMQP/Kafka
  * client created per-partition inside `foreachBatch`.
  */
object InMemoryPublisher {
  private val queues =
    new java.util.concurrent.ConcurrentHashMap[String, ConcurrentLinkedQueue[(String, String)]]()

  def queue(name: String): ConcurrentLinkedQueue[(String, String)] =
    queues.computeIfAbsent(name, _ => new ConcurrentLinkedQueue[(String, String)]())

  def apply(name: String): Publisher = new Publisher {
    def publish(routingKey: String, payload: String): Unit =
      queue(name).add((routingKey, payload))
  }
}

object Sinks {

  val Exchange = "events"
  val RoutingKey = "metagame" // RabbitService.py:20-21

  /** Wire the publish sink onto a streaming Dataset of events:
    * `writeStream.foreachBatch` serializing each micro-batch to JSON and
    * publishing per partition (executor-side, no driver collect).
    * `AvailableNow` drains-and-stops; pass a processing-time trigger for
    * a long-running service.
    */
  def publishStream(
      events: Dataset[MetagameEvent],
      publisher: Publisher,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[Row] =
    MetagameEvent.toJsonCol(events)
      .writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.foreachPartition { rows: Iterator[Row] =>
          rows.foreach(r => publisher.publish(RoutingKey, r.getString(0)))
        }
      }
}
