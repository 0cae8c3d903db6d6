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

  /** Publish one partition's messages as a unit. Default: per-message
    * publish. Durable implementations override this to batch the
    * partition into one atomic+fsync'd commit.
    */
  def publishPartition(messages: Iterator[(String, String)]): Unit =
    messages.foreach { case (k, p) => publish(k, p) }
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

/** Durable append-log publisher — the file-backed stand-in for the
  * reference's PERSISTENT AMQP publish
  * (`/root/reference/services/RabbitService.py:30-35`), proving the
  * at-least-once contract without a broker.
  *
  * Each partition's messages are written to ONE hidden temp file, fsync'd
  * to disk, then atomically renamed to `*.log` — a log file is either
  * fully published or invisible, so a crash mid-write loses nothing that
  * was acknowledged and leaks no partial reads. A retried micro-batch
  * appends a second file carrying the same messages: that is the
  * at-least-once redelivery the contract allows, and consumers dedup
  * (exactly like consumers of the reference's RabbitMQ queue must).
  *
  * Executors append independently (one file per partition-task, unique
  * name — no coordination, no driver round-trip), which is what lets the
  * sink scale with the cluster.
  */
class FilePublisher(dir: String) extends Publisher {
  import java.io.{File, FileOutputStream, OutputStreamWriter}
  import java.nio.charset.StandardCharsets.UTF_8

  override def publish(routingKey: String, payload: String): Unit =
    publishPartition(Iterator.single((routingKey, payload)))

  override def publishPartition(messages: Iterator[(String, String)]): Unit =
    writeCommit(s"part-${System.nanoTime()}-${java.util.UUID.randomUUID()}",
      messages)

  /** Idempotent publish: the commit-file name is a deterministic function
    * of (batchId, partitionId), so a RETRIED micro-batch lands on the
    * same name as its previous attempt — the late writer sees the file
    * already committed and discards its duplicate. That upgrades the
    * sink to exactly-once per (batch, partition) — the standard
    * idempotent-foreachBatch recipe — provided the partition's content
    * is deterministic across retries (true for the publish path: no
    * shuffle between source and sink).
    */
  def publishBatchPartition(batchId: Long, partitionId: Int,
      messages: Iterator[(String, String)]): Unit =
    writeCommit(f"batch-$batchId%012d-p$partitionId%06d", messages)

  private def writeCommit(name: String,
      messages: Iterator[(String, String)]): Unit = {
    if (!messages.hasNext) return
    val d = new File(dir)
    d.mkdirs()
    val target = new File(d, s"$name.log")
    if (target.exists()) return // a retry of an already-committed unit
    // tmp name stays unique so concurrent attempts never clobber each
    // other mid-write; exactly one rename wins the commit
    val tmp = new File(d, s".$name.${java.util.UUID.randomUUID()}.inprogress")
    val out = new FileOutputStream(tmp)
    val w = new OutputStreamWriter(out, UTF_8)
    messages.foreach { case (k, p) =>
      w.write(FilePublisher.escape(k)); w.write('\t')
      w.write(FilePublisher.escape(p)); w.write('\n')
    }
    w.flush()
    out.getFD.sync() // durable before visible
    w.close()
    try java.nio.file.Files.move(tmp.toPath, target.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        tmp.delete() // lost the race to an identical commit: discard
    }
  }
}

object FilePublisher {
  import java.nio.charset.StandardCharsets.UTF_8

  private[streaming] def escape(s: String): String =
    s.replace("\\", "\\\\").replace("\t", "\\t")
      .replace("\n", "\\n").replace("\r", "\\r")
  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 't' => sb.append('\t'); case 'n' => sb.append('\n')
          case 'r' => sb.append('\r')
          case c => sb.append(c)
        }
        i += 2
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** Everything durably published, in commit-file order. May contain
    * duplicates (at-least-once); in-progress temp files are invisible.
    */
  def consume(dir: String): Vector[(String, String)] =
    consumeFrom(dir, Set.empty)._1

  /** Incremental consumption: messages in commit files not yet in
    * `processed`, plus the updated processed-set to persist for the next
    * call — the consumer-offset face of the at-least-once log. The
    * offset is a SET of file names, not a high-watermark: producers are
    * concurrent partition tasks whose commit renames can land in any
    * order relative to their timestamped names, so a "newest name seen"
    * cursor would permanently skip a file that finishes its rename after
    * a higher-named sibling. A consumer that persists the set with its
    * own processing gets exactly-once for itself; one that crashes
    * between processing and persisting re-reads those files —
    * duplicates, never loss.
    */
  def consumeFrom(dir: String, processed: Set[String])
      : (Vector[(String, String)], Set[String]) = {
    val d = new java.io.File(dir)
    val files = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".log") &&
        !processed.contains(f.getName))
      .sortBy(_.getName)
    val msgs = files.toVector.flatMap { f =>
      new String(java.nio.file.Files.readAllBytes(f.toPath), UTF_8)
        .linesIterator.filter(_.nonEmpty).map { line =>
          val Array(k, p) = line.split("\t", 2)
          (unescape(k), unescape(p))
        }
    }
    (msgs, processed ++ files.map(_.getName))
  }

  /** Drop the named commit files (everything a consumer has durably
    * processed) — retention for an otherwise append-forever log. Safe
    * with concurrent producers: only explicitly-named, fully-committed
    * files are removed, never "everything older than" some cursor a
    * late-landing rename could slip under.
    */
  def truncate(dir: String, processed: Set[String]): Int = {
    val d = new java.io.File(dir)
    val victims = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && processed.contains(f.getName))
    victims.count(_.delete())
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
          publisher.publishPartition(rows.map(r => (RoutingKey, r.getString(0))))
        }
      }

  /** The exactly-once wiring of the durable publisher: each partition
    * commits under its deterministic (batchId, partitionId) name, so the
    * at-least-once micro-batch retries of the engine de-duplicate at the
    * sink instead of reaching consumers (see
    * [[FilePublisher.publishBatchPartition]]).
    */
  def publishStreamExactlyOnce(
      events: Dataset[MetagameEvent],
      publisher: FilePublisher,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[Row] =
    MetagameEvent.toJsonCol(events)
      .writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.foreachPartition { rows: Iterator[Row] =>
          publisher.publishBatchPartition(batchId,
            org.apache.spark.TaskContext.get().partitionId(),
            rows.map(r => (RoutingKey, r.getString(0))))
        }
      }
}
