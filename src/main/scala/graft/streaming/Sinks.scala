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
  * to disk, then atomically renamed to `*.log`, and the PARENT DIRECTORY
  * is fsync'd after the rename (the rename lives in the directory's
  * entries, not the file's blocks) — a log file is either fully published
  * or invisible, so a crash mid-write — process OR machine, where the
  * filesystem supports directory fsync — loses nothing that was
  * acknowledged and leaks no partial reads. A retried micro-batch
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
    writeCommit(new File(dir),
      s"part-${System.nanoTime()}-${java.util.UUID.randomUUID()}", messages)

  // ---- exactly-once batch staging ------------------------------------
  // A whole micro-batch commits ATOMICALLY: partitions stage into a
  // hidden per-attempt directory, and after every partition has written,
  // the driver renames the directory to the batch's single committed
  // name. A retried batch — even one REPLANNED with a different
  // partition count or row-to-partition assignment — either sees the
  // committed directory and skips, or races its own rename and loses
  // (POSIX rename onto an existing non-empty directory fails). This is
  // what per-(batch,partition)-named files cannot give: they'd leak a
  // partial prior attempt's partition files alongside a differently-
  // partitioned retry. Within one attempt, task retries land on the
  // same p<id> staging name (same plan => same assignment) and the
  // first rename wins. Paths are driver+executor-visible (same FS in
  // local mode; a shared filesystem on a cluster).

  def stagingDirFor(batchId: Long): String = {
    val d = new File(dir, f".batch-$batchId%012d-${java.util.UUID.randomUUID()}.staging")
    d.mkdirs()
    d.getPath
  }

  private def committedDirFor(batchId: Long): File =
    new File(dir, f"batch-$batchId%012d.committed")

  def batchCommitted(batchId: Long): Boolean = committedDirFor(batchId).exists()

  /** Stage one partition's messages for a batch attempt (invisible to
    * consumers until [[commitStaged]]).
    */
  def stagePartition(stagingDir: String, partitionId: Int,
      messages: Iterator[(String, String)]): Unit =
    writeCommit(new File(stagingDir), f"p$partitionId%06d", messages)

  /** Atomically publish a fully-staged batch. Returns false (and cleans
    * up the staging attempt) if another attempt committed first. A rename
    * that fails for any OTHER reason (permissions, IO error, a filesystem
    * without atomic directory rename) must NOT delete the staged data —
    * the batch would be acknowledged-but-lost once the checkpoint
    * advances — so that case throws and lets the micro-batch retry.
    */
  def commitStaged(stagingDir: String, batchId: Long): Boolean = {
    val staged = new File(stagingDir)
    val won = staged.renameTo(committedDirFor(batchId))
    if (won) {
      FilePublisher.syncDir(new File(dir)) // rename durable before ack
      // sweep any stale staging attempts for this batch (crashed runs)
      Option(new File(dir).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory &&
          f.getName.startsWith(f".batch-$batchId%012d-") &&
          f.getName.endsWith(".staging"))
        .foreach(FilePublisher.deleteRecursively)
    } else if (committedDirFor(batchId).exists()) {
      // genuinely lost the commit race — this attempt's copy is redundant
      FilePublisher.deleteRecursively(staged)
    } else {
      throw new java.io.IOException(
        s"commit rename failed for batch $batchId but no committed dir " +
          s"exists — staged data kept at $stagingDir for retry")
    }
    won
  }

  private def writeCommit(d: File, name: String,
      messages: Iterator[(String, String)]): Unit = {
    if (!messages.hasNext) return
    d.mkdirs()
    val target = new File(d, s"$name.log")
    if (target.exists()) return // a retry of an already-committed unit
    // tmp name stays unique so concurrent attempts never clobber each
    // other mid-write
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
    // plain rename: on POSIX an ATOMIC_MOVE onto an existing file
    // silently replaces it, so "first wins" is enforced by the exists()
    // check plus content determinism within an attempt (same plan =>
    // same rows per p<id>); a same-named late double-write lands
    // identical bytes
    if (tmp.renameTo(target)) {
      FilePublisher.syncDir(d) // the rename itself must survive power loss
    } else if (target.exists()) {
      tmp.delete() // lost the race to an identical-content sibling
    } else {
      throw new java.io.IOException(
        s"rename failed for ${target.getPath} with no prior commit — " +
          s"kept ${tmp.getPath}; caller must retry")
    }
  }
}

object FilePublisher {
  import java.nio.charset.StandardCharsets.UTF_8

  /** fsync a DIRECTORY: a file fsync makes the bytes durable, but the
    * rename that made them visible lives in the parent directory's
    * entries — without this, a power loss can forget an acknowledged
    * commit while the query checkpoint survives. Directories can't take
    * FileChannel.force on every filesystem; where the open/force is
    * unsupported the sync degrades to process-crash safety (best effort,
    * never an error).
    */
  private[streaming] def syncDir(d: java.io.File): Unit =
    try {
      val ch = java.nio.channels.FileChannel.open(
        d.toPath, java.nio.file.StandardOpenOption.READ)
      try ch.force(true) finally ch.close()
    } catch { case _: Exception => () }

  /** fsync an already-written FILE's contents (same best-effort contract
    * as [[syncDir]]).
    */
  private[streaming] def syncFile(p: java.nio.file.Path): Unit =
    try {
      val ch = java.nio.channels.FileChannel.open(
        p, java.nio.file.StandardOpenOption.WRITE)
      try ch.force(true) finally ch.close()
    } catch { case _: Exception => () }

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
  /** All committed log files: top-level at-least-once commits plus the
    * contents of atomically-committed batch directories, keyed by their
    * dir-relative path (the consumer-offset identity).
    */
  private def commitFiles(dir: String): Seq[(String, java.io.File)] = {
    val base = new java.io.File(dir)
    val entries = Option(base.listFiles()).getOrElse(Array.empty)
    val topLevel = entries
      .filter(f => f.isFile && f.getName.endsWith(".log"))
      .map(f => f.getName -> f)
    val inBatches = entries
      .filter(d => d.isDirectory && d.getName.endsWith(".committed"))
      .flatMap(cd => Option(cd.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".log"))
        .map(f => s"${cd.getName}/${f.getName}" -> f))
    (topLevel ++ inBatches).sortBy(_._1).toSeq
  }

  def consumeFrom(dir: String, processed: Set[String])
      : (Vector[(String, String)], Set[String]) = {
    val (msgs, seen, _) = consumeFromDetailed(dir, processed)
    (msgs, seen)
  }

  /** Metric counting lines dropped from damaged commit files — the
    * design makes torn lines "impossible" (fsync + atomic rename), so
    * any non-zero value is evidence of real corruption an operator must
    * see, not a condition to paper over.
    */
  val CorruptLinesMetric = "publish_log_corrupt_lines"

  private lazy val log =
    org.slf4j.LoggerFactory.getLogger("graft.streaming.FilePublisher")

  /** [[consumeFrom]] plus a report of damaged files: `(file, skipped
    * line count)` for every consumed commit file that contained
    * corrupt (separator-less) lines. A skipped line is DATA LOSS under
    * the "duplicates, never loss" contract, so it must be observable:
    * each damaged file is logged, counted on [[CorruptLinesMetric]],
    * and returned here so a consumer can quarantine/alert instead of
    * silently advancing past it.
    */
  def consumeFromDetailed(dir: String, processed: Set[String])
      : (Vector[(String, String)], Set[String], Vector[(String, Int)]) = {
    val files = commitFiles(dir).filterNot(f => processed.contains(f._1))
    val corrupt = Vector.newBuilder[(String, Int)]
    val msgs = files.toVector.flatMap { case (name, f) =>
      var skipped = 0
      val parsed = new String(java.nio.file.Files.readAllBytes(f.toPath), UTF_8)
        .linesIterator.filter(_.nonEmpty).flatMap { line =>
          // a corrupt/truncated line (no separator) is skipped, not
          // thrown: one bad line must not poison the whole consume call
          // and pin the consumer behind the damaged file forever —
          // but the skip is counted and surfaced, never silent
          val i = line.indexOf('\t')
          if (i < 0) { skipped += 1; None }
          else Some((unescape(line.substring(0, i)),
            unescape(line.substring(i + 1))))
        }.toVector
      if (skipped > 0) {
        corrupt += ((name, skipped))
        graft.streaming.Metrics.add(CorruptLinesMetric, skipped.toDouble)
        log.warn(s"publish log file $name in $dir: skipped $skipped " +
          "corrupt line(s) — acknowledged message(s) lost to damage")
      }
      parsed
    }
    (msgs, processed ++ files.map(_._1), corrupt.result())
  }

  /** Drop the named commit files (everything a consumer has durably
    * processed) — retention for an otherwise append-forever log. Safe
    * with concurrent producers: only explicitly-named, fully-committed
    * files are removed, never "everything older than" some cursor a
    * late-landing rename could slip under.
    */
  def truncate(dir: String, processed: Set[String]): Int =
    commitFiles(dir).filter(f => processed.contains(f._1))
      .count(_._2.delete())

  private[streaming] def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
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

  /** The exactly-once wiring of the durable publisher: partitions stage
    * into a per-attempt directory, and the whole batch commits with one
    * atomic directory rename after the partition action completes — so
    * the engine's at-least-once micro-batch retries (even replanned with
    * different partitioning) de-duplicate at the sink instead of
    * reaching consumers (see [[FilePublisher.commitStaged]]).
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
        if (!publisher.batchCommitted(batchId)) {
          val staging = publisher.stagingDirFor(batchId)
          batch.foreachPartition { rows: Iterator[Row] =>
            publisher.stagePartition(staging,
              org.apache.spark.TaskContext.get().partitionId(),
              rows.map(r => (RoutingKey, r.getString(0))))
          }
          publisher.commitStaged(staging, batchId)
          ()
        }
      }
}
