package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming._
import graft.operators.Dedup

/** One document's membership in one LSH band bucket. */
case class BandHit(doc_id: Long, band: Int, key: String)

/** A near-dup candidate hit: `(a_id, b_id)` collided in `band`
  * (`a_id < b_id`). A pair colliding in k bands yields k hits — the
  * reader folds them with `countDistinct(band)`, which also makes the
  * at-least-once sink replay idempotent.
  */
case class PairHit(a_id: Long, b_id: Long, band: Int)

/** Keyed state for ONE `(band, key)` bucket of the streaming LSH band
  * log: the doc_ids ingested into the bucket so far. Each arriving doc
  * is paired against the bucket's members and appended — per-batch work
  * is O(batch bands + emitted pairs), independent of corpus size. This
  * replaces the previous shape (append bands to a parquet log, re-join
  * every batch against the WHOLE accumulated log), whose per-batch cost
  * grew with the corpus — at 100 TB the log IS the corpus, so the old
  * shape re-scanned the world per micro-batch.
  *
  * State size per key is the bucket population — exactly the data a
  * batch LSH equi-join would group on that key, held in RocksDB rather
  * than recomputed; a degenerate hot bucket is quadratic in EMITTED
  * PAIRS under any LSH formulation (batch included), not a new cost of
  * the streaming shape.
  *
  * Replay: the state store is versioned per batch, so a replayed batch
  * reprocesses against the pre-batch state (no double-append), and a
  * genuinely re-ingested doc_id is recognized as already present —
  * membership and emissions are idempotent.
  */
class BandBucketProcessor(ttl: TTLConfig = TTLConfig.NONE)
    extends StatefulProcessor[(Int, String), BandHit, PairHit] {

  @transient private var members: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    members = getHandle.getListState[Long]("members", Encoders.scalaLong, ttl)

  override def handleInputRows(
      key: (Int, String),
      rows: Iterator[BandHit],
      timerValues: TimerValues): Iterator[PairHit] = {
    val present = scala.collection.mutable.HashSet.empty[Long]
    val acc = scala.collection.mutable.ArrayBuffer.empty[Long]
    members.get().foreach { id => present += id; acc += id }
    val out = scala.collection.mutable.ArrayBuffer.empty[PairHit]
    val fresh = scala.collection.mutable.ArrayBuffer.empty[Long]
    rows.foreach { r =>
      if (!present.contains(r.doc_id)) {
        // the newcomer pairs with every member already in the bucket —
        // including same-batch earlier arrivals, so any batching of the
        // input yields the same pair set (confluence, spec-asserted)
        acc.foreach(e => out += PairHit(
          math.min(e, r.doc_id), math.max(e, r.doc_id), key._1))
        present += r.doc_id
        acc += r.doc_id
        fresh += r.doc_id
      }
    }
    if (fresh.nonEmpty) members.appendList(fresh.toArray)
    out.iterator
  }
}

/** Ingest-time near-dup detection — dedup AT THE DOOR, the shape a
  * 100 TB training pipeline actually runs: every arriving micro-batch
  * of documents bands itself with per-row expressions (no shuffle —
  * [[Dedup.bandKeysPerRow]]), then probes the keyed band-bucket state
  * ([[BandBucketProcessor]]) for collisions. Requires the RocksDB state
  * store provider (`transformWithState`), which is also what keeps the
  * accumulated bucket membership off-heap and incrementally
  * checkpointed at scale.
  */
object IngestDedup {

  /** The streaming pair-hit stream for a streaming `documents` frame
    * (`doc_id`, `text`). Union over any batching equals the
    * all-at-once batch LSH pair query (`dedup_minhash_lsh`'s oracle).
    *
    * `horizon`: by default (None) buckets remember ALL history — the
    * dedup-vs-everything-ever-ingested semantic, whose state grows with
    * the corpus forever (inherent to that semantic, not to this shape).
    * With `Some(d)` each bucket member expires `d` after insertion
    * (RocksDB-native TTL, checked lazily on read — no timer storm), so
    * an arriving doc is deduped against the trailing-`d` window only —
    * the `dropDuplicatesWithinWatermark` analog for near-dup LSH, with
    * BOUNDED state at any ingest rate. Confluence within the horizon is
    * unchanged: batching cannot move a member across its own insertion
    * clock.
    *
    * Operational note: processing-time mode makes the engine run
    * NO-DATA micro-batches to advance the TTL clock
    * (`shouldRunAnotherBatch` is always true), so a horizoned query
    * never self-terminates — run it with a periodic processing-time
    * trigger (the natural production shape), not `AvailableNow`, and
    * stop it explicitly; the spec polls the sink for the same reason.
    */
  def pairHits(docs: DataFrame,
      horizon: Option[java.time.Duration] = None): Dataset[PairHit] = {
    val s = docs.sparkSession
    import s.implicits._
    // TTL needs the processing-time mode; the all-history default keeps
    // TimeMode.None (no clock plumbed through the state store at all)
    val (ttl, mode) = horizon match {
      case Some(d) => (TTLConfig(d), TimeMode.ProcessingTime())
      case None => (TTLConfig.NONE, TimeMode.None())
    }
    // spread the md5-heavy banding across the executors BEFORE it runs:
    // a micro-batch often arrives as few (or one) input splits — a
    // single small file batch would otherwise hash every document in
    // one task. The text shuffle is cheap next to the hashing, and the
    // banding output must shuffle to the state keys anyway.
    Dedup.bandKeysPerRow(docs.repartition()).as[BandHit]
      .groupByKey(h => (h.band, h.key))
      .transformWithState(
        new BandBucketProcessor(ttl), mode, OutputMode.Append())
  }
}
