package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{load => T}

/** A decoded-media feature row: what a real image/audio decoder would
  * produce per document. `features` is the embedding/feature vector a
  * downstream model consumes.
  */
case class MediaFeatures(
    doc_id: Long,
    n_bytes: Long,
    format: String,
    width: Int,
    height: Int,
    features: Array[Float])

/** Multimodal-column plumbing (north-star Ext): media as opaque `binary`
  * columns with typed metadata, processed by partition-local batch
  * functions — the Scala analog of `mapInPandas`.
  *
  * The container has no image/audio codecs, so the *decode* step is a
  * deterministic stub ([[Multimodal.fakeDecode]], clearly marked); the
  * Spark-side plumbing — binary columns, schema, partition-wise batching,
  * feature schema — is real and is what matters at 100 TB: decode is
  * per-row CPU work that scales linearly with executors, no shuffle.
  *
  * The `documents.text` bytes stand in for media payloads (the testdata
  * has no binary table).
  */
object Multimodal {

  type Q = (SparkSession, String) => DataFrame

  /** Media table: binary payload + metadata columns. */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    T(s, d, "documents").select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      lit("application/octet-stream").as("media_type"))

  /** STUB decoder — stands in for an image/audio codec, which is not
    * available in this container. Deterministic: derives pseudo
    * dimensions and a 4-float feature vector from the payload bytes.
    * A real deployment replaces ONLY this function (same signature).
    */
  def fakeDecode(docId: Long, media: Array[Byte]): MediaFeatures = {
    val n = media.length
    val checksum = media.foldLeft(17L)((a, b) => a * 31 + (b & 0xff))
    MediaFeatures(
      doc_id = docId,
      n_bytes = n.toLong,
      format = if (n % 2 == 0) "fake/even" else "fake/odd",
      width = (math.abs(checksum) % 1920).toInt,
      height = (math.abs(checksum / 1920) % 1080).toInt,
      features = Array(n.toFloat, (checksum % 255).toFloat,
        (n % 255).toFloat, (checksum % 7).toFloat))
  }

  /** Decode batch size: a real deployment sizes this to the model's
    * optimal inference batch (the `mapInPandas` arrow-batch analog).
    */
  val DecodeBatchSize = 64

  /** BATCH decoder seam: takes a whole batch and returns its features in
    * one call — the signature a vectorized codec / model-inference
    * endpoint has. The stub maps per element; a real implementation
    * replaces the body with one batched call.
    */
  def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[MediaFeatures] =
    batch.map { case (id, bytes) => fakeDecode(id, bytes) }

  /** Partition-wise decode: the `mapPartitions` boundary is where a real
    * implementation amortizes codec/model initialization per task, and
    * rows flow through [[decodeBatch]] in fixed-size batches — one
    * batched call per `DecodeBatchSize` rows (the `mapInPandas` shape).
    */
  def decode(s: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import s.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init of a real decoder/model would go here
        it.grouped(DecodeBatchSize).flatMap(decodeBatch)
      }
  }

  /** Metadata extraction — pure column ops, oracle-checkable. */
  private val meta: Q = (s, d) =>
    T(s, d, "documents").select(
      col("doc_id"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      substring(md5(col("text").cast("binary")), 1, 8).as("magic"))

  /** Decode + feature extraction via the stubbed partition-local codec.
    * Rows-only check (the stub is not SQL-expressible); the scalatest
    * spec pins determinism and schema.
    */
  private val decodeStub: Q = (s, d) =>
    decode(s, mediaTable(s, d)).toDF()
      .select(col("doc_id"), col("n_bytes"), col("format"), col("width"),
        col("height"))

  /** Frame/chunk sampling: split each payload into fixed 256-byte frames
    * (posexplode) — the shape of video frame-sampling where each frame is
    * a row. Oracle-checkable via integer arithmetic on lengths.
    */
  private val chunks: Q = (s, d) =>
    T(s, d, "documents")
      .select(col("doc_id"), col("text"))
      .select(col("doc_id"),
        // (?s) so '.' crosses line terminators — payload bytes may
        // contain newlines even though the current testdata has none
        posexplode(split(col("text"), "(?s)(?<=\\G.{256})")).as(Seq("frame_idx", "frame")))
      // Spark's split keeps a trailing empty token when the length is an
      // exact multiple of the frame size; drop it to match ceil(len/256).
      .filter(length(col("frame")) > 0)
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        length(col("frame")).cast("long").as("frame_len"))

  /** Frame sampling: every 4th frame of each payload — the video
    * frame-subsample shape (uniform stride). Composes on the chunking
    * generator; stride selection is a codegen'd modulo filter, so the
    * sampled set never materializes the skipped frames past the filter.
    */
  private val framesample: Q = (s, d) =>
    chunks(s, d).filter(col("frame_idx") % 4 === 0)

  /** Shard packing target (bytes per output shard). */
  private val ShardBytes = 2048L

  /** WEBDATASET-STYLE SHARD PACKING — the storage step of every
    * multimodal training pipeline: media samples stream into
    * size-bounded archive shards (tar files in the published
    * WebDataset layout) that the data loader later reads
    * sequentially. Per source, payloads pack in doc_id order into
    * shards of ~[[ShardBytes]] via the running-sum prefix trick
    * (`shard = bytes_before div target` — the same declarative greedy
    * scan as `layout_compaction`, here on media byte lengths); the
    * manifest emits per shard its item count, byte total, and doc-id
    * range — exactly what the loader needs to seek.
    *
    * Scale shape: one scan projecting octet lengths (the payload
    * bytes never shuffle — only lengths do), a per-source window
    * whose partition size is the SOURCE's item count, one
    * map-side-combinable rollup.
    */
  private val shardPack: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
    T(s, d, "documents")
      .select(col("source"), col("doc_id"),
        octet_length(col("text")).cast("long").as("bytes"))
      .withColumn("before", coalesce(sum(col("bytes"))
        .over(w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)), lit(0L)))
      .withColumn("shard", expr(s"before div $ShardBytes"))
      .groupBy(col("source"), col("shard"))
      .agg(count(lit(1)).as("n_items"), sum(col("bytes")).as("total_bytes"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
  }

  val queries: Map[String, Q] = Map(
    "mm_shard_pack" -> shardPack,
    "mm_meta" -> meta,
    "mm_decode_stub" -> decodeStub,
    "mm_chunks" -> chunks,
    "mm_framesample" -> framesample,
  )

  val oracles: Map[String, String] = Map(
    "mm_shard_pack" ->
      s"""WITH f AS (
         |  SELECT source, doc_id,
         |    octet_length(encode(text)) AS bytes
         |  FROM documents),
         |p AS (
         |  SELECT source, doc_id, bytes,
         |    CAST(coalesce(sum(bytes) OVER (PARTITION BY source
         |      ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) // $ShardBytes AS shard
         |  FROM f)
         |SELECT source, shard, count(*) AS n_items,
         |  CAST(sum(bytes) AS BIGINT) AS total_bytes,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM p GROUP BY 1, 2""".stripMargin,
    "mm_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |  substr(md5(text), 1, 8) AS magic FROM documents""".stripMargin,
    "mm_chunks" ->
      """SELECT doc_id, i - 1 AS frame_idx,
        |  length(substr(text, (i - 1) * 256 + 1, 256)) AS frame_len
        |FROM documents,
        |  unnest(generate_series(1, CAST(ceil(length(text) / 256.0) AS BIGINT))) t(i)""".stripMargin,
    "mm_framesample" ->
      """SELECT doc_id, i - 1 AS frame_idx,
        |  length(substr(text, (i - 1) * 256 + 1, 256)) AS frame_len
        |FROM documents,
        |  unnest(generate_series(1, CAST(ceil(length(text) / 256.0) AS BIGINT))) t(i)
        |WHERE (i - 1) % 4 = 0""".stripMargin,
    // mm_decode_stub: no oracle — the stub decoder is Scala-side only.
  )
}
