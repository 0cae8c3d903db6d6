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

  val queries: Map[String, Q] = Map(
    "mm_meta" -> meta,
    "mm_decode_stub" -> decodeStub,
    "mm_chunks" -> chunks,
    "mm_framesample" -> framesample,
  )

  val oracles: Map[String, String] = Map(
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
