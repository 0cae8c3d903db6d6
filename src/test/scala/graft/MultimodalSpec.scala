package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** The multimodal plumbing contract: deterministic stub decode, stable
  * schema, frame chunking that reassembles to the original length.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf
  import spark.implicits._

  test("stub decode is deterministic and covers every row") {
    val a = Multimodal.queries("mm_decode_stub")(spark, sf).collect()
    val b = Multimodal.queries("mm_decode_stub")(spark, sf).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
    assert(a.length == Tables.load(spark, sf, "documents").count())
    assert(a.forall(r => r.getInt(3) >= 0 && r.getInt(3) < 1920))
  }

  test("decode output schema is the typed MediaFeatures contract") {
    val ds = Multimodal.decode(spark, Multimodal.mediaTable(spark, sf))
    assert(ds.schema.fieldNames.toSeq ==
      Seq("doc_id", "n_bytes", "format", "width", "height", "features"))
    val row = ds.head()
    assert(row.features.length == 4)
  }

  test("frame chunks reassemble to original byte length") {
    val chunks = Multimodal.queries("mm_chunks")(spark, sf)
      .groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.sum("frame_len").as("total"))
    val docs = Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "length(text) AS len")
    val joined = chunks.join(docs, "doc_id")
      .filter(org.apache.spark.sql.functions.col("total") =!=
        org.apache.spark.sql.functions.col("len"))
    assert(joined.count() == 0)
  }

  test("shard packing partitions every item into ordered per-source bins") {
    import org.apache.spark.sql.functions.col
    val spark = SparkTestSession.spark
    val sf = SparkTestSession.sf
    val shards = SparkEntry.queries("mm_shard_pack")(spark, sf).collect()
    assert(shards.nonEmpty)
    // every payload lands in exactly one shard
    assert(shards.map(_.getAs[Long]("n_items")).sum ==
      Tables.load(spark, sf, "documents").count())
    shards.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_.getAs[Long]("shard"))
      // dense shard ids from 0, doc ranges strictly ordered
      assert(ordered.map(_.getAs[Long]("shard")).toSeq ==
        ordered.indices.map(_.toLong))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"))
        case _ =>
      }
    }
  }
}
