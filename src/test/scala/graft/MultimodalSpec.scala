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
}
