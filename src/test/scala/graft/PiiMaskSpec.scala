package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Masking semantics for the PII scrub on adversarial inputs — the cases
  * the hash-gate's synthetic contact blocks don't cover.
  */
class PiiMaskSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf
  import spark.implicits._

  private def mask(texts: String*): Seq[String] = {
    // run the registry operator over a stand-in documents table
    val dir = java.nio.file.Files.createTempDirectory("pii_docs").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    graft.operators.TextAnalysis.queries("text_pii_mask")(spark, dir)
      .orderBy("doc_id").select("masked").as[String].collect().toSeq
  }

  test("emails, phones and IPs are masked; lookalikes survive") {
    val out = mask(
      "write to alice.smith+spam@mail.example.org today",
      "call 555-0199 or 020-12345 now",
      "server 192.168.10.250 is up",
      "version v1.2.3 and price 10-20")
    assert(out(0).contains("<EMAIL>") && !out(0).contains("alice"))
    assert(out(1).contains("<PHONE> or <PHONE>"))
    assert(out(2).contains("server <IP> is up"))
    // version strings and short ranges are NOT PII — untouched (the
    // synthetic contact block appended to every row still masks)
    assert(out(3).contains("version v1.2.3 and price 10-20"))
  }

  test("every row of the real table ends fully masked") {
    val masked = graft.operators.TextAnalysis
      .queries("text_pii_mask")(spark, sf)
    val bad = masked.filter(
      col("masked").rlike("[0-9]@|@example|555-01|10\\.0\\.")).count()
    assert(bad == 0, s"$bad rows kept unmasked synthetic PII")
    val total = masked.count()
    val ok = masked.filter(col("masked")
      .endsWith("contact <EMAIL> ph <PHONE> host <IP>")).count()
    assert(ok == total, s"only $ok of $total rows carry the full mask")
  }
}
