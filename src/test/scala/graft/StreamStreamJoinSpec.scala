package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval join with watermarks on both sides: the
  * "purchase within 1 hour of signup" shape. Both join-state buffers are
  * bounded by the watermark + time-range condition — the only safe way to
  * join two firehoses at scale.
  */
class StreamStreamJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  case class E(userId: Long, kind: String, ts: java.sql.Timestamp)
  private def t(s: Long) = new java.sql.Timestamp(s * 1000)

  test("purchases join signups within a 1-hour event-time window") {
    val signups = MemoryStream[(Long, Long)](spark)
    val purchases = MemoryStream[(Long, Long)](spark)
    val s = signups.toDS()
      .select(col("_1").as("s_user"), timestamp_seconds(col("_2")).as("s_ts"))
      .withWatermark("s_ts", "2 hours")
    val p = purchases.toDS()
      .select(col("_1").as("p_user"), timestamp_seconds(col("_2")).as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val joined = p.join(s,
      col("p_user") === col("s_user") &&
        col("p_ts") >= col("s_ts") &&
        col("p_ts") <= col("s_ts") + expr("INTERVAL 1 HOUR"))
    val name = s"ssj_${System.nanoTime()}"
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      val base = 1700000000L
      signups.addData(Seq((1L, base), (2L, base)))
      purchases.addData(Seq(
        (1L, base + 600),   // in window -> match
        (2L, base + 7200),  // 2h later -> out of window
        (3L, base + 300)))  // no signup -> no match
      q.processAllAvailable()
      val rows = spark.table(name)
        .select(col("p_user"), unix_seconds(col("p_ts")))
        .as[(Long, Long)].collect().toSet
      assert(rows == Set((1L, base + 600)))
    } finally q.stop()
  }
}
