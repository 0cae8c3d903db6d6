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

  test("attribution join is confluent over batching (registry body)") {
    import org.apache.spark.sql.DataFrame
    val clicks = MemoryStream[(Long, Long, Long)](spark)
    val purchases = MemoryStream[(Long, Long, Long)](spark)
    def shape(df: DataFrame) = df.select(col("_1").as("user_id"),
      col("_2").as("event_id"), timestamp_seconds(col("_3")).as("ts"))
    val joined = graft.operators.StreamingQueries
      .joinClicksToPurchases(shape(clicks.toDF()), shape(purchases.toDF()))
    val name = s"ssj_attrib_${System.nanoTime()}"
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      val t0 = 1700000000L
      // batch 1: a same-batch pair (201→903); 101 buffers for later
      clicks.addData(Seq((1L, 101L, t0), (2L, 201L, t0)))
      purchases.addData(Seq((2L, 903L, t0 + 1000)))
      q.processAllAvailable()
      // batch 2: a purchase probing the buffered click (101) AND a
      // fresh same-batch click (102) — both orientations of the
      // symmetric hash join emit across the batch boundary
      clicks.addData(Seq((1L, 102L, t0 + 3600)))
      purchases.addData(Seq((1L, 901L, t0 + 7200)))
      q.processAllAvailable()
      // batch 3: outside the 24 h window — must NOT match 201
      purchases.addData(Seq((2L, 902L, t0 + 90000)))
      q.processAllAvailable()
      val got = spark.table(name)
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          col("gap_us"))
        .as[(Long, Long, Long, Long)].collect().toSet
      val expected = Set(
        (1L, 101L, 901L, 7200L * 1000000),
        (1L, 102L, 901L, 3600L * 1000000),
        (2L, 201L, 903L, 1000L * 1000000))
      assert(got == expected,
        s"missing=${expected -- got} extra=${got -- expected}")
    } finally q.stop()
  }
}
