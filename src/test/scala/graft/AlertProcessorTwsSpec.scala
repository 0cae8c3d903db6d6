package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.model.MetagameEvent
import graft.streaming.{AlertPipeline, AlertProcessorTws}

/** transformWithState twin of the alert state machine: must agree with
  * the flatMapGroupsWithState implementation (and therefore with the
  * batch window-query oracle) on the same event soup.
  */
class AlertProcessorTwsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("native TTL expires value state (processing-time mode)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[MetagameEvent](spark)
      val name = s"twsttl_${System.nanoTime()}"
      val q = graft.streaming.AlertProcessorTws.updates(mem.toDS(),
        org.apache.spark.sql.streaming.TTLConfig(java.time.Duration.ofSeconds(1)))
        .writeStream.outputMode("update").format("memory").queryName(name)
        .start()
      // NOTE: processing-time mode runs timer batches continuously, so
      // processAllAvailable never settles — poll the sink with a deadline
      def await(cond: => Boolean): Unit = {
        val deadline = System.currentTimeMillis() + 60000
        while (!cond && System.currentTimeMillis() < deadline)
          Thread.sleep(200)
        assert(cond, "condition not met within 60s")
      }
      try {
        mem.addData(Seq(MetagameEvent("17-1", 2, "started", 17, 1,
          40, 30, 20, 25, 2000.0)))
        await(spark.table(name).count() >= 1)
        Thread.sleep(3000) // let the 1s TTL lapse in processing time
        // an OLDER `ended` arrives: if state had survived, LWW would keep
        // the newer `started` and emit "live" (eventId 2) again; with the
        // entry expired the old `ended` wins — a "removed" update with
        // eventId 1 proves the TTL fired
        mem.addData(Seq(MetagameEvent("17-1", 1, "ended", 17, 1,
          40, 30, 20, 25, 1000.0)))
        await(spark.table(name).count() >= 2)
        val second = spark.table(name)
          .filter(org.apache.spark.sql.functions.col("eventId") === 1)
          .collect()
        assert(second.nonEmpty && second.head.getAs[String]("status") == "removed",
          s"expected TTL-expired state to yield removed/eventId=1, table: " +
            spark.table(name).collect().mkString(", "))
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState agrees with flatMapGroupsWithState on a soup") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rnd = new scala.util.Random(7)
      val soup = (1 to 200).map { i =>
        MetagameEvent(s"${rnd.nextInt(4)}-${rnd.nextInt(8)}", i,
          if (rnd.nextBoolean()) "started" else "ended", 17, 1,
          40, 30, 20, 25, 1000.0 + rnd.nextInt(5000))
      }
      val mem = MemoryStream[MetagameEvent](spark)
      mem.addData(soup)
      val name = s"tws_${System.nanoTime()}"
      val q = AlertProcessorTws.updates(mem.toDS())
        .writeStream.outputMode("update").format("memory").queryName(name)
        .start()
      try q.processAllAvailable() finally q.stop()
      val live = spark.table(name)
        .groupBy("id")
        .agg(org.apache.spark.sql.functions.expr("max_by(status, timestamp)").as("st"))
        .filter("st = 'live'").select("id").as[String].collect().toSet
      val expected = AlertPipeline.inProgressSnapshot(soup.toDS())
        .select("id").as[String].collect().toSet
      assert(live == expected)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
