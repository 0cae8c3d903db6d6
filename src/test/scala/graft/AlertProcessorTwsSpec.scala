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
