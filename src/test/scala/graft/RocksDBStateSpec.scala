package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.model.MetagameEvent
import graft.streaming.AlertPipeline

/** The 100 TB state posture: the keyed alert state runs on the RocksDB
  * state store provider (off-heap, spillable, incremental checkpoints)
  * instead of the default in-memory HDFS-backed provider. This spec
  * proves the stateful pipeline is provider-agnostic and RocksDB works in
  * this build.
  */
class RocksDBStateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(id: String, state: String, ts: Double): MetagameEvent =
    MetagameEvent(id, 1, state, 17, 1, 40, 30, 20, 25, ts)

  test("alert state machine runs on RocksDBStateStoreProvider") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[MetagameEvent](spark)
      val name = s"rocks_${System.nanoTime()}"
      val q = AlertPipeline.updates(mem.toDS(), ttlSeconds = None)
        .writeStream.outputMode("update").format("memory").queryName(name)
        .start()
      try {
        mem.addData(Seq(ev("17-1", "started", 1000), ev("19-2", "started", 1100)))
        q.processAllAvailable()
        mem.addData(Seq(ev("17-1", "ended", 2000)))
        q.processAllAvailable()
        val live = spark.table(name)
          .groupBy("id")
          .agg(org.apache.spark.sql.functions.expr("max_by(status, timestamp)").as("st"))
          .filter("st = 'live'").select("id").as[String].collect().toSet
        assert(live == Set("19-2"))
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
