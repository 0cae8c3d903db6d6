package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.model.MetagameEvent
import graft.streaming.AlertPipeline

/** Streaming-pipeline throughput probe: replays N synthetic MetagameEvents
  * through the full stateful path (groupByKey → flatMapGroupsWithState →
  * update sink) and reports events/second — the number to hold against the
  * reference's single-asyncio-loop, one-Mongo-write-per-event ceiling
  * (SURVEY.md §6: implied tens of events/sec live, low-thousands/sec
  * theoretical).
  */
object ThroughputProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200000
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    import spark.implicits._

    val rnd = new scala.util.Random(42)
    val events = (1 to n).map { i =>
      MetagameEvent(s"${rnd.nextInt(20)}-${rnd.nextInt(500)}", i,
        if (rnd.nextBoolean()) "started" else "ended", 17, 1,
        40, 30, 20, 25, 1000.0 + i)
    }

    // warm the streaming machinery untimed
    val warm = MemoryStream[MetagameEvent](spark)
    warm.addData(events.take(1000))
    val wq = AlertPipeline.updates(warm.toDS(), ttlSeconds = None)
      .writeStream.outputMode("update").format("noop").start()
    wq.processAllAvailable(); wq.stop()

    val mem = MemoryStream[MetagameEvent](spark)
    mem.addData(events)
    val t0 = System.nanoTime()
    val q = AlertPipeline.updates(mem.toDS(), ttlSeconds = None)
      .writeStream.outputMode("update").format("noop").start()
    q.processAllAvailable()
    val secs = (System.nanoTime() - t0) / 1e9
    q.stop()
    println(f"""{"metric":"stateful_events_per_sec","value":${n / secs}%.0f,"events":$n,"sec":$secs%.2f}""")
    spark.stop()
  }
}
