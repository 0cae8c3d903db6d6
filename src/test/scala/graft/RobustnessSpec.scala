package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.model.MetagameEvent
import graft.sources.EssFeeds

/** Failure-path behavior: malformed frames must not poison the pipeline,
  * and a restarted query must resume from its checkpoint without losing
  * or duplicating frames (DSv2 offset recovery).
  */
class RobustnessSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def frame(id: String, state: String, ts: Double): String =
    s"""{"id":"$id","event_id":1,"state":"$state","world_id":17,"zone_id":1,
       |"nc":40,"tr":30,"vs":20,"xp":25,"timestamp":$ts}"""
      .stripMargin.replace("\n", "")

  test("malformed frames are dropped, valid frames survive") {
    val ch = s"rob_${System.nanoTime()}"
    EssFeeds.push(ch, frame("17-1", "started", 1000))
    EssFeeds.push(ch, "this is not json {{{")
    EssFeeds.push(ch, """{"unrelated": true}""")
    EssFeeds.push(ch, """{"id":"19-2","state":"started"}""") // missing fields
    EssFeeds.push(ch, frame("19-3", "started", 2000))
    val raw = spark.readStream.format("ess").option("channel", ch).load()
    val name = s"rob_out_$ch"
    val q = MetagameEvent.fromJson(raw.select("value"))
      .writeStream.format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val ids = spark.table(name).select("id").as[String].collect().toSet
    assert(ids == Set("17-1", "19-3"))
  }

  test("query restart resumes from checkpoint: no loss, no duplicates") {
    val ch = s"ckpt_${System.nanoTime()}"
    val ckpt = Files.createTempDirectory("ess_ckpt").toString
    val got = RobustnessSpec.sink(ch)

    def run(): Unit = {
      val q = spark.readStream.format("ess").option("channel", ch).load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = b.selectExpr("seq").collect().map(_.getLong(0))
          rows.foreach(got.add)
        }
        .start()
      try q.awaitTermination() finally q.stop()
    }

    EssFeeds.push(ch, frame("17-1", "started", 1000))
    EssFeeds.push(ch, frame("17-2", "started", 1100))
    run()
    assert(got.toArray.toSet == Set(1L, 2L))

    EssFeeds.push(ch, frame("17-3", "started", 1200))
    run() // restart from the same checkpoint
    val seqs = got.toArray.map(_.asInstanceOf[Long]).toSeq.sorted
    assert(seqs == Seq(1L, 2L, 3L),
      s"expected exactly 1,2,3 across restarts, got $seqs")
  }
}

object RobustnessSpec {
  // survives executor serialization in local mode (same JVM)
  private val sinks =
    new java.util.concurrent.ConcurrentHashMap[String, ConcurrentLinkedQueue[Long]]()
  def sink(ch: String): ConcurrentLinkedQueue[Long] =
    sinks.computeIfAbsent(ch, _ => new ConcurrentLinkedQueue[Long]())
}
