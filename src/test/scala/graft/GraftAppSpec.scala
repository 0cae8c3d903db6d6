package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.EssFeeds
import graft.streaming.{GraftApp, InMemoryPublisher, Metrics, Observability}

/** The assembled service (§3.1 end-to-end): raw frames in one side —
  * published wire JSON, durable in-progress table and metrics out the
  * other. Also covers C1 routing: publish sink disabled by config.
  */
class GraftAppSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def frame(id: String, state: String, ts: Double): String =
    s"""{"id":"$id","event_id":1,"state":"$state","world_id":17,"zone_id":1,
       |"nc":40,"tr":30,"vs":20,"xp":25,"timestamp":$ts}"""
      .stripMargin.replace("\n", "")

  test("full service: frames -> publish + durable state + metrics") {
    Metrics.reset()
    val listener = new Observability.MetricsListener
    spark.streams.addListener(listener)
    try {
      val ch = s"app_${System.nanoTime()}"
      val cfg = GraftApp.Config(
        channel = ch, wsUri = None, subscribe = None,
        publishEnabled = true, purgeStale = false, ttlSeconds = 5400,
        stateTablePath = Files.createTempDirectory("app_state").toString)
      EssFeeds.push(ch, frame("17-1", "started", 1000))
      EssFeeds.push(ch, frame("19-2", "started", 1500))
      EssFeeds.push(ch, frame("17-1", "ended", 2000))
      val running = GraftApp.start(spark, cfg, InMemoryPublisher(ch))
      try running.processAllAvailable() finally running.stopAll()

      val published = InMemoryPublisher.queue(ch).size()
      assert(published == 3, s"published $published of 3")
      import spark.implicits._
      val live = running.table.snapshot(spark)
        .select("id").as[String].collect().toSet
      assert(live == Set("19-2"))
      val deadline = System.currentTimeMillis() + 10000
      while (Metrics.snapshot.getOrElse("total_events", 0.0) < 3.0 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(Metrics.snapshot("total_events") >= 3.0)
    } finally spark.streams.removeListener(listener)
  }

  test("live mode keeps running and processes frames pushed after startup") {
    val ch = s"applive_${System.nanoTime()}"
    val cfg = GraftApp.Config(
      channel = ch, wsUri = None, subscribe = None,
      publishEnabled = true, purgeStale = false, ttlSeconds = 5400,
      stateTablePath = Files.createTempDirectory("app_live").toString)
    val running = GraftApp.start(spark, cfg, InMemoryPublisher(ch), live = true)
    try {
      // frames arrive AFTER the queries started — drain-and-stop triggers
      // would already have terminated and missed them
      EssFeeds.push(ch, frame("17-1", "started", 1000))
      EssFeeds.push(ch, frame("19-2", "started", 1500))
      val deadline = System.currentTimeMillis() + 60000
      def liveCount = running.table.snapshot(spark).count()
      while ((InMemoryPublisher.queue(ch).size() < 2 || liveCount < 2) &&
        System.currentTimeMillis() < deadline) Thread.sleep(250)
      assert(InMemoryPublisher.queue(ch).size() == 2)
      assert(liveCount == 2)
      assert(running.publish.get.isActive && running.state.isActive,
        "live-mode queries must still be running")
    } finally running.stopAll()
  }

  test("full service with the durable publisher: events land in the append log") {
    val ch = s"appdur_${System.nanoTime()}"
    val logDir = Files.createTempDirectory("app_publog").toString
    val cfg = GraftApp.Config(
      channel = ch, wsUri = None, subscribe = None,
      publishEnabled = true, publishLogDir = Some(logDir),
      purgeStale = false, ttlSeconds = 5400,
      stateTablePath = Files.createTempDirectory("app_durstate").toString)
    EssFeeds.push(ch, frame("17-1", "started", 1000))
    EssFeeds.push(ch, frame("19-2", "started", 1500))
    val running = GraftApp.start(spark, cfg,
      new graft.streaming.FilePublisher(logDir))
    try running.processAllAvailable() finally running.stopAll()
    val got = graft.streaming.FilePublisher.consume(logDir)
    assert(got.length == 2 && got.forall(_._1 == graft.streaming.Sinks.RoutingKey))
    assert(got.exists(_._2.contains("\"id\":\"17-1\"")))
  }

  test("malformed frames are counted ONCE even with both queries running") {
    Metrics.reset()
    val listener = new Observability.MetricsListener
    spark.streams.addListener(listener)
    try {
      val ch = s"appmf_${System.nanoTime()}"
      val cfg = GraftApp.Config(
        channel = ch, wsUri = None, subscribe = None,
        publishEnabled = true, purgeStale = false, ttlSeconds = 5400,
        stateTablePath = Files.createTempDirectory("app_mf").toString)
      EssFeeds.push(ch, frame("17-1", "started", 1000))
      EssFeeds.push(ch, "{not json at all")
      val running = GraftApp.start(spark, cfg, InMemoryPublisher(ch))
      try running.processAllAvailable() finally running.stopAll()
      val deadline = System.currentTimeMillis() + 10000
      while (Metrics.snapshot.getOrElse("malformed_frames", 0.0) < 1.0 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      // publish + state both consume the parsed stream; the counter must
      // ride on exactly one branch (1 bad frame != 2 counted)
      assert(Metrics.snapshot("malformed_frames") == 1.0)
    } finally spark.streams.removeListener(listener)
  }

  test("C1 routing: publish disabled leaves only the state query") {
    val ch = s"app2_${System.nanoTime()}"
    val cfg = GraftApp.Config(
      channel = ch, wsUri = None, subscribe = None,
      publishEnabled = false, purgeStale = true, ttlSeconds = 5400,
      stateTablePath = Files.createTempDirectory("app_state2").toString)
    EssFeeds.push(ch, frame("17-9", "started", 1000))
    val running = GraftApp.start(spark, cfg, InMemoryPublisher(ch))
    try running.processAllAvailable() finally running.stopAll()
    assert(running.publish.isEmpty)
    assert(InMemoryPublisher.queue(ch).isEmpty)
    assert(running.table.snapshot(spark).count() == 1)
  }
}
