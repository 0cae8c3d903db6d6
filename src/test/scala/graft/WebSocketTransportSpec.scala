package graft

import java.util.concurrent.{CopyOnWriteArrayList, TimeUnit}
import org.scalatest.concurrent.Eventually.{eventually, interval, timeout}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.time.{Seconds, Span}
import graft.sources.FrameTransport

/** Live-socket proof for the websocket transport: a loopback RFC 6455
  * server ([[LoopbackWsServer]]) carries real frames end-to-end — the
  * handshake, the subscribe message (the F1 event-type filter riding to
  * the server, as in the reference's trigger registration,
  * /root/reference/ess_client.py:121-125), frame delivery, and the close
  * handshake. Round 1 could only exercise this path via direct
  * `EssFeeds.push`; this spec covers the actual socket.
  */
class WebSocketTransportSpec extends AnyFunSuite {

  private val subscribeJson =
    """{"service":"event","action":"subscribe","eventNames":["MetagameEvent"]}"""

  test("websocket transport: handshake, subscribe, frames, close") {
    val server = new LoopbackWsServer
    val got = new CopyOnWriteArrayList[String]()
    try {
      val conn = FrameTransport
        .webSocket(s"ws://127.0.0.1:${server.port}/", Some(subscribeJson))
        .connect(got.add(_))
      assert(server.awaitConnected(), "client never completed the handshake")
      // the subscription (carrying the event-type filter) reaches the server
      assert(server.awaitMessage() == subscribeJson)
      server.send("""{"id": "17-1", "state": "started"}""")
      server.send("""{"id": "19-2", "state": "started"}""")
      eventually(timeout(Span(10, Seconds)), interval(Span(0, Seconds))) {
        assert(got.size == 2)
      }
      assert(got.get(0).contains("17-1") && got.get(1).contains("19-2"))
      conn.close()
      eventually(timeout(Span(10, Seconds))) {
        assert(server.wasClosedByClient, "close() must send a close frame")
      }
    } finally server.close()
  }

  test("census_status gauge tracks transport connect/disconnect (A5 Info parity)") {
    val server = new LoopbackWsServer
    graft.streaming.Metrics.reset()
    val http = new graft.streaming.MetricsHttp(0)
    try {
      val conn = FrameTransport
        .webSocket(s"ws://127.0.0.1:${server.port}/", None)
        .connect(_ => ())
      assert(server.awaitConnected())
      assert(graft.streaming.Metrics.snapshot(FrameTransport.StatusGauge) == 1.0)
      // and it is scrapeable through the Prometheus endpoint
      val body = scala.io.Source.fromURL(
        s"http://127.0.0.1:${http.boundPort}/metrics").mkString
      assert(body.contains("graft_census_status 1.0"), body)
      conn.close()
      eventually(timeout(Span(10, Seconds))) {
        assert(graft.streaming.Metrics.snapshot(FrameTransport.StatusGauge) == 0.0)
      }
    } finally { http.close(); server.close() }
  }

  test("transport reconnects with backoff and resubscribes after a dropped connection") {
    val server = new LoopbackWsServer
    graft.streaming.Metrics.reset()
    val got = new CopyOnWriteArrayList[String]()
    try {
      val conn = FrameTransport
        .webSocket(s"ws://127.0.0.1:${server.port}/", Some(subscribeJson),
          reconnectBaseMs = 50, reconnectMaxMs = 400)
        .connect(got.add(_))
      try {
        assert(server.awaitConnected(), "initial handshake")
        assert(server.awaitMessage() == subscribeJson)
        server.send("""{"id": "17-1"}""")
        eventually(timeout(Span(10, Seconds))) { assert(got.size == 1) }
        // network fault: abrupt TCP close, no close frame
        server.dropConnection()
        eventually(timeout(Span(10, Seconds))) {
          assert(graft.streaming.Metrics.snapshot
            .getOrElse(FrameTransport.StatusGauge, 0.0) == 0.0,
            "gauge must report the outage")
        }
        // the transport heals itself: new handshake + RE-SENT subscribe,
        // no caller intervention
        assert(server.awaitConnected(20), "transport never reconnected")
        assert(server.awaitMessage(20) == subscribeJson,
          "subscription must be re-registered on the new socket")
        server.send("""{"id": "19-2"}""")
        eventually(timeout(Span(10, Seconds))) { assert(got.size == 2) }
        assert(got.get(1).contains("19-2"))
        val snap = graft.streaming.Metrics.snapshot
        assert(snap(FrameTransport.StatusGauge) == 1.0,
          "gauge back to connected after the heal")
        assert(snap(FrameTransport.ReconnectsMetric) >= 1.0,
          "reconnect attempts must be counted")
      } finally conn.close()
      eventually(timeout(Span(10, Seconds))) {
        assert(graft.streaming.Metrics.snapshot(FrameTransport.StatusGauge) == 0.0)
      }
    } finally server.close()
  }

  test("close() during an outage stops reconnect attempts") {
    val server = new LoopbackWsServer
    graft.streaming.Metrics.reset()
    val conn = FrameTransport
      .webSocket(s"ws://127.0.0.1:${server.port}/", None,
        reconnectBaseMs = 50, reconnectMaxMs = 200)
      .connect(_ => ())
    assert(server.awaitConnected())
    server.close() // full server death: the transport enters its retry loop
    eventually(timeout(Span(10, Seconds))) {
      assert(graft.streaming.Metrics.snapshot
        .getOrElse(FrameTransport.ReconnectsMetric, 0.0) >= 1.0)
    }
    conn.close() // user shutdown mid-outage must cancel the retry loop
    Thread.sleep(500)
    val after = graft.streaming.Metrics.snapshot
      .getOrElse(FrameTransport.ReconnectsMetric, 0.0)
    Thread.sleep(600) // > max backoff: any live retry would have counted
    assert(graft.streaming.Metrics.snapshot
      .getOrElse(FrameTransport.ReconnectsMetric, 0.0) == after,
      "no reconnect attempts after close()")
    assert(graft.streaming.Metrics.snapshot
      .getOrElse(FrameTransport.StatusGauge, 0.0) == 0.0)
  }

  test("live mode end-to-end: ess source over a real socket") {
    val server = new LoopbackWsServer
    val spark = SparkTestSession.spark
    val ch = s"ws_${System.nanoTime()}"
    val name = s"ess_ws_$ch"
    val q = spark.readStream.format("ess")
      .option("channel", ch)
      .option("wsUri", s"ws://127.0.0.1:${server.port}/")
      .option("subscribe", subscribeJson)
      .load()
      .writeStream.format("memory").queryName(name).start()
    try {
      assert(server.awaitConnected(), "source never opened the websocket")
      assert(server.awaitMessage() == subscribeJson)
      server.send("""{"id": "17-9", "state": "started", "timestamp": 1000}""")
      server.send("""{"id": "19-3", "state": "ended", "timestamp": 2000}""")
      eventually(timeout(Span(20, Seconds))) {
        q.processAllAvailable()
        val rows = spark.table(name).selectExpr("value").collect().map(_.getString(0))
        assert(rows.length == 2)
        assert(rows.exists(_.contains("17-9")) && rows.exists(_.contains("19-3")))
      }
    } finally {
      q.stop() // releases the transport lease -> client close frame
      server.close()
    }
  }

  test("ess source survives a full server kill+restart: frames resume, no source restart") {
    val server1 = new LoopbackWsServer
    val port = server1.port
    val spark = SparkTestSession.spark
    val ch = s"wsr_${System.nanoTime()}"
    val name = s"ess_wsr_$ch"
    val q = spark.readStream.format("ess")
      .option("channel", ch)
      .option("wsUri", s"ws://127.0.0.1:$port/")
      .option("subscribe", subscribeJson)
      .load()
      .writeStream.format("memory").queryName(name).start()
    try {
      assert(server1.awaitConnected(), "source never opened the websocket")
      assert(server1.awaitMessage() == subscribeJson)
      server1.send("""{"id": "17-9", "state": "started", "timestamp": 1000}""")
      eventually(timeout(Span(20, Seconds))) {
        q.processAllAvailable()
        assert(spark.table(name).count() == 1)
      }
      server1.close() // the feed endpoint dies entirely, mid-stream
      val server2 = new LoopbackWsServer(port) // ...and comes back, same port
      try {
        // the SHARED transport lease healed itself: new handshake + fresh
        // subscription, while the streaming query kept running untouched
        assert(server2.awaitConnected(30), "transport never reconnected")
        assert(server2.awaitMessage(20) == subscribeJson)
        server2.send("""{"id": "19-3", "state": "ended", "timestamp": 2000}""")
        eventually(timeout(Span(20, Seconds))) {
          q.processAllAvailable()
          val rows = spark.table(name).selectExpr("value").collect()
            .map(_.getString(0))
          assert(rows.length == 2)
          assert(rows.exists(_.contains("19-3")),
            "post-restart frames must flow into the SAME query")
        }
      } finally server2.close()
    } finally q.stop()
  }
}
