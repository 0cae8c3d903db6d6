package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.scalatest.concurrent.Eventually.eventually
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.time.{Seconds, Span}
import org.scalatest.time.SpanSugar._
import graft.sources.FrameTransport
import graft.streaming.{Metrics, MetricsHttp}

/** GET /metrics serves the Prometheus text format from a live server. */
class MetricsHttpSpec extends AnyFunSuite {

  private implicit val patience: org.scalatest.concurrent.Eventually.PatienceConfig =
    org.scalatest.concurrent.Eventually.PatienceConfig(
      org.scalatest.time.Span(10, Seconds), 50.milliseconds)

  test("metrics endpoint serves gauges in Prometheus text format") {
    Metrics.reset()
    Metrics.set("total_events", 42.0)
    Metrics.set("last_event_time", 1700000000.0)
    val http = new MetricsHttp(0) // ephemeral port
    try {
      val resp = HttpClient.newHttpClient().send(
        HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${http.boundPort}/metrics")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200)
      assert(resp.headers().firstValue("Content-Type").get.contains("text/plain"))
      assert(resp.body().contains("graft_total_events 42.0"))
      assert(resp.body().contains("# TYPE graft_last_event_time gauge"))
    } finally http.close()
  }

  test("operational ESS signals are scrapeable: dropped frames and reconnects") {
    Metrics.reset()
    // real overflow, not a hand-set gauge: a capacity-1 buffer dropping
    // its oldest frame is exactly what feeds ess_dropped_frames
    val buf = new graft.sources.FrameBuffer
    buf.setCapacity(1)
    buf.push("a"); buf.push("b")
    assert(buf.droppedFrames == 1)
    // the reconnect counter the transport advances per heal attempt
    Metrics.add(graft.sources.FrameTransport.ReconnectsMetric, 2.0)
    val http = new MetricsHttp(0)
    try {
      val body = HttpClient.newHttpClient().send(
        HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${http.boundPort}/metrics")).GET().build(),
        HttpResponse.BodyHandlers.ofString()).body()
      assert(body.contains("graft_ess_dropped_frames 1.0"), body)
      assert(body.contains("graft_ess_reconnects 2.0"), body)
    } finally http.close()
  }

  test("outage STATE is scrapeable: in_outage rises through the kill window and clears on heal") {
    Metrics.reset()
    val server = new LoopbackWsServer
    val http = new MetricsHttp(0)
    def scrape(): String = HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${http.boundPort}/metrics")).GET().build(),
      HttpResponse.BodyHandlers.ofString()).body()
    def gauge(body: String, name: String): Option[Double] =
      ("(?m)^" + java.util.regex.Pattern.quote(name) + raw" (\S+)$$").r
        .findFirstMatchIn(body).map(_.group(1).toDouble)
    try {
      val conn = FrameTransport
        .webSocket(s"ws://127.0.0.1:${server.port}/", None,
          reconnectBaseMs = 50, reconnectMaxMs = 400)
        .connect(_ => ())
      try {
        assert(server.awaitConnected())
        eventually {
          assert(gauge(scrape(), "graft_ess_in_outage").contains(0.0))
        }
        // the kill window: an operator scraping /metrics must see the
        // outage STATE (down since T), not just a grown attempt counter
        server.dropConnection()
        eventually {
          val body = scrape()
          assert(gauge(body, "graft_ess_in_outage").contains(1.0), body)
          assert(gauge(body, "graft_ess_outage_since_epoch_ms").exists(_ > 0), body)
        }
        // self-heal closes the window: state returns to healthy
        assert(server.awaitConnected(20), "transport never reconnected")
        eventually {
          val body = scrape()
          assert(gauge(body, "graft_ess_in_outage").contains(0.0), body)
          assert(gauge(body, "graft_ess_outage_since_epoch_ms").contains(0.0), body)
        }
      } finally conn.close()
    } finally { http.close(); server.close() }
  }
}
