package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{Metrics, MetricsHttp}

/** GET /metrics serves the Prometheus text format from a live server. */
class MetricsHttpSpec extends AnyFunSuite {

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
}
