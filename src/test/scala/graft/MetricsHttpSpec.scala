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
}
