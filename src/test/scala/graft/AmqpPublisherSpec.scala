package graft

import java.io.IOException
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.model.MetagameEvent
import graft.streaming.{AmqpPublisher, Sinks}

/** K1 against a REAL broker socket: the AMQP adapter drives the full
  * 0-9-1 conversation (handshake → channel → durable exchange declare →
  * publisher confirms → persistent publish → close) against a loopback
  * broker — proving the reference's RabbitMQ publish contract
  * (`/root/reference/services/RabbitService.py:24-35`) on the wire, not
  * against an in-memory queue.
  */
class AmqpPublisherSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(id: String, ts: Double): MetagameEvent =
    MetagameEvent(id, 1, "started", 17, 1, 40, 30, 20, 25, ts)

  test("streaming publish over a real AMQP socket: durable exchange, persistent delivery") {
    val broker = new LoopbackAmqpBroker
    try {
      val mem = MemoryStream[MetagameEvent](spark)
      mem.addData(Seq(ev("17-1", 1000), ev("17-2", 2000), ev("19-3", 3000)))
      val q = Sinks.publishStream(mem.toDS(),
        new AmqpPublisher("127.0.0.1", broker.port)).start()
      try q.processAllAvailable() finally q.stop()

      val msgs = Iterator.continually(broker.awaitMessage())
        .takeWhile(_ != null).take(3).toVector
      assert(msgs.length == 3)
      // routing key parity with RabbitService.py:20-21
      assert(msgs.forall(_._1 == Sinks.RoutingKey))
      // DeliveryMode.PERSISTENT parity with RabbitService.py:30-35
      assert(msgs.forall(_._3 == 2), s"non-persistent delivery in $msgs")
      assert(msgs.exists(_._2.contains("\"id\":\"17-1\"")))
      assert(msgs.exists(_._2.contains("\"id\":\"19-3\"")))
      // the exchange was declared durable direct, as the reference does
      val decl = broker.declared.poll()
      assert(decl == (("events", "direct", true)), s"got $decl")
    } finally broker.close()
  }

  test("broker kill+restart: confirmed messages survive, down-window publishes throw") {
    val broker1 = new LoopbackAmqpBroker
    val port = broker1.port
    val pub = new AmqpPublisher("127.0.0.1", port)
    // batch 1 confirmed by broker 1
    pub.publishPartition(Iterator(("metagame", "m1"), ("metagame", "m2")))
    assert(broker1.received.size == 2)
    broker1.close() // broker dies
    // a publish with no broker up must THROW (micro-batch retries it) —
    // returning silently would let the checkpoint advance past unsent data
    intercept[IOException] {
      pub.publishPartition(Iterator(("metagame", "lost?")))
    }
    // broker restarts on the same port; the retried partition lands
    val broker2 = new LoopbackAmqpBroker(port)
    try {
      pub.publishPartition(Iterator(("metagame", "m3")))
      val got = broker2.awaitMessage()
      assert(got._2 == "m3" && got._3 == 2)
    } finally broker2.close()
  }

  test("large payloads are framed at the negotiated size and reassembled") {
    val broker = new LoopbackAmqpBroker
    try {
      val pub = new AmqpPublisher("127.0.0.1", broker.port)
      val big = "x" * 200000 // > frame-max: must split into body frames
      pub.publish("metagame", big)
      val got = broker.awaitMessage()
      assert(got._2 == big, "multi-frame body must reassemble exactly")
    } finally broker.close()
  }
}
