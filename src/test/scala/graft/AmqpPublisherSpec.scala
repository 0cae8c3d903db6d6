package graft

import java.io.IOException
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.model.MetagameEvent
import graft.streaming.{AmqpConfig, AmqpPublisher, Sinks}

/** K1 against a REAL broker socket: the AMQP adapter drives the full
  * 0-9-1 conversation (handshake → channel → exchange declare →
  * publisher confirms → persistent publish) against a loopback broker —
  * proving the reference's RabbitMQ publish contract
  * (`/root/reference/services/RabbitService.py:24-35`) on the wire, not
  * against an in-memory queue. Connections are POOLED per executor JVM
  * ([[graft.streaming.AmqpConnections]]) and reused across partition
  * tasks and micro-batches — the churn assertions here are the scale
  * contract.
  */
class AmqpPublisherSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(id: String, ts: Double): MetagameEvent =
    MetagameEvent(id, 1, "started", 17, 1, 40, 30, 20, 25, ts)

  test("streaming publish over a real AMQP socket: persistent delivery, reference exchange parity") {
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
      // the exchange was declared direct and NON-durable — aio_pika's
      // default, which is what the reference actually declares; a
      // durability mismatch against the reference's existing exchange
      // would PRECONDITION_FAILED
      val decl = broker.declared.poll()
      assert(decl == (("events", "direct", false)), s"got $decl")
    } finally broker.close()
  }

  test("connections are pooled: many batches, one TCP connection") {
    val broker = new LoopbackAmqpBroker
    try {
      val pub = new AmqpPublisher("127.0.0.1", broker.port)
      // three partition-batch publishes — the per-partition dialing this
      // pool replaces would open three connections here
      pub.publishPartition(Iterator(("metagame", "b1-1"), ("metagame", "b1-2")))
      pub.publishPartition(Iterator(("metagame", "b2-1")))
      pub.publishPartition(Iterator(("metagame", "b3-1")))
      assert(broker.received.size == 4)
      assert(broker.connections.get == 1,
        s"expected one pooled connection, broker saw ${broker.connections.get}")
      // a second publisher INSTANCE with the same broker identity shares
      // the pooled connection too (the pool is keyed by broker, not
      // by publisher object)
      new AmqpPublisher("127.0.0.1", broker.port)
        .publishPartition(Iterator(("metagame", "b4-1")))
      assert(broker.connections.get == 1)
    } finally broker.close()
  }

  test("broker kill+restart: confirmed messages survive, down-window publishes throw") {
    val broker1 = new LoopbackAmqpBroker
    val port = broker1.port
    val pub = new AmqpPublisher(AmqpConfig("127.0.0.1", port,
      readTimeoutMs = 2000))
    // batch 1 confirmed by broker 1
    pub.publishPartition(Iterator(("metagame", "m1"), ("metagame", "m2")))
    assert(broker1.received.size == 2)
    broker1.close() // broker dies
    // a publish with no broker up must THROW (micro-batch retries it) —
    // returning silently would let the checkpoint advance past unsent
    // data. The pooled connection is evicted by the failure.
    intercept[IOException] {
      pub.publishPartition(Iterator(("metagame", "lost?")))
    }
    // broker restarts on the same port; the retried partition redials
    val broker2 = new LoopbackAmqpBroker(port)
    try {
      pub.publishPartition(Iterator(("metagame", "m3")))
      val got = broker2.awaitMessage()
      assert(got._2 == "m3" && got._3 == 2)
      assert(broker2.connections.get == 1)
    } finally broker2.close()
  }

  test("a waiter blocked during the holder's failure redials instead of publishing into the evicted socket") {
    // the round-6 eviction-race fix, pinned: thread A holds the pooled
    // connection and dies mid-publish; thread B was already blocked on
    // the connection's monitor. B must observe the eviction after
    // acquiring the monitor, redial, and publish successfully — NOT
    // write into the closed socket and burn a Spark task retry
    val broker = new LoopbackAmqpBroker
    try {
      val cfg = AmqpConfig("127.0.0.1", broker.port, readTimeoutMs = 2000)
      val pub = new AmqpPublisher(cfg)
      pub.publish("metagame", "prime") // dial #1 pools the connection
      assert(broker.awaitMessage()._2 == "prime")
      assert(broker.connections.get == 1)
      @volatile var bErr: Throwable = null
      val b = new Thread(() => {
        try pub.publishPartition(Iterator(("metagame", "from-b")))
        catch { case t: Throwable => bErr = t }
      }, "amqp-waiter-b")
      @volatile var sawBBlocked = false
      @volatile var aSawInjected = false
      val a = new Thread(() => {
        try graft.streaming.AmqpConnections.withConnection(cfg) { _ =>
          // B fetches the same pooled connection, then parks on its
          // monitor (held here); wait until it is genuinely BLOCKED so
          // the interleaving is deterministic, not a sleep-race
          b.start()
          val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
          while (b.getState != Thread.State.BLOCKED &&
              System.nanoTime() < deadline) Thread.sleep(5)
          sawBBlocked = b.getState == Thread.State.BLOCKED
          throw new IOException("injected mid-publish failure")
        } catch {
          case e: IOException
              if e.getMessage == "injected mid-publish failure" =>
            aSawInjected = true
        }
      }, "amqp-holder-a")
      a.start()
      a.join(15000)
      b.join(15000)
      assert(sawBBlocked, "test harness: B never reached the monitor")
      assert(aSawInjected, "holder must still see its own failure")
      assert(bErr == null,
        s"waiter must redial and succeed, not fail a task: $bErr")
      assert(broker.awaitMessage()._2 == "from-b")
      // prime dial + B's redial — the eviction itself dials nothing
      assert(broker.connections.get == 2,
        s"expected exactly one redial, broker saw ${broker.connections.get}")
    } finally broker.close()
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

  test("out-of-order mixed confirms: single ack for a high tag before a multiple ack covering lower tags") {
    // RabbitMQ confirms persistent messages out of order; a publisher
    // that assumes in-order acks would block forever here (caught by the
    // 2 s read timeout, not a hung build)
    val broker = new LoopbackAmqpBroker(mixedAcks = true)
    try {
      val pub = new AmqpPublisher(AmqpConfig("127.0.0.1", broker.port,
        readTimeoutMs = 2000))
      pub.publishPartition(Iterator(
        ("metagame", "m1"), ("metagame", "m2"),
        ("metagame", "m3"), ("metagame", "m4")))
      assert(broker.received.size == 4)
      // a second batch on the SAME pooled connection: tag accounting must
      // carry across batches (tags are per-channel, not per-batch)
      pub.publishPartition(Iterator(("metagame", "m5"), ("metagame", "m6")))
      assert(broker.received.size == 6)
    } finally broker.close()
  }

  test("credentials, vhost and exchange durability are configurable (reference rabbitmq_url surface)") {
    val broker = new LoopbackAmqpBroker
    try {
      val pub = new AmqpPublisher(AmqpConfig("127.0.0.1", broker.port,
        user = "alice", pass = "s3cret", vhost = "/prod",
        durableExchange = true))
      pub.publish("metagame", "hello")
      assert(broker.awaitMessage()._2 == "hello")
      assert(broker.logins.poll() == "alice:s3cret")
      assert(broker.vhosts.poll() == "/prod")
      val decl = broker.declared.poll()
      assert(decl == (("events", "direct", true)), s"got $decl")
    } finally broker.close()
  }

  test("broker-initiated Channel.Close surfaces as a readable error, not an opaque method id") {
    val broker = new LoopbackAmqpBroker(rejectDeclares = true)
    try {
      val pub = new AmqpPublisher(AmqpConfig("127.0.0.1", broker.port,
        readTimeoutMs = 2000))
      val e = intercept[IOException] {
        pub.publish("metagame", "never-lands")
      }
      assert(e.getMessage.contains("PRECONDITION_FAILED"),
        s"error must carry the broker's reply-text, got: ${e.getMessage}")
      assert(e.getMessage.contains("406"))
    } finally broker.close()
  }
}
