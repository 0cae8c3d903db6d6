package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.ServerSocket
import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger
import graft.streaming.AmqpWire

/** Minimal loopback AMQP 0-9-1 broker (test scope only): accepts
  * successive connections, drives the connection/channel handshake,
  * acknowledges publishes (publisher confirms), and records every
  * delivered message with its routing key and delivery mode. Exists to
  * drive [[graft.streaming.AmqpPublisher]] through a real socket — the
  * container has no RabbitMQ, so the spec brings its own broker, the
  * same trick [[LoopbackWsServer]] plays for the websocket transport.
  * `fixedPort` lets a kill/restart spec rebind the same port.
  *
  * `mixedAcks` reproduces RabbitMQ's out-of-order persistent-message
  * confirms: odd tags are held back, and each even tag is confirmed
  * with a SINGLE ack for the (higher) even tag followed by a `multiple`
  * ack covering the held-back odd one — the interleaving the publisher's
  * coverage tracking must survive.
  *
  * `rejectDeclares` answers Exchange.Declare with Channel.Close 406
  * PRECONDITION_FAILED — what a real broker does on a durability
  * mismatch with an existing exchange.
  */
final class LoopbackAmqpBroker(fixedPort: Int = 0,
    mixedAcks: Boolean = false, rejectDeclares: Boolean = false) {
  import AmqpWire._

  private val server = new ServerSocket()
  server.setReuseAddress(true)
  server.bind(new java.net.InetSocketAddress("127.0.0.1", fixedPort))
  val port: Int = server.getLocalPort

  /** (routingKey, body, deliveryMode) in arrival order. */
  val received = new LinkedBlockingQueue[(String, String, Int)]()

  /** (exchange, type, durable) declarations seen. */
  val declared = new LinkedBlockingQueue[(String, String, Boolean)]()

  /** The vhost each connection opened. */
  val vhosts = new LinkedBlockingQueue[String]()

  /** The PLAIN credentials each connection presented, as "user:pass". */
  val logins = new LinkedBlockingQueue[String]()

  /** TCP connections accepted — the pooling spec's churn measure. */
  val connections = new AtomicInteger()

  // live accepted sockets: close() must kill these too, or a "dead"
  // broker would keep serving its pooled long-lived connections
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[java.net.Socket]()

  private val thread = new Thread(() => {
    while (!server.isClosed) {
      try {
        val sock = server.accept()
        connections.incrementAndGet()
        live.add(sock)
        try serve(new DataInputStream(sock.getInputStream),
          new DataOutputStream(sock.getOutputStream))
        finally { live.remove(sock); sock.close() }
      } catch { case _: Throwable => () } // connection died: accept again
    }
  }, s"loopback-amqp-$port")
  thread.setDaemon(true)
  thread.start()

  private def serve(in: DataInputStream, out: DataOutputStream): Unit = {
    val header = new Array[Byte](8)
    in.readFully(header)
    require(java.util.Arrays.equals(header, ProtocolHeader),
      "client must lead with the AMQP 0-9-1 protocol header")
    writeFrame(out, FrameMethod, 0, method(10, 10)( // Connection.Start
      _.u8(0).u8(9).emptyTable()
        .longStr("PLAIN".getBytes).longStr("en_US".getBytes)))
    out.flush()
    // Start-Ok: client-properties table, mechanism, SASL response, locale
    locally {
      val (ftype, _, payload) = readFrame(in)
      require(ftype == FrameMethod, s"expected method frame, got $ftype")
      val (c, m, r) = readMethod(payload)
      require((c, m) == ((10, 11)), s"expected 10.11, got $c.$m")
      r.skipTable()
      require(r.shortStr() == "PLAIN", "PLAIN auth expected")
      val sasl = new String(r.longStr(),
        java.nio.charset.StandardCharsets.UTF_8)
      logins.put(sasl.split(Character.MIN_VALUE).filter(_.nonEmpty).mkString(":"))
    }
    writeFrame(out, FrameMethod, 0, method(10, 30)( // Tune
      _.u16(2047).u32(131072L).u16(0)))
    out.flush()
    expect(in, 10, 31) // Tune-Ok
    locally { // Connection.Open: record the vhost
      val (ftype, _, payload) = readFrame(in)
      require(ftype == FrameMethod, s"expected method frame, got $ftype")
      val (c, m, r) = readMethod(payload)
      require((c, m) == ((10, 40)), s"expected 10.40, got $c.$m")
      vhosts.put(r.shortStr())
    }
    writeFrame(out, FrameMethod, 0, method(10, 41)(_.shortStr("")))
    out.flush()

    var deliveryTag = 0L
    var heldBackTag = 0L // mixedAcks: the odd tag awaiting its multiple ack
    while (true) {
      val (ftype, channel, payload) = readFrame(in)
      if (ftype == FrameMethod) {
        val (classId, methodId, r) = readMethod(payload)
        (classId, methodId) match {
          case (20, 10) => // Channel.Open
            writeFrame(out, FrameMethod, channel,
              method(20, 11)(_.longStr(Array.empty)))
            out.flush()
          case (40, 10) => // Exchange.Declare
            r.u16()
            val name = r.shortStr()
            val kind = r.shortStr()
            val bits = r.u8()
            declared.put((name, kind, (bits & 0x02) != 0))
            if (rejectDeclares) {
              writeFrame(out, FrameMethod, channel, method(20, 40)(
                _.u16(406)
                  .shortStr(s"PRECONDITION_FAILED - durability mismatch on exchange '$name'")
                  .u16(40).u16(10)))
              out.flush()
              expect(in, 20, 41) // Channel.Close-Ok
              return
            }
            writeFrame(out, FrameMethod, channel, method(40, 11)(b => b))
            out.flush()
          case (85, 10) => // Confirm.Select
            writeFrame(out, FrameMethod, channel, method(85, 11)(b => b))
            out.flush()
          case (60, 40) => // Basic.Publish: header + body frames follow
            r.u16()
            r.shortStr() // exchange
            val routingKey = r.shortStr()
            val (htype, _, hpayload) = readFrame(in)
            require(htype == FrameHeader, s"expected content header, got $htype")
            val h = new Reader(hpayload)
            h.u16(); h.u16() // class, weight
            val bodySize = h.u64()
            val flags = h.u16()
            val deliveryMode = if ((flags & 0x1000) != 0) h.u8() else 0
            val body = new Array[Byte](bodySize.toInt)
            var off = 0
            while (off < bodySize) {
              val (btype, _, chunk) = readFrame(in)
              require(btype == FrameBody, s"expected body frame, got $btype")
              System.arraycopy(chunk, 0, body, off, chunk.length)
              off += chunk.length
            }
            received.put((routingKey,
              new String(body, java.nio.charset.StandardCharsets.UTF_8),
              deliveryMode))
            deliveryTag += 1
            if (!mixedAcks) {
              writeFrame(out, FrameMethod, channel, method(60, 80)(
                _.u64(deliveryTag).u8(0))) // Basic.Ack, single
              out.flush()
            } else if (deliveryTag % 2 == 1) {
              heldBackTag = deliveryTag // hold the odd tag back
            } else {
              // single ack for the HIGHER even tag first…
              writeFrame(out, FrameMethod, channel, method(60, 80)(
                _.u64(deliveryTag).u8(0)))
              // …then a multiple ack covering the held-back odd tag
              writeFrame(out, FrameMethod, channel, method(60, 80)(
                _.u64(heldBackTag).u8(1)))
              out.flush()
            }
          case (10, 50) => // Connection.Close
            writeFrame(out, FrameMethod, 0, method(10, 51)(b => b))
            out.flush()
            return
          case (c, m) => sys.error(s"loopback broker: unhandled method $c.$m")
        }
      } // heartbeats ignored
    }
  }

  private def expect(in: DataInputStream, classId: Int, methodId: Int): Unit = {
    val (ftype, _, payload) = readFrame(in)
    require(ftype == FrameMethod, s"expected method frame, got $ftype")
    val (c, m, _) = readMethod(payload)
    require((c, m) == ((classId, methodId)), s"expected $classId.$methodId, got $c.$m")
  }

  def awaitMessage(timeoutSec: Int = 10): (String, String, Int) =
    received.poll(timeoutSec, TimeUnit.SECONDS)

  def close(): Unit = {
    try server.close() catch { case _: Throwable => () }
    live.forEach(s => try s.close() catch { case _: Throwable => () })
    live.clear()
  }
}
