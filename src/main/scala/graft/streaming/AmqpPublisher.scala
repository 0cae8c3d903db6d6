package graft.streaming

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, IOException}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8

/** AMQP 0-9-1 wire encoding — the minimal faithful subset a durable
  * publisher needs: frames (method / content-header / body), short and
  * long strings, empty field tables, and the connection / channel /
  * exchange / confirm / basic method payloads. Shared by the publisher
  * and the test-scope loopback broker, exactly like the RFC 6455 codec
  * is shared with the loopback websocket server.
  *
  * Protocol constants follow the public AMQP 0-9-1 specification
  * (class.method ids, frame types, the 0xCE frame-end octet).
  */
object AmqpWire {
  val FrameMethod = 1
  val FrameHeader = 2
  val FrameBody = 3
  val FrameEnd = 0xCE

  val ProtocolHeader: Array[Byte] =
    "AMQP".getBytes(UTF_8) ++ Array[Byte](0, 0, 9, 1)

  // ---- writing -------------------------------------------------------

  final class Builder {
    private val buf = new ByteArrayOutputStream()
    private val out = new DataOutputStream(buf)
    def u8(v: Int): Builder = { out.writeByte(v); this }
    def u16(v: Int): Builder = { out.writeShort(v); this }
    def u32(v: Long): Builder = { out.writeInt(v.toInt); this }
    def u64(v: Long): Builder = { out.writeLong(v); this }
    def shortStr(s: String): Builder = {
      val b = s.getBytes(UTF_8)
      require(b.length < 256, "shortstr overflow")
      out.writeByte(b.length); out.write(b); this
    }
    def longStr(b: Array[Byte]): Builder = {
      out.writeInt(b.length); out.write(b); this
    }
    def emptyTable(): Builder = { out.writeInt(0); this }
    def bytes: Array[Byte] = { out.flush(); buf.toByteArray }
  }

  def method(classId: Int, methodId: Int)(args: Builder => Builder): Array[Byte] =
    args(new Builder().u16(classId).u16(methodId)).bytes

  def writeFrame(out: DataOutputStream, ftype: Int, channel: Int,
      payload: Array[Byte]): Unit = {
    out.writeByte(ftype)
    out.writeShort(channel)
    out.writeInt(payload.length)
    out.write(payload)
    out.writeByte(FrameEnd)
  }

  // ---- reading -------------------------------------------------------

  /** (frameType, channel, payload); throws on a damaged frame end. */
  def readFrame(in: DataInputStream): (Int, Int, Array[Byte]) = {
    val ftype = in.readUnsignedByte()
    val channel = in.readUnsignedShort()
    val size = in.readInt()
    val payload = new Array[Byte](size)
    in.readFully(payload)
    if (in.readUnsignedByte() != FrameEnd)
      throw new IOException("AMQP frame-end octet missing")
    (ftype, channel, payload)
  }

  final class Reader(payload: Array[Byte]) {
    private var pos = 0
    def u8(): Int = { val v = payload(pos) & 0xff; pos += 1; v }
    def u16(): Int = (u8() << 8) | u8()
    def u32(): Long = (u16().toLong << 16) | u16()
    def u64(): Long = (u32() << 32) | u32()
    def shortStr(): String = {
      val n = u8()
      val s = new String(payload, pos, n, UTF_8); pos += n; s
    }
    def longStr(): Array[Byte] = {
      val n = u32().toInt
      val b = java.util.Arrays.copyOfRange(payload, pos, pos + n); pos += n; b
    }
    def skipTable(): Unit = { val n = u32().toInt; pos += n }
    def remaining: Int = payload.length - pos
  }

  /** Split a method payload into (classId, methodId, argsReader). */
  def readMethod(payload: Array[Byte]): (Int, Int, Reader) = {
    val r = new Reader(payload)
    (r.u16(), r.u16(), r)
  }
}

/** Connection settings for [[AmqpPublisher]] — the full URL surface the
  * reference takes (`/root/reference/services/RabbitService.py`:
  * `rabbitmq_url`), as discrete fields: credentials, vhost, exchange
  * durability, and socket timeouts. Defaults mirror the reference stack
  * (guest/guest on "/", NON-durable `events` exchange — aio_pika's
  * default — so a redeclare against an exchange the reference already
  * declared can never PRECONDITION_FAILED).
  */
case class AmqpConfig(
    host: String,
    port: Int = 5672,
    user: String = "guest",
    pass: String = "guest",
    vhost: String = "/",
    exchange: String = Sinks.Exchange,
    durableExchange: Boolean = false,
    connectTimeoutMs: Int = 10000,
    readTimeoutMs: Int = 30000)

/** One live AMQP connection held by an executor and shared across
  * partition tasks and micro-batches (see [[AmqpConnections]]). Owns the
  * socket, the negotiated frame-max, channel 1 in confirm mode, and the
  * channel's monotonically increasing publish delivery-tag.
  *
  * Thread contract: callers serialize on the instance monitor for the
  * whole publish-and-confirm span — AMQP confirms are per-channel, so
  * interleaving two tasks' publishes on one channel would make their
  * ack windows ambiguous.
  */
private[streaming] final class AmqpConnection(cfg: AmqpConfig) {
  import AmqpWire._

  private val Channel = 1
  private val FrameMaxCap = 65536 // body chunk bound; renegotiated down if tuned

  private val sock = new Socket()
  sock.connect(new InetSocketAddress(cfg.host, cfg.port), cfg.connectTimeoutMs)
  sock.setTcpNoDelay(true)
  // a dead broker must THROW (SocketTimeoutException is an IOException),
  // never park a Spark task forever waiting on a read
  sock.setSoTimeout(cfg.readTimeoutMs)
  private[streaming] val in = new DataInputStream(sock.getInputStream)
  private[streaming] val out = new DataOutputStream(sock.getOutputStream)
  private[streaming] val frameMax: Int = handshake()

  /** Next publish's delivery tag: per-channel, 1-based after
    * Confirm.Select, monotonic for the connection's lifetime.
    */
  private[streaming] var nextTag: Long = 1L

  openChannelAndConfirms()

  /** Protocol header → Start/Start-Ok → Tune/Tune-Ok → Open/Open-Ok.
    * Returns the negotiated frame-max.
    */
  private def handshake(): Int = {
    out.write(ProtocolHeader)
    out.flush()
    val (c0, m0, _) = readMethodFrame()
    if ((c0, m0) != ((10, 10)))
      throw new IOException(s"expected Connection.Start, got $c0.$m0")
    writeFrame(out, FrameMethod, 0, method(10, 11)(
      _.emptyTable().shortStr("PLAIN")
        .longStr(s"\u0000${cfg.user}\u0000${cfg.pass}".getBytes(UTF_8))
        .shortStr("en_US")))
    out.flush()
    val (c1, m1, tune) = readMethodFrame()
    if ((c1, m1) != ((10, 30)))
      throw new IOException(s"expected Connection.Tune, got $c1.$m1")
    val channelMax = tune.u16()
    val brokerFrameMax = tune.u32()
    val fm =
      if (brokerFrameMax == 0) FrameMaxCap
      else math.min(brokerFrameMax, FrameMaxCap.toLong).toInt
    writeFrame(out, FrameMethod, 0, method(10, 31)(
      _.u16(channelMax).u32(fm.toLong).u16(0))) // heartbeat off
    writeFrame(out, FrameMethod, 0, method(10, 40)(
      _.shortStr(cfg.vhost).shortStr("").u8(0)))
    out.flush()
    val (c2, m2, _) = readMethodFrame()
    if ((c2, m2) != ((10, 41)))
      throw new IOException(s"expected Connection.Open-Ok, got $c2.$m2")
    fm
  }

  private def openChannelAndConfirms(): Unit = {
    expectMethod(20, 11) { // Channel.Open-Ok
      writeFrame(out, FrameMethod, Channel, method(20, 10)(_.shortStr("")))
      out.flush()
    }
    expectMethod(40, 11) { // Exchange.Declare-Ok
      writeFrame(out, FrameMethod, Channel, method(40, 10)(
        _.u16(0).shortStr(cfg.exchange).shortStr("direct")
          .u8(if (cfg.durableExchange) 0x02 else 0x00)
          .emptyTable()))
      out.flush()
    }
    expectMethod(85, 11) { // Confirm.Select-Ok: publisher confirms on
      writeFrame(out, FrameMethod, Channel, method(85, 10)(_.u8(0)))
      out.flush()
    }
  }

  /** Publish the batch and block until the broker confirms every message.
    * Must run inside `this.synchronized`.
    */
  private[streaming] def publishConfirmed(
      msgs: Seq[(String, String)]): Unit = {
    val first = nextTag
    val last = first + msgs.size - 1
    nextTag = last + 1
    msgs.foreach { case (k, p) => basicPublish(k, p) }
    out.flush()
    awaitAcks(first, last)
  }

  private def basicPublish(routingKey: String, payload: String): Unit = {
    writeFrame(out, FrameMethod, Channel, method(60, 40)(
      _.u16(0).shortStr(cfg.exchange).shortStr(routingKey).u8(0)))
    val body = payload.getBytes(UTF_8)
    // content header: class 60, weight 0, body size, delivery-mode=2
    // (PERSISTENT — the reference's DeliveryMode.PERSISTENT)
    writeFrame(out, FrameHeader, Channel, new Builder()
      .u16(60).u16(0).u64(body.length.toLong)
      .u16(0x1000) // property flags: delivery-mode present
      .u8(2).bytes)
    // body split at the negotiated frame size (frame-max bounds the
    // whole frame; keep a margin for the 8 octets of framing)
    val chunk = math.max(1, frameMax - 8)
    var off = 0
    while (off < body.length) {
      val n = math.min(chunk, body.length - off)
      writeFrame(out, FrameBody, Channel,
        java.util.Arrays.copyOfRange(body, off, off + n))
      off += n
    }
  }

  /** Block until the broker has confirmed every tag in [first, last].
    * RabbitMQ confirms persistent messages OUT OF ORDER and mixes single
    * and cumulative (`multiple`) acks — a single ack for a HIGH tag can
    * land before a multiple ack covering the low tags — so coverage is
    * tracked explicitly: a cumulative low-watermark advanced through a
    * set of out-of-band single tags, finishing exactly when the whole
    * range is covered. A Basic.Nack or connection close before full
    * confirmation throws — the caller (micro-batch) retries.
    */
  private def awaitAcks(first: Long, last: Long): Unit = {
    // everything below `first` was confirmed before this batch started
    var cumulative = first - 1
    val singles = scala.collection.mutable.SortedSet.empty[Long]
    while (cumulative < last) {
      val (classId, methodId, r) = readMethodFrame()
      (classId, methodId) match {
        case (60, 80) => // Basic.Ack: delivery-tag, multiple
          val tag = r.u64()
          val multiple = (r.u8() & 1) == 1
          if (multiple) cumulative = math.max(cumulative, tag)
          else if (tag > cumulative) singles += tag
          // fold contiguous single acks into the watermark
          while (singles.nonEmpty && singles.head <= cumulative + 1) {
            cumulative = math.max(cumulative, singles.head)
            singles -= singles.head
          }
        case (60, 120) =>
          throw new IOException("broker nacked a publish — retry partition")
        case (c, m) =>
          throw new IOException(s"unexpected method $c.$m awaiting confirms")
      }
    }
  }

  /** Read frames until a method frame arrives (heartbeats skipped).
    * Broker-initiated Channel.Close / Connection.Close are translated to
    * a readable error carrying the broker's reply-code and reply-text
    * (e.g. a PRECONDITION_FAILED exchange redeclare) instead of
    * surfacing as an opaque "unexpected method".
    */
  private def readMethodFrame(): (Int, Int, Reader) = {
    var res: (Int, Int, Reader) = null
    while (res == null) {
      val (ftype, _, payload) = readFrame(in)
      if (ftype == FrameMethod) {
        val (c, m, r) = readMethod(payload)
        if ((c, m) == ((20, 40)) || (c, m) == ((10, 50))) {
          val code = r.u16()
          val text = r.shortStr()
          val what = if (c == 20) "channel" else "connection"
          // best-effort Close-Ok so a well-behaved broker can finish
          try {
            writeFrame(out, FrameMethod, if (c == 20) Channel else 0,
              method(c, m + 1)(b => b))
            out.flush()
          } catch { case _: IOException => () }
          throw new IOException(s"broker closed $what: $code $text")
        }
        res = (c, m, r)
      } // heartbeat/other: skip
    }
    res
  }

  private def expectMethod(classId: Int, methodId: Int)(send: => Unit): Unit = {
    send
    val (c, m, _) = readMethodFrame()
    if ((c, m) != ((classId, methodId)))
      throw new IOException(s"expected $classId.$methodId, got $c.$m")
  }

  private[streaming] def close(): Unit = {
    try {
      expectMethod(10, 51) { // Connection.Close-Ok
        writeFrame(out, FrameMethod, 0, method(10, 50)(
          _.u16(200).shortStr("bye").u16(0).u16(0)))
        out.flush()
      }
    } catch { case _: IOException => () } // already dead: just drop it
    finally try sock.close() catch { case _: IOException => () }
  }

  private[streaming] def closeAbruptly(): Unit =
    try sock.close() catch { case _: IOException => () }
}

/** Executor-held AMQP connection pool: ONE long-lived connection per
  * broker identity per JVM, shared by every partition task and
  * micro-batch that publishes there — the reference holds one channel
  * for the process lifetime (`RabbitService.py:8-23`), and at scale
  * (many partitions × many batches) per-partition dialing is broker
  * connection churn. A connection that fails mid-publish is EVICTED and
  * closed so the retrying task dials fresh; nothing unconfirmed is ever
  * swallowed.
  */
object AmqpConnections {
  private case class Key(host: String, port: Int, user: String, vhost: String,
      exchange: String, durable: Boolean)
  private val pool =
    new java.util.concurrent.ConcurrentHashMap[Key, AmqpConnection]()

  /** Connections dialed since JVM start — observability for the churn
    * this pool exists to prevent (and the spec's assertion handle).
    */
  val DialsMetric = "amqp_connections_dialed"

  private def keyOf(cfg: AmqpConfig) = Key(cfg.host, cfg.port, cfg.user,
    cfg.vhost, cfg.exchange, cfg.durableExchange)

  /** Dial serialization per broker identity — dialing happens under
    * this lock, NOT inside `pool.computeIfAbsent`: a TCP connect can
    * block for `connectTimeoutMs`, and holding a ConcurrentHashMap bin
    * lock that long stalls unrelated keys hashing to the same bin.
    *
    * Lifetime: entries are NEVER removed — the map is bounded by the
    * number of distinct broker identities this JVM ever publishes to
    * (a handful), and a permanent lock object per identity is what
    * makes the dial serialization race-free. Do not "fix" this into an
    * eviction scheme: removing a lock while a dialer holds it would
    * let a second dialer for the same key proceed concurrently.
    */
  private val dialLocks =
    new java.util.concurrent.ConcurrentHashMap[Key, Object]()

  /** Waiter-side redial bound: a caller that keeps finding its fetched
    * connection evicted (sustained churn — every holder erroring while
    * waiters queue) gives up after this many redials and surfaces the
    * failure to the micro-batch retry backstop instead of spinning.
    */
  private val MaxEvictionRedials = 3

  /** Run `f` against the pooled connection, serialized on it (confirms
    * are per-channel). An IOException evicts the connection before
    * rethrowing — the next caller redials.
    *
    * A caller that was BLOCKED on the connection's monitor while the
    * holder hit an error must not publish into the evicted (closed)
    * socket — after acquiring the monitor it re-checks that the
    * connection is still the pool's current mapping and redials if not,
    * instead of burning a Spark task retry on a guaranteed IOException.
    * The redial loop is BOUNDED: under pathological churn it rethrows
    * rather than looping forever (the outer task retry is the backstop).
    */
  def withConnection[A](cfg: AmqpConfig)(f: AmqpConnection => A): A = {
    val key = keyOf(cfg)
    var evictions = 0
    while (true) {
      val conn = {
        val cur = pool.get(key)
        if (cur != null) cur
        else dialLocks.computeIfAbsent(key, _ => new Object).synchronized {
          val again = pool.get(key)
          if (again != null) again
          else {
            val fresh = new AmqpConnection(cfg) // outside the map bin lock
            Metrics.add(DialsMetric, 1.0)
            pool.put(key, fresh)
            fresh
          }
        }
      }
      val result: Option[A] = conn.synchronized {
        if (pool.get(key) ne conn) None // evicted while we waited: redial
        else {
          try Some(f(conn))
          catch {
            case e: IOException =>
              pool.remove(key, conn)
              conn.closeAbruptly()
              throw e
          }
        }
      }
      result match {
        case Some(a) => return a
        case None =>
          evictions += 1
          if (evictions > MaxEvictionRedials)
            throw new IOException(
              s"AMQP connection to ${cfg.host}:${cfg.port} evicted " +
                s"$evictions times before this caller could publish — " +
                "sustained connection churn; giving up to the task retry")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Politely close and drop every pooled connection (app shutdown). */
  def closeAll(): Unit = {
    drain()
    // a dialer that won its dial lock during the drain can pool a fresh
    // connection AFTER the sweep passed its key; acquiring each dial
    // lock waits that dialer out, and the re-drain closes what it
    // pooled. A dial that starts after closeAll returns is a new use of
    // the pool (re-opening it), not a leaked socket.
    dialLocks.forEach((_, lock) => lock.synchronized(drain()))
  }

  private def drain(): Unit = {
    val it = pool.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      it.remove()
      e.getValue.synchronized(e.getValue.close())
    }
  }
}

/** K1 over a REAL socket: an AMQP 0-9-1 publisher speaking the same wire
  * contract as the reference's RabbitMQ publish
  * (`/root/reference/services/RabbitService.py:24-35`): direct exchange,
  * routing-key publish, PERSISTENT delivery mode — plus publisher
  * confirms, so `publishPartition` returns only after the broker has
  * acknowledged every message in the partition.
  *
  * Delivery contract: at-least-once, the same as the reference and the
  * [[FilePublisher]]. A partition that fails mid-publish (socket drop,
  * read timeout, broker nack) THROWS — the micro-batch retries and may
  * re-publish the partition's prefix; consumers dedup. Nothing
  * acknowledged is ever lost; nothing lost is ever silent.
  *
  * Scale shape: the instance holds only config (it is serialized into
  * executor closures); the actual socket lives in [[AmqpConnections]] —
  * one long-lived connection per executor JVM, reused across partition
  * tasks and micro-batches, confirms still awaited per partition batch.
  */
class AmqpPublisher(cfg: AmqpConfig) extends Publisher {

  def this(host: String, port: Int) = this(AmqpConfig(host, port))
  def this(host: String, port: Int, exchange: String) =
    this(AmqpConfig(host, port, exchange = exchange))

  override def publish(routingKey: String, payload: String): Unit =
    publishPartition(Iterator.single((routingKey, payload)))

  override def publishPartition(messages: Iterator[(String, String)]): Unit = {
    val msgs = messages.toVector
    if (msgs.isEmpty) return
    AmqpConnections.withConnection(cfg)(_.publishConfirmed(msgs))
  }
}
