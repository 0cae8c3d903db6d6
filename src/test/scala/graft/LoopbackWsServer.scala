package graft

import java.io.{DataInputStream, OutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64
import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}

/** Minimal loopback RFC 6455 websocket server (test scope only): accepts
  * successive connections (one at a time), performs the SHA-1
  * `Sec-WebSocket-Accept` handshake, records every client text message
  * (unmasked per the RFC — clients MUST mask), and lets the test push
  * server→client text frames. Exists to drive
  * [[graft.sources.FrameTransport.webSocket]] through a real socket — the
  * container has no websocket broker, so the spec brings its own.
  * `fixedPort` lets a reconnect spec restart a killed server on the SAME
  * port; [[dropConnection]] simulates a network fault (abrupt TCP close,
  * no close frame).
  */
final class LoopbackWsServer(fixedPort: Int = 0) {
  private val server = new ServerSocket()
  server.setReuseAddress(true) // a restarted server rebinds the same port
  server.bind(new java.net.InetSocketAddress("127.0.0.1", fixedPort))
  val port: Int = server.getLocalPort

  /** Messages received FROM the client (e.g. the ESS subscribe JSON). */
  val received = new LinkedBlockingQueue[String]()
  // one permit per completed handshake: each awaitConnected() call waits
  // for the NEXT connection (first call = first connect, second call =
  // the reconnect, ...)
  private val connected = new java.util.concurrent.Semaphore(0)
  @volatile private var client: Socket = _
  @volatile private var out: OutputStream = _
  @volatile private var closedByClient = false

  private val thread = new Thread(() => {
    while (!server.isClosed) {
      try {
        val sock = server.accept()
        client = sock
        val in = new DataInputStream(sock.getInputStream)
        out = sock.getOutputStream
        handshake(in, out)
        connected.release()
        readLoop(in) // returns when this connection ends; accept the next
      } catch { case _: Throwable => () } // connection died: accept again
    }
  }, s"loopback-ws-$port")
  thread.setDaemon(true)
  thread.start()

  /** HTTP upgrade: echo the key back SHA-1'd with the RFC magic GUID. */
  private def handshake(in: DataInputStream, out: OutputStream): Unit = {
    val req = new StringBuilder
    while (!req.endsWith("\r\n\r\n")) req.append(in.readByte().toChar)
    val key = req.toString.linesIterator
      .find(_.toLowerCase.startsWith("sec-websocket-key:"))
      .map(_.split(":", 2)(1).trim)
      .getOrElse(sys.error("no Sec-WebSocket-Key header"))
    val accept = Base64.getEncoder.encodeToString(
      MessageDigest.getInstance("SHA-1")
        .digest((key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes(UTF_8)))
    out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Accept: $accept\r\n\r\n").getBytes(UTF_8))
    out.flush()
  }

  /** Parse client frames: unmask, reassemble text fragments, honor close. */
  private def readLoop(in: DataInputStream): Unit = {
    val message = new StringBuilder
    while (true) {
      val b0 = in.readUnsignedByte()
      val fin = (b0 & 0x80) != 0
      val opcode = b0 & 0x0f
      val b1 = in.readUnsignedByte()
      val masked = (b1 & 0x80) != 0
      val len: Long = (b1 & 0x7f) match {
        case 126 => in.readUnsignedShort().toLong
        case 127 => in.readLong()
        case n => n.toLong
      }
      val mask = if (masked) { val m = new Array[Byte](4); in.readFully(m); m }
        else Array[Byte](0, 0, 0, 0)
      val payload = new Array[Byte](len.toInt)
      in.readFully(payload)
      var i = 0
      while (i < payload.length) { payload(i) = (payload(i) ^ mask(i % 4)).toByte; i += 1 }
      opcode match {
        case 0x8 => // close: echo and stop
          closedByClient = true
          sendRaw(0x88, payload)
          client.close()
          return
        case 0x9 => sendRaw(0x8a, payload) // ping -> pong
        case 0x1 | 0x0 =>
          message.append(new String(payload, UTF_8))
          if (fin) { received.put(message.toString); message.clear() }
        case _ => () // binary/pong: ignored in this harness
      }
    }
  }

  private def sendRaw(b0: Int, payload: Array[Byte]): Unit = synchronized {
    out.write(b0)
    if (payload.length < 126) out.write(payload.length)
    else { out.write(126); out.write(payload.length >> 8); out.write(payload.length & 0xff) }
    out.write(payload)
    out.flush()
  }

  /** Push a server→client text frame (servers do not mask). */
  def send(text: String): Unit = sendRaw(0x81, text.getBytes(UTF_8))

  def awaitConnected(timeoutSec: Int = 10): Boolean =
    connected.tryAcquire(timeoutSec, TimeUnit.SECONDS)

  /** Abruptly sever the live connection (no close frame) while the
    * listener stays up — the shape of a network fault the transport must
    * reconnect through.
    */
  def dropConnection(): Unit =
    try Option(client).foreach(_.close()) catch { case _: Throwable => () }

  def awaitMessage(timeoutSec: Int = 10): String =
    received.poll(timeoutSec, TimeUnit.SECONDS)

  def wasClosedByClient: Boolean = closedByClient

  def close(): Unit = {
    try Option(client).foreach(_.close()) catch { case _: Throwable => () }
    try server.close() catch { case _: Throwable => () }
  }
}
