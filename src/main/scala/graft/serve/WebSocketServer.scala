package graft.serve

import java.io.{BufferedInputStream, IOException, InputStream, OutputStream}
import java.net.{InetAddress, InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

/** WebSocket transport parity with the reference UI
  * (app/routes/websocket_routes.py:8-29 pushes each coaching response
  * over a WebSocket; app/utils/kafka_utils.py:425-446 broadcasts to the
  * client set): the same [[CoachingBroadcaster]] fan-out the SSE
  * transport serves, exposed as an RFC 6455 server endpoint so a UI
  * port needs no shim. Pure JDK — the built-in HTTP server cannot
  * hijack the raw socket an Upgrade needs, so this binds its own
  * `ServerSocket` (loopback by default, like [[CoachingServer]]).
  *
  * Scope is the reference's: server→client push of single-line JSON
  * text frames. The server honors the client side of the protocol it
  * must (masked client frames, CLOSE echo, PING→PONG) and sends
  * unmasked text/ping/close frames; fragmented client messages and
  * client text payloads are read and discarded — the reference's
  * socket is push-only too (websocket_routes.py keeps the connection
  * open without consuming application messages).
  *
  * Same fan-out semantics as SSE — per-client bounded queues, slow
  * clients lose their own events, the broadcaster's eviction pill
  * CLOSES the socket (code 1001 "going away") so the client observes
  * the disconnect and re-subscribes instead of pinging forever.
  *
  * A client that stops READING is the other stall mode: its TCP
  * buffers fill and the server's next frame write blocks forever —
  * the eviction pill is then queued but never polled, so without a
  * bound the connection wedges its writer thread, reader thread, and
  * socket until stop(). Blocking `Socket` writes have no native
  * deadline (SO_TIMEOUT covers reads only), so every frame write
  * registers a deadline and a reaper thread closes any socket whose
  * write is still in flight past `writeTimeoutMs` — the blocked write
  * throws, the connection unwinds through its normal teardown, and
  * the stalled client is torn down instead of leaking resources. */
final class CoachingWebSocketServer(broadcaster: CoachingBroadcaster,
                                    port: Int = 0,
                                    bindAddress: String = "127.0.0.1",
                                    writeTimeoutMs: Long = 10000L) {
  @volatile private var server: ServerSocket = _
  @volatile private var running = false
  private val clients =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Socket]()
  private var pool: java.util.concurrent.ExecutorService = _
  /** socket → nanoTime deadline of its in-flight frame write; absent =
    * no write in flight. The reaper scans this, never `clients`. */
  private val writeDeadlines =
    new java.util.concurrent.ConcurrentHashMap[Socket, java.lang.Long]()
  private var reaper: java.util.concurrent.ScheduledExecutorService = _

  /** Start on `port` (0 = ephemeral); returns the bound port. */
  def start(): Int = {
    server = new ServerSocket()
    server.bind(new InetSocketAddress(InetAddress.getByName(bindAddress),
      port))
    running = true
    pool = java.util.concurrent.Executors.newCachedThreadPool()
    reaper = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => { val t = new Thread(r, "ws-write-reaper")
        t.setDaemon(true); t })
    // closing the socket from here makes the wedged write throw and the
    // connection unwind — the only way to bound a blocking Socket write
    reaper.scheduleAtFixedRate(() => {
      val now = System.nanoTime()
      writeDeadlines.forEach { (s, dl) =>
        if (now - dl > 0) closeQuietly(s)
      }
    }, 50, 50, java.util.concurrent.TimeUnit.MILLISECONDS)
    pool.submit(new Runnable {
      override def run(): Unit = {
        while (running) {
          try {
            val s = server.accept()
            clients.add(s)
            pool.submit(new Runnable {
              override def run(): Unit =
                try handleConnection(s)
                catch { case _: IOException | _: InterruptedException => () }
                finally { clients.remove(s); closeQuietly(s) }
            })
            ()
          } catch {
            case _: IOException => () // accept raced stop(): loop exits
          }
        }
      }
    })
    server.getLocalPort
  }

  def stop(): Unit = {
    running = false
    if (reaper != null) reaper.shutdownNow()
    if (server != null) closeQuietly(server)
    clients.forEach(s => closeQuietly(s))
    clients.clear()
    if (pool != null) pool.shutdownNow()
  }

  private def closeQuietly(c: AutoCloseable): Unit =
    try c.close() catch { case _: Exception => () }

  // ---- handshake ----------------------------------------------------

  /** RFC 6455 §4.2.2 accept key: base64(SHA-1(key + fixed GUID)). */
  private[serve] def acceptKey(key: String): String = {
    val sha = java.security.MessageDigest.getInstance("SHA-1")
    java.util.Base64.getEncoder.encodeToString(sha.digest(
      (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes(UTF_8)))
  }

  private def handleConnection(s: Socket): Unit = {
    s.setTcpNoDelay(true)
    val in = new BufferedInputStream(s.getInputStream)
    val out = s.getOutputStream
    // read the HTTP request head (headers are ASCII; body-less GET)
    val head = readHead(in)
    val lines = head.split("\r\n").toSeq
    val headers = lines.drop(1).flatMap { l =>
      val i = l.indexOf(':')
      if (i < 0) None else Some(l.take(i).trim.toLowerCase -> l.drop(i + 1).trim)
    }.toMap
    val isUpgrade = lines.headOption.exists(_.startsWith("GET")) &&
      headers.get("upgrade").exists(_.equalsIgnoreCase("websocket")) &&
      headers.contains("sec-websocket-key")
    if (!isUpgrade) {
      out.write(("HTTP/1.1 400 Bad Request\r\nConnection: close\r\n" +
        "Content-Length: 0\r\n\r\n").getBytes(UTF_8))
      out.flush()
      return
    }
    out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Accept: ${acceptKey(headers("sec-websocket-key"))}" +
      "\r\n\r\n").getBytes(UTF_8))
    out.flush()

    val (id, q) = broadcaster.subscribe()
    @volatile var peerClosed = false
    // PER-CONNECTION write lock (push loop vs reader's pong/close-echo
    // race). Never the server instance: a stalled client's blocked TCP
    // write would then hold a server-wide monitor and freeze every
    // other client's pushes and keepalives — one slow client must only
    // ever block itself, bounded by the write deadline below.
    val wlock = new Object
    // every frame write runs under a registered deadline: a client that
    // stopped reading blocks the write in a full TCP buffer, and the
    // reaper then closes the socket so this write throws instead of
    // wedging the thread forever (class doc)
    def deadlineWrite(opcode: Int, payload: Array[Byte]): Unit =
      wlock.synchronized {
        writeDeadlines.put(s, System.nanoTime() + writeTimeoutMs * 1000000L)
        try writeFrame(out, opcode, payload)
        finally writeDeadlines.remove(s)
      }
    // reader thread: the push loop parks on the queue, so a dedicated
    // reader services the frames the CLIENT may send — CLOSE must be
    // echoed and the connection torn down, PING answered with PONG
    // (both required by RFC 6455); anything else is drained and
    // discarded (push-only surface, see class doc)
    val reader = new Thread(() => {
      try {
        var live = true
        while (live) {
          readFrame(in) match {
            case None => live = false // EOF
            case Some((0x8, payload)) => // CLOSE: echo, then tear down
              deadlineWrite(0x8, payload)
              live = false
            case Some((0x9, payload)) => // PING → PONG, same payload
              deadlineWrite(0xA, payload)
            case Some(_) => () // pong/text/binary/continuation: discard
          }
        }
      } catch {
        case _: IOException | _: InterruptedException => ()
        case scala.util.control.NonFatal(_) =>
          // protocol violation (unmasked frame, oversized length):
          // RFC 6455 close 1002, best-effort — never an uncaught-
          // exception stack trace per hostile client
          try deadlineWrite(0x8,
            Array[Byte](0x03, (0xEA & 0xFF).toByte) ++
              "protocol error".getBytes(UTF_8))
          catch { case _: Exception => () }
      }
      finally { peerClosed = true; closeQuietly(s) }
    })
    reader.setDaemon(true)
    reader.start()
    try {
      var idlePolls = 0
      var live = true
      while (live && !peerClosed) {
        val msg = q.poll(250, java.util.concurrent.TimeUnit.MILLISECONDS)
        if (msg.asInstanceOf[AnyRef] eq CoachingBroadcaster.PoisonPill) {
          // evicted: CLOSE 1001 (going away) so the client re-subscribes
          deadlineWrite(0x8,
            Array[Byte](0x03, (0xE9 & 0xFF).toByte) ++
              "going away".getBytes(UTF_8))
          live = false
        } else if (msg != null) {
          deadlineWrite(0x1, msg.getBytes(UTF_8))
          idlePolls = 0
        } else {
          idlePolls += 1
          if (idlePolls >= 60) { // protocol-level keepalive every ~15 s
            deadlineWrite(0x9, Array.emptyByteArray)
            idlePolls = 0
          }
        }
      }
    } finally {
      broadcaster.unsubscribe(id)
      reader.interrupt()
    }
  }

  private def readHead(in: InputStream): String = {
    val buf = new java.io.ByteArrayOutputStream()
    var last4 = 0
    var b = in.read()
    while (b != -1) {
      buf.write(b)
      last4 = ((last4 << 8) | b) & 0xFFFFFFFF
      if (last4 == 0x0D0A0D0A || buf.size() > 64 * 1024) b = -1
      else b = in.read()
    }
    new String(buf.toByteArray, UTF_8)
  }

  // ---- frames --------------------------------------------------------

  /** One server frame, unmasked (RFC 6455 §5.1: servers MUST NOT mask). */
  private def writeFrame(out: OutputStream, opcode: Int,
                         payload: Array[Byte]): Unit = {
    out.write(0x80 | opcode) // FIN set: no fragmentation server-side
    val n = payload.length
    if (n < 126) out.write(n)
    else if (n <= 0xFFFF) {
      out.write(126); out.write(n >>> 8); out.write(n & 0xFF)
    } else {
      out.write(127)
      var i = 7
      while (i >= 0) { out.write(((n.toLong >>> (8 * i)) & 0xFF).toInt); i -= 1 }
    }
    out.write(payload)
    out.flush()
  }

  /** One client frame → (opcode, unmasked payload); None on EOF.
    * Client frames MUST be masked (§5.1) — unmasked ones fail loudly. */
  private def readFrame(in: InputStream): Option[(Int, Array[Byte])] = {
    val b0 = in.read()
    if (b0 == -1) return None
    val b1 = in.read()
    if (b1 == -1) return None
    val opcode = b0 & 0x0F
    val masked = (b1 & 0x80) != 0
    var len: Long = b1 & 0x7F
    if (len == 126) len = (readByte(in) << 8) | readByte(in)
    else if (len == 127) {
      len = 0
      var i = 0
      while (i < 8) { len = (len << 8) | readByte(in); i += 1 }
    }
    require(masked, "websocket: client frames must be masked (RFC 6455)")
    require(len <= (1L << 20), s"websocket: client frame too large ($len)")
    val mask = Array.fill(4)(readByte(in).toByte)
    val payload = new Array[Byte](len.toInt)
    var off = 0
    while (off < payload.length) {
      val r = in.read(payload, off, payload.length - off)
      if (r == -1) return None
      off += r
    }
    var i = 0
    while (i < payload.length) {
      payload(i) = (payload(i) ^ mask(i % 4)).toByte
      i += 1
    }
    Some((opcode, payload))
  }

  private def readByte(in: InputStream): Int = {
    val b = in.read()
    if (b == -1) throw new IOException("websocket: unexpected EOF in frame")
    b & 0xFF
  }
}
