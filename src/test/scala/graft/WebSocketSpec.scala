package graft

import java.io.{BufferedInputStream, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.serve.{CoachingBroadcaster, CoachingWebSocketServer}

/** RFC 6455 transport parity for the push layer (reference
  * websocket_routes.py) — hand-rolled loopback client: handshake accept
  * key, text push, ping/pong, close echo, and the eviction pill closing
  * the socket. */
class WebSocketSpec extends AnyFunSuite with Matchers {

  private def handshake(port: Int,
      key: String = "dGhlIHNhbXBsZSBub25jZQ=="): (java.net.Socket, BufferedInputStream, OutputStream, String) = {
    val s = new java.net.Socket("127.0.0.1", port)
    s.setSoTimeout(20000)
    val out = s.getOutputStream
    out.write(("GET /ws HTTP/1.1\r\nHost: 127.0.0.1\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Key: $key\r\nSec-WebSocket-Version: 13\r\n\r\n")
      .getBytes(UTF_8))
    out.flush()
    val in = new BufferedInputStream(s.getInputStream)
    (s, in, out, readHead(in))
  }

  private def readHead(in: InputStream): String = {
    val buf = new java.io.ByteArrayOutputStream()
    var last4 = 0
    var b = in.read()
    while (b != -1) {
      buf.write(b)
      last4 = (last4 << 8) | b
      if (last4 == 0x0D0A0D0A) b = -1 else b = in.read()
    }
    new String(buf.toByteArray, UTF_8)
  }

  /** Client frame: MASKED per RFC 6455 §5.1. */
  private def sendFrame(out: OutputStream, opcode: Int,
                        payload: Array[Byte]): Unit = {
    out.write(0x80 | opcode)
    require(payload.length < 126, "test frames stay small")
    out.write(0x80 | payload.length)
    val mask = Array[Byte](0x11, 0x22, 0x33, 0x44)
    out.write(mask)
    out.write(payload.zipWithIndex.map { case (p, i) =>
      (p ^ mask(i % 4)).toByte })
    out.flush()
  }

  /** Server frame: unmasked; returns (opcode, payload) or None on EOF. */
  private def readFrame(in: InputStream): Option[(Int, Array[Byte])] = {
    val b0 = in.read()
    if (b0 == -1) return None
    val b1 = in.read()
    (b1 & 0x80) shouldBe 0 // servers never mask
    var len = b1 & 0x7F
    if (len == 126) len = (in.read() << 8) | in.read()
    else if (len == 127) {
      var l = 0L
      (0 until 8).foreach(_ => l = (l << 8) | (in.read() & 0xFF))
      len = l.toInt // test frames stay far below Int.MaxValue
    }
    val payload = new Array[Byte](len)
    var off = 0
    while (off < len) {
      val r = in.read(payload, off, len - off)
      if (r == -1) return None
      off += r
    }
    Some((b0 & 0x0F, payload))
  }

  test("handshake + push: RFC sample accept key, broadcast arrives as a text frame, ping→pong, close echo") {
    val b = new CoachingBroadcaster()
    val ws = new CoachingWebSocketServer(b)
    val port = ws.start()
    try {
      val (s, in, out, head) = handshake(port)
      try {
        head should startWith("HTTP/1.1 101")
        // the RFC 6455 §1.3 worked example — pins the SHA-1/base64 path
        head should include("Sec-WebSocket-Accept: s3pPLMBiTxaQ9kYGzzhZRbK+xOo=")
        val deadline = System.nanoTime() + 10e9.toLong
        while (b.clientCount == 0 && System.nanoTime() < deadline)
          Thread.sleep(5)
        b.clientCount shouldBe 1
        b.publish("""{"coaching_response":"Lead with value."}""")
        val (op, payload) = readFrame(in).get
        op shouldBe 0x1
        new String(payload, UTF_8) shouldBe """{"coaching_response":"Lead with value."}"""
        // ping → pong with the same payload
        sendFrame(out, 0x9, "hb-42".getBytes(UTF_8))
        val (op2, payload2) = readFrame(in).get
        op2 shouldBe 0xA
        new String(payload2, UTF_8) shouldBe "hb-42"
        // client close → server echoes close and unsubscribes
        sendFrame(out, 0x8, Array[Byte](0x03, (0xE8 & 0xFF).toByte))
        readFrame(in).map(_._1) shouldBe Some(0x8)
        while (b.clientCount > 0 && System.nanoTime() < deadline)
          Thread.sleep(5)
        b.clientCount shouldBe 0
      } finally s.close()
    } finally ws.stop()
  }

  test("a protocol-violating client gets CLOSE 1002, not an uncaught exception") {
    val b = new CoachingBroadcaster()
    val ws = new CoachingWebSocketServer(b)
    val port = ws.start()
    try {
      val (s, in, out, head) = handshake(port)
      try {
        head should startWith("HTTP/1.1 101")
        // UNMASKED client frame — RFC 6455 §5.1 violation
        out.write(Array[Byte]((0x81 & 0xFF).toByte, 0x02, 'h', 'i'))
        out.flush()
        val (op, payload) = readFrame(in).get
        op shouldBe 0x8
        ((payload(0) & 0xFF) << 8 | (payload(1) & 0xFF)) shouldBe 1002
      } finally s.close()
    } finally ws.stop()
  }

  test("a non-upgrade request gets 400, not a hung socket") {
    val ws = new CoachingWebSocketServer(new CoachingBroadcaster())
    val port = ws.start()
    try {
      val s = new java.net.Socket("127.0.0.1", port)
      s.setSoTimeout(10000)
      try {
        s.getOutputStream.write(
          "GET / HTTP/1.1\r\nHost: x\r\n\r\n".getBytes(UTF_8))
        s.getOutputStream.flush()
        readHead(new BufferedInputStream(s.getInputStream)) should
          startWith("HTTP/1.1 400")
      } finally s.close()
    } finally ws.stop()
  }

  test("an evicted slow client's socket CLOSES (1001) — not a silent zombie") {
    // capacity 1, evict after 2 full publishes — the SSE eviction
    // scenario, over the WebSocket transport
    val b = new CoachingBroadcaster(queueCapacity = 1,
      evictAfterFullPublishes = 2)
    val ws = new CoachingWebSocketServer(b)
    val port = ws.start()
    try {
      val (s, in, _, head) = handshake(port)
      try {
        head should startWith("HTTP/1.1 101")
        val deadline = System.nanoTime() + 20e9.toLong
        while (b.clientCount == 0 && System.nanoTime() < deadline)
          Thread.sleep(10)
        // flood with big frames the client is NOT reading: the TCP
        // buffer fills, the push loop blocks on write, the queue (cap
        // 1) fills, the full-streak trips → eviction + pill
        val big = "x" * (256 * 1024)
        while (b.clientCount > 0 && System.nanoTime() < deadline) {
          b.publish(big); Thread.sleep(1)
        }
        b.clientCount shouldBe 0 // evicted
        // drain: after the buffered text frames the client must see a
        // CLOSE frame (or EOF once the server tears down) — never an
        // open socket pinging forever
        var sawCloseOrEof = false
        while (!sawCloseOrEof && System.nanoTime() < deadline) {
          readFrame(in) match {
            case None => sawCloseOrEof = true
            case Some((0x8, payload)) =>
              // close code 1001 "going away"
              ((payload(0) & 0xFF) << 8 | (payload(1) & 0xFF)) shouldBe 1001
              sawCloseOrEof = true
            case Some(_) => () // buffered text frames
          }
        }
        sawCloseOrEof shouldBe true
      } finally s.close()
    } finally ws.stop()
  }

  test("a client that STOPS READING is torn down by the write deadline — no wedged writer thread") {
    // large queue so the broadcaster never evicts (no pill): the only
    // way this connection dies is the write-deadline reaper closing the
    // socket out from under the blocked frame write. Before the fix the
    // push loop wedged forever in the TCP write and clientCount stayed 1.
    val b = new CoachingBroadcaster()
    val ws = new CoachingWebSocketServer(b, writeTimeoutMs = 300L)
    val port = ws.start()
    try {
      val (s, in, _, head) = handshake(port)
      try {
        head should include("101 Switching Protocols")
        val deadline = System.nanoTime() + 20e9.toLong
        while (b.clientCount == 0 && System.nanoTime() < deadline)
          Thread.sleep(10)
        b.clientCount shouldBe 1
        // fill the client's TCP buffers with frames it never reads: the
        // push loop blocks mid-write with a registered deadline
        val big = "x" * (256 * 1024)
        (1 to 100).foreach(_ => b.publish(big))
        // the reaper must close the socket, unwinding the writer thread
        // through its normal teardown (unsubscribe → clientCount 0)
        while (b.clientCount > 0 && System.nanoTime() < deadline)
          Thread.sleep(20)
        b.clientCount shouldBe 0
        // and the client observes the dead socket: draining ends in a
        // CLOSE frame, EOF, or a reset — never an open push socket
        var dead = false
        while (!dead && System.nanoTime() < deadline) {
          try readFrame(in) match {
            case None => dead = true
            case Some((0x8, _)) => dead = true
            case Some(_) => () // buffered text frames
          } catch { case _: java.io.IOException => dead = true }
        }
        dead shouldBe true
      } finally s.close()
    } finally ws.stop()
  }
}
