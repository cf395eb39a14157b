package graft.serve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** The serving PUSH layer — the reference app's broadcast half
  * (app/routes/websocket_routes.py:8-29: a client set fed by the
  * coaching-response consumer, app/utils/kafka_utils.py:425-446:
  * each response JSON broadcast to every connected client, broken
  * clients discarded), re-expressed as Server-Sent Events over the
  * JDK's built-in HTTP server — push-over-HTTP like the reference's
  * WebSocket, with zero dependencies and the same fan-out semantics.
  *
  * Split the same way the reference is:
  *  - [[CoachingBroadcaster]] = the client set + broadcast loop
  *    (kafka_utils' `clients_set` handling): per-client bounded queues,
  *    a slow or dead client loses ITS OWN events and is eventually
  *    discarded — one stuck consumer must never block the stream or
  *    the other clients (the reference drops broken clients the same
  *    way).
  *  - [[CoachingServer]] = the transport (websocket_routes): `GET
  *    /events` holds the connection open and relays the subscriber
  *    queue as `data:` frames; `/healthz` for liveness.
  *  - [[CoachingServer.pushSink]] = the consumer thread analog: a
  *    foreachBatch sink relaying each micro-batch's coaching rows into
  *    the broadcaster. The per-batch collect is the nature of a push
  *    layer — results must reach the serving process — and is bounded
  *    by the micro-batch's own size.
  */
final class CoachingBroadcaster(queueCapacity: Int = 1024) {
  import java.util.concurrent.LinkedBlockingQueue
  private val nextId = new java.util.concurrent.atomic.AtomicLong(0L)
  private val clients =
    new java.util.concurrent.ConcurrentHashMap[Long, LinkedBlockingQueue[String]]()
  @volatile private var droppedEvents = 0L

  def subscribe(): (Long, LinkedBlockingQueue[String]) = {
    val id = nextId.incrementAndGet()
    val q = new LinkedBlockingQueue[String](queueCapacity)
    clients.put(id, q)
    (id, q)
  }

  def unsubscribe(id: Long): Unit = clients.remove(id)

  def clientCount: Int = clients.size
  def dropped: Long = droppedEvents

  /** Broadcast one event to every subscriber. A full queue (slow
    * client) drops the event FOR THAT CLIENT only — counted, never
    * blocking the publisher (the reference's failed `client.send`
    * discard, without killing the subscription outright: SSE clients
    * reconnect). */
  def publish(json: String): Unit = {
    val it = clients.values().iterator()
    while (it.hasNext) {
      if (!it.next().offer(json)) droppedEvents += 1
    }
  }
}

final class CoachingServer(broadcaster: CoachingBroadcaster,
                           port: Int = 0) {
  import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

  private var server: HttpServer = _
  private var pool: java.util.concurrent.ExecutorService = _

  /** Start on `port` (0 = ephemeral); returns the bound port. */
  def start(): Int = {
    server = HttpServer.create(new java.net.InetSocketAddress(
      java.net.InetAddress.getLoopbackAddress, port), 0)
    // one thread per open SSE stream + request handling; kept so stop()
    // can interrupt handlers parked in queue polls
    pool = java.util.concurrent.Executors.newCachedThreadPool()
    server.setExecutor(pool)
    server.createContext("/healthz", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val body = s"""{"clients":${broadcaster.clientCount}}"""
          .getBytes("UTF-8")
        x.getResponseHeaders.set("Content-Type", "application/json")
        x.sendResponseHeaders(200, body.length)
        x.getResponseBody.write(body); x.close()
      }
    })
    server.createContext("/events", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val (id, q) = broadcaster.subscribe()
        try {
          x.getResponseHeaders.set("Content-Type", "text/event-stream")
          x.getResponseHeaders.set("Cache-Control", "no-cache")
          x.sendResponseHeaders(200, 0) // chunked: stream until close
          val out = x.getResponseBody
          var idlePolls = 0
          while (true) {
            val msg = q.poll(250, java.util.concurrent.TimeUnit.MILLISECONDS)
            if (msg != null) {
              // SSE frame; payloads are single-line JSON by contract
              out.write(s"data: $msg\n\n".getBytes("UTF-8"))
              out.flush()
              idlePolls = 0
            } else {
              // standard SSE keepalive comment every ~15 s of silence:
              // bounds how long a dead connection can hold its thread
              // (the write raises IOException once the client is gone)
              idlePolls += 1
              if (idlePolls >= 60) {
                out.write(": ping\n\n".getBytes("UTF-8"))
                out.flush()
                idlePolls = 0
              }
            }
          }
        } catch {
          case _: java.io.IOException => () // client went away: normal
        } finally {
          broadcaster.unsubscribe(id)
          x.close()
        }
      }
    })
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = {
    if (server != null) server.stop(0)
    // interrupt SSE handlers parked in their queue polls so the JVM
    // (and a test suite) never waits on the 15 s keepalive to notice
    if (pool != null) pool.shutdownNow()
  }
}

object CoachingServer {
  /** The consumer-thread analog: relay each micro-batch's coached rows
    * into the broadcaster as single-line JSON (message + the generated
    * coaching payload). Unserializable/NULL payloads are skipped, not
    * fatal — the reference's TypeError-continue policy. */
  def pushSink(coached: DataFrame, broadcaster: CoachingBroadcaster)
      : DataStreamWriter[org.apache.spark.sql.Row] = {
    coached.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, _: Long) =>
        batch.select(to_json(struct(
            col("message"), col("coaching_response"))).as("j"))
          .na.drop(Seq("j"))
          .collect()
          .foreach(r => broadcaster.publish(
            r.getString(0).replace("\n", " ").replace("\r", " ")))
        ()
    }
  }
}
