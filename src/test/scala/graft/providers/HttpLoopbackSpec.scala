package graft.providers

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.store.{MongoAtlasConfig, MongoAtlasStore}

/** The REAL transport, driven offline: a loopback com.sun.net.httpserver
  * stands in for Azure OpenAI and the Atlas Data API, so Http.post and
  * both remote client stacks (providers + MongoAtlasStore) are exercised
  * through an actual socket — URL construction, auth headers, request
  * bodies, response parsing, and the two negative paths (retry-then-
  * succeed on 5xx, fail-fast on 4xx). Closes the "parsers tested,
  * transport never run" gap: only real credentials/egress stay
  * environment-bound. */
class HttpLoopbackSpec extends AnyFunSuite with Matchers {

  /** One recorded request: (path+query, api-key header, body). */
  private final case class Captured(uri: String, apiKey: String, body: String)

  /** Start a loopback server whose handler decides (status, response) per
    * request; every request is captured. Runs `f(baseUrl, captured)`. */
  private def withServer(handler: (String, Int) => (Int, String))
                        (f: (String, collection.Seq[Captured]) => Unit): Unit = {
    val captured = collection.mutable.ArrayBuffer.empty[Captured]
    val counter = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val uri = ex.getRequestURI.toString
      captured.synchronized {
        captured += Captured(uri, Option(ex.getRequestHeaders.getFirst("api-key")).getOrElse(""), body)
      }
      val (status, resp) = handler(uri, counter.incrementAndGet())
      val bytes = resp.getBytes("UTF-8")
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.setExecutor(null)
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", captured)
    finally server.stop(0)
  }

  test("Http.post retries 5xx with backoff and returns the eventual 2xx body") {
    withServer((_, n) => if (n < 3) (503, """{"error":"overloaded"}""")
                         else (200, """{"ok":true}""")) { (base, captured) =>
      val got = Http.post(s"$base/flaky", """{"x":1}""", Map("api-key" -> "k"),
        maxAttempts = 3, backoffMs = 1)
      got shouldBe """{"ok":true}"""
      captured should have size 3 // two 503s consumed by retry, then the 200
      captured.map(_.body).distinct shouldBe Seq("""{"x":1}""")
    }
  }

  test("Http.post surfaces persistent 5xx after maxAttempts, with status in the error") {
    withServer((_, _) => (503, """{"error":"still down"}""")) { (base, captured) =>
      val e = the[java.io.IOException] thrownBy
        Http.post(s"$base/down", "{}", Map.empty, maxAttempts = 3, backoffMs = 1)
      e.getMessage should include("HTTP 503")
      e.getMessage should include("3 attempt(s)")
      captured should have size 3
    }
  }

  test("Http.post honors a numeric Retry-After and falls back on junk values") {
    // variant server that can set response headers on the 429
    def withRetryAfterServer[A](retryAfter: String)(f: String => A): A = {
      val counter = new AtomicInteger(0)
      val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/", (ex: HttpExchange) => {
        ex.getRequestBody.readAllBytes()
        val first = counter.incrementAndGet() == 1
        if (first) ex.getResponseHeaders.set("Retry-After", retryAfter)
        val bytes = (if (first) """{"error":"rate"}""" else """{"ok":true}""")
          .getBytes("UTF-8")
        ex.sendResponseHeaders(if (first) 429 else 200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      })
      server.setExecutor(null)
      server.start()
      try f(s"http://127.0.0.1:${server.getAddress.getPort}")
      finally server.stop(0)
    }
    // numeric Retry-After: 1 → ~1 s wait even though backoffMs=1
    val honoredSecs = withRetryAfterServer("1") { base =>
      val t0 = System.nanoTime()
      Http.post(s"$base/rated", "{}", Map.empty,
        maxAttempts = 2, backoffMs = 1) shouldBe """{"ok":true}"""
      (System.nanoTime() - t0) / 1e9
    }
    honoredSecs should be >= 0.9
    // unparseable value → computed backoff (1 ms), not a stall or crash.
    // Relative bound (vs the honored path's wall clock), not an absolute
    // one — an absolute upper bound flakes under machine load
    val fallbackSecs = withRetryAfterServer("soon") { base =>
      val t0 = System.nanoTime()
      Http.post(s"$base/rated", "{}", Map.empty,
        maxAttempts = 2, backoffMs = 1) shouldBe """{"ok":true}"""
      (System.nanoTime() - t0) / 1e9
    }
    fallbackSecs should be < honoredSecs
  }

  test("Http.post fails FAST on 4xx — auth errors never retry") {
    withServer((_, _) => (401, """{"error":"bad key"}""")) { (base, captured) =>
      val e = the[java.io.IOException] thrownBy
        Http.post(s"$base/auth", "{}", Map("api-key" -> "wrong"),
          maxAttempts = 3, backoffMs = 1)
      e.getMessage should include("HTTP 401")
      captured should have size 1
    }
  }

  test("AzureOpenAIEmbedder drives the real stack: URL, api-key, body, parse") {
    val canned =
      """{"object":"list","data":[
        |{"object":"embedding","index":0,"embedding":[0.5,-0.25,1.0]},
        |{"object":"embedding","index":1,"embedding":[0.0,2.0,-1.5]}],
        |"model":"text-embedding-ada-002"}""".stripMargin
    withServer((_, _) => (200, canned)) { (base, captured) =>
      ConnectionRegistry.register(ConnectionSpec(
        "loopback-embed", "azureopenai",
        endpoint = s"$base/openai/deployments/emb/embeddings", apiKey = "sk-test"))
      val got = new AzureOpenAIEmbedder("loopback-embed", dim = 3)
        .embedBatch(Seq("alpha", "beta \"quoted\""))
      got.map(_.toSeq) shouldBe Seq(Seq(0.5f, -0.25f, 1.0f), Seq(0.0f, 2.0f, -1.5f))
      val req = captured.head
      req.uri should startWith("/openai/deployments/emb/embeddings")
      req.uri should include("api-version=")
      req.apiKey shouldBe "sk-test"
      req.body should include(""""alpha"""")
      req.body should include("""beta \"quoted\"""") // JSON-escaped input
    }
  }

  test("AzureOpenAIChat round-trips the system prompt and parses content") {
    val canned =
      """{"choices":[{"index":0,"message":{"role":"assistant",
        |"content":"use the \"band\" framing\nthen close"}}]}""".stripMargin
    withServer((_, _) => (200, canned)) { (base, captured) =>
      ConnectionRegistry.register(ConnectionSpec(
        "loopback-chat", "azureopenai",
        endpoint = s"$base/openai/deployments/gpt/chat/completions", apiKey = "sk-chat"))
      val got = new AzureOpenAIChat("loopback-chat")
        .completeBatch(Seq("prospect asked about pricing"), "You are a coach.")
      got shouldBe Seq("use the \"band\" framing\nthen close")
      val req = captured.head
      req.apiKey shouldBe "sk-chat"
      req.body should include("You are a coach.")
      req.body should include("prospect asked about pricing")
    }
  }

  test("MongoAtlasStore searches and upserts through a real socket") {
    val aggResp =
      """{"documents":[
        |{"document_id":"kb/pricing.md","chunks":"objection { handling }","score":0.97},
        |{"document_id":"kb/security.md","chunks":"soc2 notes","score":0.91}]}""".stripMargin
    val handler: (String, Int) => (Int, String) = {
      case (uri, _) if uri.endsWith("/action/aggregate") => (200, aggResp)
      case (uri, _) if uri.endsWith("/action/updateOne") =>
        (200, """{"matchedCount":0,"modifiedCount":0,"upsertedId":"64f"}""")
      case _ => (404, """{"error":"no such action"}""")
    }
    withServer(handler) { (base, captured) =>
      val cfg = MongoAtlasConfig(s"$base/app/data-x/endpoint/data/v1", "atlas-key",
        "Cluster0", "ragdb", "chunks", "vector_index")
      val store = new MongoAtlasStore(cfg,
        (url, body, headers) => Http.post(url, body, headers, maxAttempts = 3, backoffMs = 1))
      val hits = store.search(Array(0.1f, 0.2f), k = 2, numCandidates = 10)
      hits.map(h => (h.document_id, h.score)) shouldBe
        Seq(("kb/pricing.md", 0.97), ("kb/security.md", 0.91))
      hits.head.chunks shouldBe "objection { handling }" // brace-safe split
      store.upsert("kb/pricing.md", "objection { handling }",
        Array(0.1f, 0.2f)) shouldBe 1 // upsert-insert ack counts
      val (agg, up) = (captured.head, captured(1))
      agg.uri shouldBe "/app/data-x/endpoint/data/v1/action/aggregate"
      agg.apiKey shouldBe "atlas-key"
      agg.body should include(""""index":"vector_index"""")
      agg.body should include(""""queryVector":[0.1,0.2]""")
      up.uri shouldBe "/app/data-x/endpoint/data/v1/action/updateOne"
      up.body should include(""""upsert":true""")
    }
  }
}
