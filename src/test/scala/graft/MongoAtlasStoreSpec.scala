package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.store.{MongoAtlasConfig, MongoAtlasStore, SearchHit}

/** Offline tests for the Atlas remote store (S4/S5 remote half): request
  * builders against goldens, response parsers against canned payloads, and
  * the store driven end-to-end through a fake transport — the same
  * no-network treatment as HttpParseSpec gives the Azure providers. */
class MongoAtlasStoreSpec extends AnyFunSuite with Matchers {

  private val cfg = MongoAtlasConfig(
    baseUrl = "https://data.example.test/endpoint/data/v1",
    apiKey = "k", dataSource = "Cluster0", database = "meetingcoach",
    collection = "knowledge_embeddings", indexName = "vector_index",
    embeddingPath = "embedding", maxBatchSize = 2)

  test("searchBody is the reference $vectorSearch aggregation") {
    val body = MongoAtlasStore.searchBody(cfg, Array(1.0f, 2.5f), k = 3,
      numCandidates = 150)
    body should include(""""pipeline":[{"$vectorSearch":""")
    body should include(""""index":"vector_index"""")
    body should include(""""path":"embedding"""")
    body should include(""""queryVector":[1.0,2.5]""")
    body should include(""""numCandidates":150""")
    body should include(""""limit":3""")
    body should include(""""score":{"$meta":"vectorSearchScore"}""")
  }

  test("the full $vectorSearch request at the reference defaults is byte-pinned, and the index definition locks cosine/1536") {
    // the live Atlas path is environment-blocked, so the CONTRACT is
    // the regression surface: the aggregation exactly as the reference
    // app sends it (generate_personalized_commands.sh:304 — k=3 from
    // numCandidates=150) and the index shape it requires
    // (main.tf:658-669 — vector field, numDimensions=1536, cosine)
    MongoAtlasStore.searchBody(cfg, Array(0.25f, -1.0f), k = 3,
      numCandidates = 150) shouldBe
      """{"dataSource":"Cluster0","database":"meetingcoach","collection":"knowledge_embeddings","pipeline":[""" +
      """{"$vectorSearch":{"index":"vector_index","path":"embedding","queryVector":[0.25,-1.0],"numCandidates":150,"limit":3}},""" +
      """{"$project":{"_id":0,"document_id":1,"chunks":1,"score":{"$meta":"vectorSearchScore"}}}]}"""
    MongoAtlasStore.indexDefinitionBody(cfg) shouldBe
      """{"fields":[{"type":"vector","path":"embedding","numDimensions":1536,"similarity":"cosine"}]}"""
    // and a default search() through the store really sends 150
    var sent = ""
    val fake = (_: String, body: String, _: Map[String, String]) => {
      sent = body; """{"documents":[]}"""
    }
    new MongoAtlasStore(cfg, fake).search(Array(1f), k = 3)
    sent should include(""""numCandidates":150""")
    sent should include(""""limit":3""")
  }

  test("upsertOneBody keys on (document_id, chunk_hash) with upsert=true") {
    val body = MongoAtlasStore.upsertOneBody(cfg, "dir/doc.md", "some text",
      Array(0.5f))
    val hash = MongoAtlasStore.chunkHash("some text")
    body should include(s""""filter":{"document_id":"dir/doc.md","chunk_hash":"$hash"}""")
    body should include(""""upsert":true""")
    body should include(""""$set":{"document_id":"dir/doc.md"""")
    hash should fullyMatch regex "[0-9a-f]{32}"
  }

  test("insertManyBody escapes content and carries every document") {
    val body = MongoAtlasStore.insertManyBody(cfg, Seq(
      ("a.md", "line1\nline2 \"quoted\"", Array(1f, 2f)),
      ("b.md", "plain", Array(3f))))
    body should include("""line1\nline2 \"quoted\"""")
    body should include(""""document_id":"a.md"""")
    body should include(""""document_id":"b.md"""")
    body should include(""""embedding":[1.0,2.0]""")
  }

  test("parseSearchHits reads documents in server rank order") {
    val resp =
      """{"documents":[
        |{"document_id":"p/a.md","chunks":"alpha \"x\"","score":0.99},
        |{"document_id":"p/b.md","chunks":"beta\nline","score":0.5}]}""".stripMargin
    MongoAtlasStore.parseSearchHits(resp) shouldBe Seq(
      SearchHit("p/a.md", "alpha \"x\"", 0.99),
      SearchHit("p/b.md", "beta\nline", 0.5))
  }

  test("parseSearchHits skips malformed documents instead of failing the search") {
    // doc missing its chunks field is quarantined; the valid one survives
    val hits = MongoAtlasStore.parseSearchHits(
      """{"documents":[{"document_id":"a","score":1.0},
        |{"document_id":"b","chunks":"ok","score":0.5}]}""".stripMargin)
    hits shouldBe Seq(SearchHit("b", "ok", 0.5))
  }

  test("parseSearchHits survives braces and nested objects inside chunks text") {
    // raw '{'/'}' are legal inside JSON strings — code snippets and JSON
    // examples in a curated corpus. The old flat-object regex truncated
    // these spans and silently dropped the hit.
    val resp =
      """{"documents":[
        |{"document_id":"code.md","chunks":"fn f() { return {a: 1}; }","score":0.9},
        |{"document_id":"json.md","chunks":"example: {\"k\": {\"v\": 2}}","score":0.8},
        |{"document_id":"plain.md","chunks":"no braces","score":0.7}]}""".stripMargin
    val (hits, skipped) = MongoAtlasStore.parseSearchHitsCounting(resp)
    hits shouldBe Seq(
      SearchHit("code.md", "fn f() { return {a: 1}; }", 0.9),
      SearchHit("json.md", "example: {\"k\": {\"v\": 2}}", 0.8),
      SearchHit("plain.md", "no braces", 0.7))
    skipped shouldBe 0
  }

  test("parseSearchHits ignores sibling fields after the documents array") {
    // a trailing object-valued field must not be scanned as a phantom
    // document (it would log spurious skips, or worse, fake a hit)
    val (hits, skipped) = MongoAtlasStore.parseSearchHitsCounting(
      """{"documents":[{"document_id":"a","chunks":"c","score":1.0}],
        |"stats":{"n":3},"echo":{"document_id":"x","chunks":"y","score":9.0}}""".stripMargin)
    hits shouldBe Seq(SearchHit("a", "c", 1.0))
    skipped shouldBe 0
  }

  test("parseSearchHitsCounting reports dropped malformed documents") {
    val (hits, skipped) = MongoAtlasStore.parseSearchHitsCounting(
      """{"documents":[{"document_id":"a","score":1.0},
        |{"document_id":"b","chunks":"ok","score":0.5}]}""".stripMargin)
    hits shouldBe Seq(SearchHit("b", "ok", 0.5))
    skipped shouldBe 1
  }

  test("unescape degrades a malformed \\u escape instead of throwing") {
    // non-hex after \u: lenient pass-through (drop the backslash), like
    // every other unknown escape pair — one bad server byte must not
    // abort the whole parse.
    graft.io.JsonText.unescape("a\\" + "uZZZZb") shouldBe "auZZZZb"
    graft.io.JsonText.unescape("tail\\" + "u12") shouldBe "tailu12" // truncated
    graft.io.JsonText.unescape("ok\\" + "u0041!") shouldBe "okA!"
  }

  test("parseWriteAck covers updateOne and insertMany ack shapes") {
    MongoAtlasStore.parseWriteAck("""{"matchedCount":1,"modifiedCount":1}""") shouldBe 1
    // an upsert that INSERTS: matchedCount 0 but an upsertedId — counts as 1
    MongoAtlasStore.parseWriteAck("""{"matchedCount":0,"upsertedId":"x"}""") shouldBe 1
    MongoAtlasStore.parseWriteAck(
      """{"matchedCount":0,"modifiedCount":0,"upsertedId":null}""") shouldBe 0
    MongoAtlasStore.parseWriteAck("""{"insertedIds":["a","b","c"]}""") shouldBe 3
    MongoAtlasStore.parseWriteAck("""{"insertedIds":[]}""") shouldBe 0
  }

  test("parseSearchHits handles exponent-form scores exactly") {
    val hits = MongoAtlasStore.parseSearchHits(
      """{"documents":[{"document_id":"a","chunks":"c","score":2E-5},
        |{"document_id":"b","chunks":"d","score":1.5e2}]}""".stripMargin)
    hits.map(_.score) shouldBe Seq(2e-5, 150.0)
  }

  test("request bodies escape control characters and reject non-finite floats") {
    val body = MongoAtlasStore.upsertOneBody(cfg, "a.md", "page\fbreak\u0001x",
      Array(1f))
    body should include("page\\fbreak\\u0001x")
    an[IllegalArgumentException] should be thrownBy
      MongoAtlasStore.upsertOneBody(cfg, "a.md", "t", Array(Float.NaN))
  }

  test("JsonText round-trips the full escape set including \\b and \\f") {
    val nasty = "a\"b\\c\bd\fe\nf\rg\thi"
    graft.io.JsonText.unescape(graft.io.JsonText.escape(nasty)) shouldBe nasty
  }

  test("store end-to-end through a fake transport: urls, batching, order") {
    val calls = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val fake = (url: String, body: String, _: Map[String, String]) => {
      calls += ((url, body))
      if (url.endsWith("/aggregate"))
        """{"documents":[{"document_id":"d","chunks":"c","score":0.7}]}"""
      else if (url.endsWith("/insertMany")) """{"insertedIds":["1","2"]}"""
      else """{"matchedCount":1,"modifiedCount":1}"""
    }
    val store = new MongoAtlasStore(cfg, fake)

    store.search(Array(1f, 0f), k = 3) shouldBe
      Seq(SearchHit("d", "c", 0.7))
    calls.last._1 should endWith("/action/aggregate")

    // 5 rows at maxBatchSize=2 → 3 ordered insertMany calls
    val rows = (1 to 5).map(i => (s"doc$i", s"text$i", Array(i.toFloat)))
    store.insertAllOrdered(rows) shouldBe 6 // fake acks 2 per batch
    val inserts = calls.filter(_._1.endsWith("/action/insertMany")).map(_._2)
    inserts should have length 3
    inserts(0) should (include("doc1") and include("doc2"))
    inserts(1) should (include("doc3") and include("doc4"))
    inserts(2) should include("doc5")

    store.upsertAll(Seq(("u", "t", Array(1f))))
    calls.last._1 should endWith("/action/updateOne")
  }
}
