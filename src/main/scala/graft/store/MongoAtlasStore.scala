package graft.store

/** MongoDB Atlas remote half of the store seam (S4 sink / S5 search) —
  * code-complete against Atlas's public REST surface (the Data API), the
  * same treatment as the Azure OpenAI providers: request builders and
  * response parsers are pure and offline-tested; only the transport
  * function touches the network, and tests inject a fake.
  *
  * Reference mapping:
  *  - sink: the MongoDbAtlasSink connector config (main.tf:594-635) —
  *    ordered bulk writes (`use.ordered.bulk.writes=true`), batched
  *    (`max.batch.size`), into `database`/`collection`. Here:
  *    [[MongoAtlasStore.upsertAll]] issues ordered batches; each document
  *    is keyed by (document_id, md5(chunks)) so at-least-once topic
  *    replays overwrite instead of duplicating (the same idempotency rule
  *    as [[InMemoryVectorStore]]; the connector's BsonOidStrategy gets
  *    this from Kafka coordinates, which a REST writer does not have).
  *  - search: the `$vectorSearch` aggregation against the vector index
  *    (main.tf:649-669: path = embedding field, cosine, 1536 dims;
  *    generate_personalized_commands.sh:293-306: k=3, numCandidates=150).
  */
final case class MongoAtlasConfig(
    baseUrl: String,      // https://data.mongodb-api.com/app/<app>/endpoint/data/v1
    apiKey: String,
    dataSource: String,   // Atlas cluster name
    database: String,     // var.mongodb_database_name
    collection: String,   // var.mongodb_collection_name
    indexName: String,    // var.mongodb_index_name
    embeddingPath: String = "embedding",
    maxBatchSize: Int = 100)

object MongoAtlasStore {

  private def esc(s: String): String = graft.io.JsonText.escape(s)

  private def floats(v: Array[Float]): String = {
    require(v.forall(f => !f.isNaN && !f.isInfinite),
      "NaN/Infinity cannot be encoded as JSON vector elements")
    v.mkString("[", ",", "]")
  }

  def chunkHash(chunks: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(Option(chunks).getOrElse("").getBytes("UTF-8"))
    md.map("%02x".format(_)).mkString
  }

  // --- request builders (pure, goldens in MongoAtlasStoreSpec) ---

  /** `$vectorSearch` aggregation body for POST {baseUrl}/action/aggregate:
    * ANN over the configured index, k results from numCandidates
    * re-ranked, score surfaced via $meta. */
  def searchBody(cfg: MongoAtlasConfig, query: Array[Float], k: Int,
                 numCandidates: Int): String =
    s"""{"dataSource":"${esc(cfg.dataSource)}","database":"${esc(cfg.database)}","collection":"${esc(cfg.collection)}","pipeline":[""" +
      s"""{"$$vectorSearch":{"index":"${esc(cfg.indexName)}","path":"${esc(cfg.embeddingPath)}","queryVector":${floats(query)},"numCandidates":$numCandidates,"limit":$k}},""" +
      s"""{"$$project":{"_id":0,"document_id":1,"chunks":1,"score":{"$$meta":"vectorSearchScore"}}}]}"""

  /** The vector-search INDEX definition the `$vectorSearch` pipeline
    * requires — the Atlas Search JSON-editor shape the reference emits
    * for manual creation (main.tf:658-669: one vector field over the
    * embedding path, numDimensions=1536, similarity=cosine). Rendered
    * here so the full search contract — index AND query — is
    * regression-locked offline even though a live cluster (where this
    * body is POSTed/pasted) is environment-blocked. */
  def indexDefinitionBody(cfg: MongoAtlasConfig,
                          numDimensions: Int = 1536,
                          similarity: String = "cosine"): String =
    s"""{"fields":[{"type":"vector","path":"${esc(cfg.embeddingPath)}","numDimensions":$numDimensions,"similarity":"${esc(similarity)}"}]}"""

  /** One idempotent upsert for POST {baseUrl}/action/updateOne: filter on
    * the content key, $set the full document, upsert=true — replays of the
    * same (id, chunks) overwrite in place. */
  def upsertOneBody(cfg: MongoAtlasConfig, id: String, chunks: String,
                    embedding: Array[Float]): String = {
    val hash = chunkHash(chunks)
    s"""{"dataSource":"${esc(cfg.dataSource)}","database":"${esc(cfg.database)}","collection":"${esc(cfg.collection)}",""" +
      s""""filter":{"document_id":"${esc(id)}","chunk_hash":"$hash"},""" +
      s""""update":{"$$set":{"document_id":"${esc(id)}","chunk_hash":"$hash","chunks":"${esc(chunks)}","${esc(cfg.embeddingPath)}":${floats(embedding)}}},""" +
      s""""upsert":true}"""
  }

  /** Ordered insert batch for POST {baseUrl}/action/insertMany — the
    * connector-parity path (BsonOid insert strategy, ordered bulk writes,
    * main.tf:618-626) for first loads where idempotency is handled
    * upstream. */
  def insertManyBody(cfg: MongoAtlasConfig,
                     batch: Seq[(String, String, Array[Float])]): String = {
    val docs = batch.map { case (id, chunks, emb) =>
      s"""{"document_id":"${esc(id)}","chunk_hash":"${chunkHash(chunks)}","chunks":"${esc(chunks)}","${esc(cfg.embeddingPath)}":${floats(emb)}}"""
    }.mkString("[", ",", "]")
    s"""{"dataSource":"${esc(cfg.dataSource)}","database":"${esc(cfg.database)}","collection":"${esc(cfg.collection)}","documents":$docs}"""
  }

  // --- response parsers (narrow, dependency-free, offline-tested) ---

  private val docIdRe = "\"document_id\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"".r
  private val chunksRe = "\"chunks\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"".r
  private val scoreRe =
    "\"score\"\\s*:\\s*(-?[0-9]+(?:\\.[0-9]+)?(?:[eE][+-]?[0-9]+)?)".r

  private def unescape(s: String): String = graft.io.JsonText.unescape(s)

  /** Split the region after `"documents"` into top-level `{...}` object
    * spans with a quote-aware brace-depth scan. A flat-object regex would
    * truncate any document whose `chunks` text contains a raw brace
    * (code, JSON examples — common in a curated corpus); tracking
    * in-string state makes braces inside strings inert, and `\"` inside
    * strings is handled by skipping the char after every backslash. */
  private[store] def splitDocumentObjects(body: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    var depth = 0
    var objStart = -1
    var inString = false
    var done = false
    while (i < body.length && !done) {
      val c = body.charAt(i)
      if (inString) {
        if (c == '\\') i += 1 // skip escaped char (covers \" and \\)
        else if (c == '"') inString = false
      } else c match {
        case '"' => inString = true
        case '{' =>
          if (depth == 0) objStart = i
          depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0 && objStart >= 0) {
            out += body.substring(objStart, i + 1)
            objStart = -1
          }
        case ']' if depth == 0 =>
          // end of the documents array: stop, or a trailing sibling
          // field like "stats":{...} would be captured as a phantom doc
          done = true
        case _ =>
      }
      i += 1
    }
    out.result()
  }

  /** Parse an aggregate response `{"documents":[{document_id, chunks,
    * score}, ...]}` into hits, in server order (already ranked by
    * score). Documents are split with the brace-depth scan above; fields
    * are extracted PER OBJECT and a document missing any field is
    * skipped — one malformed legacy row in the collection must not
    * disable search for every query (the same quarantine-don't-crash
    * policy as the image decoder). Returns (hits, skippedCount) so
    * silent loss is observable to callers. */
  def parseSearchHitsCounting(json: String): (Seq[SearchHit], Int) = {
    val start = json.indexOf("\"documents\"")
    val body = if (start < 0) json else json.substring(start)
    val objs = splitDocumentObjects(body)
    val hits = objs.flatMap { obj =>
      for {
        id <- docIdRe.findFirstMatchIn(obj).map(m => unescape(m.group(1)))
        ch <- chunksRe.findFirstMatchIn(obj).map(m => unescape(m.group(1)))
        sc <- scoreRe.findFirstMatchIn(obj).map(_.group(1).toDouble)
      } yield SearchHit(id, ch, sc)
    }
    (hits, objs.size - hits.size)
  }

  def parseSearchHits(json: String): Seq[SearchHit] =
    parseSearchHitsCounting(json)._1

  /** Parse `{"matchedCount":N,"modifiedCount":M,"upsertedId":...}` /
    * `{"insertedIds":[...]}` acks into an affected-row count. An upsert
    * that INSERTS acks matchedCount=0 plus an upsertedId — both must
    * count, or callers summing write acks conclude nothing was written. */
  def parseWriteAck(json: String): Int = {
    val inserted = "\"insertedIds\"\\s*:\\s*\\[([^\\]]*)\\]".r
      .findFirstMatchIn(json).map(_.group(1).trim)
    inserted match {
      case Some(ids) => if (ids.isEmpty) 0 else ids.count(_ == ',') + 1
      case None =>
        val matched = "\"matchedCount\"\\s*:\\s*([0-9]+)".r
          .findFirstMatchIn(json).map(_.group(1).toInt).getOrElse(0)
        val upserted =
          if ("\"upsertedId\"\\s*:\\s*(?!null)".r.findFirstIn(json).isDefined) 1
          else 0
        matched + upserted
    }
  }
}

/** The remote [[VectorStore]]: `$vectorSearch` per query, ordered batched
  * upserts. `transport(url, body, headers) => responseBody` is the only
  * effectful piece — production passes a JDK HttpClient POST; tests pass
  * a fake and assert the requests it captured. Unreachable in this
  * offline build (like the Azure providers) but code-complete. */
final class MongoAtlasStore(
    cfg: MongoAtlasConfig,
    transport: (String, String, Map[String, String]) => String,
    corpusSize: () => Int = () => -1) extends VectorStore {
  import MongoAtlasStore._

  private def post(action: String, body: String): String =
    transport(s"${cfg.baseUrl}/action/$action", body,
      Map("api-key" -> cfg.apiKey, "Content-Type" -> "application/json"))

  override def search(query: Array[Float], k: Int,
                      numCandidates: Int = 150): Seq[SearchHit] = {
    val (hits, skipped) =
      parseSearchHitsCounting(post("aggregate", searchBody(cfg, query, k, numCandidates)))
    if (skipped > 0)
      System.err.println(s"[atlas] $skipped malformed document(s) skipped in search response")
    hits
  }

  /** Idempotent upsert of one chunk row (S4). */
  def upsert(id: String, chunks: String, embedding: Array[Float]): Int =
    parseWriteAck(post("updateOne", upsertOneBody(cfg, id, chunks, embedding)))

  /** Ordered, batched bulk load: batches of `maxBatchSize` issued in
    * order, each batch one insertMany — the sink connector's write shape.
    * Returns total inserted. */
  def insertAllOrdered(batch: Seq[(String, String, Array[Float])]): Int =
    batch.grouped(cfg.maxBatchSize).map { g =>
      parseWriteAck(post("insertMany", insertManyBody(cfg, g)))
    }.sum

  /** Idempotent bulk upsert (replay-safe sink path), ordered within the
    * iteration like the connector's ordered bulk writes. */
  def upsertAll(batch: Iterable[(String, String, Array[Float])]): Unit =
    batch.foreach { case (id, c, e) => upsert(id, c, e) }

  override def size: Int = corpusSize()
}
