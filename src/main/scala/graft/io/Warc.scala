package graft.io

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.{Encoders => E}
import org.apache.spark.sql.types._

/** WARC (ISO 28500) shard codec, pure JDK — the container CommonCrawl
  * ships in, i.e. THE ingest format of a web-scale training corpus.
  * Follows the repo's byte-codec conventions ([[WebDataset]]/
  * [[TfRecord]]): the shard stays a binary COLUMN (flows through any
  * source/sink, round-trips testably in-engine), encode/decode are
  * partition-local with zero shuffle, one shard per partition, and the
  * corpus parsing policy is truncation-yields-the-records-before-the-
  * cut, garbage-yields-none — a 10⁹-record crawl pass must skip a
  * damaged shard, not die on it.
  *
  * Layout per record: `WARC/1.0\r\n`, header lines, `\r\n`, exactly
  * Content-Length content bytes, `\r\n\r\n`. Response records carry an
  * HTTP/1.1 message as content (status line, headers, `\r\n\r\n`,
  * body) — [[parseHttp]] splits it. The GZ face writes each record as
  * its OWN gzip member, concatenated ([[writeWarcGz]]): that is
  * CommonCrawl's actual on-disk form, and the reason the format scales
  * — a member index (offset, length) makes shards SPLITTABLE at record
  * granularity without a splittable compression codec; the JDK's
  * GZIPInputStream reads multi-member streams natively, which
  * [[readWarcGz]] uses for the whole-shard path.
  *
  * Record IDs and dates must be DETERMINISTIC here (shard bytes are
  * hash-compared across engines and reruns): the id derives from the
  * target URI's md5 and the date is a fixed epoch — a live crawler
  * would stamp real ones; nothing downstream keys on them. */
object Warc {

  private val Crlf = "\r\n"
  private val FixedDate = "2020-01-01T00:00:00Z"

  /** One fetched page: the writer's input, the reader's output. */
  final case class Doc(uri: String, body: Array[Byte],
                       contentType: String = "text/html; charset=utf-8",
                       status: Int = 200,
                       location: Option[String] = None,
                       etag: Option[String] = None,
                       lastModified: Option[String] = None)

  /** A parsed record: WARC headers + raw content block. `extra`
    * carries the revisit-linkage headers when present (WARC-Profile,
    * WARC-Payload-Digest, WARC-Refers-To-Target-URI,
    * WARC-Refers-To-Date) — a bounded 0-4-entry map, never the whole
    * header bag (a 10⁹-record scan must not allocate a map per
    * record for headers nothing reads). */
  final case class Record(warcType: String, targetUri: String,
                          recordId: String, content: Array[Byte],
                          extra: Map[String, String] = Map.empty)

  /** The WARC headers [[readWarc]] preserves beyond the identity trio
    * — the revisit-record linkage set (WARC 1.1 §6.7.2). */
  private val ExtraKeys = Seq("WARC-Profile", "WARC-Payload-Digest",
    "WARC-Refers-To-Target-URI", "WARC-Refers-To-Date")

  /** The identical-payload-digest revisit profile URI (WARC 1.1
    * §6.7.2-1): "I fetched this again; the payload digest matched a
    * capture I already hold, so no body is stored." */
  val RevisitIdenticalDigest =
    "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest"

  /** The server-not-modified revisit profile URI (WARC 1.1 §6.7.3):
    * "the server answered 304 to my validators" — a weaker claim than
    * byte-identity (nothing was hashed this fetch), recorded as such
    * so replay tools don't trust an identity nobody verified. */
  val RevisitServerNotModified =
    "http://netpreserve.org/warc/1.1/revisit/server-not-modified"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def record(warcType: String, uri: Option[String],
                     headers: Seq[(String, String)],
                     content: Array[Byte],
                     version: String = "1.0",
                     idSeed: Option[String] = None): Array[Byte] = {
    // the target URI goes through headerSafe HERE, for every writer:
    // the head is US-ASCII, so a raw non-ASCII URI would mangle to
    // '?' in one writer face while another percent-encoded it — two
    // spellings of one identity that break the revisit refers_to →
    // target_uri resolution join (and the CRLF strip closes header
    // injection on every face, not just the ones that remembered).
    // headerSafe is idempotent, so call-site encoding stays legal.
    val safeUri = uri.map(headerSafe)
    // the id derivation discriminates by RECORD TYPE: a revisit, a
    // WET conversion and the response they all refer to share a URI
    // but must not collide on WARC-Record-ID (uniqueness within an
    // archive; CDX/dedup consumers key on it). idSeed is the escape
    // hatch for callers needing a different discriminator.
    val id = s"<urn:md5:${md5hex(idSeed.getOrElse(
      s"$warcType:${safeUri.getOrElse(warcType)}"))}>"
    val hs = Seq("WARC-Type" -> warcType,
        "WARC-Record-ID" -> id, "WARC-Date" -> FixedDate) ++
      safeUri.map("WARC-Target-URI" -> _) ++ headers ++
      Seq("Content-Length" -> content.length.toString)
    val head = (s"WARC/$version$Crlf" +
      hs.map { case (k, v) => s"$k: $v$Crlf" }.mkString + Crlf)
      .getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream(
      head.length + content.length + 4)
    out.write(head); out.write(content)
    out.write(s"$Crlf$Crlf".getBytes("US-ASCII"))
    out.toByteArray
  }

  /** A header-safe spelling of an arbitrary value: CR/LF stripped (a
    * crafted Location with embedded CRLF would otherwise terminate the
    * head early and inject fake headers into the written record) and
    * non-ASCII/control bytes percent-encoded as UTF-8 (RFC 3986's own
    * spelling for non-ASCII URL bytes — US-ASCII getBytes would mangle
    * an internationalized Location to '?' and the read-back edge
    * would point at the wrong URL). The WHOLE string encodes as one
    * UTF-8 byte sequence: a per-UTF-16-char flatMap would hand each
    * half of a non-BMP surrogate pair to getBytes alone, which maps a
    * lone surrogate to '?' — destroying the URL instead of encoding
    * it. */
  private def headerSafe(v: String): String = {
    val stripped = v.filter(c => c != '\r' && c != '\n')
    stripped.getBytes("UTF-8").map { b =>
      val u = b & 0xff
      if (u >= 0x20 && u <= 0x7E) u.toChar.toString else f"%%$u%02X"
    }.mkString
  }

  /** HTTP/1.1 response message for a response record's content. */
  private def httpResponse(d: Doc): Array[Byte] = {
    val head = (s"HTTP/1.1 ${d.status} OK$Crlf" +
      s"Content-Type: ${d.contentType}$Crlf" +
      d.location.map(l => s"Location: ${headerSafe(l)}$Crlf")
        .getOrElse("") +
      d.etag.map(e => s"ETag: ${headerSafe(e)}$Crlf").getOrElse("") +
      d.lastModified.map(m => s"Last-Modified: ${headerSafe(m)}$Crlf")
        .getOrElse("") +
      s"Content-Length: ${d.body.length}$Crlf" + Crlf)
      .getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream(head.length + d.body.length)
    out.write(head); out.write(d.body)
    out.toByteArray
  }

  /** Docs → one uncompressed WARC shard: a warcinfo record then one
    * response record per doc. */
  def writeWarc(docs: Seq[Doc]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(record("warcinfo", None,
      Seq("Content-Type" -> "application/warc-fields"),
      s"software: graft$Crlf".getBytes("US-ASCII")))
    docs.foreach { d =>
      out.write(record("response", Some(d.uri),
        Seq("Content-Type" -> "application/http;msgtype=response"),
        httpResponse(d)))
    }
    out.toByteArray
  }

  /** Docs → a multi-member gzip WARC shard (one member per record —
    * the CommonCrawl layout; see the Scaladoc's splittability note).
    * The one framing writer: [[writeRecordShardGz]] over the docs'
    * HTTP response messages. */
  def writeWarcGz(docs: Seq[Doc]): Array[Byte] =
    writeRecordShardGz(docs.map(d => (d.uri, httpResponse(d))),
      "response", "application/http;msgtype=response")

  /** First index of `sub` in `bytes` at or after `from`, -1 if absent —
    * the one byte-substring search [[readWarc]] and [[parseHttp]]
    * share. */
  private def indexOf(bytes: Array[Byte], sub: Array[Byte],
                      from: Int): Int = {
    var i = from
    while (i + sub.length <= bytes.length) {
      var j = 0
      while (j < sub.length && bytes(i + j) == sub(j)) j += 1
      if (j == sub.length) return i
      i += 1
    }
    -1
  }

  /** Parse an uncompressed WARC shard into records. Corpus policy:
    * truncation yields the records before the cut; a malformed header
    * block, a missing/negative/absurd Content-Length (corrupt or
    * adversarial shards must stop the walk CLEAN, never throw out of
    * the ingest task) stops the walk. */
  def readWarc(bytes: Array[Byte]): Seq[Record] = {
    if (bytes == null) return Seq.empty
    val recs = scala.collection.mutable.ArrayBuffer.empty[Record]
    var pos = 0
    val headEnd = s"$Crlf$Crlf".getBytes("US-ASCII")
    var walking = true
    while (walking && pos < bytes.length) {
      val he = indexOf(bytes, headEnd, pos)
      if (he < 0) walking = false
      else {
        val head = new String(bytes, pos, he - pos, "US-ASCII")
        val lines = head.split("\r\n")
        if (lines.isEmpty || !lines.head.startsWith("WARC/")) walking = false
        else {
          val hs = lines.tail.flatMap { l =>
            val i = l.indexOf(':')
            if (i < 0) None else Some(l.substring(0, i).trim ->
              l.substring(i + 1).trim)
          }.toMap
          // LONG arithmetic + len >= 0: an int bound would let a
          // negative or near-MaxValue Content-Length pass the check
          // and throw from copyOfRange — a crash, not a clean stop
          hs.get("Content-Length").flatMap(c =>
            scala.util.Try(c.toLong).toOption) match {
            case Some(len) if len >= 0 &&
                he.toLong + 4L + len <= bytes.length =>
              val l = len.toInt
              val content = java.util.Arrays.copyOfRange(bytes,
                he + 4, he + 4 + l)
              recs += Record(hs.getOrElse("WARC-Type", ""),
                hs.getOrElse("WARC-Target-URI", ""),
                hs.getOrElse("WARC-Record-ID", ""), content,
                extra = ExtraKeys.flatMap(k => hs.get(k).map(k -> _))
                  .toMap)
              pos = he + 4 + l + 4 // skip the record separator CRLFCRLF
            case _ => walking = false // truncated or unframed: stop clean
          }
        }
      }
    }
    recs.toSeq
  }

  /** Inflate a (multi-member) gzip WARC shard and parse it. The JDK's
    * GZIPInputStream consumes concatenated members natively. The
    * truncation policy holds ACROSS the compression: a shard cut
    * mid-member inflates every complete earlier member before the
    * stream error, and those records are salvaged — a damaged 1 GB
    * crawl shard contributes everything before the cut, not zero.
    * Garbage (non-gzip bytes) yields no records. */
  /** One gzip member wrapping `bytes` — shared by the WET/sitemap
    * fixtures and anything that ships a single-member `.gz` payload. */
  def gzipBytes(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(bytes); gz.close()
    out.toByteArray
  }

  /** Magic-sniffed inflate: gzip payloads (0x1f 0x8b — multi-member
    * streams inflate whole, truncation salvages every complete
    * earlier member, [[readWarcGz]]'s policy) inflate; anything else
    * passes through UNCHANGED, so one call handles a mixed plain/.gz
    * column (the sitemap-feed shape). Null yields empty. The inflate
    * loop is BOUNDED at `maxBytes` (default: the sitemap protocol's
    * 50 MB uncompressed cap): these are attacker-controlled feed
    * bytes, and a kB-sized gzip bomb would otherwise expand to
    * gigabytes inside one task's ByteArrayOutputStream and OOM the
    * executor — past the bound the walk stops and salvages the prefix
    * (the truncation convention; a protocol-legal feed never gets
    * there). */
  def gunzipAuto(bytes: Array[Byte],
                 maxBytes: Long = 50L << 20): Array[Byte] = {
    if (bytes == null) return Array.empty
    if (bytes.length < 2 || (bytes(0) & 0xff) != 0x1f ||
        (bytes(1) & 0xff) != 0x8b) return bytes
    val out = new java.io.ByteArrayOutputStream()
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0 && out.size() <= maxBytes) {
        out.write(buf, 0, n); n = in.read(buf)
      }
    } catch { case _: java.io.IOException => () } // salvage
    if (out.size() > maxBytes)
      java.util.Arrays.copyOf(out.toByteArray, maxBytes.toInt)
    else out.toByteArray
  }

  /** Bounded zlib/raw-deflate inflate — `Content-Encoding: deflate`'s
    * decoder. The wild serves BOTH spellings under that name (RFC 9110
    * says zlib-wrapped; enough servers ship raw DEFLATE that every
    * browser sniffs), so ANY zlib attempt that hits damage — first
    * block or mid-stream — retries raw: ~1/500 of raw-DEFLATE streams
    * open with two bytes that happen to form a valid zlib header, and
    * those throw mid-stream with a garbage partial, so gating the
    * retry on zero-output would return that garbage as "the body". A
    * clean raw pass wins over a damaged zlib salvage; when BOTH
    * attempts hit damage (a genuinely truncated stream) the longer
    * salvage wins (zlib on a tie — the spec'd spelling). Same bomb
    * bound and salvage-prefix policy as [[gunzipAuto]]; garbage
    * yields empty (never a throw — the 10⁹-page policy). */
  def inflateAuto(bytes: Array[Byte],
                  maxBytes: Long = 50L << 20): Array[Byte] = {
    if (bytes == null || bytes.isEmpty) return Array.empty
    def run(nowrap: Boolean): (Array[Byte], Boolean, Boolean) = {
      val inf = new java.util.zip.Inflater(nowrap)
      inf.setInput(bytes)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var damaged = false
      try {
        // n == 0 means finished, truncated input, or a preset-dict
        // demand — with the whole input already set, each is a stop
        var n = inf.inflate(buf)
        while (n > 0 && out.size() <= maxBytes) {
          out.write(buf, 0, n); n = inf.inflate(buf)
        }
      } catch {
        case _: java.util.zip.DataFormatException => damaged = true
      }
      val fin = inf.finished()
      inf.end()
      val b = if (out.size() > maxBytes)
        java.util.Arrays.copyOf(out.toByteArray, maxBytes.toInt)
      else out.toByteArray
      (b, damaged, fin)
    }
    val (zlib, zDamaged, _) = run(nowrap = false)
    // no damage = clean finish, a truncated-stream salvage, or the
    // bomb cap — each keeps the zlib reading (the spec'd spelling).
    // Damage ANYWHERE = the stream was never zlib (or is corrupt):
    // retry raw, trust a raw pass that runs CLEAN TO THE END (the
    // coincidental-header case decodes fully), otherwise keep the
    // longer salvage of the two damaged attempts, zlib on ties.
    if (!zDamaged) zlib
    else {
      val (raw, rDamaged, rFinished) = run(nowrap = true)
      if (!rDamaged && rFinished) raw
      else if (raw.length > zlib.length) raw
      else zlib
    }
  }

  def readWarcGz(bytes: Array[Byte]): Seq[Record] = {
    if (bytes == null) return Seq.empty
    val out = new java.io.ByteArrayOutputStream()
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } catch { case _: java.io.IOException => () } // salvage what inflated
    readWarc(out.toByteArray)
  }

  /** Split a response record's HTTP content into (status, body); a
    * content block without an HTTP head yields (0, whole content) —
    * resource records and exotic captures stay readable as raw bytes.
    * Delegates to [[parseHttpFull]], so chunked bodies de-chunk here
    * too. */
  def parseHttp(content: Array[Byte]): (Int, Array[Byte]) = {
    val (status, _, body) = parseHttpFull(content)
    (status, body)
  }

  /** Split a response record's HTTP content into (status, head, body);
    * no HTTP head yields (0, "", whole content) — [[parseHttp]]'s law
    * with the header block kept for charset/content-type sniffing.
    * A `Transfer-Encoding: chunked` body is DE-CHUNKED (raw WARC
    * captures keep the wire framing, and hex size lines inside the
    * payload would poison every downstream text stage); malformed
    * chunk framing salvages the chunks before the damage — the
    * truncation convention. Then `Content-Encoding` DECODES — in that
    * order, per RFC 9110 §6.4.1/RFC 9112 §6.1 (transfer coding wraps
    * the content coding on the wire): a raw capture whose body is
    * gzip/deflate-compressed would otherwise reach every downstream
    * text stage as binary slush, the exact poison de-chunking fixed
    * for the framing layer. gzip/x-gzip inflate via [[gunzipAuto]]
    * (whose non-gzip passthrough also salvages the real web's
    * lying-header servers), deflate via [[inflateAuto]] (zlib or raw),
    * identity passes; any OTHER coding (br, zstd, compress — no JDK
    * codec) yields an EMPTY body: undecodable compressed bytes must
    * not enter a corpus as text, and an empty body is the loud,
    * filterable refusal. Multi-coding lists apply last-to-first. */
  def parseHttpFull(content: Array[Byte]): (Int, String, Array[Byte]) = {
    val sep = "\r\n\r\n".getBytes("US-ASCII")
    val at = indexOf(content, sep, 0)
    if (at < 0) return (0, "", content)
    val head = new String(content, 0, at, "US-ASCII")
    if (!head.startsWith("HTTP/")) (0, "", content)
    else {
      val status = head.split("\r\n").head.split(" ")
        .lift(1).flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(0)
      val raw = java.util.Arrays.copyOfRange(content, at + 4,
        content.length)
      val unframed =
        if (httpHeader(head, "Transfer-Encoding").toLowerCase
            .contains("chunked")) dechunk(raw)
        else raw
      val codings = httpHeader(head, "Content-Encoding").toLowerCase
        .split(",").map(_.trim).filter(c => c.nonEmpty && c != "identity")
      val body = codings.foldRight(unframed) { (c, b) =>
        c match {
          case "gzip" | "x-gzip" => gunzipAuto(b)
          case "deflate" => inflateAuto(b)
          case _ => Array.empty[Byte] // br/zstd/…: refuse, don't garble
        }
      }
      (status, head, body)
    }
  }

  /** Decode RFC 9112 §7.1 chunked framing: hex-size line (chunk
    * extensions after ';' ignored), size bytes, CRLF, …, a 0-size
    * chunk ends the body (trailers ignored). Malformed framing — a
    * non-hex size line, a chunk running past the buffer — stops the
    * walk and returns the chunks already decoded. */
  private def dechunk(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(raw.length)
    val crlf = Crlf.getBytes("US-ASCII")
    var pos = 0
    var walking = true
    while (walking) {
      val eol = indexOf(raw, crlf, pos)
      if (eol < 0) walking = false
      else {
        val line = new String(raw, pos, eol - pos, "US-ASCII")
        val hexPart = line.takeWhile(_ != ';').trim
        scala.util.Try(java.lang.Long.parseLong(hexPart, 16)).toOption match {
          // the data bytes must be present; the chunk's own trailing
          // CRLF need NOT be (a capture cut exactly after the data is
          // a normal truncation and the salvage convention keeps
          // everything before the cut) — the skip clamps instead
          case Some(0L) => walking = false // terminal chunk; trailers drop
          case Some(n) if n > 0 && eol + 2 + n <= raw.length =>
            out.write(raw, eol + 2, n.toInt)
            pos = math.min(eol + 2 + n + 2, raw.length.toLong).toInt
          case _ => walking = false // malformed/truncated: salvage
        }
      }
    }
    out.toByteArray
  }

  /** Case-insensitive HTTP header lookup over a parsed head; '' when
    * absent (first occurrence wins). */
  def httpHeader(head: String, name: String): String =
    head.split("\r\n").iterator.drop(1)
      .map(_.split(":", 2))
      .collectFirst { case Array(k, v)
        if k.trim.equalsIgnoreCase(name) => v.trim }
      .getOrElse("")

  // ——— charset sniffing (the WHATWG-shaped subset) ————————————————

  /** Canonical name for an encoding label, WHATWG Encoding-spec
    * aliases for the four families that cover the real web's long
    * tail head-on: utf-8, windows-1252 (which ABSORBS iso-8859-1/
    * latin1/ascii labels — the WHATWG rule, because real pages
    * labeled latin1 use the 0x80–0x9F cp1252 punctuation), utf-16le
    * (plain 'utf-16' maps here per the spec) and utf-16be. '' for
    * labels outside the subset — callers fall through to the next
    * detection stage rather than crash on 'x-mac-cyrillic'. */
  def canonicalCharset(label: String): String =
    label.trim.toLowerCase match {
      case "utf-8" | "utf8" | "unicode-1-1-utf-8" => "utf-8"
      case "windows-1252" | "cp1252" | "x-cp1252" | "iso-8859-1" |
           "iso8859-1" | "iso_8859-1" | "latin1" | "l1" | "ascii" |
           "us-ascii" | "ansi_x3.4-1968" | "iso-ir-100" |
           "csisolatin1" => "windows-1252"
      case "utf-16" | "utf-16le" => "utf-16le"
      case "utf-16be" => "utf-16be"
      case _ => ""
    }

  private val CharsetParam =
    "(?i)charset\\s*=\\s*\"?([A-Za-z0-9_.:\\-]+)".r
  private val MetaCharset =
    "(?i)<meta[^>]{0,512}?charset\\s*=\\s*[\"']?([A-Za-z0-9_.:\\-]+)".r

  /** Detect a response body's charset: BOM (which outranks even a
    * contradicting header — the bytes don't lie) > the Content-Type
    * `charset=` parameter > a `<meta ... charset=` declaration in the
    * first 1024 bytes (scanned through a latin-1 view — every charset
    * this subset decodes is ASCII-compatible in that window) >
    * utf-8. Unknown labels at any stage fall through to the next.
    * Returns a [[canonicalCharset]] name. */
  def detectCharset(contentType: String, body: Array[Byte]): String = {
    if (body.length >= 3 && body(0) == 0xEF.toByte &&
        body(1) == 0xBB.toByte && body(2) == 0xBF.toByte) return "utf-8"
    if (body.length >= 2 && body(0) == 0xFF.toByte &&
        body(1) == 0xFE.toByte) return "utf-16le"
    if (body.length >= 2 && body(0) == 0xFE.toByte &&
        body(1) == 0xFF.toByte) return "utf-16be"
    val fromHeader = CharsetParam.findFirstMatchIn(contentType)
      .map(m => canonicalCharset(m.group(1))).getOrElse("")
    if (fromHeader.nonEmpty) return fromHeader
    val prefix = new String(body, 0, math.min(1024, body.length),
      "ISO-8859-1")
    val fromMeta = MetaCharset.findFirstMatchIn(prefix)
      .map(m => canonicalCharset(m.group(1))).getOrElse("")
    if (fromMeta.nonEmpty) fromMeta else "utf-8"
  }

  /** Decode a body under a [[canonicalCharset]] name: the charset's
    * own BOM is stripped (it is a signature, not content), malformed
    * and unmappable sequences REPLACE (U+FFFD) — a 10⁹-page decode
    * pass must never throw on mojibake. */
  def decodeBody(body: Array[Byte], charset: String): String = {
    val (off, jdk) = charset match {
      case "utf-8" if body.length >= 3 && body(0) == 0xEF.toByte &&
        body(1) == 0xBB.toByte && body(2) == 0xBF.toByte => (3, "UTF-8")
      case "utf-8" => (0, "UTF-8")
      case "utf-16le" if body.length >= 2 && body(0) == 0xFF.toByte &&
        body(1) == 0xFE.toByte => (2, "UTF-16LE")
      case "utf-16le" => (0, "UTF-16LE")
      case "utf-16be" if body.length >= 2 && body(0) == 0xFE.toByte &&
        body(1) == 0xFF.toByte => (2, "UTF-16BE")
      case "utf-16be" => (0, "UTF-16BE")
      case "windows-1252" => (0, "windows-1252")
      case other => (0, if (other.isEmpty) "UTF-8" else other)
    }
    val dec = java.nio.charset.Charset.forName(jdk).newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    dec.decode(java.nio.ByteBuffer.wrap(body, off, body.length - off))
      .toString
  }

  /** Byte-level writer face: (url, body BINARY, content_type) rows →
    * gzip WARC shards — what a real fetcher has in hand (the string
    * face [[toShards]] is the synthetic-fixture convenience). Same
    * bounded shard cutting, zero shuffle; null url/body rows skip. */
  def toShardsRaw(docs: DataFrame,
                  maxShardBytes: Long = 128L << 20): DataFrame = {
    require(maxShardBytes > 0, s"maxShardBytes must be > 0: $maxShardBytes")
    val uIdx = docs.schema.fieldIndex("url")
    val bIdx = docs.schema.fieldIndex("body")
    val cIdx = docs.schema.fieldIndex("content_type")
    // optional fetch metadata: a `status` int column and a `location`
    // string column (3xx redirect targets) ride into the HTTP head
    // when present — the writer face a fetcher recording redirects
    // needs; absent columns keep the 200/no-Location defaults.
    // Detected by name but normalized by CAST at plan time: a JSON-
    // sourced fetch log infers status as BIGINT and a raw getInt would
    // ClassCastException inside every task with an error naming
    // neither the column nor the fix
    val hasStatus = docs.columns.contains("status")
    val hasLocation = docs.columns.contains("location")
    // fetch-validator headers (r18): optional `etag`/`last_modified`
    // STRING columns ride into the HTTP head the same way — a fetcher
    // recording them makes the capture→frontier validator loop
    // closable at ingest (fromShardsDecoded exposes both back)
    val hasEtag = docs.columns.contains("etag")
    val hasLastMod = docs.columns.contains("last_modified")
    val normalized = {
      import org.apache.spark.sql.functions.col
      var df = docs
      if (hasStatus) df = df.withColumn("status", col("status").cast("int"))
      if (hasLocation)
        df = df.withColumn("location", col("location").cast("string"))
      if (hasEtag) df = df.withColumn("etag", col("etag").cast("string"))
      if (hasLastMod)
        df = df.withColumn("last_modified",
          col("last_modified").cast("string"))
      df
    }
    def idxOf(name: String, has: Boolean) =
      if (has) Some(normalized.schema.fieldIndex(name)) else None
    val sIdx = idxOf("status", hasStatus)
    val lIdx = idxOf("location", hasLocation)
    val eIdx = idxOf("etag", hasEtag)
    val mIdx = idxOf("last_modified", hasLastMod)
    normalized.mapPartitions { it =>
      cutBounded[Doc](it.flatMap { r =>
        if (r.isNullAt(uIdx) || r.isNullAt(bIdx)) None
        else Some(Doc(r.getString(uIdx), r.getAs[Array[Byte]](bIdx),
          if (r.isNullAt(cIdx)) "application/octet-stream"
          else r.getString(cIdx),
          status = sIdx.filterNot(r.isNullAt).map(r.getInt)
            .getOrElse(200),
          location = lIdx.filterNot(r.isNullAt).map(r.getString),
          etag = eIdx.filterNot(r.isNullAt).map(r.getString),
          lastModified = mIdx.filterNot(r.isNullAt).map(r.getString)))
      }, d => d.uri.length.toLong + d.body.length, maxShardBytes,
        buf => Row(writeWarcGz(buf), buf.length.toLong))
    }(E.row(shardSchema))
  }

  private val shardSchema = StructType(Seq(
    StructField("shard", BinaryType),
    StructField("n_records", LongType)))

  /** The ONE bounded shard-cutting law every writer face shares: cut a
    * new shard before an element would push the accumulated payload
    * bytes past `maxShardBytes` (a single over-sized element still
    * emits alone — the bound never starves progress); elements stream
    * through a buffered iterator, the partition is never
    * materialized. */
  private def cutBounded[T](it: Iterator[T], sz: T => Long,
                            maxShardBytes: Long,
                            build: Seq[T] => Row): Iterator[Row] = {
    val ds = it.buffered
    new Iterator[Row] {
      override def hasNext: Boolean = ds.hasNext
      override def next(): Row = {
        val buf = scala.collection.mutable.ArrayBuffer.empty[T]
        var bytes = 0L
        while (ds.hasNext && (buf.isEmpty ||
            bytes + sz(ds.head) <= maxShardBytes)) {
          val d = ds.next()
          buf += d
          bytes += sz(d)
        }
        build(buf.toSeq)
      }
    }
  }

  /** One multi-member gzip shard of NON-response records — the shape
    * of CommonCrawl's DERIVED formats: WET shards are `conversion`
    * records whose content is the extracted text (Content-Type
    * text/plain), WAT shards are `metadata` records whose content is
    * a JSON envelope (application/json). Same layout laws as
    * [[writeWarcGz]]: warcinfo first, one gzip member per record,
    * deterministic ids. */
  def writeRecordShardGz(recs: Seq[(String, Array[Byte])],
                         warcType: String,
                         contentType: String): Array[Byte] =
    shardOfMembers(recs.map { case (uri, payload) =>
      record(warcType, Some(uri),
        Seq("Content-Type" -> contentType), payload)
    })

  /** One gzip shard of WARC 1.1 `revisit` records (§6.7.2,
    * identical-payload-digest profile) — what the archive writes for
    * an UNCHANGED page instead of re-storing its body: a revisit
    * fetch whose payload digest matches a held capture (or that
    * answered 304) costs ~300 bytes of linkage headers, not the
    * body, so archive growth is proportional to CHANGED bytes — at
    * steady state (most answers unchanged) the dominant storage win
    * a 10⁹-page recrawl has. Each element is (uri, refersToUri,
    * payloadDigest); WARC-Refers-To-Date is the deterministic fixed
    * date (the codec convention — real deployments stamp the
    * original capture's date). Content block is empty: the profile
    * requires no payload, and the response headers live with the
    * frontier's validator columns, not the archive. Per element the
    * optional 4th slot picks the profile — [[RevisitIdenticalDigest]]
    * (the default when the digest matched a held capture) or
    * [[RevisitServerNotModified]] (a 304: the SERVER asserted
    * validator equality; no byte-identity was verified this fetch, so
    * claiming the identical-digest profile would put a false claim in
    * the archive) — and a null/empty digest omits the
    * WARC-Payload-Digest header (§6.7.3 allows it). Records declare
    * WARC/1.1 (the profiles are 1.1-namespace; strict validators flag
    * a 1.1 profile on a 1.0 record) with a type-discriminated
    * record id (a revisit must not collide with the response it
    * refers to). Layout laws of [[writeRecordShardGz]] (warcinfo
    * head, one member per record — one shared assembler). */
  def writeRevisitShardGz(
      revisits: Seq[(String, String, String, String)]): Array[Byte] =
    shardOfMembers(revisits.map { case (uri, refersTo, digest, profile) =>
      val dig = Option(digest).filter(_.nonEmpty)
        .map(d => "WARC-Payload-Digest" -> headerSafe(d))
      record("revisit", Some(uri), Seq(
          "WARC-Profile" -> (if (profile == null || profile.isEmpty)
            RevisitIdenticalDigest else headerSafe(profile))) ++
        dig ++ Seq(
          "WARC-Refers-To-Target-URI" -> headerSafe(refersTo),
          "WARC-Refers-To-Date" -> FixedDate), Array.empty[Byte],
        version = "1.1")
    }, version = "1.1")

  /** One multi-member gzip shard: the warcinfo head + one member per
    * record — the layout law every record-shard writer shares. The
    * warcinfo head takes the SAME version as the members (a WARC/1.0
    * head describing WARC/1.1 records is exactly the mixed-version
    * file strict validators flag). */
  private def shardOfMembers(records: Seq[Array[Byte]],
                             version: String = "1.0"): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def member(rec: Array[Byte]): Unit = {
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(rec); gz.finish(); gz.close()
    }
    member(record("warcinfo", None,
      Seq("Content-Type" -> "application/warc-fields"),
      s"software: graft$Crlf".getBytes("US-ASCII"), version = version))
    records.foreach(member)
    out.toByteArray
  }

  /** (url, refers_to, payload_digest[, profile]) rows → gzip shards
    * of revisit records — the DataFrame writer face of
    * [[writeRevisitShardGz]], with [[toShards]]' bounded cutting.
    * `profile` is optional (absent column or null value → the
    * identical-payload-digest default); a NULL digest writes a
    * digest-less record (§6.7.3's server-not-modified shape — the
    * 304 case where nothing was hashed this fetch), so only
    * null url/refers_to rows skip (no record could be linked). Feed
    * it [[graft.operators.CrawlFrontier.archivePlan]]'s revisit
    * slice. */
  def toRevisitShards(docs: DataFrame,
                      maxShardBytes: Long = 128L << 20): DataFrame = {
    require(maxShardBytes > 0, s"maxShardBytes must be > 0: $maxShardBytes")
    val uIdx = docs.schema.fieldIndex("url")
    val rIdx = docs.schema.fieldIndex("refers_to")
    val dIdx = docs.schema.fieldIndex("payload_digest")
    val pIdx = if (docs.columns.contains("profile"))
      Some(docs.schema.fieldIndex("profile")) else None
    docs.mapPartitions { it =>
      cutBounded[(String, String, String, String)](it.flatMap { r =>
        if (r.isNullAt(uIdx) || r.isNullAt(rIdx)) None
        else Some((r.getString(uIdx), r.getString(rIdx),
          if (r.isNullAt(dIdx)) null else r.getString(dIdx),
          pIdx.filterNot(r.isNullAt).map(r.getString).orNull))
      }, d => d._1.length.toLong + d._2.length +
        Option(d._3).fold(0)(_.length) + 200L,
        maxShardBytes,
        buf => Row(writeRevisitShardGz(buf), buf.length.toLong))
    }(E.row(shardSchema))
  }

  /** Gzip shards → the revisit-linkage frame (target_uri, refers_to,
    * payload_digest, profile): join refers_to against the held
    * captures' target_uri to RESOLVE each unchanged page to its
    * stored body — the read side of the storage-∝-changed-bytes
    * contract. Non-revisit records drop. Partition-local, zero
    * shuffle. */
  def fromRevisitShards(shards: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("target_uri", StringType),
      StructField("refers_to", StringType),
      StructField("payload_digest", StringType),
      StructField("profile", StringType)))
    val sIdx = shards.schema.fieldIndex("shard")
    shards.mapPartitions { it =>
      it.flatMap { r =>
        readWarcGz(r.getAs[Array[Byte]](sIdx))
          .filter(_.warcType == "revisit")
          .map(rec => Row(rec.targetUri,
            rec.extra.getOrElse("WARC-Refers-To-Target-URI", ""),
            // a digest-less record (§6.7.3) reads back as NULL — a
            // meaningful absence, not an empty digest
            rec.extra.get("WARC-Payload-Digest").orNull,
            rec.extra.getOrElse("WARC-Profile", "")))
      }
    }(E.row(schema))
  }

  /** (url, payload STRING) rows → gzip shards of `warcType` records —
    * the derived-format writer face: `toRecordShards(pages,
    * "conversion", "text/plain")` emits WET, `toRecordShards(meta,
    * "metadata", "application/json")` emits WAT (build the JSON
    * envelope with to_json upstream; the codec stays byte-level).
    * Same bounded shard cutting as [[toShards]] (a partition of any
    * size emits a SEQUENCE of bounded shards); null rows skip. */
  def toRecordShards(docs: DataFrame, warcType: String,
                     contentType: String,
                     maxShardBytes: Long = 128L << 20): DataFrame = {
    require(maxShardBytes > 0, s"maxShardBytes must be > 0: $maxShardBytes")
    require(warcType.nonEmpty && warcType != "warcinfo",
      s"warcType must be a non-warcinfo record type: '$warcType'")
    val uIdx = docs.schema.fieldIndex("url")
    val pIdx = docs.schema.fieldIndex("payload")
    docs.mapPartitions { it =>
      cutBounded[(String, Array[Byte])](it.flatMap { r =>
        if (r.isNullAt(uIdx) || r.isNullAt(pIdx)) None
        else Some((r.getString(uIdx),
          r.getString(pIdx).getBytes("UTF-8")))
      }, d => d._1.length.toLong + d._2.length, maxShardBytes,
        buf => Row(writeRecordShardGz(buf, warcType, contentType),
          buf.length.toLong))
    }(E.row(shardSchema))
  }

  /** Gzip shards of `warcType` records → (target_uri, payload,
    * n_bytes) with the payload decoded as UTF-8 — the WET/WAT reader
    * face (both derived formats are UTF-8 by construction; raw fetch
    * bytes live in the WARC, not here). Other record types — the
    * warcinfo head included — drop. Partition-local, zero shuffle. */
  def fromRecordShards(shards: DataFrame, warcType: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("target_uri", StringType),
      StructField("payload", StringType),
      StructField("n_bytes", LongType)))
    val sIdx = shards.schema.fieldIndex("shard")
    shards.mapPartitions { it =>
      it.flatMap { r =>
        readWarcGz(r.getAs[Array[Byte]](sIdx))
          .filter(_.warcType == warcType)
          .map(rec => Row(rec.targetUri,
            new String(rec.content, "UTF-8"), rec.content.length.toLong))
      }
    }(E.row(schema))
  }

  /** Charset-aware reader face: gzip WARC shards → (target_uri,
    * http_status, content_type, charset, body_text, n_bytes) with
    * content_type the lowercased mime sans parameters, charset the
    * [[detectCharset]] verdict and body_text decoded accordingly —
    * [[fromShards]] decodes everything as UTF-8, which silently
    * garbles the latin1/cp1252 half of a real crawl. n_bytes counts
    * the PAYLOAD bytes the parse hands to the decoder — BOM included,
    * chunked transfer framing (size lines, chunk CRLFs, trailers)
    * already removed: the corpus-content accounting, which for
    * chunked captures is smaller than the stored wire bytes.
    * Partition-local, zero shuffle. */
  def fromShardsDecoded(shards: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("target_uri", StringType),
      StructField("http_status", IntegerType),
      StructField("content_type", StringType),
      StructField("charset", StringType),
      StructField("location", StringType),
      StructField("etag", StringType),
      StructField("last_modified", StringType),
      StructField("body_text", StringType),
      StructField("n_bytes", LongType),
      StructField("retry_after", StringType),
      StructField("cache_control", StringType)))
    val sIdx = shards.schema.fieldIndex("shard")
    shards.mapPartitions { it =>
      it.flatMap { r =>
        readWarcGz(r.getAs[Array[Byte]](sIdx))
          .filter(_.warcType == "response")
          .map { rec =>
            val (status, head, body) = parseHttpFull(rec.content)
            val ctRaw = httpHeader(head, "Content-Type")
            val mime = ctRaw.takeWhile(_ != ';').trim.toLowerCase
            val cs = detectCharset(ctRaw, body)
            // the Location header ('' when absent): 3xx rows feed the
            // redirect map (resolveRedirects) straight from shards;
            // ETag/Last-Modified ride RAW (r18 — epoch parsing is
            // TextExtraction.imfFixdateEpoch's job downstream) so the
            // ingest path can feed the frontier's validator columns;
            // Retry-After/Cache-Control ride raw too (r19 — appended
            // LAST so positional consumers keep their indexes), so the
            // wire face carries the COMPLETE fetch contract
            // (CrawlFrontier.fetchResults is the bridge)
            Row(rec.targetUri, status, mime, cs,
              httpHeader(head, "Location"),
              httpHeader(head, "ETag"),
              httpHeader(head, "Last-Modified"),
              decodeBody(body, cs),
              body.length.toLong,
              httpHeader(head, "Retry-After"),
              httpHeader(head, "Cache-Control"))
          }
      }
    }(E.row(schema))
  }

  /** (doc_id, url, text) rows → gzip WARC shards: (shard binary,
    * n_records). Partition-local, zero shuffle; null url/text rows are
    * skipped, never a crash. Shard memory is bounded BY CONSTRUCTION:
    * a new shard starts before a doc would push the current shard's
    * accumulated payload bytes (uri + UTF-8 body; header overhead is
    * ~200 B/record on top) past `maxShardBytes`, so a partition of any
    * size emits a SEQUENCE of bounded shards and peak task memory is
    * ≈ payload + compressed output per shard — never the whole
    * partition (the unbounded form OOM'd the ingest probe at ~73 k
    * pages/shard and was survivable only by caller-side repartition
    * discipline). A single over-sized doc still emits as its own
    * shard (the bound can never starve progress). Docs stream through
    * a buffered iterator — the partition is never materialized.
    *
    * Staging shards in PARQUET: cap
    * `spark.sql.parquet.columnarReaderBatchSize` (default 4096) when
    * reading them back — the vectorized reader reserves
    * batchSize × shard bytes per column batch, and 4096 rows of
    * 128 MB shards is an impossible reservation. A handful of rows
    * per batch is right for fat binary columns. */
  def toShards(docs: DataFrame,
               maxShardBytes: Long = 128L << 20): DataFrame = {
    require(maxShardBytes > 0, s"maxShardBytes must be > 0: $maxShardBytes")
    val uIdx = docs.schema.fieldIndex("url")
    val tIdx = docs.schema.fieldIndex("text")
    docs.mapPartitions { it =>
      cutBounded[Doc](it.flatMap { r =>
        if (r.isNullAt(uIdx) || r.isNullAt(tIdx)) None
        else Some(Doc(r.getString(uIdx),
          r.getString(tIdx).getBytes("UTF-8")))
      }, d => d.uri.length.toLong + d.body.length, maxShardBytes,
        buf => Row(writeWarcGz(buf), buf.length.toLong))
    }(E.row(shardSchema))
  }

  /** Gzip WARC shards → response rows: (target_uri, http_status,
    * body_text, n_bytes). warcinfo/request records are dropped — the
    * crawl-ingest projection every pipeline starts from. */
  def fromShards(shards: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("target_uri", StringType),
      StructField("http_status", IntegerType),
      StructField("body_text", StringType),
      StructField("n_bytes", LongType)))
    val sIdx = shards.schema.fieldIndex("shard")
    shards.mapPartitions { it =>
      it.flatMap { r =>
        readWarcGz(r.getAs[Array[Byte]](sIdx))
          .filter(_.warcType == "response")
          .map { rec =>
            val (status, body) = parseHttp(rec.content)
            Row(rec.targetUri, status, new String(body, "UTF-8"),
              body.length.toLong)
          }
      }
    }(E.row(schema))
  }
}
