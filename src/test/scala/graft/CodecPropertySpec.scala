package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.Multimodal.AudioCodec
import graft.store.{MongoAtlasStore, SearchHit}

/** Seeded-random property tests for the pure codecs (the repo's
  * property convention: scala.util.Random with fixed seeds, reproducible
  * without a scalatest-scalacheck bridge).
  *
  * These are the layers where a missed edge case is silent data loss at
  * corpus scale — one malformed string shouldn't cost a search result,
  * one odd sample count shouldn't corrupt an audio feature. */
class CodecPropertySpec extends AnyFunSuite with Matchers {

  test("JsonText escape/unescape round-trips arbitrary unicode strings") {
    val rnd = new scala.util.Random(20260812L)
    (1 to 500).foreach { _ =>
      val s = new String(Array.fill(rnd.nextInt(80)) {
        rnd.nextInt(4) match {
          case 0 => rnd.nextPrintableChar()
          case 1 => Seq('"', '\\', '\b', '\f', '\n', '\r', '\t')(rnd.nextInt(7))
          case 2 => rnd.nextInt(0x20).toChar             // raw controls
          case _ => (0x80 + rnd.nextInt(0x2000)).toChar  // non-ASCII BMP
        }
      })
      val escaped = graft.io.JsonText.escape(s)
      // escaped form is JSON-legal: no raw control chars survive
      escaped.forall(_ >= ' ') shouldBe true
      graft.io.JsonText.unescape(escaped) shouldBe s
    }
  }

  test("WAV codec round-trips arbitrary PCM signals bit-exactly") {
    val rnd = new scala.util.Random(42L)
    (1 to 50).foreach { _ =>
      val n = 1 + rnd.nextInt(2000) // odd lengths included
      val rate = Seq(8000, 16000, 22050, 44100)(rnd.nextInt(4))
      val samples = Array.fill(n)((rnd.nextInt(65536) - 32768).toShort)
      val (gotRate, gotSamples) =
        AudioCodec.decode(AudioCodec.encodeWav(samples, rate))
      gotRate shouldBe rate
      gotSamples shouldBe samples
    }
  }

  test("GIF video codec round-trips arbitrary constant-gray frame sequences") {
    import graft.operators.Multimodal.VideoCodec
    val rnd = new scala.util.Random(20260813L)
    (1 to 30).foreach { _ =>
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(20)
      val grays = Array.fill(1 + rnd.nextInt(6))(rnd.nextInt(256))
      val frames = grays.toSeq.map { g =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until h; x <- 0 until w)
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
        img
      }
      val got = VideoCodec.decodeFrames(VideoCodec.encodeGif(frames))
      got.length shouldBe grays.length // getNumImages(true) finds them all
      got.zip(grays).foreach { case (f, g) =>
        (f.width, f.height) shouldBe ((w, h))
        // a single-color frame IS its palette entry: decode is exact and
        // Rec.601 luminance of gray g is exactly g
        f.meanLum shouldBe g.toDouble
      }
    }
  }

  test("windowRms of a sine matches A/sqrt(2) over whole periods") {
    // a non-constant signal sanity-bound: 32 samples/period, 8 periods
    val a = 12000.0
    val samples = Array.tabulate(256)(i =>
      (a * math.sin(2 * math.Pi * i / 32)).toShort)
    val rms = AudioCodec.windowRms(samples, 256).head * 32768.0
    rms shouldBe (a / math.sqrt(2.0)) +- a * 0.01 // int16 rounding tolerance
  }

  test("Atlas document splitter survives randomly brace-laden chunk text") {
    val rnd = new scala.util.Random(7L)
    (1 to 200).foreach { _ =>
      val hits = (0 until 1 + rnd.nextInt(5)).map { i =>
        val chunk = new String(Array.fill(rnd.nextInt(40)) {
          Seq('{', '}', '[', ']', '"', '\\', 'a', ' ', ':' ,',')(rnd.nextInt(10))
        })
        SearchHit(s"doc$i", chunk, rnd.nextInt(1000) / 1000.0)
      }
      val json = hits.map(h =>
        s"""{"document_id":"${graft.io.JsonText.escape(h.document_id)}","chunks":"${graft.io.JsonText.escape(h.chunks)}","score":${h.score}}""")
        .mkString("""{"documents":[""", ",", """],"stats":{"n":1}}""")
      val (got, skipped) = MongoAtlasStore.parseSearchHitsCounting(json)
      skipped shouldBe 0
      got shouldBe hits
    }
  }

  test("demuxers and EXIF parser never throw on corrupted container bytes") {
    // the quarantine contract fuzz-tested: every byte parser in the
    // multimodal family must yield (possibly empty) results — never an
    // exception — on ARBITRARY bytes, including real containers with
    // random corruption and random truncation, which is exactly what a
    // 100 TB crawl corpus delivers. A task-killing throw on one bad
    // payload would fail a whole partition of good ones.
    import graft.operators.Multimodal
    import graft.operators.Multimodal.{AutoVideoDemux, GifVideoDemux,
      MjpegAviVideoDemux, MkvVideoDemux, Mp4VideoDemux, VideoCodec}
    val rnd = new scala.util.Random(20260814L)
    def gray(g: Int, w: Int, h: Int) = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x =>
        img.setRGB(x, y, (g << 16) | (g << 8) | g)))
      img
    }
    val frames = Seq(gray(30, 8, 8), gray(90, 8, 8), gray(150, 8, 8))
    val jpegBase = {
      val b = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(gray(70, 8, 8), "jpg", b)
      b.toByteArray
    }
    val seeds: Seq[Array[Byte]] = Seq(
      VideoCodec.encodeGif(frames),
      VideoCodec.encodeMjpegAvi(frames),
      VideoCodec.encodeMjpegMp4(frames),
      VideoCodec.encodeMjpegMkv(frames),
      Multimodal.ExifCodec.splice(jpegBase, "maker", "model", 3,
        "2020:01:01 00:00:00", littleEndian = true),
      Multimodal.ExifCodec.splice(jpegBase, "maker", "model", 3,
        "2020:01:01 00:00:00", littleEndian = false))
    val parsers: Seq[Array[Byte] => Any] = Seq(
      AutoVideoDemux.demuxFrames, GifVideoDemux.demuxFrames,
      MjpegAviVideoDemux.demuxFrames, Mp4VideoDemux.demuxFrames,
      MkvVideoDemux.demuxFrames, Multimodal.ExifCodec.parse)
    (1 to 300).foreach { _ =>
      val base = seeds(rnd.nextInt(seeds.length))
      val mutated = base.clone()
      // corrupt 1-8 random bytes, then truncate at a random point —
      // header fields, size declarations, and payload bytes all get hit
      (0 until 1 + rnd.nextInt(8)).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      val cut = java.util.Arrays.copyOf(mutated, 1 + rnd.nextInt(mutated.length))
      parsers.foreach { p =>
        noException should be thrownBy p(cut)
        noException should be thrownBy p(mutated)
      }
      // pure noise too
      noException should be thrownBy parsers.foreach(
        _(Array.fill[Byte](rnd.nextInt(200))(rnd.nextInt(256).toByte)))
    }
  }

  test("chunked transfer framing round-trips arbitrary payloads under random chunk splits; truncation salvages a prefix") {
    import graft.io.Warc
    val rnd = new scala.util.Random(20260816L)
    def frame(payload: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var pos = 0
      while (pos < payload.length) {
        val n = 1 + rnd.nextInt(math.min(40, payload.length - pos))
        val ext = if (rnd.nextBoolean()) ";x=" + rnd.nextInt(9) else ""
        out.write(f"$n%x$ext\r\n".getBytes("US-ASCII"))
        out.write(payload, pos, n)
        out.write("\r\n".getBytes("US-ASCII"))
        pos += n
      }
      out.write("0\r\n\r\n".getBytes("US-ASCII"))
      out.toByteArray
    }
    val head = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
      "Transfer-Encoding: chunked\r\n\r\n").getBytes("US-ASCII")
    (1 to 200).foreach { _ =>
      val payload = Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte)
      val wire = frame(payload)
      val (status, body) = Warc.parseHttp(head ++ wire)
      status shouldBe 200
      body.toSeq shouldBe payload.toSeq
      // a random cut anywhere in the wire bytes salvages a PREFIX of
      // the payload (whole chunks before the cut), never garbage and
      // never a throw
      val cut = rnd.nextInt(wire.length + 1)
      val (_, salvaged) = Warc.parseHttp(head ++ wire.take(cut))
      payload.take(salvaged.length).toSeq shouldBe salvaged.toSeq
    }
  }

  test("record-shard codec round-trips arbitrary uri/payload batches; Location headers stay head-safe under hostile values") {
    import graft.io.Warc
    val rnd = new scala.util.Random(777L)
    (1 to 40).foreach { _ =>
      val recs = (0 until rnd.nextInt(8)).map { i =>
        val uri = s"https://p$i.ex/" + rnd.alphanumeric.take(
          rnd.nextInt(20)).mkString
        val payload = Array.fill(rnd.nextInt(200))(
          rnd.nextInt(256).toByte)
        (uri, payload)
      }
      val back = Warc.readWarcGz(
        Warc.writeRecordShardGz(recs, "conversion", "text/plain"))
        .filter(_.warcType == "conversion")
      back.map(_.targetUri) shouldBe recs.map(_._1)
      back.map(_.content.toSeq) shouldBe recs.map(_._2.toSeq)
    }
    // hostile Location values: CRLF injection, controls, non-ASCII —
    // the read-back head NEVER tears and the location is ASCII-clean
    (1 to 100).foreach { _ =>
      val loc = new String(Array.fill(1 + rnd.nextInt(30)) {
        rnd.nextInt(5) match {
          case 0 => Seq('\r', '\n')(rnd.nextInt(2))
          case 1 => rnd.nextInt(0x20).toChar
          case 2 => (0x80 + rnd.nextInt(0x2000)).toChar
          case _ => rnd.nextPrintableChar()
        }
      })
      val body = s"b${rnd.nextInt(100)}".getBytes("UTF-8")
      val shard = Warc.writeWarcGz(Seq(Warc.Doc("https://h.ex/p", body,
        "text/html", 301, Some(loc))))
      val rec = Warc.readWarcGz(shard).find(_.warcType == "response").get
      val (status, head, got) = Warc.parseHttpFull(rec.content)
      status shouldBe 301
      got.toSeq shouldBe body.toSeq // the body never absorbs header junk
      val readLoc = Warc.httpHeader(head, "Location")
      readLoc.forall(c => c >= ' ' && c <= '~') shouldBe true
    }
  }
}

/** Seeded-random properties for the TFRecord container + tf.Example
  * codec: arbitrary payloads round-trip bit-exactly, and corruption
  * anywhere in a shard yields FEWER records, never a wrong one — the
  * contract that makes a CRC-framed format trustworthy at corpus
  * scale. */
class TfRecordPropertySpec extends org.scalatest.funsuite.AnyFunSuite
    with org.scalatest.matchers.should.Matchers {
  import graft.io.TfRecord

  test("frame/unframe round-trips arbitrary record batches bit-exactly") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 100).foreach { _ =>
      val recs = Seq.fill(rnd.nextInt(8)) {
        val n = rnd.nextInt(300) // includes empty records
        Array.fill(n)(rnd.nextInt(256).toByte)
      }
      TfRecord.unframe(TfRecord.frame(recs)).map(_.toSeq) shouldBe
        recs.map(_.toSeq)
    }
  }

  test("example/parseExample round-trips arbitrary ids, sources and payloads") {
    val rnd = new scala.util.Random(7L)
    (1 to 200).foreach { _ =>
      val id = rnd.nextLong()
      val src = new String(Array.fill(rnd.nextInt(40))(rnd.nextPrintableChar()))
      val data = Array.fill(rnd.nextInt(500))(rnd.nextInt(256).toByte)
      TfRecord.parseExample(TfRecord.example(id, src, data)) match {
        case Some((i, s, d)) =>
          i shouldBe id; s shouldBe src; d.toSeq shouldBe data.toSeq
        case None => fail(s"no parse for id=$id")
      }
    }
  }

  test("a single flipped byte anywhere yields a strict prefix of the records, never a corrupted record") {
    val rnd = new scala.util.Random(99L)
    val recs = Seq("first", "second", "third").map(_.getBytes("UTF-8"))
    val framed = TfRecord.frame(recs)
    (1 to 200).foreach { _ =>
      val pos = rnd.nextInt(framed.length)
      val corrupt = framed.clone()
      corrupt(pos) = (corrupt(pos) ^ (1 << rnd.nextInt(8))).toByte
      val got = TfRecord.unframe(corrupt).map(new String(_, "UTF-8"))
      // every surviving record is one of the originals, in order, from
      // the front: the walk stops at the first CRC/length violation
      got shouldBe recs.map(new String(_, "UTF-8")).take(got.length)
    }
  }
}
