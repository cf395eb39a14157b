package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.util.hashing.MurmurHash3

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns with a typed metadata
  * struct, and decode/feature steps run as partition-local batch maps.
  *
  * The image path is REAL: [[ImageCodec.decode]] runs javax.imageio (in
  * the JDK, fully offline) over PNG/JPEG/BMP/GIF payloads and extracts
  * width/height plus a downsampled luminance feature vector; undecodable
  * payloads degrade to (0, 0, zeros) instead of failing the job — at
  * corpus scale you quarantine those rows, not crash the stage. The video
  * path is real too for multi-frame GIF and runs behind the [[VideoDemux]]
  * seam (MP4/WebM = one deploy-time impl, like EmbeddingProvider);
  * [[sampleFrames]] remains the hash-level deterministic stand-in where
  * frame content is not needed.
  *
  * Scale: per-row maps, zero shuffle. Binary payloads dominate scan cost →
  * keep metadata in separate columns so metadata-only queries prune the
  * binary column entirely (columnar parquet reads skip it).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("content", BinaryType),
    StructField("media_type", StringType),     // "image" | "audio" | "video"
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType),
      StructField("content_hash", StringType),
      StructField("source", StringType))))))

  /** Wrap a text table into media rows (test harness: deterministic bytes
    * from text). Metadata derived with catalyst expressions only. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
              mediaType: String, sourceCol: String): DataFrame = {
    val bin = col(payloadCol).cast("binary")
    df.select(
      col(idCol).cast("long").as("media_id"),
      bin.as("content"),
      lit(mediaType).as("media_type"),
      struct(
        length(bin).cast("long").as("n_bytes"),   // length(binary) = octet count
        md5(bin).as("content_hash"),
        col(sourceCol).as("source")).as("meta"))
  }

  /** Real image codec on javax.imageio (JDK-bundled, offline-capable).
    *
    * decode: bytes → (width, height, features) where features is the mean
    * luminance (Rec. 601 weights, normalized to [0,1]) of `featureDim`
    * vertical strips — the cheap fixed-dim image summary a curation
    * pipeline buckets/near-dups on before a real vision model runs.
    * Undecodable or empty payloads yield (0, 0, zeros): a corrupt image in
    * a 100 TB corpus must surface as a filterable row, not a stage crash.
    *
    * encodePng: deterministic synthetic PNG whose pixels derive from a
    * seed — the test/harness generator (PNG is lossless, so decode
    * round-trips dims and pixel statistics exactly). */
  object ImageCodec extends Serializable {
    val featureDim = 8

    def decode(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
      if (bytes == null || bytes.isEmpty) return (0, 0, new Array[Float](featureDim))
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: java.io.IOException | _: RuntimeException => null }
      if (img == null) return (0, 0, new Array[Float](featureDim))
      val w = img.getWidth
      val h = img.getHeight
      val sums = new Array[Double](featureDim)
      val counts = new Array[Int](featureDim)
      // bulk row reads: per-pixel getRGB pays a color-model conversion
      // call per pixel — an order of magnitude slower on real megapixel
      // corpus images than one conversion per row into a buffer
      val rowBuf = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, rowBuf, 0, w)
        var x = 0
        while (x < w) {
          val rgb = rowBuf(x)
          val lum = ((rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000.0
          val bin = math.min(x * featureDim / w, featureDim - 1)
          sums(bin) += lum
          counts(bin) += 1
          x += 1
        }
        y += 1
      }
      val feats = Array.tabulate(featureDim)(i =>
        if (counts(i) == 0) 0f else (sums(i) / (counts(i) * 255.0)).toFloat)
      (w, h, feats)
    }

    /** Difference hash (dHash) — the standard perceptual fingerprint for
      * image NEAR-dup detection (the visual analog of simhash): decode,
      * bilinear-resize to 9×8 luminance, emit one bit per horizontal
      * neighbor pair (right brighter than left). Identical images hash
      * equal; small crops/recompressions differ in a few bits, so
      * bucketing on the hash (or its masked variants, as in
      * simhashNearDupPairs) finds visual duplicates without pixel
      * comparison. Returns 16 hex chars; null for undecodable payloads. */
    def dHash(bytes: Array[Byte]): String = {
      if (bytes == null || bytes.isEmpty) return null
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: java.io.IOException | _: RuntimeException => null }
      if (img == null) return null
      dHashImage(img)
    }

    /** dHash of an already-decoded frame — the entry point video demux
      * composes with ([[Multimodal.withVideoFrameDHash]]). */
    def dHashImage(img: java.awt.image.BufferedImage): String = {
      val small = new java.awt.image.BufferedImage(
        9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = small.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, 9, 8, null)
      } finally g.dispose()
      def lum(x: Int, y: Int): Int = {
        val rgb = small.getRGB(x, y)
        (rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 + (rgb & 0xff) * 114
      }
      var hash = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          hash = (hash << 1) | (if (lum(x + 1, y) > lum(x, y)) 1L else 0L)
          x += 1
        }
        y += 1
      }
      f"$hash%016x"
    }

    /** Real resize: decode → Graphics2D bilinear scaled draw → PNG
      * re-encode. Returns null for undecodable payloads (same
      * quarantine-don't-crash policy as decode — callers surface 0×0). */
    def resize(bytes: Array[Byte], width: Int, height: Int): Array[Byte] = {
      if (bytes == null || bytes.isEmpty) return null
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: java.io.IOException | _: RuntimeException => null }
      if (img == null) return null
      val out = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, width, height, null)
      } finally g.dispose()
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", baos)
      baos.toByteArray
    }

    def encodePng(seed: Long, width: Int, height: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val g = MurmurHash3.productHash((seed, x, y)) & 0xff
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
  }

  /** Decode stage: appends (width, height, features) via a partition-local
    * batch map — the physical shape a codec/GPU step needs (amortize
    * per-batch setup, stay off the driver). */
  def withDecodedFeatures(media: DataFrame, batchSize: Int = 32): DataFrame = {
    val outSchema = media.schema
      .add(StructField("width", IntegerType))
      .add(StructField("height", IntegerType))
      .add(StructField("features", ArrayType(FloatType)))
    val binIdx = media.schema.fieldIndex("content")
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        // batch boundary: a GPU codec would take all `rows` in one call
        rows.map { r =>
          val (w, h, f) = ImageCodec.decode(r.getAs[Array[Byte]](binIdx))
          Row.fromSeq(r.toSeq ++ Seq(w, h, f.toSeq))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Harness generator: media rows whose `content` is a REAL synthetic PNG
    * with dims derived arithmetically from the id — so a downstream decode
    * is oracle-checkable (the oracle recomputes the dims; a broken decode
    * yields 0×0 and hash-mismatches). Runs as a partition-local map. */
  def withSyntheticImages(df: DataFrame, idCol: String, sourceCol: String): DataFrame = {
    val ids = df.select(col(idCol).cast("long").as("media_id"),
      col(sourceCol).cast("string").as("source"))
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("content", BinaryType),
      StructField("media_type", StringType),
      StructField("source", StringType)))
    val encoded = ids.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val png = ImageCodec.encodePng(id, syntheticWidth(id), syntheticHeight(id))
        Row(id, png, "image", r.getString(1))
      }
    }(Encoders.row(schema))
    encoded.select(
      col("media_id"), col("content"), col("media_type"),
      struct(
        length(col("content")).cast("long").as("n_bytes"),
        md5(col("content")).as("content_hash"),
        col("source").as("source")).as("meta"))
  }

  /** Synthetic image dims: arithmetic in the id so an external oracle can
    * recompute them without decoding. */
  def syntheticWidth(id: Long): Int = (8 + math.floorMod(id, 9)).toInt
  def syntheticHeight(id: Long): Int = (8 + math.floorMod(id / 9, 9)).toInt

  /** Gradient-image harness for the perceptual-hash oracle: even ids get
    * a strictly ASCENDING left→right luminance ramp (every dHash bit 1),
    * odd ids a DESCENDING one (every bit 0) — a bilinear downscale of a
    * monotonic ramp stays monotonic, so the expected hash is a constant
    * an external oracle states without decoding. */
  def withGradientImages(df: DataFrame, idCol: String, sourceCol: String): DataFrame = {
    val ids = df.select(col(idCol).cast("long").as("media_id"),
      col(sourceCol).cast("string").as("source"))
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("content", BinaryType),
      StructField("media_type", StringType),
      StructField("source", StringType)))
    ids.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val (w, h) = (32, 16)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = (x * 255) / (w - 1)
            val g = if (id % 2 == 0) v else 255 - v
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
            x += 1
          }
          y += 1
        }
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", out)
        Row(id, out.toByteArray, "image", r.getString(1))
      }
    }(Encoders.row(schema))
  }

  /** EXIF-law harness: media rows whose `content` is a REAL JPEG with a
    * spec-correct APP1 EXIF segment built from arithmetic laws — make
    * "maker"+(id%5), model "model"+(id%7), orientation 1+(id%8),
    * DateTimeOriginal "2020:01:DD 03:04:SS" with DD=1+id%28, SS=id%60 —
    * so an external oracle states every extracted field without
    * touching a byte. EVEN ids write the TIFF little-endian ("II"),
    * ODD ids big-endian ("MM"): both in-the-wild byte orders are on
    * the round-trip path, not just the writer's favorite. */
  def withSyntheticExifImages(df: DataFrame, idCol: String,
                              sourceCol: String): DataFrame = {
    val ids = df.select(col(idCol).cast("long").as("media_id"),
      col(sourceCol).cast("string").as("source"))
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("content", BinaryType),
      StructField("media_type", StringType),
      StructField("source", StringType)))
    val encoded = ids.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val img = new java.awt.image.BufferedImage(
          syntheticWidth(id), syntheticHeight(id),
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", baos)
        val jpeg = ExifCodec.splice(baos.toByteArray,
          s"maker${id % 5}", s"model${id % 7}", (1 + id % 8).toInt,
          f"2020:01:${1 + id % 28}%02d 03:04:${id % 60}%02d",
          littleEndian = id % 2 == 0)
        Row(id, jpeg, "image", r.getString(1))
      }
    }(Encoders.row(schema))
    encoded.select(
      col("media_id"), col("content"), col("media_type"),
      struct(
        length(col("content")).cast("long").as("n_bytes"),
        md5(col("content")).as("content_hash"),
        col("source").as("source")).as("meta"))
  }

  /** Perceptual-hash stage: appends the 16-hex dHash via the standard
    * batched partition map — bucketing on it (exact or masked) is the
    * image near-dup plan. */
  def withImageDHash(media: DataFrame, batchSize: Int = 32): DataFrame = {
    val outSchema = media.schema.add(StructField("dhash", StringType))
    val binIdx = media.schema.fieldIndex("content")
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        rows.map { r =>
          Row.fromSeq(r.toSeq :+ ImageCodec.dHash(r.getAs[Array[Byte]](binIdx)))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** REAL resize stage: decode → bilinear scale → PNG re-encode as a
    * partition-local batch map (the same physical shape as
    * [[withDecodedFeatures]] — a GPU codec takes the whole batch in one
    * call). Appends the resized payload plus its actual decoded dims:
    * `resized_width`/`resized_height` are re-decoded FROM the new payload
    * (not echoed constants), so a broken codec yields 0×0 and fails the
    * oracle; undecodable inputs quarantine as (null payload, 0, 0). */
  def withResizedContent(media: DataFrame, width: Int, height: Int,
                         batchSize: Int = 32): DataFrame = {
    val outSchema = media.schema
      .add(StructField("resized_content", BinaryType))
      .add(StructField("resized_width", IntegerType))
      .add(StructField("resized_height", IntegerType))
    val binIdx = media.schema.fieldIndex("content")
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        rows.map { r =>
          val resized = ImageCodec.resize(r.getAs[Array[Byte]](binIdx), width, height)
          val (w, h, _) = ImageCodec.decode(resized)
          Row.fromSeq(r.toSeq ++ Seq(resized, w, h))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Resize metadata fast path (column expressions only): target dims and
    * a hash DERIVED from (content hash, dims) — no decode, binary column
    * pruned from the scan. Use for planning/bookkeeping passes where the
    * payload itself is not needed; [[withResizedContent]] is the real
    * codec path. */
  def withResized(media: DataFrame, width: Int, height: Int): DataFrame =
    media
      .withColumn("resized_width", lit(width))
      .withColumn("resized_height", lit(height))
      .withColumn("resized_hash",
        md5(concat(col("meta.content_hash"),
          lit(s":${width}x$height"))))

  /** EXIF metadata codec, pure JDK byte walking — the capture-device /
    * capture-time dimension a photo corpus partitions, dedups, and
    * time-filters on before any pixel is decoded. JPEG is a marker
    * stream (FF xx + big-endian length); EXIF lives in an APP1 segment
    * ("Exif\0\0" + a TIFF structure whose own byte order is declared
    * in-band: "II" little / "MM" big — both are in the wild and both
    * parse here). IFD0 carries Make(0x010F)/Model(0x0110)/
    * Orientation(0x0112) and the Exif-IFD pointer (0x8769) whose IFD
    * carries DateTimeOriginal(0x9003). ASCII values ≤4 bytes are
    * inline in the 4-byte value field, longer ones live at a TIFF
    * offset — both forms handled. Corpus policy as every codec here:
    * absent APP1, non-JPEG payloads, truncated segments, or
    * out-of-bounds offsets yield nulls (a filterable row), never a
    * stage crash. */
  object ExifCodec extends Serializable {
    final case class Exif(make: String, model: String,
                          orientation: Integer, dateTimeOriginal: String)
    private val empty = Exif(null, null, null, null)

    def parse(bytes: Array[Byte]): Exif = {
      if (bytes == null || bytes.length < 4) return empty
      if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return empty
      var pos = 2
      while (pos + 4 <= bytes.length && (bytes(pos) & 0xff) == 0xff) {
        val marker = bytes(pos + 1) & 0xff
        if (marker == 0xd8 || marker == 0x01 ||
            (marker >= 0xd0 && marker <= 0xd7)) pos += 2 // standalone
        else if (marker == 0xda) return empty // entropy data: no APP1 seen
        else {
          val len = ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
          if (len < 2 || pos + 2 + len > bytes.length) return empty
          if (marker == 0xe1 && len >= 8 &&
              bytes(pos + 4) == 'E' && bytes(pos + 5) == 'x' &&
              bytes(pos + 6) == 'i' && bytes(pos + 7) == 'f' &&
              bytes(pos + 8) == 0 && bytes(pos + 9) == 0)
            return parseTiff(bytes, pos + 10, pos + 2 + len)
          pos += 2 + len
        }
      }
      empty
    }

    private def parseTiff(bytes: Array[Byte], tiff: Int, end: Int): Exif = {
      if (tiff + 8 > end) return empty
      val little = bytes(tiff) == 'I' && bytes(tiff + 1) == 'I'
      val big = bytes(tiff) == 'M' && bytes(tiff + 1) == 'M'
      if (!little && !big) return empty
      def r16(o: Int): Int =
        if (o < tiff || o + 2 > end) -1
        else if (little) (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
        else ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
      def r32(o: Int): Long =
        if (o < tiff || o + 4 > end) -1L
        else if (little)
          (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
            ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
        else
          ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
            ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
      if (r16(tiff + 2) != 42) return empty
      def ascii(entry: Int): String = {
        val n = r32(entry + 4)
        if (n <= 0 || n > (1 << 16)) return null
        val at = if (n <= 4) entry + 8 else tiff + r32(entry + 8).toInt
        if (at < tiff || at + n > end) return null
        val raw = new String(bytes, at, n.toInt, "US-ASCII")
        val cut = raw.indexOf(0.toChar)
        if (cut >= 0) raw.substring(0, cut) else raw
      }
      // one IFD walk, shared by IFD0 and the Exif sub-IFD
      def walk(ifdOff: Int, f: (Int, Int) => Unit): Unit = {
        val n = r16(ifdOff)
        if (n < 0 || n > 512) return // bounded: a real IFD has dozens
        var i = 0
        while (i < n) {
          val e = ifdOff + 2 + 12 * i
          if (e + 12 <= end) f(r16(e), e)
          i += 1
        }
      }
      var make: String = null; var model: String = null
      var orient: Integer = null; var dto: String = null
      val ifd0 = tiff + r32(tiff + 4).toInt
      walk(ifd0, (tag, e) => tag match {
        case 0x010f => make = ascii(e)
        case 0x0110 => model = ascii(e)
        case 0x0112 =>
          // SHORT lives in the leading 2 bytes of the value field
          val v = r16(e + 8); if (v > 0) orient = Integer.valueOf(v)
        case 0x8769 =>
          val sub = r32(e + 8)
          if (sub > 0) walk(tiff + sub.toInt, (t2, e2) =>
            if (t2 == 0x9003) dto = ascii(e2))
        case _ => ()
      })
      Exif(make, model, orient, dto)
    }

    /** Harness writer: splice a spec-correct APP1 EXIF segment (TIFF in
      * the requested byte order, IFD0 Make/Model/Orientation + Exif-IFD
      * DateTimeOriginal, long ASCII values in the data area) into an
      * existing JPEG right after SOI — proof the layout [[parse]] walks
      * is the real one, in BOTH endiannesses. */
    def splice(jpeg: Array[Byte], make: String, model: String,
               orientation: Int, dateTimeOriginal: String,
               littleEndian: Boolean): Array[Byte] = {
      require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff &&
        (jpeg(1) & 0xff) == 0xd8, "splice: not a JPEG")
      val mk = make.getBytes("US-ASCII") :+ 0.toByte
      val md = model.getBytes("US-ASCII") :+ 0.toByte
      val dt = {
        val b = dateTimeOriginal.getBytes("US-ASCII")
        java.util.Arrays.copyOf(b, 20) // EXIF datetimes are 20 bytes NUL-padded
      }
      val ifd0End = 8 + 2 + 4 * 12 + 4     // header + 4 entries
      val exifEnd = ifd0End + 2 + 12 + 4   // 1 entry
      val mkOff = exifEnd
      val mdOff = mkOff + mk.length
      val dtOff = mdOff + md.length
      val tiff = new Array[Byte](dtOff + dt.length)
      var p = 0
      def w8(v: Int): Unit = { tiff(p) = v.toByte; p += 1 }
      def w16(v: Int): Unit =
        if (littleEndian) { w8(v & 0xff); w8(v >> 8) }
        else { w8(v >> 8); w8(v & 0xff) }
      def w32(v: Int): Unit =
        if (littleEndian) { w16(v & 0xffff); w16(v >>> 16) }
        else { w16(v >>> 16); w16(v & 0xffff) }
      def entry(tag: Int, tpe: Int, count: Int)(value: => Unit): Unit = {
        w16(tag); w16(tpe); w32(count)
        val before = p; value; while (p < before + 4) w8(0)
      }
      // ASCII values ≤4 bytes live INLINE in the value field (TIFF
      // spec), longer ones at an offset into the data area — emit
      // whichever the length dictates so both parser paths see real
      // layouts
      def asciiEntry(tag: Int, data: Array[Byte], off: Int): Unit =
        entry(tag, 2, data.length)(
          if (data.length <= 4) data.foreach(b => w8(b & 0xff))
          else w32(off))
      if (littleEndian) { w8('I'); w8('I') } else { w8('M'); w8('M') }
      w16(42); w32(8)
      w16(4) // IFD0 entry count (ascending tag order, per spec)
      asciiEntry(0x010f, mk, mkOff)
      asciiEntry(0x0110, md, mdOff)
      entry(0x0112, 3, 1)(w16(orientation))
      entry(0x8769, 4, 1)(w32(ifd0End))
      w32(0) // next IFD
      w16(1) // Exif IFD
      entry(0x9003, 2, 20)(w32(dtOff))
      w32(0)
      System.arraycopy(mk, 0, tiff, mkOff, mk.length)
      System.arraycopy(md, 0, tiff, mdOff, md.length)
      System.arraycopy(dt, 0, tiff, dtOff, dt.length)
      val payload = ("Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0)) ++ tiff
      val seg = java.nio.ByteBuffer.allocate(4 + payload.length)
      seg.put(0xff.toByte).put(0xe1.toByte)
        .putShort((payload.length + 2).toShort).put(payload)
      jpeg.take(2) ++ seg.array() ++ jpeg.drop(2)
    }
  }

  /** EXIF extraction stage: batched partition-local map appending
    * exif_make / exif_model / exif_orientation / exif_datetime —
    * nulls for payloads without parseable EXIF. Zero shuffle. */
  def withExifMetadata(media: DataFrame, batchSize: Int = 32): DataFrame = {
    val outSchema = media.schema
      .add(StructField("exif_make", StringType))
      .add(StructField("exif_model", StringType))
      .add(StructField("exif_orientation", IntegerType))
      .add(StructField("exif_datetime", StringType))
    val binIdx = media.schema.fieldIndex("content")
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        rows.map { r =>
          val e = ExifCodec.parse(r.getAs[Array[Byte]](binIdx))
          Row.fromSeq(r.toSeq ++ Seq(e.make, e.model, e.orientation,
            e.dateTimeOriginal))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** EXIF-orientation normalization — the standard first pixel op on a
    * photo corpus: cameras store the sensor raster plus an Orientation
    * tag, so two visually-identical photos can be byte-rotated copies;
    * perceptual hashing, resizing, or any vision model needs the
    * upright raster. [[normalizeOrientation]] applies the EXIF 1-8
    * transform (identity, mirrors, 90/180/270 rotations, transposes) by
    * exact pixel mapping; [[withOrientationNormalized]] composes the
    * metadata walk + decode + transform + re-encode as the standard
    * batched partition map, re-decoding the output dims (a broken
    * transform yields wrong dims and fails the oracle). Rows without
    * parseable EXIF pass through unrotated with orientation NULL —
    * quarantine, not a crash. */
  def normalizeOrientation(img: java.awt.image.BufferedImage,
                           orientation: Int): java.awt.image.BufferedImage = {
    if (orientation <= 1 || orientation > 8) return img
    val w = img.getWidth; val h = img.getHeight
    val swap = orientation >= 5
    val out = new java.awt.image.BufferedImage(
      if (swap) h else w, if (swap) w else h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // (tx, ty) = where source pixel (x, y) lands in the upright
        // image, per the EXIF orientation definitions
        val (tx, ty) = orientation match {
          case 2 => (w - 1 - x, y)             // mirror horizontal
          case 3 => (w - 1 - x, h - 1 - y)     // rotate 180
          case 4 => (x, h - 1 - y)             // mirror vertical
          case 5 => (y, x)                     // transpose
          case 6 => (h - 1 - y, x)             // rotate 90 CW
          case 7 => (h - 1 - y, w - 1 - x)     // transverse
          case _ => (y, w - 1 - x)             // 8: rotate 270 CW
        }
        out.setRGB(tx, ty, img.getRGB(x, y))
        x += 1
      }
      y += 1
    }
    out
  }

  def withOrientationNormalized(media: DataFrame,
                                batchSize: Int = 32): DataFrame = {
    val outSchema = media.schema
      .add(StructField("norm_content", BinaryType))
      .add(StructField("norm_width", IntegerType))
      .add(StructField("norm_height", IntegerType))
      .add(StructField("applied_orientation", IntegerType))
    val binIdx = media.schema.fieldIndex("content")
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](binIdx)
          val exif = ExifCodec.parse(bytes)
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: java.io.IOException | _: RuntimeException => null }
          if (img == null)
            Row.fromSeq(r.toSeq ++ Seq(null, 0, 0, exif.orientation))
          else {
            val upright = normalizeOrientation(img,
              if (exif.orientation == null) 1 else exif.orientation.intValue())
            val baos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(upright, "jpg", baos)
            val norm = baos.toByteArray
            // dims re-decoded FROM the output payload, not echoed
            val (nw, nh, _) = ImageCodec.decode(norm)
            Row.fromSeq(r.toSeq ++ Seq(norm, nw, nh, exif.orientation))
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Real audio codec on javax.sound.sampled (JDK-bundled, offline):
    * 16-bit signed little-endian mono PCM in a WAV container — the
    * completion of the image/audio/video modality triad (image decode is
    * real, video demux has no JDK parser and stays a stub).
    *
    * decode: WAV bytes → (sampleRate, samples). Undecodable payloads
    * yield (0, empty) — quarantine, don't crash, same as images.
    * windowRms: per-window root-mean-square normalized to [0,1] by the
    * int16 range — the cheap fixed-cost energy profile a curation
    * pipeline filters silence/clipping on before a real audio model. */
  object AudioCodec extends Serializable {

    def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val pcm = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        pcm(2 * i) = (samples(i) & 0xff).toByte
        pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRate.toFloat, 16, 1, true, false) // 16-bit signed LE mono
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }

    def decode(bytes: Array[Byte]): (Int, Array[Short]) = {
      if (bytes == null || bytes.isEmpty) return (0, Array.empty)
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = ais.getFormat
        // only the profile we write: 16-bit mono PCM (a real corpus run
        // would transcode here; anything else quarantines)
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1)
          return (0, Array.empty)
        val pcm = ais.readAllBytes()
        val n = pcm.length / 2
        val samples = new Array[Short](n)
        var i = 0
        if (fmt.isBigEndian)
          while (i < n) {
            samples(i) = (((pcm(2 * i) & 0xff) << 8) | (pcm(2 * i + 1) & 0xff)).toShort
            i += 1
          }
        else
          while (i < n) {
            samples(i) = (((pcm(2 * i + 1) & 0xff) << 8) | (pcm(2 * i) & 0xff)).toShort
            i += 1
          }
        (fmt.getSampleRate.round, samples)
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException |
             _: java.io.IOException | _: RuntimeException => (0, Array.empty)
      }
    }

    /** RMS per `windowSize`-sample window, normalized by 32768 → [0,1].
      * Exact for int16 input: squares stay under 2^53, so a constant
      * window of value v yields exactly v/32768. */
    def windowRms(samples: Array[Short], windowSize: Int): Array[Double] = {
      require(windowSize > 0, "windowSize must be positive")
      samples.grouped(windowSize).map { w =>
        var sum = 0.0
        var i = 0
        while (i < w.length) { sum += w(i).toDouble * w(i).toDouble; i += 1 }
        math.sqrt(sum / w.length) / 32768.0
      }.toArray
    }

    /** Radix-2 iterative FFT magnitudes of the first `n` samples
      * (zero-padded; n must be a power of two): |X[0..n/2)|. The real
      * spectral front-end for audio fingerprinting/dominant-frequency
      * curation gates — pure JVM, no DSP dependency. */
    def fftMagnitudes(samples: Array[Short], n: Int): Array[Double] = {
      require(n > 0 && (n & (n - 1)) == 0, s"n must be a power of two, got $n")
      val re = new Array[Double](n)
      val im = new Array[Double](n)
      var i = 0
      val lim = math.min(n, samples.length)
      while (i < lim) { re(i) = samples(i).toDouble; i += 1 }
      // bit-reversal permutation
      var j = 0
      var k = 1
      while (k < n) {
        var bit = n >> 1
        while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
        j |= bit
        if (k < j) {
          val tr = re(k); re(k) = re(j); re(j) = tr
          val ti = im(k); im(k) = im(j); im(j) = ti
        }
        k += 1
      }
      var len = 2
      while (len <= n) {
        val ang = -2.0 * math.Pi / len
        val wr = math.cos(ang)
        val wi = math.sin(ang)
        var s = 0
        while (s < n) {
          var cr = 1.0; var ci = 0.0
          val half = len >> 1
          var t = 0
          while (t < half) {
            val ur = re(s + t); val ui = im(s + t)
            val xr = re(s + t + half); val xi = im(s + t + half)
            val vr = xr * cr - xi * ci
            val vi = xr * ci + xi * cr
            re(s + t) = ur + vr; im(s + t) = ui + vi
            re(s + t + half) = ur - vr; im(s + t + half) = ui - vi
            val ncr = cr * wr - ci * wi
            ci = cr * wi + ci * wr
            cr = ncr
            t += 1
          }
          s += len
        }
        len <<= 1
      }
      Array.tabulate(n >> 1)(b => math.hypot(re(b), im(b)))
    }

    /** Dominant NON-DC frequency bin of the first `n` samples: argmax of
      * the FFT magnitude over bins 1..n/2-1, ties to the lower bin; -1
      * (the quarantine sentinel) when the input can't support the
      * analysis — empty/NULL payloads, fewer than `n` samples (a
      * zero-padded window would leak energy across bins, breaking the
      * exact-bin/no-leakage law real audio is gated on; callers that
      * WANT padded analysis pad explicitly), or n ≤ 2 (the n/2-bin
      * spectrum has no non-DC bin to report). An exact-bin tone
      * (frequency = bin·rate/n) over a full window has zero spectral
      * leakage, so the argmax is mathematically exact — the
      * synthetic-tone oracle law. */
    def dominantBin(samples: Array[Short], n: Int): Int = {
      if (samples == null || samples.length < n || n <= 2) return -1
      val mags = fftMagnitudes(samples, n)
      if (mags.length < 2) return -1
      var best = 1
      var b = 2
      while (b < mags.length) {
        if (mags(b) > mags(best)) best = b
        b += 1
      }
      best
    }
  }

  /** Synthetic-audio harness constants + amplitude law: window k of doc
    * `id` holds the CONSTANT sample value (id·7919 + k·104729) mod 32768,
    * so the decoded per-window RMS is exactly that value / 32768 — plain
    * arithmetic an external oracle recomputes without touching WAV bytes
    * (a broken codec path yields 0 and hash-mismatches). */
  val audioSampleRate = 8000
  val audioWindowSize = 256
  val audioWindows = 4
  def audioAmplitude(id: Long, window: Int): Short =
    math.floorMod(id * 7919L + window * 104729L, 32768L).toShort

  /** Harness generator: media rows whose `content` is a REAL WAV built
    * from the amplitude law above. Partition-local map, no shuffle. */
  def withSyntheticAudio(df: DataFrame, idCol: String, sourceCol: String): DataFrame = {
    val ids = df.select(col(idCol).cast("long").as("media_id"),
      col(sourceCol).cast("string").as("source"))
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("content", BinaryType),
      StructField("media_type", StringType),
      StructField("source", StringType)))
    val encoded = ids.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val samples = Array.tabulate(audioWindows * audioWindowSize)(i =>
          audioAmplitude(id, i / audioWindowSize))
        Row(id, AudioCodec.encodeWav(samples, audioSampleRate), "audio", r.getString(1))
      }
    }(Encoders.row(schema))
    encoded.select(
      col("media_id"), col("content"), col("media_type"),
      struct(
        length(col("content")).cast("long").as("n_bytes"),
        md5(col("content")).as("content_hash"),
        col("source").as("source")).as("meta"))
  }

  /** Synthetic-tone harness law: doc `id` is a pure sine at EXACT FFT
    * bin `3 + id mod 40` of a [[toneFftSize]]-sample window — an
    * exact-bin tone has zero spectral leakage, so the dominant bin is
    * the law itself, recomputable by an external oracle as plain
    * arithmetic (a broken FFT or decode argmaxes elsewhere and
    * hash-mismatches). Amplitude 12000 keeps int16 headroom. */
  val toneFftSize = 1024
  def toneBin(id: Long): Int = (3 + math.floorMod(id, 40L)).toInt

  /** Harness generator: media rows whose `content` is a REAL WAV pure
    * tone per the law above. Partition-local map, no shuffle. */
  def withSyntheticTones(df: DataFrame, idCol: String, sourceCol: String): DataFrame = {
    val ids = df.select(col(idCol).cast("long").as("media_id"),
      col(sourceCol).cast("string").as("source"))
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("content", BinaryType),
      StructField("media_type", StringType),
      StructField("source", StringType)))
    val encoded = ids.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bin = toneBin(id)
        val samples = Array.tabulate(toneFftSize)(i =>
          math.round(12000.0 *
            math.sin(2.0 * math.Pi * bin * i / toneFftSize)).toShort)
        Row(id, AudioCodec.encodeWav(samples, audioSampleRate), "audio",
          r.getString(1))
      }
    }(Encoders.row(schema))
    encoded.select(
      col("media_id"), col("content"), col("media_type"),
      struct(
        length(col("content")).cast("long").as("n_bytes"),
        md5(col("content")).as("content_hash"),
        col("source").as("source")).as("meta"))
  }

  /** Multi-window tone audio for the acoustic-fingerprint oracle: the
    * WAV holds `3 + id % 2` consecutive [[toneFftSize]]-sample windows,
    * window w a pure tone at exact bin `3 + (id % 5 + w) % 40` — so the
    * per-window dominant-bin SEQUENCE follows an arithmetic law, and
    * audios sharing (id % 5, id % 2) are acoustic duplicates: the
    * harness for landmark-style fingerprint dedup (same shape as the
    * shot/gradient video harnesses). */
  def withToneSequenceAudio(df: DataFrame, idCol: String,
                            sourceCol: String): DataFrame = {
    val ids = df.select(col(idCol).cast("long").as("media_id"),
      col(sourceCol).cast("string").as("source"))
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("content", BinaryType),
      StructField("media_type", StringType),
      StructField("source", StringType)))
    val encoded = ids.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val nw = (3 + math.floorMod(id, 2L)).toInt
        val samples = Array.tabulate(nw * toneFftSize) { i =>
          val w = i / toneFftSize
          val j = i % toneFftSize
          val bin = 3 + (math.floorMod(id, 5L).toInt + w) % 40
          math.round(12000.0 *
            math.sin(2.0 * math.Pi * bin * j / toneFftSize)).toShort
        }
        Row(id, AudioCodec.encodeWav(samples, audioSampleRate), "audio",
          r.getString(1))
      }
    }(Encoders.row(schema))
    encoded.select(
      col("media_id"), col("content"), col("media_type"),
      struct(
        length(col("content")).cast("long").as("n_bytes"),
        md5(col("content")).as("content_hash"),
        col("source").as("source")).as("meta"))
  }

  /** Acoustic-fingerprint primitive: REAL WAV decode + one radix-2 FFT
    * PER `n`-sample window, one row per (media, window, dominant bin) —
    * the landmark sequence audio dedup buckets on (the per-window
    * analog of [[withVideoFrameDHash]]'s per-frame hashes; a signature
    * over the ordered bin sequence groups re-encodes of the same
    * recording with one equi-shuffle and no waveform comparison).
    * Trailing samples short of a full window are not analyzed
    * (windowing is explicit, never implicit zero-padding — the
    * [[AudioCodec.dominantBin]] quarantine contract). */
  def withAudioWindowBins(media: DataFrame, n: Int = toneFftSize,
                          batchSize: Int = 32): DataFrame = {
    val audio = media.filter(col("media_type") === "audio")
    val outSchema = media.schema
      .add(StructField("window_idx", IntegerType))
      .add(StructField("bin", IntegerType))
    val binIdx = media.schema.fieldIndex("content")
    audio.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        rows.flatMap { r =>
          val (_, samples) = AudioCodec.decode(r.getAs[Array[Byte]](binIdx))
          (0 until samples.length / n).map { w =>
            val slice = java.util.Arrays.copyOfRange(samples, w * n, (w + 1) * n)
            Row.fromSeq(r.toSeq ++
              Seq[Any](w, AudioCodec.dominantBin(slice, n)))
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Dominant-frequency stage: appends (peak_bin, peak_hz) from a real
    * WAV decode + FFT over the first [[toneFftSize]] samples — the
    * spectral curation gate (tone/silence/narrowband detection) in the
    * same partition-local batch-map shape as the other media stages.
    * peak_hz = bin·rate/n; with the 8000/1024 defaults the quotient is
    * exactly representable, so the column is hash-stable. */
  def withDominantFreq(media: DataFrame, n: Int = toneFftSize,
                       batchSize: Int = 32): DataFrame = {
    val outSchema = media.schema
      .add(StructField("peak_bin", IntegerType))
      .add(StructField("peak_hz", DoubleType))
    val binIdx = media.schema.fieldIndex("content")
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        rows.map { r =>
          val (rate, samples) = AudioCodec.decode(r.getAs[Array[Byte]](binIdx))
          val peak = AudioCodec.dominantBin(samples, n)
          val hz = if (peak < 0) -1.0 else peak.toDouble * rate / n
          // Seq[Any]: Seq(peak, hz) would numeric-widen the Int to Double
          Row.fromSeq(r.toSeq ++ Seq[Any](peak, hz))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Audio feature stage: appends (sample_rate, n_samples, rms_windows)
    * via the same partition-local batch map shape as the image stages —
    * real javax.sound decode per row, zero shuffle. */
  def withAudioFeatures(media: DataFrame, windowSize: Int = audioWindowSize,
                        batchSize: Int = 32): DataFrame = {
    val outSchema = media.schema
      .add(StructField("sample_rate", IntegerType))
      .add(StructField("n_samples", IntegerType))
      .add(StructField("rms_windows", ArrayType(DoubleType)))
    val binIdx = media.schema.fieldIndex("content")
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        rows.map { r =>
          val (rate, samples) = AudioCodec.decode(r.getAs[Array[Byte]](binIdx))
          Row.fromSeq(r.toSeq ++ Seq(rate, samples.length,
            AudioCodec.windowRms(samples, windowSize).toSeq))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** The video-demux seam — the deploy-time plug-in point for container
    * support, mirroring [[graft.providers.EmbeddingProvider]]: the frame
    * stages ([[withVideoFrames]], [[withVideoFrameDHash]]) only ever see
    * this trait, so MP4/WebM support is one `VideoDemux` impl backed by a
    * real demuxer lib (JavaCV/ffmpeg) swapped in at the call site — no
    * engine change. Contract: container bytes → decoded frames in
    * container order; undecodable payloads yield zero frames (quarantine,
    * don't crash — the corpus policy everywhere in this file). */
  trait VideoDemux extends Serializable {
    def demuxFrames(bytes: Array[Byte]): Array[java.awt.image.BufferedImage]
  }

  /** Real JDK demux: javax.imageio's image-sequence API over multi-frame
    * GIF — the one video container the JDK reads and writes without
    * external codecs, so it carries the build's real decode path.
    * `getNumImages(allowSearch=true)` scans the container for the frame
    * count, `read(i)` decodes each frame. */
  object GifVideoDemux extends VideoDemux {
    override def demuxFrames(bytes: Array[Byte]): Array[java.awt.image.BufferedImage] = {
      if (bytes == null || bytes.isEmpty) return Array.empty
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return Array.empty
        val reader = readers.next()
        try {
          // seekForwardOnly=false: getNumImages(true) must scan backward
          reader.setInput(iis, false, true)
          val n = reader.getNumImages(true)
          Array.tabulate(n)(reader.read)
        } finally reader.dispose()
      } catch {
        case _: java.io.IOException | _: RuntimeException => Array.empty
      }
    }
  }

  /** Quarantine demux for containers this offline build has no codec for
    * (MP4/WebM): every payload yields zero frames, so mistyped or
    * unsupported videos surface as frameless rows instead of wrong data.
    * A deployment with real codecs replaces this (and/or GifVideoDemux)
    * with a JavaCV-backed impl; [[sampleFrames]] is the hash-level
    * deterministic stand-in where frame CONTENT is not needed. */
  object UnsupportedVideoDemux extends VideoDemux {
    override def demuxFrames(bytes: Array[Byte]): Array[java.awt.image.BufferedImage] =
      Array.empty
  }

  /** Real MJPEG-in-AVI demux, pure JDK: AVI is a RIFF container and each
    * MJPEG frame chunk is a standalone JPEG, so walking the chunk tree
    * and handing `..dc`/`..db` payloads to ImageIO decodes the second
    * real video container (the format camera firmware and OpenCV's MJPG
    * writer emit) with no external codec. Follows the corpus policy:
    * malformed RIFF structure or an undecodable frame payload yields
    * only the frames that did decode — zero for garbage input. */
  object MjpegAviVideoDemux extends VideoDemux {
    override def demuxFrames(bytes: Array[Byte]): Array[java.awt.image.BufferedImage] = {
      if (bytes == null || bytes.length < 12) return Array.empty
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(off: Int): String =
        new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return Array.empty
      val frames = Array.newBuilder[java.awt.image.BufferedImage]
      // chunk walk STRICTLY in container order via an explicit
      // continuation stack: entering a LIST pushes the remainder of the
      // CURRENT level, then descends, so children precede following
      // siblings ('rec ' interleave groups, the spec's grouped form,
      // keep their frame order — a deferred-sibling stack would reverse
      // them) while staying heap-allocated — a crafted file nesting one
      // LIST per 12 bytes must not StackOverflowError the task (Error,
      // which the quarantine handlers cannot catch). Bounds-checked so
      // a truncated file ends the walk instead of throwing.
      var pos = 12
      val declared = bb.getInt(4)
      // streaming/interrupted writers leave a placeholder RIFF size
      // (0 or -1); fall back to the actual byte count so intact frames
      // before the cut still decode
      var end =
        if (declared <= 4) bytes.length
        else math.min(8L + declared, bytes.length.toLong).toInt
      var cont = List.empty[(Int, Int)]
      var walking = true
      while (walking) {
        if (pos + 8 > end) {
          cont match {
            case (p, e) :: rest => pos = p; end = e; cont = rest
            case Nil => walking = false
          }
        } else {
          val id = fourcc(pos)
          val size = bb.getInt(pos + 4)
          val dataStart = pos + 8
          val dataEnd = dataStart.toLong + size
          if (size < 0 || dataEnd > end) pos = end // corrupt: stop level
          else if (id == "LIST") {
            cont = ((dataEnd + (dataEnd & 1)).toInt, end) :: cont
            pos = dataStart + 4
            end = dataEnd.toInt
          } else {
            if (id.length == 4 && (id.endsWith("dc") || id.endsWith("db")) &&
                size > 0) {
              try {
                val img = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(bytes, dataStart, size))
                if (img != null) frames += img
              } catch { case _: java.io.IOException | _: RuntimeException => }
            }
            pos = (dataEnd + (dataEnd & 1)).toInt // chunks are word-aligned
          }
        }
      }
      frames.result()
    }
  }

  /** Real MJPEG-in-MP4 demux, pure JDK: MP4 is an ISO-BMFF box tree
    * (big-endian size+fourcc headers) whose `moov` carries per-track
    * sample TABLES — `stsz` (sample sizes), `stsc` (samples-per-chunk
    * runs), `stco`/`co64` (absolute chunk offsets) — that locate each
    * sample inside `mdat` without any sample-level framing. For a
    * 'jpeg'-coded video track every sample is a standalone JPEG, so
    * reconstructing the offset list from the tables and handing each
    * slice to ImageIO decodes the third real container with no external
    * codec (ISO/IEC 14496-12 §8.5-8.7 layout). Corpus policy as ever:
    * malformed boxes, truncated `mdat`, or an undecodable sample yield
    * only the frames that did decode — zero for garbage input.
    *
    * Structure walk is non-recursive: each level (file → moov → trak →
    * mdia → minf → stbl) is one flat bounded scan, so nesting depth is
    * a compile-time constant and crafted deep nesting cannot touch the
    * task stack. 64-bit `largesize` headers and `co64` offsets are
    * honored; `size==0` (box-to-EOF, the live-capture placeholder) and
    * a truncated final box clamp to the payload end instead of
    * throwing. */
  object Mp4VideoDemux extends VideoDemux {
    /** Scan one box level in [from, to): returns (type, bodyStart,
      * bodyEnd) triples in container order; corrupt headers end the
      * scan (quarantine, don't throw). */
    private def boxes(bytes: Array[Byte], from: Int, to: Int): Seq[(String, Int, Int)] = {
      val bb = java.nio.ByteBuffer.wrap(bytes) // ISO-BMFF is big-endian
      val out = Seq.newBuilder[(String, Int, Int)]
      var pos = from
      var walking = true
      while (walking && pos + 8 <= to) {
        val size32 = bb.getInt(pos).toLong & 0xffffffffL
        val id = new String(bytes, pos + 4, 4,
          java.nio.charset.StandardCharsets.US_ASCII)
        var bodyStart = pos + 8L
        val boxEnd: Long =
          if (size32 == 0) to.toLong // box extends to end of range
          else if (size32 == 1) { // 64-bit largesize follows the fourcc
            if (pos + 16 > to) { walking = false; to.toLong }
            else { bodyStart = pos + 16L; pos + bb.getLong(pos + 8) }
          } else pos + size32
        if (!walking || boxEnd < bodyStart) walking = false
        else {
          // truncated writer: clamp the FINAL box to the payload end so
          // tables/frames before the cut still parse
          val end = math.min(boxEnd, to.toLong).toInt
          out += ((id, bodyStart.toInt, end))
          if (boxEnd >= to) walking = false else pos = boxEnd.toInt
        }
      }
      out.result()
    }
    private def box(bs: Seq[(String, Int, Int)], id: String): Option[(Int, Int)] =
      bs.collectFirst { case (`id`, s, e) => (s, e) }

    override def demuxFrames(bytes: Array[Byte]): Array[java.awt.image.BufferedImage] = {
      if (bytes == null || bytes.length < 16) return Array.empty
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val top = boxes(bytes, 0, bytes.length)
      if (box(top, "ftyp").isEmpty) return Array.empty
      val frames = Array.newBuilder[java.awt.image.BufferedImage]
      for {
        (moovS, moovE) <- box(top, "moov").toSeq
        (trakS, trakE) <- boxes(bytes, moovS, moovE).collect { case ("trak", s, e) => (s, e) }
        trak = boxes(bytes, trakS, trakE)
        (mdiaS, mdiaE) <- box(trak, "mdia").toSeq
        mdia = boxes(bytes, mdiaS, mdiaE)
        // video tracks only: hdlr.handler_type at FullBox body + 4
        (hS, hE) <- box(mdia, "hdlr").toSeq
        if hE - hS >= 12 && new String(bytes, hS + 8, 4,
          java.nio.charset.StandardCharsets.US_ASCII) == "vide"
        (minfS, minfE) <- box(mdia, "minf").toSeq
        (stblS, stblE) <- box(boxes(bytes, minfS, minfE), "stbl").toSeq
        stbl = boxes(bytes, stblS, stblE)
        // stsz v0: fullbox(4) uniform_size(4) sample_count(4) [sizes]
        (szS, szE) <- box(stbl, "stsz").toSeq
        if szE - szS >= 12
        (scS, scE) <- box(stbl, "stsc").toSeq
        nSamples = bb.getInt(szS + 8)
        // a declared count beyond any possible sample payload is corrupt
        if nSamples >= 0 && nSamples <= bytes.length / 2 + 1
      } {
        val uniform = bb.getInt(szS + 4)
        def sampleSize(i: Int): Int =
          if (uniform != 0) uniform
          else if (szS + 12 + 4 * i + 4 <= szE) bb.getInt(szS + 12 + 4 * i)
          else -1
        // stco v0 (32-bit) / co64 (64-bit): chunk_count then offsets
        val chunkOffsets: IndexedSeq[Long] = box(stbl, "stco") match {
          case Some((s, e)) if e - s >= 8 =>
            val n = math.min(bb.getInt(s + 4).toLong, (e - s - 8) / 4L).toInt
            (0 until math.max(0, n)).map(i => bb.getInt(s + 8 + 4 * i).toLong & 0xffffffffL)
          case _ => box(stbl, "co64") match {
            case Some((s, e)) if e - s >= 8 =>
              val n = math.min(bb.getInt(s + 4).toLong, (e - s - 8) / 8L).toInt
              (0 until math.max(0, n)).map(i => bb.getLong(s + 8 + 8 * i))
            case _ => IndexedSeq.empty
          }
        }
        // stsc v0 runs: (first_chunk, samples_per_chunk, sdi); a run
        // covers chunks up to the next run's first_chunk
        val nRuns = if (scE - scS >= 8) bb.getInt(scS + 4) else 0
        val runs = (0 until math.max(0, nRuns))
          .filter(i => scS + 8 + 12 * i + 12 <= scE)
          .map { i =>
            val o = scS + 8 + 12 * i
            (bb.getInt(o), bb.getInt(o + 4)) // (first_chunk, spc)
          }
          .filter { case (fc, spc) => fc >= 1 && spc >= 1 }
        var sample = 0
        var run = 0
        var chunk = 1 // 1-based, per spec
        while (chunk <= chunkOffsets.length && sample < nSamples && runs.nonEmpty) {
          while (run + 1 < runs.length && runs(run + 1)._1 <= chunk) run += 1
          val spc = runs(run)._2
          var off = chunkOffsets(chunk - 1)
          var s = 0
          while (s < spc && sample < nSamples) {
            val size = sampleSize(sample)
            if (size > 0 && off >= 0 && off + size <= bytes.length) {
              try {
                val img = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(bytes, off.toInt, size))
                if (img != null) frames += img
              } catch { case _: java.io.IOException | _: RuntimeException => }
            }
            if (size > 0) off += size
            sample += 1; s += 1
          }
          chunk += 1
        }
      }
      frames.result()
    }
  }

  /** Real MJPEG-in-Matroska demux, pure JDK — the WebM/MKV container
    * family (WebM IS Matroska with a restricted codec set; the container
    * layer parsed here is identical). Matroska is an EBML tree: every
    * element is (variable-length ID, variable-length size, payload), so
    * one VINT reader plus a walk that descends into the known MASTER
    * elements (Segment → Tracks/Cluster → TrackEntry/BlockGroup) reaches
    * the frame payloads. Frames live in SimpleBlock/Block elements whose
    * payload is: track-number VINT, int16 relative timestamp, flags byte,
    * then the frame data — possibly LACED (several frames per block):
    * Xiph (255-run byte sums), fixed-size, and EBML (delta-VINT) lacing
    * are all reconstructed per spec. For a `V_MJPEG`-coded video track
    * every frame is a standalone JPEG handed to ImageIO.
    *
    * Corpus policy as the other demuxers: malformed EBML, oversized
    * VINTs, truncated payloads, or undecodable frames yield only the
    * frames that did decode — zero for garbage. Unknown-size elements
    * (the live-stream form: size VINT all value-bits set, legal for
    * Segment/Cluster) extend to the enclosing element's end; a following
    * Cluster header is then met as a child and descended into, so
    * container order is preserved. The walk is an explicit heap stack
    * (the AVI walker's style) — crafted deep nesting cannot
    * StackOverflowError the task. */
  object MkvVideoDemux extends VideoDemux {
    // IDs as conventionally written WITH the length-marker bits
    // (RFC 8794 / Matroska spec element registry)
    private val SEGMENT = 0x18538067L
    private val TRACKS = 0x1654AE6BL
    private val TRACK_ENTRY = 0xAEL
    private val TRACK_NUMBER = 0xD7L
    private val TRACK_TYPE = 0x83L
    private val CLUSTER = 0x1F43B675L
    private val SIMPLE_BLOCK = 0xA3L
    private val BLOCK_GROUP = 0xA0L
    private val BLOCK = 0xA1L
    private val masters = Set(SEGMENT, TRACKS, TRACK_ENTRY, CLUSTER, BLOCK_GROUP)

    /** One EBML VINT at `pos` in [pos, end): (value, width). ID form
      * keeps the marker bits (IDs are compared marker-included); size
      * form strips them and maps the reserved all-ones pattern to -1
      * ("unknown size"). null-width 0 signals a malformed VINT. */
    private def vint(bytes: Array[Byte], pos: Int, end: Int,
                     keepMarker: Boolean): (Long, Int) = {
      if (pos >= end) return (0L, 0)
      val b0 = bytes(pos) & 0xff
      if (b0 == 0) return (0L, 0) // would claim >8 bytes: malformed
      val len = java.lang.Integer.numberOfLeadingZeros(b0) - 23
      if (pos + len > end) return (0L, 0)
      var v = if (keepMarker) b0.toLong else (b0 & (0xff >>> len)).toLong
      var i = 1
      while (i < len) { v = (v << 8) | (bytes(pos + i) & 0xff); i += 1 }
      if (!keepMarker && v == (1L << (7 * len)) - 1) (-1L, len) // unknown
      else (v, len)
    }

    /** Split a block payload into its laced frame slices (offset,len),
      * per Matroska §"Block lacing". Returns empty on any structural
      * inconsistency (quarantine the block, keep the file). */
    private def laceSlices(bytes: Array[Byte], start: Int,
                           end: Int): Seq[(Int, Int)] = {
      val (_, tnW) = vint(bytes, start, end, keepMarker = false)
      if (tnW == 0 || start + tnW + 3 > end) return Seq.empty
      val flags = bytes(start + tnW + 2) & 0xff
      var p = start + tnW + 3
      (flags >> 1) & 3 match {
        case 0 => // no lacing: the rest is one frame
          if (end > p) Seq((p, end - p)) else Seq.empty
        case 2 => // fixed-size: count byte, equal slices of the rest
          if (p >= end) return Seq.empty
          val nf = (bytes(p) & 0xff) + 1
          p += 1
          val rem = end - p
          if (rem <= 0 || rem % nf != 0) return Seq.empty
          val sz = rem / nf
          (0 until nf).map(i => (p + i * sz, sz))
        case style => // 1 = Xiph (255-run sums), 3 = EBML (delta VINTs)
          if (p >= end) return Seq.empty
          val nf = (bytes(p) & 0xff) + 1
          p += 1
          val sizes = new Array[Int](nf)
          var i = 0
          var prev = 0L
          var ok = true
          while (ok && i < nf - 1) { // last frame's size is implicit
            if (style == 1) {
              var s = 0L
              var more = true
              while (more && p < end) {
                val b = bytes(p) & 0xff; p += 1; s += b; more = b == 255
              }
              if (more) ok = false else { sizes(i) = s.toInt }
            } else {
              val (v, w) = vint(bytes, p, end, keepMarker = false)
              if (w == 0 || v < 0) ok = false
              else {
                p += w
                // first size is plain; the rest are signed deltas
                // centered on 2^(7w-1)-1 (RFC 8794 §4.4)
                val s = if (i == 0) v else prev + (v - ((1L << (7 * w - 1)) - 1))
                if (s < 0 || s > end - p) ok = false
                else { sizes(i) = s.toInt; prev = s }
              }
            }
            i += 1
          }
          if (!ok) return Seq.empty
          val declared = sizes.take(nf - 1).map(_.toLong).sum
          if (declared > end - p) return Seq.empty
          sizes(nf - 1) = (end - p - declared).toInt
          if (sizes(nf - 1) < 0) return Seq.empty
          val out = Seq.newBuilder[(Int, Int)]
          var off = p
          sizes.foreach { s => if (s > 0) out += ((off, s)); off += s }
          out.result()
      }
    }

    override def demuxFrames(bytes: Array[Byte]): Array[java.awt.image.BufferedImage] = {
      if (bytes == null || bytes.length < 8) return Array.empty
      // EBML header magic 0x1A45DFA3
      if (!(bytes(0) == 0x1a && bytes(1) == 0x45 &&
            (bytes(2) & 0xff) == 0xdf && (bytes(3) & 0xff) == 0xa3))
        return Array.empty
      // one container-order walk collecting (a) video track numbers from
      // TrackEntry and (b) block payload ranges tagged with their track;
      // filtering at the end keeps the walk independent of whether
      // Tracks precedes the Clusters (the spec allows either order)
      final case class Entry(var num: Long, var tpe: Long)
      var videoTracks = Set.empty[Long]
      var entry: Entry = null
      var entryEnd = -1
      val blocks = Seq.newBuilder[(Long, Int, Int)]
      var pos = 0
      var end = bytes.length
      var cont = List.empty[(Int, Int)]
      var walking = true
      def closeEntryAt(p: Int): Unit =
        if (entry != null && p >= entryEnd) {
          if (entry.tpe == 1 && entry.num > 0) videoTracks += entry.num
          entry = null
        }
      while (walking) {
        closeEntryAt(pos)
        if (pos >= end) {
          cont match {
            case (p, e) :: rest => pos = p; end = e; cont = rest
            case Nil => walking = false
          }
        } else {
          val (id, idW) = vint(bytes, pos, end, keepMarker = true)
          val (sz, szW) =
            if (idW == 0) (0L, 0)
            else vint(bytes, pos + idW, end, keepMarker = false)
          if (idW == 0 || szW == 0) pos = end // malformed: stop level
          else {
            val bodyStart = pos + idW + szW
            // unknown size (-1) extends to the current level's end;
            // oversize declarations clamp (truncated-writer policy)
            val bodyEnd =
              if (sz < 0) end
              else math.min(bodyStart.toLong + sz, end.toLong).toInt
            if (bodyStart > end) pos = end
            else if (masters.contains(id)) {
              if (id == TRACK_ENTRY) { entry = Entry(-1, -1); entryEnd = bodyEnd }
              cont = (bodyEnd, end) :: cont
              pos = bodyStart
              end = bodyEnd
            } else {
              if ((id == SIMPLE_BLOCK || id == BLOCK) && bodyEnd > bodyStart) {
                val (tn, tnW) = vint(bytes, bodyStart, bodyEnd, keepMarker = false)
                if (tnW > 0 && tn > 0) blocks += ((tn, bodyStart, bodyEnd))
              } else if (entry != null && (id == TRACK_NUMBER || id == TRACK_TYPE)) {
                var v = 0L // unsigned big-endian integer element
                var i = bodyStart
                while (i < bodyEnd && i < bodyStart + 8) { v = (v << 8) | (bytes(i) & 0xff); i += 1 }
                if (id == TRACK_NUMBER) entry.num = v else entry.tpe = v
              }
              pos = bodyEnd
            }
          }
        }
      }
      closeEntryAt(Int.MaxValue)
      val frames = Array.newBuilder[java.awt.image.BufferedImage]
      blocks.result().foreach { case (tn, s, e) =>
        if (videoTracks.contains(tn)) {
          laceSlices(bytes, s, e).foreach { case (off, len) =>
            try {
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes, off, len))
              if (img != null) frames += img
            } catch { case _: java.io.IOException | _: RuntimeException => }
          }
        }
      }
      frames.result()
    }
  }

  /** Container dispatch by magic bytes — the default demux for the frame
    * stages: GIF87a/GIF89a → imageio sequence reader, RIFF/AVI → MJPEG
    * chunk demux, ftyp-led ISO-BMFF → MP4 sample-table demux, EBML-led
    * Matroska/WebM → block demux, anything else → quarantine. One place
    * to extend when a deployment plugs in further codecs. */
  object AutoVideoDemux extends VideoDemux {
    private def startsWith(bytes: Array[Byte], s: String, off: Int = 0): Boolean =
      bytes.length >= off + s.length &&
        s.indices.forall(i => bytes(off + i) == s.charAt(i).toByte)
    override def demuxFrames(bytes: Array[Byte]): Array[java.awt.image.BufferedImage] = {
      if (bytes == null || bytes.length < 12) Array.empty
      else if (startsWith(bytes, "GIF8")) GifVideoDemux.demuxFrames(bytes)
      else if (startsWith(bytes, "RIFF") && startsWith(bytes, "AVI ", 8))
        MjpegAviVideoDemux.demuxFrames(bytes)
      else if (startsWith(bytes, "ftyp", 4)) Mp4VideoDemux.demuxFrames(bytes)
      else if (bytes(0) == 0x1a && bytes(1) == 0x45 &&
               (bytes(2) & 0xff) == 0xdf && (bytes(3) & 0xff) == 0xa3)
        MkvVideoDemux.demuxFrames(bytes)
      else UnsupportedVideoDemux.demuxFrames(bytes)
    }
  }

  /** Video codec utilities over the [[VideoDemux]] seam. */
  object VideoCodec extends Serializable {

    /** One decoded frame: dims + mean Rec.601 luminance (UNnormalized,
      * 0..255 — exact integer-in-double for constant-gray frames, which
      * is what makes the synthetic-video oracle arithmetic). */
    final case class Frame(width: Int, height: Int, meanLum: Double)

    def encodeGif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val baos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        frames.foreach { img =>
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        }
        writer.endWriteSequence()
      } finally {
        writer.dispose()
        ios.close()
      }
      baos.toByteArray
    }

    /** Minimal spec-correct MJPEG AVI writer (RIFF: avih + strl('vids'/
      * 'MJPG') headers, movi list of word-aligned '00dc' JPEG chunks,
      * idx1 keyframe index) — the test harness for the AVI demux path,
      * and proof the chunk layout [[MjpegAviVideoDemux]] parses is the
      * real one. Frames JPEG-encode through the JDK writer. */
    def encodeMjpegAvi(frames: Seq[java.awt.image.BufferedImage],
                       fps: Int = 10): Array[Byte] = {
      require(frames.nonEmpty, "encodeMjpegAvi: need at least one frame")
      val w = frames.head.getWidth
      val h = frames.head.getHeight
      val jpegs = frames.map { f =>
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(f, "jpg", baos)
        baos.toByteArray
      }
      val le = java.nio.ByteOrder.LITTLE_ENDIAN
      def chunk(id: String, body: Array[Byte]): Array[Byte] = {
        val pad = body.length & 1
        val bb = java.nio.ByteBuffer.allocate(8 + body.length + pad).order(le)
        bb.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
        bb.array()
      }
      def list(kind: String, body: Array[Byte]): Array[Byte] =
        chunk("LIST", kind.getBytes("US-ASCII") ++ body)
      val avih = {
        val bb = java.nio.ByteBuffer.allocate(56).order(le)
        bb.putInt(1000000 / fps).putInt(0).putInt(0).putInt(0)
          .putInt(jpegs.length).putInt(0).putInt(1).putInt(0)
          .putInt(w).putInt(h) // + 4 reserved DWORDs of zeros
        bb.array()
      }
      val strh = {
        val bb = java.nio.ByteBuffer.allocate(56).order(le)
        bb.put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
          .putInt(0).putInt(0).putInt(0)
          .putInt(1).putInt(fps) // scale / rate
          .putInt(0).putInt(jpegs.length)
          .putInt(jpegs.map(_.length).max).putInt(-1).putInt(0)
          .putShort(0).putShort(0)
          .putShort(w.toShort).putShort(h.toShort)
        bb.array()
      }
      val strf = { // BITMAPINFOHEADER
        val bb = java.nio.ByteBuffer.allocate(40).order(le)
        bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
          .put("MJPG".getBytes("US-ASCII")).putInt(w * h * 3)
          .putInt(0).putInt(0).putInt(0).putInt(0)
        bb.array()
      }
      val hdrl = list("hdrl", chunk("avih", avih) ++
        list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
      val moviChunks = jpegs.map(chunk("00dc", _))
      val movi = list("movi", moviChunks.reduce(_ ++ _))
      val idx1 = { // offsets are from the 'movi' fourcc (the common form)
        val bb = java.nio.ByteBuffer.allocate(16 * jpegs.length).order(le)
        var off = 4
        jpegs.zip(moviChunks).foreach { case (j, c) =>
          bb.put("00dc".getBytes("US-ASCII")).putInt(0x10).putInt(off)
            .putInt(j.length)
          off += c.length
        }
        chunk("idx1", bb.array())
      }
      val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi ++ idx1
      chunk("RIFF", body)
    }

    /** Minimal spec-correct MP4 (ISO-BMFF) writer with a 'jpeg'-coded
      * video track — the test harness for [[Mp4VideoDemux]], and proof
      * the sample-table layout it parses is the real one (ISO/IEC
      * 14496-12: ftyp + moov{mvhd, trak{tkhd, mdia{mdhd, hdlr('vide'),
      * minf{vmhd, dinf/dref/url, stbl{stsd('jpeg'), stts, stsc, stsz,
      * stco}}}}} + mdat). Faststart layout (moov BEFORE mdat — the
      * progressive-streaming form): stco offsets depend on moov's own
      * size, so the moov is built twice — once with placeholder offsets
      * to fix the size, then with the real ones (same entry counts ⇒
      * identical size; asserted). Samples pack two-per-chunk (odd tail
      * chunk of one), so the stsc RUN table is exercised, not just a
      * degenerate one-sample-per-chunk form. Frames JPEG-encode through
      * the JDK writer; per-frame dims are legal ('jpeg' samples are
      * independent codestreams, like MJPEG-AVI). */
    def encodeMjpegMp4(frames: Seq[java.awt.image.BufferedImage],
                       fps: Int = 10): Array[Byte] = {
      require(frames.nonEmpty, "encodeMjpegMp4: need at least one frame")
      val w = frames.head.getWidth
      val h = frames.head.getHeight
      val jpegs = frames.map { f =>
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(f, "jpg", baos)
        baos.toByteArray
      }
      val n = jpegs.length
      def boxOf(id: String, body: Array[Byte]): Array[Byte] = {
        val bb = java.nio.ByteBuffer.allocate(8 + body.length) // big-endian
        bb.putInt(8 + body.length).put(id.getBytes("US-ASCII")).put(body)
        bb.array()
      }
      def full(id: String, versionFlags: Int, body: Array[Byte]): Array[Byte] = {
        val bb = java.nio.ByteBuffer.allocate(4 + body.length)
        bb.putInt(versionFlags).put(body)
        boxOf(id, bb.array())
      }
      // fixed-layout boxes fit 1 KiB; the per-sample tables (stsz/stsc/
      // stco) size to their entry counts below
      def beCap(cap: Int)(parts: (java.nio.ByteBuffer => Unit)*): Array[Byte] = {
        val bb = java.nio.ByteBuffer.allocate(cap)
        parts.foreach(_(bb))
        java.util.Arrays.copyOf(bb.array(), bb.position())
      }
      def be(parts: (java.nio.ByteBuffer => Unit)*): Array[Byte] =
        beCap(1 << 10)(parts: _*)
      val timescale = 1000
      val duration = n * timescale / fps
      val ftyp = boxOf("ftyp", be(
        _.put("isom".getBytes("US-ASCII")), _.putInt(0x200),
        _.put("isommp42".getBytes("US-ASCII"))))
      val mvhd = full("mvhd", 0, be(_.putInt(0), _.putInt(0),
        _.putInt(timescale), _.putInt(duration), _.putInt(0x00010000),
        _.putShort(0x0100.toShort), _.putShort(0), _.putLong(0),
        // identity transform matrix + 6 predefined zero DWORDs
        _.putInt(0x00010000), _.putInt(0), _.putInt(0),
        _.putInt(0), _.putInt(0x00010000), _.putInt(0),
        _.putInt(0), _.putInt(0), _.putInt(0x40000000),
        b => (1 to 6).foreach(_ => b.putInt(0)), _.putInt(2)))
      val tkhd = full("tkhd", 3, be(_.putInt(0), _.putInt(0), // enabled|in-movie
        _.putInt(1), _.putInt(0), _.putInt(duration), _.putLong(0),
        _.putShort(0), _.putShort(0), _.putShort(0), _.putShort(0),
        _.putInt(0x00010000), _.putInt(0), _.putInt(0),
        _.putInt(0), _.putInt(0x00010000), _.putInt(0),
        _.putInt(0), _.putInt(0), _.putInt(0x40000000),
        _.putInt(w << 16), _.putInt(h << 16))) // 16.16 fixed
      val mdhd = full("mdhd", 0, be(_.putInt(0), _.putInt(0),
        _.putInt(timescale), _.putInt(duration),
        _.putShort(0x55c4.toShort), _.putShort(0))) // language 'und'
      val hdlr = full("hdlr", 0, be(_.putInt(0),
        _.put("vide".getBytes("US-ASCII")), b => (1 to 3).foreach(_ => b.putInt(0)),
        _.put("graft".getBytes("US-ASCII")), _.put(0.toByte)))
      val vmhd = full("vmhd", 1, be(_.putShort(0), b => (1 to 3).foreach(_ => b.putShort(0))))
      val dinf = boxOf("dinf", full("dref", 0,
        be(_.putInt(1)) ++ full("url ", 1, Array.emptyByteArray)))
      val stsd = full("stsd", 0, be(_.putInt(1)) ++ boxOf("jpeg", be(
        b => (1 to 3).foreach(_ => b.putShort(0)), _.putShort(1), // dref index 1
        b => (1 to 4).foreach(_ => b.putInt(0)), // pre_defined/reserved
        _.putShort(w.toShort), _.putShort(h.toShort),
        _.putInt(0x00480000), _.putInt(0x00480000), _.putInt(0), _.putShort(1),
        b => (1 to 8).foreach(_ => b.putInt(0)), // compressorname (32 bytes)
        _.putShort(0x0018.toShort), _.putShort(0xffff.toShort))))
      val stts = full("stts", 0, be(_.putInt(1), _.putInt(n),
        _.putInt(timescale / fps)))
      // two samples per chunk, odd tail chunk of one — a real stsc run
      val nChunks = (n + 1) / 2
      val stsc = full("stsc", 0, {
        val runs = if (n == 1) Seq((1, 1)) else if (n % 2 == 0) Seq((1, 2))
          else Seq((1, 2), (nChunks, 1))
        be(_.putInt(runs.length),
          b => runs.foreach { case (fc, spc) =>
            b.putInt(fc); b.putInt(spc); b.putInt(1)
          })
      })
      val stsz = full("stsz", 0, beCap(8 + 4 * n)(_.putInt(0), _.putInt(n),
        b => jpegs.foreach(j => b.putInt(j.length))))
      def stcoOf(offsets: Seq[Long]): Array[Byte] = full("stco", 0,
        beCap(4 + 4 * offsets.length)(_.putInt(offsets.length),
          b => offsets.foreach(o => b.putInt(o.toInt))))
      def moovOf(stco: Array[Byte]): Array[Byte] = {
        val stbl = boxOf("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
        val minf = boxOf("minf", vmhd ++ dinf ++ stbl)
        val mdia = boxOf("mdia", mdhd ++ hdlr ++ minf)
        boxOf("moov", mvhd ++ boxOf("trak", tkhd ++ mdia))
      }
      val sizer = moovOf(stcoOf(Seq.fill(nChunks)(0L)))
      // chunk c (0-based) starts at the cumulative size of samples 0..2c
      val mdatData = Array.concat(jpegs: _*)
      val base = ftyp.length + sizer.length + 8L // + mdat header
      val chunkOffsets = (0 until nChunks).map { c =>
        base + jpegs.take(2 * c).map(_.length.toLong).sum
      }
      val moov = moovOf(stcoOf(chunkOffsets))
      assert(moov.length == sizer.length,
        "encodeMjpegMp4: moov size changed between offset passes")
      ftyp ++ moov ++ boxOf("mdat", mdatData)
    }

    /** Minimal spec-correct Matroska writer with a `V_MJPEG` video track
      * — the test harness for [[MkvVideoDemux]], and proof the EBML
      * layout it parses is the real one (RFC 8794 encoding + the
      * Matroska element registry: EBML header{DocType matroska} +
      * Segment{Info{TimestampScale}, Tracks{TrackEntry{TrackNumber,
      * TrackUID, TrackType vide, CodecID, Video{PixelWidth/Height}}},
      * Cluster{Timestamp, SimpleBlock}*}). Frames pack TWO per
      * SimpleBlock via Xiph lacing (odd tail block unlaced), one
      * SimpleBlock per Cluster — so the lacing reconstruction and the
      * cluster iteration are both actually exercised, not just the
      * degenerate one-frame-per-block form. All sizes are known-size
      * VINTs (the file form); the unknown-size stream form is covered by
      * a hand-built case in MultimodalSpec. */
    def encodeMjpegMkv(frames: Seq[java.awt.image.BufferedImage],
                       fps: Int = 10): Array[Byte] = {
      require(frames.nonEmpty, "encodeMjpegMkv: need at least one frame")
      val w = frames.head.getWidth
      val h = frames.head.getHeight
      val jpegs = frames.map { f =>
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(f, "jpg", baos)
        baos.toByteArray
      }
      def idBytes(id: Long): Array[Byte] = {
        val n = (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8
        (0 until n).map(i => ((id >> (8 * (n - 1 - i))) & 0xff).toByte).toArray
      }
      def vintOf(v: Long): Array[Byte] = {
        // minimal width whose all-ones pattern (reserved: unknown) the
        // value does not collide with
        var len = 1
        while (v >= (1L << (7 * len)) - 1) len += 1
        val out = new Array[Byte](len)
        var i = 0
        while (i < len) {
          out(i) = ((v >> (8 * (len - 1 - i))) & 0xff).toByte; i += 1
        }
        out(0) = (out(0) | (0x80 >> (len - 1))).toByte
        out
      }
      def el(id: Long, body: Array[Byte]): Array[Byte] =
        idBytes(id) ++ vintOf(body.length) ++ body
      def uint(v: Long): Array[Byte] = {
        val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
        (0 until n).map(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte).toArray
      }
      def str(s: String): Array[Byte] = s.getBytes("US-ASCII")
      val header = el(0x1A45DFA3L,
        el(0x4286, uint(1)) ++ el(0x42F7, uint(1)) ++ // EBML(Read)Version
        el(0x42F2, uint(4)) ++ el(0x42F3, uint(8)) ++ // MaxIDLength/MaxSizeLength
        el(0x4282, str("matroska")) ++
        el(0x4287, uint(2)) ++ el(0x4285, uint(2))) // DocType(Read)Version
      val info = el(0x1549A966L, el(0x2AD7B1L, uint(1000000L)))
      val tracks = el(0x1654AE6BL, el(0xAEL,
        el(0xD7, uint(1)) ++ el(0x73C5, uint(1)) ++ // number / UID
        el(0x83, uint(1)) ++ el(0x86, str("V_MJPEG")) ++
        el(0xE0, el(0xB0, uint(w)) ++ el(0xBA, uint(h)))))
      def xiphRuns(size: Int): Array[Byte] = {
        val out = Array.newBuilder[Byte]
        var rem = size
        while (rem >= 255) { out += 0xff.toByte; rem -= 255 }
        out += rem.toByte
        out.result()
      }
      def simpleBlock(payload: Array[Byte], laceFirstSize: Int): Array[Byte] = {
        val laced = laceFirstSize >= 0
        val head = Array[Byte](0x81.toByte, 0, 0, // track 1 VINT, ts int16
          (if (laced) 0x82 else 0x80).toByte) // keyframe | Xiph-lacing bit
        val lace = if (laced) Array[Byte](1) ++ xiphRuns(laceFirstSize)
                   else Array.emptyByteArray
        el(0xA3, head ++ lace ++ payload)
      }
      val clusters = jpegs.zipWithIndex.grouped(2).map { pair =>
        val ts = el(0xE7, uint(pair.head._2 * 1000L / fps))
        val block = pair match {
          case Seq((a, _), (b, _)) => simpleBlock(a ++ b, a.length)
          case Seq((a, _)) => simpleBlock(a, -1)
        }
        el(0x1F43B675L, ts ++ block)
      }.reduce(_ ++ _)
      header ++ el(SEGMENT_ID, info ++ tracks ++ clusters)
    }
    private val SEGMENT_ID = 0x18538067L

    def decodeFrames(bytes: Array[Byte],
                     demux: VideoDemux = AutoVideoDemux): Array[Frame] =
      demux.demuxFrames(bytes).map { img =>
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0.0
        val rowBuf = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, rowBuf, 0, w)
          var x = 0
          while (x < w) {
            val rgb = rowBuf(x)
            sum += ((rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000.0
            x += 1
          }
          y += 1
        }
        Frame(w, h, sum / (w.toLong * h))
      }
  }

  /** Synthetic-video laws: dims, frame count, and per-frame constant gray
    * all arithmetic in the id, so an external oracle recomputes every
    * decoded figure without touching GIF bytes — the exact pattern of the
    * image ([[syntheticWidth]]) and audio ([[audioAmplitude]]) harnesses.
    * Constant-gray frames survive GIF palette quantization exactly (the
    * single color IS the palette), and their Rec.601 mean luminance is
    * exactly the gray value, so a broken demux cannot hash-match. */
  def videoFrameCount(id: Long): Int = (2 + math.floorMod(id, 3)).toInt
  def videoWidth(id: Long): Int = (8 + math.floorMod(id, 5)).toInt
  def videoHeight(id: Long): Int = (8 + math.floorMod(id / 5, 5)).toInt
  def videoFrameGray(id: Long, frame: Int): Int =
    math.floorMod(id * 31L + frame * 53L, 256L).toInt

  /** Harness generator: media rows whose `content` is a REAL multi-frame
    * GIF built from the laws above. Partition-local map, no shuffle. */
  def withSyntheticVideos(df: DataFrame, idCol: String, sourceCol: String): DataFrame = {
    val ids = df.select(col(idCol).cast("long").as("media_id"),
      col(sourceCol).cast("string").as("source"))
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("content", BinaryType),
      StructField("media_type", StringType),
      StructField("source", StringType)))
    val encoded = ids.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val (w, h) = (videoWidth(id), videoHeight(id))
        val frames = Seq.tabulate(videoFrameCount(id)) { k =>
          val g = videoFrameGray(id, k)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, (g << 16) | (g << 8) | g); x += 1 }
            y += 1
          }
          img
        }
        Row(id, VideoCodec.encodeGif(frames), "video", r.getString(1))
      }
    }(Encoders.row(schema))
    encoded.select(
      col("media_id"), col("content"), col("media_type"),
      struct(
        length(col("content")).cast("long").as("n_bytes"),
        md5(col("content")).as("content_hash"),
        col("source").as("source")).as("meta"))
  }

  /** Harness generator for the AVI path: media rows whose `content` is a
    * REAL MJPEG AVI. Same laws as [[withSyntheticVideos]] EXCEPT frame
    * k's width is `videoWidth(id) + k` — MJPEG frames are independent
    * JPEGs, so per-frame dims are legal, and the k-dependent width pins
    * FRAME ORDER in the oracle with integer-exact values (JPEG makes
    * constant-gray luminance only quantization-close, so dims — not
    * lum — carry the order evidence). Partition-local map, no shuffle. */
  def withSyntheticAviVideos(df: DataFrame, idCol: String,
                             sourceCol: String): DataFrame = {
    val ids = df.select(col(idCol).cast("long").as("media_id"),
      col(sourceCol).cast("string").as("source"))
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("content", BinaryType),
      StructField("media_type", StringType),
      StructField("source", StringType)))
    val encoded = ids.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val h = videoHeight(id)
        val frames = Seq.tabulate(videoFrameCount(id)) { k =>
          val w = videoWidth(id) + k
          val g = videoFrameGray(id, k)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, (g << 16) | (g << 8) | g); x += 1 }
            y += 1
          }
          img
        }
        Row(id, VideoCodec.encodeMjpegAvi(frames), "video", r.getString(1))
      }
    }(Encoders.row(schema))
    encoded.select(
      col("media_id"), col("content"), col("media_type"),
      struct(
        length(col("content")).cast("long").as("n_bytes"),
        md5(col("content")).as("content_hash"),
        col("source").as("source")).as("meta"))
  }

  /** Harness generator for the MP4 path: media rows whose `content` is a
    * REAL ISO-BMFF MP4 with a 'jpeg'-coded track. Same laws as
    * [[withSyntheticAviVideos]] (frame k is (videoWidth(id)+k) ×
    * videoHeight(id)) so the SAME oracle arithmetic pins frame order and
    * dims for the third container — and a demux that mixes up the
    * stsc/stco tables decodes wrong-sized or missing frames and cannot
    * hash-match. Partition-local map, no shuffle. */
  def withSyntheticMp4Videos(df: DataFrame, idCol: String,
                             sourceCol: String): DataFrame = {
    val ids = df.select(col(idCol).cast("long").as("media_id"),
      col(sourceCol).cast("string").as("source"))
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("content", BinaryType),
      StructField("media_type", StringType),
      StructField("source", StringType)))
    val encoded = ids.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val h = videoHeight(id)
        val frames = Seq.tabulate(videoFrameCount(id)) { k =>
          val w = videoWidth(id) + k
          val g = videoFrameGray(id, k)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, (g << 16) | (g << 8) | g); x += 1 }
            y += 1
          }
          img
        }
        Row(id, VideoCodec.encodeMjpegMp4(frames), "video", r.getString(1))
      }
    }(Encoders.row(schema))
    encoded.select(
      col("media_id"), col("content"), col("media_type"),
      struct(
        length(col("content")).cast("long").as("n_bytes"),
        md5(col("content")).as("content_hash"),
        col("source").as("source")).as("meta"))
  }

  /** Harness generator for the Matroska/WebM path: media rows whose
    * `content` is a REAL MKV with a `V_MJPEG` track. Same laws as
    * [[withSyntheticAviVideos]] (frame k is (videoWidth(id)+k) ×
    * videoHeight(id)) so the SAME oracle arithmetic pins frame order and
    * dims for the fourth container — and a demux that misreads the EBML
    * sizes or the Xiph lace boundaries decodes wrong-sized, missing, or
    * misordered frames and cannot hash-match. Partition-local map. */
  def withSyntheticMkvVideos(df: DataFrame, idCol: String,
                             sourceCol: String): DataFrame = {
    val ids = df.select(col(idCol).cast("long").as("media_id"),
      col(sourceCol).cast("string").as("source"))
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("content", BinaryType),
      StructField("media_type", StringType),
      StructField("source", StringType)))
    val encoded = ids.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val h = videoHeight(id)
        val frames = Seq.tabulate(videoFrameCount(id)) { k =>
          val w = videoWidth(id) + k
          val g = videoFrameGray(id, k)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, (g << 16) | (g << 8) | g); x += 1 }
            y += 1
          }
          img
        }
        Row(id, VideoCodec.encodeMjpegMkv(frames), "video", r.getString(1))
      }
    }(Encoders.row(schema))
    encoded.select(
      col("media_id"), col("content"), col("media_type"),
      struct(
        length(col("content")).cast("long").as("n_bytes"),
        md5(col("content")).as("content_hash"),
        col("source").as("source")).as("meta"))
  }

  /** Gradient-video harness for the video near-dup oracle: frame k of
    * video `id` is a 32×16 luminance ramp, ASCENDING when (id + k) is
    * even (dHash ffffffffffffffff) and DESCENDING otherwise (all-zeros)
    * — the per-frame analog of [[withGradientImages]], inside a real GIF
    * container. A video's frame-hash sequence is therefore a parity
    * pattern an external oracle states without decoding. */
  def withGradientVideos(df: DataFrame, idCol: String, sourceCol: String): DataFrame = {
    val ids = df.select(col(idCol).cast("long").as("media_id"),
      col(sourceCol).cast("string").as("source"))
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("content", BinaryType),
      StructField("media_type", StringType),
      StructField("source", StringType)))
    ids.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val (w, h) = (32, 16)
        val frames = Seq.tabulate(videoFrameCount(id)) { k =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = (x * 255) / (w - 1)
              val g = if ((id + k) % 2 == 0) v else 255 - v
              img.setRGB(x, y, (g << 16) | (g << 8) | g)
              x += 1
            }
            y += 1
          }
          img
        }
        Row(id, VideoCodec.encodeGif(frames), "video", r.getString(1))
      }
    }(Encoders.row(schema))
  }

  /** Shot-structured gradient videos for the scene-cut oracle: same
    * 32×16 luminance ramp per frame as [[withGradientVideos]], but the
    * ramp DIRECTION is constant within 3-frame shots — ascending when
    * `(id + k/3)` is even — so consecutive frame dHashes are identical
    * inside a shot (distance 0) and maximally apart (64 bits) exactly at
    * the k % 3 == 0 shot boundaries. Frame count 6 + id % 3 gives one or
    * two cuts per video. The cut positions are therefore a pure
    * arithmetic law an external oracle states without decoding. */
  def withShotVideos(df: DataFrame, idCol: String, sourceCol: String): DataFrame = {
    val ids = df.select(col(idCol).cast("long").as("media_id"),
      col(sourceCol).cast("string").as("source"))
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("content", BinaryType),
      StructField("media_type", StringType),
      StructField("source", StringType)))
    ids.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val (w, h) = (32, 16)
        val frames = Seq.tabulate((6 + math.floorMod(id, 3)).toInt) { k =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = (x * 255) / (w - 1)
              val g = if ((id + k / 3) % 2 == 0) v else 255 - v
              img.setRGB(x, y, (g << 16) | (g << 8) | g)
              x += 1
            }
            y += 1
          }
          img
        }
        Row(id, VideoCodec.encodeGif(frames), "video", r.getString(1))
      }
    }(Encoders.row(schema))
  }

  /** Scene-cut detection: Hamming distance between CONSECUTIVE frames'
    * perceptual hashes, flagged at `threshold` bits — the shot-boundary
    * primitive a video training pipeline samples keyframes by (one
    * representative frame per shot instead of every-Nth blind sampling).
    *
    * One row per frame transition: (media_id, frame_idx, dist, is_cut)
    * for frame_idx ≥ 1. Plan shape: the only shuffle is the media_id
    * window for `lag` (frames of one video meet once — state per key =
    * one 16-char hash), and the Hamming distance is pure built-ins
    * (two 32-bit `conv` halves, xor, bit_count — no 64-bit parse that
    * would overflow a signed cast), fully codegen'd. */
  def withVideoSceneCuts(media: DataFrame, threshold: Int = 16,
                         batchSize: Int = 32,
                         demux: VideoDemux = AutoVideoDemux): DataFrame = {
    val hashed = withVideoFrameDHash(media, batchSize, demux)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("frame_idx"))
    def half(c: org.apache.spark.sql.Column, i: Int): org.apache.spark.sql.Column =
      conv(substring(c, 1 + 8 * i, 8), 16, 10).cast("long")
    hashed
      .withColumn("__prev", lag(col("frame_dhash"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .select(col("media_id"), col("frame_idx"),
        (bit_count(half(col("frame_dhash"), 0).bitwiseXOR(half(col("__prev"), 0))) +
          bit_count(half(col("frame_dhash"), 1).bitwiseXOR(half(col("__prev"), 1))))
          .cast("int").as("dist"))
      .withColumn("is_cut", col("dist") >= threshold)
  }

  /** Per-frame perceptual hash — the video NEAR-dup primitive: demux +
    * [[ImageCodec.dHashImage]] per frame, one row per frame. Videos
    * sharing their (ordered) frame-hash sequence are visual duplicates;
    * bucketing on a signature over the sequence (see mm_video_neardup)
    * finds them with one equi-shuffle and no pixel comparison — the
    * video analog of bucketing images on [[withImageDHash]]. */
  def withVideoFrameDHash(media: DataFrame, batchSize: Int = 32,
                          demux: VideoDemux = AutoVideoDemux): DataFrame = {
    // video rows only, like sampleFrames: javax.imageio happily decodes a
    // stray PNG as a 1-frame "video", which would emit a plausible-but-
    // wrong row instead of excluding the mistyped payload
    val videos = media.filter(col("media_type") === "video")
    val outSchema = media.schema
      .add(StructField("frame_idx", IntegerType))
      .add(StructField("frame_dhash", StringType))
    val binIdx = media.schema.fieldIndex("content")
    videos.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        rows.flatMap { r =>
          demux.demuxFrames(r.getAs[Array[Byte]](binIdx)).zipWithIndex.map {
            case (img, i) =>
              Row.fromSeq(r.toSeq ++ Seq[Any](i, ImageCodec.dHashImage(img)))
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** REAL frame-decode stage: demux each video payload in the batched
    * partition map and emit one row per frame — (frame_idx, frame_width,
    * frame_height, mean_lum) appended to the media columns. Explode-shaped
    * like [[sampleFrames]] but decode-backed: a broken demux emits zero
    * rows (or wrong luminance) and fails the oracle. Zero shuffle. */
  def withVideoFrames(media: DataFrame, batchSize: Int = 32,
                      demux: VideoDemux = AutoVideoDemux): DataFrame = {
    // video rows only, like sampleFrames: javax.imageio happily decodes a
    // stray PNG as a 1-frame "video", which would emit a plausible-but-
    // wrong row instead of excluding the mistyped payload
    val videos = media.filter(col("media_type") === "video")
    val outSchema = media.schema
      .add(StructField("frame_idx", IntegerType))
      .add(StructField("frame_width", IntegerType))
      .add(StructField("frame_height", IntegerType))
      .add(StructField("mean_lum", DoubleType))
    val binIdx = media.schema.fieldIndex("content")
    videos.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        rows.flatMap { r =>
          VideoCodec.decodeFrames(r.getAs[Array[Byte]](binIdx), demux).zipWithIndex.map {
            case (f, i) =>
              // Seq[Any]: a bare Seq(i, …, f.meanLum) would unify to
              // Seq[Double] and silently widen the Int fields
              Row.fromSeq(r.toSeq ++ Seq[Any](i, f.width, f.height, f.meanLum))
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Frame-sampling stub for video-typed rows in containers the JDK
    * cannot demux (MP4/WebM — see [[VideoCodec]] for the real GIF path):
    * emits `n` (media_id, frame_idx, frame_hash) rows per video —
    * explode-shaped, no state. */
  def sampleFrames(media: DataFrame, n: Int): DataFrame =
    media.filter(col("media_type") === "video")
      .select(col("media_id"), explode(sequence(lit(0), lit(n - 1))).as("frame_idx"),
        col("content"))
      .withColumn("frame_hash",
        md5(concat(md5(col("content")), col("frame_idx").cast("string"))))
      .drop("content")
}
