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
  * corpus scale you quarantine those rows, not crash the stage. Video
  * frame-sampling stays a deterministic stub (no container demuxer in the
  * JDK).
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

  /** Resize stage (STUB codec, real plumbing): appends target dims and a
    * deterministic content hash for the resized payload — the transform
    * a real pipeline runs before feature extraction so every image hits
    * the model at a fixed resolution. Pure column expressions: the stub
    * derives the new hash from (content hash, dims), so the stage is
    * oracle-checkable; a real impl swaps in a batched codec map like
    * withDecodedFeatures. */
  def withResized(media: DataFrame, width: Int, height: Int): DataFrame =
    media
      .withColumn("resized_width", lit(width))
      .withColumn("resized_height", lit(height))
      .withColumn("resized_hash",
        md5(concat(col("meta.content_hash"),
          lit(s":${width}x$height"))))

  /** Frame-sampling stub for video-typed rows: emits `n` (media_id,
    * frame_idx, frame_hash) rows per video — explode-shaped, no state. */
  def sampleFrames(media: DataFrame, n: Int): DataFrame =
    media.filter(col("media_type") === "video")
      .select(col("media_id"), explode(sequence(lit(0), lit(n - 1))).as("frame_idx"),
        col("content"))
      .withColumn("frame_hash",
        md5(concat(md5(col("content")), col("frame_idx").cast("string"))))
      .drop("content")
}
