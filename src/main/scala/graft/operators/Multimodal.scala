package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.util.hashing.MurmurHash3

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns with a typed metadata
  * struct, and decode/feature steps run as partition-local batch maps.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * environment): [[StubImageDecoder]] produces deterministic fake features
  * from the bytes. Everything around it — schema, batching, partitioning,
  * null handling — is real and tested; swapping in a real decoder changes
  * only the function body.
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

  /** Deterministic stand-in for an image decode + feature extraction:
    * "decodes" bytes into a fixed-dim feature vector + fake width/height
    * derived from a stable hash. Replace the body with a real codec
    * (e.g. javax.imageio / ffmpeg) in a full deployment. */
  object StubImageDecoder extends Serializable {
    val featureDim = 8
    def decode(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
      if (bytes == null || bytes.isEmpty) return (0, 0, Array.fill(featureDim)(0f))
      val h = MurmurHash3.bytesHash(bytes, 42)
      val width = 64 + math.floorMod(h, 1024)
      val height = 64 + math.floorMod(h >> 10, 1024)
      val feats = Array.tabulate(featureDim)(i =>
        MurmurHash3.bytesHash(bytes, i).toFloat / Int.MaxValue.toFloat)
      (width, height, feats)
    }
  }

  /** Decode stage: appends (width, height, features) via a partition-local
    * batch map — the physical shape a real GPU/codec step needs (amortize
    * per-batch setup, stay off the driver). */
  def withDecodedFeatures(media: DataFrame, batchSize: Int = 32): DataFrame = {
    val outSchema = media.schema
      .add(StructField("width", IntegerType))
      .add(StructField("height", IntegerType))
      .add(StructField("features", ArrayType(FloatType)))
    val binIdx = media.schema.fieldIndex("content")
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        // real impl: one codec/GPU call for the whole batch
        rows.map { r =>
          val (w, h, f) = StubImageDecoder.decode(r.getAs[Array[Byte]](binIdx))
          Row.fromSeq(r.toSeq ++ Seq(w, h, f.toSeq))
        }
      }
    }(Encoders.row(outSchema))
  }

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
