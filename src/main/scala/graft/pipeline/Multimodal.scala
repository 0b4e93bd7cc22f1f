package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extraction /
  * resize / frame-sampling operators.
  *
  * The ACTUAL codec step is STUBBED (this container has no image/audio
  * libraries): [[decodeFeaturesStub]] produces a deterministic fake
  * feature vector from the payload bytes. Everything around it — schema,
  * batch shape (mapPartitions over iterator batches, the Scala analogue
  * of mapInPandas), partitioning for decode parallelism, metadata
  * propagation — is real and tested, so swapping in a real decoder is a
  * one-function change.
  */
object Multimodal {

  /** one decoded media item. */
  case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, duration_ms: Long)

  /** extracted features per item (what a real CNN/codec stage would emit). */
  case class MediaFeatures(doc_id: Long, kind: String, feat_dim: Int,
      feat_mean: Double, features: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  /** Attach a deterministic fake binary payload + metadata to a corpus
    * (stand-in for reading real media files alongside the documents).
    * Payload bytes derive from sha2(text) — stable across runs. */
  def attachMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = sha2(col(textCol).cast(StringType), 256)
    val payload = unhex(concat(h, h, h, h)) // 128 deterministic bytes
    docs.select(
      col(idCol).cast(LongType).as("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast(IntegerType)).as("kind"),
      payload.as("payload"),
      (pmod(xxhash64(col(textCol)), lit(1024L)) + 32).cast(IntegerType).as("width"),
      (pmod(xxhash64(col(textCol), lit(1)), lit(768L)) + 32).cast(IntegerType).as("height"),
      (pmod(xxhash64(col(textCol), lit(2)), lit(60000L)) + 1000).cast(LongType)
        .as("duration_ms"))
  }

  /** Decode + feature-extract. Runs as mapPartitions so a real decoder
    * amortizes model/codec init once per partition (the reason mapInPandas
    * batches exist). Repartition first so decode parallelism is
    * independent of upstream file splits.
    *
    * STUB: features are a deterministic hash-fold of the payload — replace
    * the body of `fakeDecode` with a real codec call to productionize. */
  def decodeFeaturesStub(media: DataFrame, featDim: Int = 8,
      decodeParallelism: Int = 0): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val balanced =
      if (decodeParallelism > 0) media.repartition(decodeParallelism, col("doc_id"))
      else media
    balanced.as[MediaRow].mapPartitions { rows =>
      // per-partition init would go here (codec handles, model weights)
      rows.map { r =>
        val feats = fakeDecode(r.payload, featDim)
        MediaFeatures(r.doc_id, r.kind, featDim,
          feats.map(_.toDouble).sum / featDim, feats)
      }
    }
  }

  /** ??? real decoder goes here — deterministic fake: fold payload bytes
    * into featDim buckets. */
  private def fakeDecode(payload: Array[Byte], featDim: Int): Array[Float] = {
    val acc = new Array[Float](featDim)
    var i = 0
    while (i < payload.length) {
      acc(i % featDim) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    acc
  }

  /** "Resize": metadata transform + payload truncation proportional to the
    * area change (real resize = swap the binary transform; the columnar
    * plumbing — no shuffle, codegen'd substring on binary — is the point). */
  def resize(media: DataFrame, newWidth: Int, newHeight: Int): DataFrame =
    media.withColumn("payload",
        expr(s"substring(payload, 1, greatest(int(length(payload) * " +
          s"least(1.0, ($newWidth * $newHeight) / (width * height))), 1))"))
      .withColumn("width", lit(newWidth))
      .withColumn("height", lit(newHeight))

  /** Frame sampling for video rows: splits the payload into `frames`
    * equal chunks and explodes to one row per sampled frame — the shape a
    * real ffmpeg-style sampler produces. */
  def frameSample(media: DataFrame, frames: Int): DataFrame = {
    val frameSize = greatest((length(col("payload")) / frames)
      .cast(IntegerType), lit(1))
    media.where(col("kind") === "video")
      .select(col("doc_id"), col("duration_ms"),
        posexplode(transform(sequence(lit(0), lit(frames - 1)),
          i => col("payload").substr(i * frameSize + 1, frameSize))))
      .toDF("doc_id", "duration_ms", "frame_idx", "frame_payload")
      .withColumn("frame_ts_ms",
        (col("frame_idx") * col("duration_ms") / frames).cast(LongType))
  }
}
