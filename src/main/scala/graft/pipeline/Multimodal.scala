package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extraction /
  * resize / frame-sampling operators.
  *
  * IMAGES decode for real via `javax.imageio` (in-JDK, jar-free):
  * [[decodeFeatures]] reads PNG/JPEG payloads into pixel-derived
  * features and [[resizeImages]] rescales + re-encodes. AUDIO decodes
  * for real via `javax.sound.sampled` (WAV/AIFF/AU PCM — also in-JDK):
  * [[decodeFeatures]] reads payloads into per-span RMS energy features.
  * VIDEO decodes for real as animated GIF (the one multi-frame format
  * `javax.imageio` both encodes and decodes): [[attachVideoMedia]]
  * synthesizes genuine multi-frame clips, [[decodeFeatures]] extracts
  * per-frame luminance over temporal spans, and [[frameSample]] emits
  * real per-frame PNG payloads. The batch shape everywhere is
  * mapPartitions over iterator batches (the Scala analogue of
  * mapInPandas) so decoder init amortizes per partition; swapping GIF
  * for an ffmpeg-class codec is a one-function change.
  */
object Multimodal {
  import java.awt.image.{BufferedImage, IndexColorModel}
  import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
  import javax.imageio.{IIOImage, ImageIO}
  import javax.imageio.stream.{MemoryCacheImageInputStream, MemoryCacheImageOutputStream}
  import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

  /** PNG-encode through an EXPLICIT memory-cached stream. The
    * `ImageIO.write(img, fmt, OutputStream)` overload wraps the target in
    * a DISK-backed cache stream by default — one temp file created,
    * written, and deleted per call. At corpus scale (thousands of rows per
    * partition) that temp-file churn dominates the actual codec cost. */
  private def writePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    try ImageIO.write(img, "png", ios) finally ios.close()
    bos.toByteArray
  }

  /** decode any ImageIO-readable payload via a memory-cached stream (the
    * `ImageIO.read(InputStream)` overload is disk-cache-backed too).
    * `ImageIO.read(ImageInputStream)` closes the stream on success; we
    * only close manually on the null/failure path. */
  private def readImageMem(payload: Array[Byte]): BufferedImage = {
    val iis = new MemoryCacheImageInputStream(new ByteArrayInputStream(payload))
    val img = ImageIO.read(iis)
    if (img == null) { try iis.close() catch { case _: Exception => () } }
    img
  }

  /** 256-level gray palette. VIDEO frames are written indexed against it:
    * GIF stores palette indices, so gray frames round-trip EXACTLY — no
    * quantization — and PNG re-encodes of the same raster decode to the
    * identical pixels (the kernel-parity invariant the specs lock). */
  private lazy val grayPalette: IndexColorModel = {
    val v = Array.tabulate(256)(_.toByte)
    new IndexColorModel(8, 256, v, v, v)
  }

  /** Widen a codec stage's input to the session's default parallelism
    * when the upstream partitioning is coarser. Codec work is CPU-bound
    * per row, so its parallelism must not be capped by file layout — a
    * small single-file parquet scan arrives as ONE partition and would
    * serialize every encode/decode on one core. At cluster scale inputs
    * are already wide and this is a planning-time no-op (no shuffle). */
  private def widen(df: DataFrame, explicit: Int = 0): DataFrame = {
    val target =
      if (explicit > 0) explicit
      else df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

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

  /** Generate REAL PNG payloads for a corpus: one small image per doc,
    * pixels drawn deterministically from (doc id, text hash) by a
    * splitmix-style generator, encoded through `javax.imageio`. Every row
    * is a decodable image — the input [[decodeFeatures]]' real path
    * exercises end to end. */
  def attachImageMedia(docs: DataFrame, idCol: String, textCol: String,
      width: Int = 16, height: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    widen(docs.select(col(idCol).cast(LongType).as("doc_id"),
        col(textCol).cast(StringType).as("text")))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
          var seed = id * 1125899906842597L ^
            (if (text == null) 0L else text.hashCode.toLong)
          var y = 0
          while (y < height) {
            var x = 0
            while (x < width) {
              seed = seed * 6364136223846793005L + 1442695040888963407L
              img.setRGB(x, y, ((seed >>> 33) & 0xFFFFFF).toInt)
              x += 1
            }
            y += 1
          }
          MediaRow(id, "image", writePng(img), width, height, 0L)
        }
      }.toDF()
  }

  /** Generate REAL WAV payloads for a corpus: one short PCM-16 mono clip
    * per doc — a sine tone whose frequency/length derive deterministically
    * from (doc id, text hash) plus low-level LCG noise — encoded through
    * `javax.sound.sampled` (a genuine RIFF/WAVE container). Every row is
    * a decodable clip, so [[decodeFeatures]]' real audio path exercises
    * end to end. */
  def attachAudioMedia(docs: DataFrame, idCol: String, textCol: String,
      sampleRate: Int = 8000, maxMs: Int = 250): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    widen(docs.select(col(idCol).cast(LongType).as("doc_id"),
        col(textCol).cast(StringType).as("text")))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val th = if (text == null) 0L else text.hashCode.toLong
          var seed = id * 2862933555777941757L ^ th
          def next(): Long = { seed = seed * 6364136223846793005L +
            1442695040888963407L; seed >>> 16 }
          val durMs = (50 + math.floorMod(next(), (maxMs - 50).toLong)).toInt
          val freq = 200.0 + math.floorMod(next(), 800L)
          val n = sampleRate * durMs / 1000
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val tone = math.sin(2 * math.Pi * freq * i / sampleRate)
            val noise = (math.floorMod(next(), 64L) - 32) / 1024.0
            val s = math.max(-1.0, math.min(1.0, 0.8 * tone + noise))
            val v = (s * 32767).toInt
            pcm(2 * i) = (v & 0xFF).toByte         // little-endian
            pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
            i += 1
          }
          val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
          val ais = new AudioInputStream(new ByteArrayInputStream(pcm),
            fmt, n.toLong)
          val bos = new ByteArrayOutputStream()
          AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
          MediaRow(id, "audio", bos.toByteArray, 0, 0, durMs.toLong)
        }
      }.toDF()
  }

  /** encode frames as one animated GIF (in-JDK: javax.imageio's GIF
    * writer supports multi-image sequences) */
  private[graft] def encodeGif(frames: Seq[BufferedImage]): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(f => writer.writeToSequence(new IIOImage(f, null, null), null))
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Generate REAL VIDEO payloads for a corpus: one short animated GIF per
    * doc (2..6 frames, 100 ms/frame), gray pixels drawn deterministically
    * from (doc id, text hash) by the same LCG family as the other
    * attachers, frames written INDEXED against the shared gray palette so
    * the codec round-trip is exact. GIF is the one multi-frame format the
    * JDK both encodes and decodes — every row is a genuinely decodable
    * video, closing the last byte-fold stand-in. */
  def attachVideoMedia(docs: DataFrame, idCol: String, textCol: String,
      width: Int = 16, height: Int = 16, maxFrames: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    widen(docs.select(col(idCol).cast(LongType).as("doc_id"),
        col(textCol).cast(StringType).as("text")))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val th = if (text == null) 0L else text.hashCode.toLong
          var seed = id * 3935559000370003845L ^ th
          def next(): Long = { seed = seed * 6364136223846793005L +
            1442695040888963407L; seed >>> 16 }
          val nFrames = (2 + math.floorMod(next(), (maxFrames - 1).toLong)).toInt
          val frames = (0 until nFrames).map { _ =>
            val img = new BufferedImage(width, height,
              BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
            val raster = img.getRaster
            var y = 0
            while (y < height) {
              var x = 0
              while (x < width) {
                raster.setSample(x, y, 0, (next() & 0xFF).toInt)
                x += 1
              }
              y += 1
            }
            img
          }
          MediaRow(id, "video", encodeGif(frames), width, height,
            nFrames * 100L)
        }
      }.toDF()
  }

  /** decode every frame of a multi-image payload (animated GIF). None
    * when the payload is not readable as an image sequence. */
  private[graft] def decodeVideoFrames(
      payload: Array[Byte]): Option[Vector[BufferedImage]] =
    try {
      val iis = new MemoryCacheImageInputStream(new ByteArrayInputStream(payload))
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); None }
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          val frames = (0 until n).map(reader.read(_)).toVector
          if (frames.isEmpty) None else Some(frames)
        } finally { reader.dispose(); iis.close() }
      }
    } catch { case _: Exception => None }

  /** mean luminance of one frame — the same accumulation decodeImage
    * performs with featDim = 1, so a single-frame video feature equals the
    * same raster's image feature bit-for-bit (kernel-parity lock) */
  private def frameMeanLum(img: BufferedImage): Float = {
    val (w, h) = (img.getWidth, img.getHeight)
    var acc = 0f
    var cnt = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        acc += (((rgb >> 16) & 0xFF) * 0.299f +
          ((rgb >> 8) & 0xFF) * 0.587f + (rgb & 0xFF) * 0.114f) / 255f
        cnt += 1
        x += 1
      }
      y += 1
    }
    if (cnt > 0) acc / cnt else 0f
  }

  /** real video decode: per-frame mean luminance, bucketed into featDim
    * equal TEMPORAL spans (images span space, audio spans samples, video
    * spans frames). None when the payload has no decodable frames. */
  private[graft] def decodeVideo(payload: Array[Byte],
      featDim: Int): Option[Array[Float]] =
    decodeVideoFrames(payload).map { frames =>
      val acc = new Array[Float](featDim)
      val cnt = new Array[Int](featDim)
      var i = 0
      while (i < frames.length) {
        val b = (i.toLong * featDim / frames.length).toInt
        acc(b) += frameMeanLum(frames(i)); cnt(b) += 1
        i += 1
      }
      var j = 0
      while (j < featDim) { if (cnt(j) > 0) acc(j) /= cnt(j); j += 1 }
      acc
    }

  /** Decode + feature-extract. Runs as mapPartitions so decoder init
    * amortizes once per partition (the reason mapInPandas batches exist).
    * Repartition first so decode parallelism is independent of upstream
    * file splits.
    *
    * `image` payloads decode for REAL (`javax.imageio` — PNG/JPEG/BMP/GIF):
    * features are per-band mean luminance over `featDim` equal pixel
    * spans. `audio` payloads decode for REAL too (`javax.sound.sampled` —
    * WAV/AIFF/AU): features are per-span RMS energy over the PCM samples.
    * `video` payloads decode for REAL as well (animated GIF via the same
    * `javax.imageio` reader): per-frame mean luminance over featDim
    * temporal spans. Undecodable payloads fall back to the deterministic
    * byte-fold stand-in. */
  def decodeFeatures(media: DataFrame, featDim: Int = 8,
      decodeParallelism: Int = 0): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    widen(media, decodeParallelism).as[MediaRow].mapPartitions { rows =>
      // per-partition init would go here (codec handles, model weights)
      rows.map { r =>
        val feats = (r.kind match {
          case "image" => decodeImage(r.payload, featDim)
          case "audio" => decodeAudio(r.payload, featDim)
          case "video" => decodeVideo(r.payload, featDim)
          case _ => None
        }).getOrElse(fakeDecode(r.payload, featDim))
        MediaFeatures(r.doc_id, r.kind, featDim,
          feats.map(_.toDouble).sum / featDim, feats)
      }
    }
  }

  /** Former stub entry point — now routes through the real decoder
    * (identical batching; opaque payloads take the byte-fold fallback). */
  def decodeFeaturesStub(media: DataFrame, featDim: Int = 8,
      decodeParallelism: Int = 0): Dataset[MediaFeatures] =
    decodeFeatures(media, featDim, decodeParallelism)

  /** real image decode: mean luminance (ITU-R 601) per featDim equal
    * spans of the row-major pixel sequence. None when the payload is not
    * a decodable image. */
  private[graft] def decodeImage(payload: Array[Byte],
      featDim: Int): Option[Array[Float]] =
    try {
      val img = readImageMem(payload)
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val acc = new Array[Float](featDim)
        val cnt = new Array[Int](featDim)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xFF) * 0.299f +
              ((rgb >> 8) & 0xFF) * 0.587f + (rgb & 0xFF) * 0.114f) / 255f
            val b = ((y.toLong * w + x) * featDim / (w.toLong * h)).toInt
            acc(b) += lum; cnt(b) += 1
            x += 1
          }
          y += 1
        }
        var i = 0
        while (i < featDim) { if (cnt(i) > 0) acc(i) /= cnt(i); i += 1 }
        Some(acc)
      }
    } catch { case _: Exception => None }

  /** real audio decode: RMS energy per featDim equal spans of the PCM
    * sample sequence. Any `javax.sound.sampled`-readable container
    * (WAV/AIFF/AU) in any PCM width works — the stream converts to
    * 16-bit signed little-endian first. None when the payload is not
    * decodable audio. */
  private[graft] def decodeAudio(payload: Array[Byte],
      featDim: Int): Option[Array[Float]] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      val src = in.getFormat
      val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        src.getSampleRate, 16, src.getChannels, src.getChannels * 2,
        src.getSampleRate, false)
      val pcm = AudioSystem.getAudioInputStream(pcmFmt, in)
      val bytes = pcm.readAllBytes()
      pcm.close(); in.close()
      val n = bytes.length / 2
      val acc = new Array[Float](featDim)
      if (n == 0) return Some(acc)
      val cnt = new Array[Int](featDim)
      var i = 0
      while (i < n) {
        val s = (((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xFF)).toShort
          / 32768f)
        val b = (i.toLong * featDim / n).toInt
        acc(b) += s * s; cnt(b) += 1
        i += 1
      }
      var j = 0
      while (j < featDim) {
        if (cnt(j) > 0) acc(j) = math.sqrt(acc(j) / cnt(j)).toFloat
        j += 1
      }
      Some(acc)
    } catch { case _: Exception => None }

  /** deterministic byte-fold stand-in for kinds with no in-JDK codec:
    * fold payload bytes into featDim buckets. */
  private def fakeDecode(payload: Array[Byte], featDim: Int): Array[Float] = {
    val acc = new Array[Float](featDim)
    var i = 0
    while (i < payload.length) {
      acc(i % featDim) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    acc
  }

  /** REAL image resize: decode, rescale through a Graphics2D draw (JDK
    * raster ops, headless-safe), re-encode PNG. Non-image rows and
    * undecodable payloads pass through with updated metadata only.
    * Same mapPartitions batching as [[decodeFeatures]]. */
  def resizeImages(media: DataFrame, newWidth: Int,
      newHeight: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    widen(media).as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val resized =
          if (r.kind != "image") None
          else try {
            Option(readImageMem(r.payload)).map { img =>
              val out = new BufferedImage(newWidth, newHeight,
                BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              try g.drawImage(img, 0, 0, newWidth, newHeight, null)
              finally g.dispose()
              writePng(out)
            }
          } catch { case _: Exception => None }
        r.copy(payload = resized.getOrElse(r.payload),
          width = newWidth, height = newHeight)
      }
    }.toDF()
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

  /** Frame sampling for video rows: decodes the payload's REAL frames
    * (animated GIF, in-JDK) and emits `frames` evenly-strided samples,
    * each re-encoded as a standalone PNG — the shape an ffmpeg-style
    * sampler produces, with genuinely decodable per-frame payloads.
    * Payloads with no readable image sequence fall back to the byte-chunk
    * stand-in (same output schema). mapPartitions batching as
    * [[decodeFeatures]]. */
  def frameSample(media: DataFrame, frames: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    widen(media.where(col("kind") === "video")).as[MediaRow]
      .mapPartitions { rows =>
      rows.flatMap { r =>
        val sampled: Seq[Array[Byte]] = decodeVideoFrames(r.payload) match {
          case Some(fs) =>
            (0 until frames).map { k =>
              val srcIdx = (k.toLong * fs.size / frames).toInt
              writePng(fs(srcIdx))
            }
          case None =>
            val fsize = math.max(r.payload.length / frames, 1)
            (0 until frames).map { k =>
              val from = math.min(k * fsize, r.payload.length)
              val until = math.min(from + fsize, r.payload.length)
              java.util.Arrays.copyOfRange(r.payload, from, until)
            }
        }
        sampled.iterator.zipWithIndex.map { case (p, k) =>
          (r.doc_id, r.duration_ms, k, p, r.duration_ms * k / frames)
        }
      }
    }.toDF("doc_id", "duration_ms", "frame_idx", "frame_payload",
      "frame_ts_ms")
  }
}
