package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline: media payloads
  * travel as opaque `binary` columns next to a typed metadata struct; the
  * decode / feature-extract steps run per-partition over batches.
  *
  * Image decode is REAL: PNG/JPEG payloads go through the JDK's
  * `javax.imageio.ImageIO` (no external codec dependency) — true
  * width/height/format/pixels come off the decoded raster. Payloads ImageIO
  * cannot identify (audio, video, arbitrary bytes) fall back to
  * `fakeDecode`, a deterministic stand-in that keeps the distributed
  * plumbing exercised for media types this container has no codec for.
  */
object Multimodal {

  /** The asset schema: payload + typed metadata, the shape a 100 TB media
    * lakehouse table would use (payload column kept out of stats-heavy
    * queries via column pruning; metadata queryable without touching
    * bytes). */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("format", StringType, nullable = true),
    )), nullable = true),
  ))

  /** Build an asset table from any (id, string) source — the string bytes
    * stand in for a media payload. Pure column ops. */
  def toAssets(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      lit("image/fake").as("media_type"),
      col(textCol).cast("binary").as("payload"),
      struct(
        (length(col(textCol)) % 1024).cast("int").as("width"),
        (length(col(textCol)) % 768).cast("int").as("height"),
        lit("fake").as("format")).as("meta"))

  final case class AssetFeatures(asset_id: Long, n_bytes: Int,
                                 feature: Array[Float])

  // ── real image codec (JDK ImageIO — no external dependency) ──────────

  /** Deterministic gray value for synthesized test images; the DuckDB
    * oracle reproduces the same arithmetic, so a query that ENCODES with
    * this and then truly DECODES the PNG bytes is hash-checkable. */
  def grayAt(x: Int, y: Int, seed: Long): Int =
    ((x.toLong * 7 + y.toLong * 13 + seed) % 256).toInt

  /** Encode a real 8-bit grayscale PNG with `grayAt` pixels. PNG is
    * lossless, so every sample round-trips exactly through decode. */
  def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, grayAt(x, y, seed)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  final case class DecodedImage(width: Int, height: Int, format: String,
                                pixel_sum: Long, image: java.awt.image.BufferedImage)

  /** Real decode: sniff the format with ImageIO's reader registry, decode
    * the pixels, and sum band-0 samples (an order-independent integer
    * checksum of the raster). None when no installed reader recognizes the
    * bytes — the caller's cue to use the fallback path. */
  def decodeImage(bytes: Array[Byte]): Option[DecodedImage] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      if (iis == null) return None
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val fmt = reader.getFormatName.toLowerCase
            val img = reader.read(0)
            val raster = img.getRaster
            var sum = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) { sum += raster.getSample(x, y, 0); x += 1 }
              y += 1
            }
            Some(DecodedImage(img.getWidth, img.getHeight, fmt, sum, img))
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case _: java.io.IOException => None }
  }

  // ── real audio codec (JDK javax.sound.sampled — no external dep) ─────

  /** Deterministic signed 16-bit sample for synthesized test audio; the
    * DuckDB oracle reproduces the arithmetic, so a query that ENCODES
    * with this and truly DECODES the WAV container is hash-checkable. */
  def pcmAt(i: Int, seed: Long): Int =
    ((i.toLong * 37 + seed) % 65536L).toInt - 32768

  /** Encode a real 16-bit PCM mono WAV (8 kHz) with `pcmAt` samples.
    * PCM is lossless: every sample round-trips exactly. */
  def encodeWav(nSamples: Int, seed: Long): Array[Byte] = {
    require(nSamples > 0, s"bad sample count $nSamples")
    import javax.sound.sampled._
    val bytes = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = pcmAt(i, seed)
      bytes(2 * i) = (s & 0xFF).toByte        // little-endian
      bytes(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  final case class DecodedAudio(sample_rate: Int, channels: Int, bits: Int,
                                n_frames: Long, sample_sum: Long)

  /** Real audio decode: javax.sound.sampled parses the WAV container
    * (format chunk → rate/channels/bits, data chunk → frames) and the
    * PCM samples are summed as a lossless integer checksum. None when no
    * installed reader recognizes the bytes (MP3/OGG have no JDK codec —
    * those fall back like non-image payloads do). */
  def decodeAudio(payload: Array[Byte]): Option[DecodedAudio] = {
    if (payload == null || payload.isEmpty) return None
    import javax.sound.sampled._
    try {
      val ais = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val f = ais.getFormat
        val data = ais.readAllBytes()
        var sum = 0L
        if (f.getSampleSizeInBits == 16 && !f.isBigEndian) {
          var i = 0
          while (i + 1 < data.length) {
            sum += ((data(i) & 0xFF) | (data(i + 1).toInt << 8)).toShort
            i += 2
          }
        }
        Some(DecodedAudio(f.getSampleRate.toInt, f.getChannels,
          f.getSampleSizeInBits,
          data.length.toLong / math.max(1, f.getFrameSize), sum))
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException                               => None
    }
  }

  /** Synthesize an asset table with REAL WAV payloads, frame counts
    * deterministic from the id — the audio twin of
    * `synthesizeImageAssets`. */
  def synthesizeAudioAssets(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map { id => (id, encodeWav(wavSamples(id), seed = id)) })
      .toDF("asset_id", "payload")
      .select(col("asset_id"), lit("audio/wav").as("media_type"),
        col("payload"),
        struct(lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height"),
          lit(null).cast("string").as("format")).as("meta"))
  }

  def wavSamples(id: Long): Int = (50 + id % 200).toInt

  final case class AudioMeta(asset_id: Long, sample_rate: Int, channels: Int,
                             bits: Int, n_frames: Long, sample_sum: Long)

  /** Real decode pass over audio assets — narrow mapPartitions,
    * undecodable payloads dropped (quarantine in production). */
  def decodeAudios(assets: DataFrame): Dataset[AudioMeta] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeAudio(bytes).map(d => AudioMeta(id, d.sample_rate, d.channels,
          d.bits, d.n_frames, d.sample_sum))
      })
  }

  /** FALLBACK decoder for media types this container has no codec for
    * (video, compressed audio): derives a deterministic 8-dim feature
    * from the raw bytes so the distributed plumbing still runs
    * end-to-end. */
  def fakeDecode(payload: Array[Byte]): Array[Float] = {
    val f = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      f(i % 8) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    f
  }

  /** Real image feature: 8-bin histogram of band-0 samples, normalized by
    * pixel count (sums to 1). None for non-image payloads. */
  def imageFeature(bytes: Array[Byte]): Option[Array[Float]] =
    decodeImage(bytes).map { d =>
      val raster = d.image.getRaster
      val counts = new Array[Long](8)
      var y = 0
      while (y < d.height) {
        var x = 0
        while (x < d.width) {
          // clamp the bin: >8-bit samples (16-bit gray PNGs decode to
          // values up to 65535) must not index past the 8 bins
          counts(math.min(7, raster.getSample(x, y, 0) >> 5)) += 1
          x += 1
        }
        y += 1
      }
      val n = d.width.toLong * d.height
      counts.map(c => c.toFloat / n)
    }

  /** Real audio feature: 8-bin histogram of PCM amplitude magnitude
    * (bin = |sample| >> 12 for 16-bit), normalized by frame count. None
    * for non-audio payloads. */
  def audioFeature(bytes: Array[Byte]): Option[Array[Float]] =
    decodeAudio(bytes).filter(d => d.bits == 16 && d.n_frames > 0).map { _ =>
      import javax.sound.sampled._
      val ais = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val data = ais.readAllBytes()
        val counts = new Array[Long](8)
        var n = 0L
        var i = 0
        while (i + 1 < data.length) {
          val s = ((data(i) & 0xFF) | (data(i + 1).toInt << 8)).toShort
          counts(math.min(7, math.abs(s.toInt) >> 12)) += 1
          n += 1
          i += 2
        }
        counts.map(c => c.toFloat / math.max(1L, n))
      } finally ais.close()
    }

  /** Feature extraction over asset batches: mapPartitions so the codec
    * amortizes per-task init across its partition — the Scala analogue of
    * a pandas-batched UDF. Image payloads get a REAL decoded pixel
    * histogram, audio payloads a REAL PCM amplitude histogram;
    * unrecognized bytes fall back to the deterministic stub. */
  def extractFeatures(assets: DataFrame): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-task init for a heavier decoder would go here
        rows.map { case (id, bytes) =>
          val payload = if (bytes == null) Array.empty[Byte] else bytes
          AssetFeatures(id, payload.length,
            imageFeature(payload)
              .orElse(audioFeature(payload))
              .getOrElse(fakeDecode(payload)))
        }
      }
  }

  /** Synthesize an asset table with REAL PNG payloads: dims derive
    * deterministically from the id (so an oracle can predict the decoded
    * output), pixels from `grayAt`. Metadata is left null — on ingest the
    * payload arrives first and decode fills the meta, which is exactly
    * what `decodeImages` does. */
  def synthesizeImageAssets(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        (id, encodePng(imgWidth(id), imgHeight(id), seed = id))
      })
      .toDF("asset_id", "payload")
      .select(col("asset_id"), lit("image/png").as("media_type"),
        col("payload"),
        struct(lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height"),
          lit(null).cast("string").as("format")).as("meta"))
  }

  /** Deterministic synthesized-image dims (small: encode stays cheap even
    * over millions of rows; the shape — not the pixel count — is what the
    * pipeline exercises). */
  def imgWidth(id: Long): Int = (4 + id % 29).toInt
  def imgHeight(id: Long): Int = (3 + id % 17).toInt

  final case class ImageMeta(asset_id: Long, width: Int, height: Int,
                             format: String, pixel_sum: Long)

  /** Real decode pass over an asset table: ImageIO parses each payload's
    * actual bytes; undecodable payloads are dropped (a production pipeline
    * would route them to a quarantine sink). Narrow mapPartitions — no
    * shuffle, payload column pruned everywhere downstream. */
  def decodeImages(assets: DataFrame): Dataset[ImageMeta] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeImage(bytes).map(d =>
          ImageMeta(id, d.width, d.height, d.format, d.pixel_sum))
      })
  }

  /** Real image resize: decode, nearest-neighbor downscale to
    * `targetWidth` (aspect preserved, never upscales), re-encode PNG, and
    * rewrite the metadata from the dimensions actually applied — payload
    * and meta cannot drift. Non-image payloads pass through unchanged.
    * Narrow map, no shuffle. */
  def resizeImages(assets: DataFrame, targetWidth: Int = 256): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val out = assets
      .select(col("asset_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, mt, bytes) =>
        decodeImage(bytes) match {
          case Some(d) if d.width > targetWidth =>
            val nw = targetWidth
            val nh = math.max(1, (d.height.toLong * nw / d.width).toInt)
            val img = new java.awt.image.BufferedImage(
              nw, nh, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val src = d.image.getRaster; val dst = img.getRaster
            var y = 0
            while (y < nh) {
              var x = 0
              while (x < nw) {
                // clamp into the 8-bit output raster: a deeper source
                // sample (16-bit gray) would otherwise wrap modulo 256
                dst.setSample(x, y, 0, math.min(255,
                  src.getSample(x * d.width / nw, y * d.height / nh, 0)))
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            (id, mt, bos.toByteArray, nw, nh, "png")
          case Some(d) => (id, mt, bytes, d.width, d.height, d.format)
          case None    => (id, mt, bytes, -1, -1, null: String)
        }
      })
      .toDF("asset_id", "media_type", "payload", "w", "h", "fmt")
    out.select(col("asset_id"), col("media_type"), col("payload"),
      struct(
        when(col("w") >= 0, col("w")).as("width"),
        when(col("h") >= 0, col("h")).as("height"),
        col("fmt").as("format")).as("meta"))
  }

  /** Resize stub: a real implementation decodes, scales to
    * `targetWidth`, and re-encodes; this deterministically downsamples
    * the payload bytes by the same ratio and rewrites the metadata —
    * exercising the real pipeline shape (payload AND meta must change
    * together, new width propagates, narrow map, no shuffle). */
  def resize(assets: DataFrame, targetWidth: Int = 256): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val resized = assets
      .select(col("asset_id"), col("payload"), col("meta.width").as("w"))
      .as[(Long, Array[Byte], Int)]
      .map { case (id, payload, w) =>
        val bytes = if (payload == null) Array.empty[Byte] else payload
        // ceil ratio guarantees the new width lands <= target; the new
        // metadata width derives from the APPLIED ratio so payload and
        // meta stay consistent (w=600,target=256 -> ratio 3, width 200)
        val ratio = if (w <= 0 || w <= targetWidth) 1
                    else (w + targetWidth - 1) / targetWidth
        val out =
          if (ratio == 1) bytes
          else Array.tabulate(bytes.length / ratio)(i => bytes(i * ratio))
        (id, out, if (w <= 0) w else w / ratio)
      }
      .toDF("asset_id", "payload2", "new_width")
    assets.join(resized, "asset_id")
      .select(col("asset_id"), col("media_type"),
        col("payload2").as("payload"),
        struct(col("new_width").as("width"), col("meta.height").as("height"),
          col("meta.format").as("format")).as("meta"))
  }

  /** Frame-sampling stub: pick every `stride`-th byte window as a "frame",
    * emitting (asset_id, frame_no, frame_bytes) — the explode-shaped op a
    * video pipeline needs, with deterministic fake frames. */
  def sampleFrames(assets: DataFrame, frameLen: Int = 16,
                   stride: Int = 64): DataFrame =
    assets.select(col("asset_id"),
        posexplode(expr(
          s"transform(sequence(0, greatest(int(length(payload) / $stride) - 1, 0))," +
            s" i -> substring(payload, i * $stride + 1, $frameLen))")))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame_bytes")
}
