package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline: media payloads
  * travel as opaque `binary` columns next to a typed metadata struct; the
  * decode / feature-extract steps run per-partition over batches.
  *
  * The actual codec work is STUBBED (this container has no image/audio
  * libraries): `fakeDecode` derives deterministic pseudo-features from the
  * bytes. Everything Spark-side — schema, batch iteration, partitioning,
  * output shape — is real and tested, so swapping in a real decoder is a
  * one-function change.
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

  /** STUB decoder: a real implementation would decode the payload
    * (image/audio frame) and emit pixel/spectral features; this derives a
    * deterministic 8-dim feature from the raw bytes so the distributed
    * plumbing (per-partition batching, fixed-width float output, no
    * driver collect) is exercised end-to-end. */
  def fakeDecode(payload: Array[Byte]): Array[Float] = {
    val f = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      f(i % 8) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    f
  }

  /** Feature extraction over asset batches: mapPartitions so a real codec
    * could amortize per-task init (model load, JNI context) across its
    * partition — the Scala analogue of a pandas-batched UDF. */
  def extractFeatures(assets: DataFrame): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-task init for a real decoder would go here
        rows.map { case (id, bytes) =>
          val payload = if (bytes == null) Array.empty[Byte] else bytes
          AssetFeatures(id, payload.length, fakeDecode(payload))
        }
      }
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
