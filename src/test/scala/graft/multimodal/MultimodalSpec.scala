package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def assets = Multimodal.toAssets(
    Seq((1L, "hello world"), (2L, "x" * 200), (3L, ""))
      .toDF("id", "t"), "id", "t")

  test("asset table carries binary payload + typed metadata") {
    // same names and types; nullability may tighten for literal columns
    assert(assets.schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq ==
      Multimodal.assetSchema.fields.map(f => (f.name, f.dataType.typeName)).toSeq)
    val r = assets.where(col("asset_id") === 1L).head()
    assert(new String(r.getAs[Array[Byte]]("payload")) == "hello world")
    assert(r.getAs[org.apache.spark.sql.Row]("meta").getAs[Int]("width") == 11)
  }

  test("feature extraction is distributed, deterministic, fixed-width") {
    val f = Multimodal.extractFeatures(assets).collect()
      .map(a => a.asset_id -> a).toMap
    assert(f(1L).n_bytes == 11 && f(2L).n_bytes == 200 && f(3L).n_bytes == 0)
    assert(f.values.forall(_.feature.length == 8))
    // deterministic: same payload -> same features on re-run
    val f2 = Multimodal.extractFeatures(assets).collect()
      .map(a => a.asset_id -> a.feature.toSeq).toMap
    assert(f.view.mapValues(_.feature.toSeq).toMap == f2)
  }

  test("resize shrinks payload and rewrites metadata together") {
    val out = Multimodal.resize(assets, targetWidth = 100)
      .collect().map(r => r.getAs[Long]("asset_id") -> r).toMap
    // asset 2: width 200 -> ratio 2 -> 100 bytes, meta.width becomes 100
    val big = out(2L)
    assert(big.getAs[Array[Byte]]("payload").length == 100)
    assert(big.getAs[org.apache.spark.sql.Row]("meta").getAs[Int]("width") == 100)
    // asset 1 (width 11 <= target): untouched payload, width unchanged
    val small = out(1L)
    assert(new String(small.getAs[Array[Byte]]("payload")) == "hello world")
    assert(small.getAs[org.apache.spark.sql.Row]("meta").getAs[Int]("width") == 11)
    // schema is still the asset schema (round-trips into the same table)
    assert(Multimodal.resize(assets).schema.fields.map(_.name).toSeq ==
      Multimodal.assetSchema.fields.map(_.name).toSeq)
  }

  test("frame sampling explodes payload into strided windows") {
    val frames = Multimodal.sampleFrames(assets, frameLen = 16, stride = 64)
      .where(col("asset_id") === 2L).collect()
    assert(frames.length == 3) // 200 bytes / 64 stride
    assert(frames.map(_.getAs[Int]("frame_no")).toSeq == Seq(0, 1, 2))
    assert(frames.forall(_.getAs[Array[Byte]]("frame_bytes").length == 16))
  }
}
