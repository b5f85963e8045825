package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: points matched to the intervals
  * `[lo, hi)` that contain them.
  *
  * Spark plans a bare `p >= lo AND p < hi` join as BroadcastNestedLoop
  * (fine for a handful of tiers) or, without a broadcastable side, as a
  * cartesian-with-filter — |points| × |intervals| comparisons, dead at
  * scale. The scale path here is BUCKETING: pick a bucket width, explode
  * each interval into the buckets it overlaps, hash each point to its
  * bucket, equi-join on the bucket, then apply the exact containment
  * filter. The shuffle key is the bucket, work is
  * |points| + Σ(interval span / width) — linear, skew-controlled by the
  * width choice, and the equi-join gets all of Spark's machinery (AQE,
  * broadcast if the exploded intervals are small, codegen).
  */
object Ranges {

  /** `points` keeps all its columns; matching interval rows contribute
    * their columns (inner join: unmatched points drop). `lo` inclusive,
    * `hi` exclusive. Intervals must not be wider than ~millions of
    * buckets each (explode cost); pick `width` near the median interval
    * span. */
  def bucketedRangeJoin(points: DataFrame, ptCol: String,
                        intervals: DataFrame, loCol: String, hiCol: String,
                        width: Double): DataFrame = {
    require(width > 0, "bucket width must be positive")
    val pB = points.withColumn("__bucket",
      floor(col(ptCol) / width).cast("long"))
    // hi is exclusive: an interval ending exactly on a bucket boundary
    // does not reach into that bucket
    val loB = floor(col(loCol) / width).cast("long")
    val hiB = floor(col(hiCol) / width).cast("long") -
      when(col(hiCol) === floor(col(hiCol) / width) * width, 1L).otherwise(0L)
    val iB = intervals
      .withColumn("__bucket", explode(sequence(loB, greatest(hiB, loB))))
    pB.join(iB, Seq("__bucket"))
      .where(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("__bucket")
  }
}
