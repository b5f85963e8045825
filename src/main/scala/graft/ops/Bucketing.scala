package graft.ops

import org.apache.spark.sql.DataFrame

/** Bucketed-table co-location: the standing answer to "this join/agg
  * shuffles the fact table every night".
  *
  * Writing a table with `bucketBy(n, key)` pins a persistent hash
  * partitioning into the table layout: every later equi-join or
  * aggregation on the bucket key reads the partitioning off the catalog
  * and SKIPS its Exchange — at 100 TB that converts the nightly
  * fact⋈fact join from "shuffle 100 TB twice" to a zero-movement
  * merge of co-located buckets. `sortBy` additionally pre-orders rows
  * inside each bucket so the SortMergeJoin's per-task Sort is a no-op.
  *
  * Rules that make it work (and that BucketingSpec pins):
  *   - both sides bucketed by the join key into the SAME bucket count
  *     (or a multiple, with `spark.sql.bucketing.coalesceBucketsInJoin`);
  *   - the join key must equal the bucket key exactly (no expressions);
  *   - `spark.sql.sources.bucketing.enabled` stays true (default).
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed (and per-bucket
    * sorted) on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, sorted: Boolean = true): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }
}
