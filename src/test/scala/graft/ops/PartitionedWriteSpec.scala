package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hive-style partitioned layout: `partitionBy` at write time turns the
  * reference's `where ds=` filter into directory-level PartitionFilters —
  * at 100 TB the scan plans only the matching partition's files and never
  * lists the rest. This is the layout CoreOps.scanSource reads through the
  * catalog on a real warehouse. */
class PartitionedWriteSpec extends SparkSpec {

  test("ds-partitioned write + equality filter prunes at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    spark.read.parquet(s"$sf/lineitem.parquet")
      .withColumn("yr", year(col("l_shipdate")).cast("int"))
      .write.mode("overwrite").partitionBy("yr").parquet(dir)
    val filtered = spark.read.parquet(dir).where(col("yr") === 1996)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("(yr"),
      s"expected a directory-level partition filter in:\n$plan")
    // the data filter list must NOT carry the partition predicate — it is
    // resolved against directories, not rows
    assert(!plan.contains("PushedFilters: [IsNotNull(yr"),
      "partition predicate must not degrade to a row-level filter")
    val expected = spark.read.parquet(s"$sf/lineitem.parquet")
      .where(year(col("l_shipdate")) === 1996).count()
    assert(filtered.count() == expected && expected > 0)
  }
}
