package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.conf.{DumpConf, FieldMapping}
import graft.ops.CoreOps

/** Orchestration of the reference's 3-stage pipeline (dumpToTarget,
  * HiveToMysql.java:192-216) collapsed into one lazy Spark plan:
  *
  *   scan -> ds filter -> project(mapping+constants) -> normalize -> sink
  *
  * Stage-skip flags (skip_dump_to_local_file etc., dump.conf:24-26) existed
  * because each reference stage materialized an on-disk artifact; in Spark
  * there are no mid-pipeline files, so the flags degrade to: skipScan has no
  * meaning (kept for conf compat), skipTransform passes the scan through
  * unmapped, skipSink returns the DataFrame without writing.
  *
  * Dry-run (`mode=test`, HiveToMysql.java:560-564) prints the optimized
  * plan instead of executing — the Spark analogue of printing the would-be
  * shell commands.
  */
object Pipeline {

  /** Build the lazy plan for a conf+mapping against a date-derived ds. */
  def plan(spark: SparkSession, sfDir: String, table: String,
           dateColumn: String, conf: DumpConf, mapping: FieldMapping)
      : DataFrame = {
    val scanned = CoreOps.scanSource(spark, sfDir, table, conf.hiveDb)
    val withDs = scanned.withColumn(
      "ds", CoreOps.withDs(org.apache.spark.sql.functions.col(dateColumn),
                           conf.dsFormat))
    val filtered = CoreOps.partitionFilter(
      withDs, org.apache.spark.sql.functions.col("ds"), conf.ds())
    val projected =
      if (conf.skipTransform) filtered
      else CoreOps.project(filtered, mapping, conf.raw, conf.missingFieldPolicy)
    CoreOps.normalizeNulls(projected)
  }

  /** Run end-to-end. Returns the row count written (0 on dry-run).
    * `sink` receives the final DataFrame; empty-data policy applies first
    * (HiveToMysql.java:200-207). */
  def run(spark: SparkSession, sfDir: String, table: String,
          dateColumn: String, conf: DumpConf, mapping: FieldMapping)
         (sink: DataFrame => Unit): Long = {
    val df = plan(spark, sfDir, table, dateColumn, conf, mapping)
    if (conf.dryRun) {
      // plan-only: the Spark analogue of mode=test printing shell commands
      df.explain("formatted")
      0L
    } else {
      // persist so the pipeline computes ONCE: the count (which also
      // serves as the empty-data check) materializes the cache and the
      // sink reads it back — not a second scan->filter->project execution
      val cached = df.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val n = cached.count()
        if (n == 0 && conf.emptyDataPolicy == graft.conf.EmptyDataPolicy.Fail)
          throw graft.GraftError.NoData("pipeline produced zero rows")
        if (!conf.skipSink && n > 0) sink(cached)
        n
      } finally cached.unpersist()
    }
  }
}
