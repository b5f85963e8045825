package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkEntry, SparkSpec}

/** Analysis canary over the WHOLE registered-query surface against the
  * shipped testdata.
  *
  * Motivation (round 11 post-mortem): the driver regenerated
  * events.parquet with `ts` as parquet TIMESTAMP(µs, isAdjustedToUTC=false)
  * — Spark's TIMESTAMP_NTZ — where the old layout was int64 nanos.
  * `unix_micros(ts)` in ev05/ev07 then failed ANALYSIS, but only
  * ExecutionModeParitySpec happened to execute ev05, so the break surfaced
  * as a parity failure rather than a named "this query no longer analyzes
  * against the shipped data" failure, and ev07 had no in-suite signal at
  * all. This spec calls `fn(spark, sfDir).schema` for EVERY
  * SparkEntry.queries entry — schema forces full analysis (column
  * resolution + type checking) without executing the plan — so any future
  * testdata schema/type drift fails here with the query's name.
  *
  * Cost note: analysis is milliseconds per query; a handful of queries
  * (t25's duplication probe, s13's centroid training) run a small bounded
  * job at plan-build time, which keeps this suite in seconds at sf0.001.
  */
class AnalysisCanarySpec extends SparkSpec {

  private lazy val sfDirs = Seq(sf, s"$testdataRoot/sf0.01")

  for (dir <- sfDirs) {
    test(s"every registered query analyzes against $dir") {
      val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          try { fn(spark, dir).schema; None }
          catch { case e: Throwable => Some(s"$name: ${e.toString.linesIterator.next()}") }
      }
      assert(failures.isEmpty,
        s"queries failing analysis against $dir:\n  " + failures.mkString("\n  "))
    }
  }

  test("registry surface is non-trivial and oracle-complete") {
    // A refactor that empties the registry (or drops oracle entries) must
    // not let the canary pass vacuously.
    assert(SparkEntry.queries.size >= 89)
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet)
  }

  // ---- normalizeTs contract: all three input shapes → TimestampType ----

  import spark.implicits._

  test("normalizeTs: int64 nanos input → TimestampType, µs-exact") {
    val ns = 1704067200123456789L // 2024-01-01T00:00:00.123456789Z
    val df = EventQueries.normalizeTs(Seq(ns).toDF("ts"))
    assert(df.schema("ts").dataType == TimestampType)
    val us = df.select(unix_micros(col("ts"))).as[Long].head()
    assert(us == ns / 1000L) // truncated, not rounded
  }

  test("normalizeTs: TIMESTAMP_NTZ input → TimestampType, instant-preserving under UTC") {
    val df0 = Seq("2024-01-01 00:00:00.123456").toDF("s")
      .select(col("s").cast(TimestampNTZType).as("ts"))
    assert(df0.schema("ts").dataType == TimestampNTZType)
    val df = EventQueries.normalizeTs(df0)
    assert(df.schema("ts").dataType == TimestampType)
    val us = df.select(unix_micros(col("ts"))).as[Long].head()
    assert(us == 1704067200123456L)
  }

  test("normalizeTs: TIMESTAMP input passes through unchanged") {
    val df0 = Seq("2024-01-01 00:00:00.123456").toDF("s")
      .select(col("s").cast(TimestampType).as("ts"))
    val df = EventQueries.normalizeTs(df0)
    assert(df.schema("ts").dataType == TimestampType)
    val us = df.select(unix_micros(col("ts"))).as[Long].head()
    assert(us == 1704067200123456L)
  }

  test("shipped events.parquet normalizes to TimestampType (whatever its on-disk layout)") {
    for (dir <- sfDirs) {
      val df = EventQueries.readEvents(spark, dir)
      assert(df.schema("ts").dataType == TimestampType,
        s"$dir/events.parquet: normalized ts is ${df.schema("ts").dataType}")
    }
  }

  test("the legacy int64-nanos events layout still runs end-to-end") {
    // The regenerated testdata dropped the old ns-as-int64 layout, so no
    // shipped dir exercises normalizeTs's LongType branch beyond the unit
    // pin above — replant it and run a real event query through it.
    val dir = trackedTempDir("graft-nslayout")
    EventQueries.readEvents(spark, sf) // normalized TIMESTAMP → µs is legal
      .withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val legacy = spark.read.parquet(s"$dir/events.parquet")
    assert(legacy.schema("ts").dataType == LongType) // the old shape, truly
    val out = SparkEntry.queries("ev05_asof_view_click")(spark, dir)
    assert(out.schema("view_us").dataType == LongType)
    val expected = SparkEntry.queries("ev05_asof_view_click")(spark, sf)
    // same instants through either layout → identical result set
    assert(out.exceptAll(expected).isEmpty && expected.exceptAll(out).isEmpty)
  }

  test("a planted type-drifted events table fails analysis loudly, by name") {
    // The canary's reason to exist, demonstrated: regenerate events with a
    // ts layout normalizeTs does NOT know (string), and the same analysis
    // probe that greens the shipped dirs must throw for the event queries.
    val dir = trackedTempDir("graft-drift")
    spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts", date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ex = intercept[Throwable] {
      SparkEntry.queries("ev05_asof_view_click")(spark, dir).schema
    }
    assert(ex.toString.toLowerCase.contains("datatype_mismatch")
      || ex.toString.toLowerCase.contains("cannot resolve"),
      s"expected an analysis error, got: $ex")
  }
}
