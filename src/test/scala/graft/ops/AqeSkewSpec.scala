package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Proof that Spark's AQE skew-join handles the straggler shapes the
  * manual `Skew` salting primitives do NOT need to cover: a planted hot
  * key whose shuffle partition dwarfs the median gets SPLIT at runtime
  * into multiple tasks (the matching side's partition is read once per
  * split). Thresholds are lowered to test scale — production keeps the
  * defaults (factor 5, 256 MB), where the same mechanics engage at real
  * skew sizes. This is the regression pin for "AQE stays enabled in our
  * sessions" (Skew.scala's stated contract).
  */
class AqeSkewSpec extends SparkSpec with graft.IsolatedSession {
  import spark.implicits._

  private val tuned = Seq(
    // a partition is skewed if > factor × median AND > threshold bytes;
    // advisory is the split granularity, kept below the threshold
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
  )

  private def withTuned[A](body: => A): A = {
    val prev = tuned.map { case (k, _) => k -> spark.conf.getOption(k) }
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  // ~100 bytes of payload per row so the hot key's partition crosses the
  // byte threshold with modest row counts
  private def pad(n: Int): String = "x" * n

  test("AQE splits a planted hot key's partition in a shuffle join") {
    withTuned {
      // left: key 0 owns 20k rows (~2 MB); keys 1-40 own 50 rows each
      val hot = spark.range(20000).select(lit(0L).as("k"),
        concat(lit(pad(100)), col("id")).as("payload"))
      val rest = spark.range(2000).select((col("id") % 40 + 1).as("k"),
        concat(lit(pad(100)), col("id")).as("payload"))
      val left = hot.unionAll(rest)
      val right = spark.range(41).select(col("id").as("k"),
        col("id").cast("string").as("dim"))
      val joined = left.join(right, "k")
      // execute THIS QueryExecution (count() would build a separate one
      // whose adaptive plan never finalizes here)
      assert(joined.collect().length == 22000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"AQE must finalize:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected a shuffle join:\n$plan")
      // the AQE-final plan marks both the join and its shuffle reads
      assert(plan.contains("isSkewJoin=true") || plan.contains("skewed"),
        s"AQE must flag the skew-handled join:\n$plan")
    }
  }

  test("no skew flag when partitions are balanced (AQE is not crying wolf)") {
    withTuned {
      val left = spark.range(22000).select((col("id") % 41).as("k"),
        concat(lit(pad(100)), col("id")).as("payload"))
      val right = spark.range(41).select(col("id").as("k"),
        col("id").cast("string").as("dim"))
      val joined = left.join(right, "k")
      assert(joined.collect().length == 22000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("isSkewJoin=true") && !plan.contains("skewed"),
        s"balanced input must not trigger skew handling:\n$plan")
    }
  }
}
