package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Runtime (Bloom) filter injection: when one side of a shuffle join is
  * selectively filtered, Spark can build a Bloom filter from it at runtime
  * and push `might_contain` onto the OTHER side's scan — at 100 TB this
  * turns "shuffle everything then drop 99%" into "drop 99% at the scan".
  * Thresholds are lowered to test scale (the application side here is far
  * under the production 10 GB gate). */
class RuntimeFilterSpec extends SparkSpec with graft.IsolatedSession {

  private val tuned = Seq(
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    // apply even to tiny scans (prod default: only >10GB sides benefit)
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
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

  test("selective dim filter injects a Bloom filter on the fact scan") {
    withTuned {
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
      val ord = spark.read.parquet(s"$sf/orders.parquet")
        .where(col("o_totalprice") > 400000) // selective creation side
        .select("o_orderkey")
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom_filter"),
        s"expected a runtime bloom filter on the fact side:\n$plan")
      // and it is semantics-preserving
      val expected = li.join(
        spark.read.parquet(s"$sf/orders.parquet")
          .where(col("o_totalprice") > 400000).select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    }
  }
}
