package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketingSpec extends SparkSpec with graft.IsolatedSession {

  private def withNoBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private def dropStale(table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // a table dir left behind by a previous JVM is unknown to this
    // session's in-memory catalog but still blocks CREATE (location check)
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(loc)
    }
  }

  test("join of two tables bucketed on the key runs with NO shuffle") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    dropStale("b_lineitem"); dropStale("b_orders")
    Bucketing.writeBucketed(li, "b_lineitem", "l_orderkey", buckets = 8)
    Bucketing.writeBucketed(ord, "b_orders", "l_orderkey", buckets = 8)
    withNoBroadcast {
      val joined = spark.table("b_lineitem").join(spark.table("b_orders"),
        "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed equi-join must not shuffle either side:\n$plan")
      assert(plan.contains("SortMergeJoin"),
        "co-located buckets merge-join without movement")
      // and it is not just a plan curiosity — the rows are right
      val expected = li.join(ord, "l_orderkey").count()
      assert(joined.count() == expected && expected > 0)
    }
  }

  test("aggregation on the bucket key also skips its Exchange") {
    withNoBroadcast {
      val agg = spark.table("b_lineitem").groupBy("l_orderkey")
        .agg(sum("l_quantity").as("q"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucket-keyed aggregation must not shuffle:\n$plan")
    }
  }

  test("a join on a NON-bucket key still shuffles (the contract is the key)") {
    withNoBroadcast {
      val other = spark.table("b_orders")
        .withColumnRenamed("l_orderkey", "k")
      val joined = spark.table("b_lineitem")
        .join(other, col("l_quantity") === col("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"),
        "joining on a different column must fall back to a shuffle")
    }
  }
}
