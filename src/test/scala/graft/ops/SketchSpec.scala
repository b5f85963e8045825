package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Approximate-aggregate (sketch) support: HyperLogLog++ distinct counts
  * and t-digest-style quantiles are Spark builtins and the right tool at
  * 100 TB (fixed-size sketch state, mergeable across partitions, one
  * pass). They cannot be DuckDB-hash-oracled — different engines, different
  * sketches — so correctness here is error-bound checks against the exact
  * answers the engine also computes (e11 is the exact-median twin). */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct (HLL++) lands within its rsd bound") {
    val ord = spark.read.parquet(s"$sf/orders.parquet")
    val row = ord.agg(
      countDistinct(col("o_custkey")).as("exact"),
      approx_count_distinct(col("o_custkey"), rsd = 0.02).as("approx"))
      .collect().head
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    val err = math.abs(approx - exact).toDouble / exact
    assert(err <= 0.06, f"HLL error $err%.4f exceeds 3x the 2%% target rsd")
  }

  test("approx_percentile brackets the exact two-phase median") {
    val ord = spark.read.parquet(s"$sf/orders.parquet")
    val approx = ord.agg(percentile_approx(col("o_totalprice"), lit(0.5),
      lit(10000)).as("m")).collect().head.getDouble(0)
    // exact median per the engine's own two-phase operator, globally
    val exact = graft.queries.EngineQueries.exactMedian(spark, sf)
      .agg(avg(col("median_price"))).collect().head.getDouble(0)
    // per-priority medians of a uniform price distribution sit near the
    // global median; the sketch must land in the same region
    assert(math.abs(approx - exact) / exact < 0.1,
      s"approx median $approx too far from exact-median region $exact")
  }

  test("per-group HLL distinct counts track the oracled exact twin (e23)") {
    val exact = graft.queries.EngineQueries.distinctCounts(spark, sf)
      .collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Long]("n_parts"), r.getAs[Long]("n_supps"))).toMap
    val approx = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), rsd = 0.02).as("p"),
        approx_count_distinct(col("l_suppkey"), rsd = 0.02).as("s"))
      .collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Long]("p"), r.getAs[Long]("s"))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (g, (ep, es)) =>
      val (ap, as_) = approx(g)
      assert(math.abs(ap - ep).toDouble / ep <= 0.06,
        s"group $g parts: approx $ap vs exact $ep")
      assert(math.abs(as_ - es).toDouble / es <= 0.06,
        s"group $g supps: approx $as_ vs exact $es")
    }
  }

  test("approx_percentile lands near every oracled exact quartile (e20)") {
    val exact = graft.queries.EngineQueries.quartiles(spark, sf)
      .select(col("o_orderpriority"), col("p"),
        col("q_value").cast("double").as("q"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val approx = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy(col("o_orderpriority"))
      .agg(percentile_approx(col("o_totalprice").cast("double"),
        array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("qs"))
      .collect()
      .flatMap { r =>
        val g = r.getString(0)
        r.getSeq[Double](1).zip(Seq(0.25, 0.5, 0.75))
          .map { case (v, p) => (g, p) -> v }
      }.toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e) / e <= 0.02,
        s"quartile $k: approx ${approx(k)} vs exact $e")
    }
  }

  test("sketches merge across partitions (repartitioning changes nothing)") {
    val ord = spark.read.parquet(s"$sf/orders.parquet")
    def hll(parts: Int) = ord.repartition(parts)
      .agg(approx_count_distinct(col("o_custkey"), rsd = 0.02))
      .collect().head.getLong(0)
    assert(hll(2) == hll(13),
      "HLL++ result must be partitioning-independent (mergeable sketch)")
  }
}
