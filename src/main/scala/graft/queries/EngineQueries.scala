package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.CoreOps.scan

/** General analytics capabilities beyond the reference's single-table
  * pipeline: aggregation, joins (broadcast / semi / anti), windows, rollup,
  * set ops, scalar function library. These are what make the engine a
  * usable analytics library at 100 TB, and they are the bench workhorses.
  *
  * Determinism-vs-oracle notes (driver hash-compares against DuckDB):
  *   - double SUMs are order-dependent, so every sum first rounds each
  *     addend into an exact DECIMAL, sums exactly, then casts the total
  *     back to double — bit-identical across engines regardless of
  *     partitioning/order.
  *   - every ORDER BY ... LIMIT has a total-order tie-break.
  */
object EngineQueries {

  private def decSum(c: org.apache.spark.sql.Column, scale: Int = 4) =
    sum(c.cast(s"decimal(18,$scale)"))

  /** TPC-H Q1-shaped scan+aggregate: the canonical partial/final hash
    * aggregation. One shuffle on the (tiny-cardinality) group key; all
    * arithmetic inside WholeStageCodegen. */
  def q1Agg(spark: SparkSession, sfDir: String): DataFrame =
    scan(spark, sfDir, "lineitem")
      .where(col("l_shipdate") <= lit("1998-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        decSum(col("l_quantity"), 2).cast("double").as("sum_qty"),
        decSum(col("l_extendedprice"), 2).cast("double").as("sum_base_price"),
        decSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("double").as("sum_disc_price"),
        (decSum(col("l_quantity"), 2).cast("double") / count(lit(1)))
          .as("avg_qty"),
        count(lit(1)).as("count_order"))

  private val q1Oracle =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-shaped 3-way join + top-k. The two small sides (customer
    * filtered to one segment; orders filtered by date) would be
    * shuffle-joined by default at 100 TB — customer gets an explicit
    * broadcast hint; orders⋈lineitem shuffles on the shared key. Top-10 via
    * TakeOrderedAndProject (no global sort). */
  def q3JoinTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = scan(spark, sfDir, "customer")
      .where(col("c_mktsegment") === "BUILDING")
    val ord = scan(spark, sfDir, "orders")
      .where(col("o_orderdate") < lit("1997-01-01"))
    val li = scan(spark, sfDir, "lineitem")
      .where(col("l_shipdate") > lit("1997-01-01"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .agg(decSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val q3Oracle =
    """SELECT l_orderkey,
      |       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY 1, 2
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** ROLLUP over the region→nation→customer dim chain: subtotal rows with
    * NULL group keys. Both dims broadcast (a few rows each). */
  def rollupAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = scan(spark, sfDir, "customer")
    val nat = scan(spark, sfDir, "nation")
    val reg = scan(spark, sfDir, "region")
    cust
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_cust"),
        decSum(col("c_acctbal"), 2).cast("double").as("sum_bal"))
  }

  private val rollupOracle =
    """SELECT r_name, n_name, COUNT(*) AS n_cust,
      |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)""".stripMargin

  /** Left-semi + left-anti joins: customers that have at least one order
    * but none in status 'F'. Semi/anti shuffle only the keys they need and
    * never duplicate rows — the scalable EXISTS/NOT EXISTS. */
  def semiAnti(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = scan(spark, sfDir, "customer")
    val ord = scan(spark, sfDir, "orders")
    cust
      .join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
      .join(ord.where(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
  }

  private val semiAntiOracle =
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin

  /** UNION / INTERSECT / EXCEPT: nations that have customers or suppliers,
    * intersected with nations (sanity), minus nations in region key 0. */
  def setOps(spark: SparkSession, sfDir: String): DataFrame = {
    val cn = scan(spark, sfDir, "customer")
      .select(col("c_nationkey").cast("int").as("k"))
    val sn = scan(spark, sfDir, "supplier")
      .select(col("s_nationkey").cast("int").as("k"))
    val alln = scan(spark, sfDir, "nation")
      .select(col("n_nationkey").cast("int").as("k"))
    val reg0 = scan(spark, sfDir, "nation")
      .where(col("n_regionkey") === 0)
      .select(col("n_nationkey").cast("int").as("k"))
    cn.union(sn).intersect(alln).except(reg0)
  }

  // parenthesized to the Spark evaluation order ((cn ∪ sn) ∩ nation) ∖ reg0
  // — bare SQL would bind INTERSECT tighter than UNION, which only happens
  // to agree here because of the nationkey FK
  private val setOpsOracle =
    """((SELECT CAST(c_nationkey AS INTEGER) AS k FROM customer
      |  UNION SELECT CAST(s_nationkey AS INTEGER) FROM supplier)
      | INTERSECT SELECT CAST(n_nationkey AS INTEGER) FROM nation)
      |EXCEPT SELECT CAST(n_nationkey AS INTEGER) FROM nation WHERE n_regionkey = 0""".stripMargin

  /** Ranking window: top-2 orders by totalprice per market segment.
    * Single shuffle on the partition key; rank pushed down via
    * WindowGroupLimit in Spark 4 (no full sort of losers). */
  def windowTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = scan(spark, sfDir, "customer")
    val ord = scan(spark, sfDir, "orders")
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 2)
      .select(col("c_mktsegment"), col("rk"), col("o_orderkey"),
        col("o_totalprice"))
  }

  private val windowTopkOracle =
    """SELECT c_mktsegment, rk, o_orderkey, o_totalprice FROM (
      |  SELECT c_mktsegment, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY c_mktsegment
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |) WHERE rk <= 2""".stripMargin

  /** Scalar function library sample over `part`: string ops + regex +
    * arithmetic, all codegen'd builtins (no UDFs). */
  def scalarFuncs(spark: SparkSession, sfDir: String): DataFrame =
    scan(spark, sfDir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        length(col("p_name")).cast("int").as("name_len"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        (col("p_size") % 7).cast("int").as("size_mod"),
        round(col("p_retailprice") * 1.1, 2).as("marked_up"))

  private val scalarFuncsOracle =
    """SELECT p_partkey,
      |       upper(p_brand) AS brand_u,
      |       CAST(length(p_name) AS INTEGER) AS name_len,
      |       COALESCE(regexp_extract(p_name, '^(\w+)', 1), '') AS first_word,
      |       concat_ws('|', p_brand, p_type) AS brand_type,
      |       CAST(p_size % 7 AS INTEGER) AS size_mod,
      |       round(p_retailprice * 1.1, 2) AS marked_up
      |FROM part""".stripMargin

  /** Date/time function coverage over orders. */
  def dateFuncs(spark: SparkSession, sfDir: String): DataFrame =
    scan(spark, sfDir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        datediff(lit("1998-01-01").cast("date"),
          col("o_orderdate").cast("date")).as("days_to_98"),
        date_format(date_add(col("o_orderdate").cast("date"), 30),
          "yyyy-MM-dd").as("plus30"))

  private val dateFuncsOracle =
    """SELECT o_orderkey,
      |       CAST(year(o_orderdate) AS INTEGER) AS y,
      |       CAST(quarter(o_orderdate) AS INTEGER) AS q,
      |       CAST(month(o_orderdate) AS INTEGER) AS m,
      |       CAST(day(o_orderdate) AS INTEGER) AS d,
      |       CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INTEGER) AS days_to_98,
      |       strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30
      |FROM orders""".stripMargin

  /** Array function coverage over embeddings (float elements are exactly
    * representable as doubles, so casts are value-preserving). */
  def arrayFuncs(spark: SparkSession, sfDir: String): DataFrame =
    scan(spark, sfDir, "embeddings")
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 4).as("first"),
        round(array_max(col("embedding")).cast("double"), 4).as("vmax"),
        round(array_min(col("embedding")).cast("double"), 4).as("vmin"),
        round(aggregate(transform(col("embedding"), x => x.cast("double")),
          lit(0.0), (a, x) => a + x), 4).as("vsum"))

  private val arrayFuncsOracle =
    """SELECT vec_id,
      |       CAST(len(embedding) AS INTEGER) AS dim,
      |       round(CAST(embedding[1] AS DOUBLE), 4) AS first,
      |       round(CAST(list_max(embedding) AS DOUBLE), 4) AS vmax,
      |       round(CAST(list_min(embedding) AS DOUBLE), 4) AS vmin,
      |       round(list_sum(embedding::DOUBLE[]), 4) AS vsum
      |FROM embeddings""".stripMargin

  /** Conditional aggregation: FILTER-style counts, distincts, string
    * min/max, bucketed histogram — per order-year. */
  def conditionalAgg(spark: SparkSession, sfDir: String): DataFrame =
    scan(spark, sfDir, "orders")
      .groupBy(year(col("o_orderdate")).as("y"))
      .agg(
        count(lit(1)).as("n"),
        count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
        countDistinct(col("o_custkey")).as("n_cust"),
        min(col("o_orderpriority")).as("min_prio"),
        max(col("o_orderpriority")).as("max_prio"),
        decSum(col("o_totalprice"), 2).cast("double").as("sum_price"))

  private val conditionalAggOracle =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
      |       COUNT(*) AS n,
      |       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
      |       COUNT(DISTINCT o_custkey) AS n_cust,
      |       MIN(o_orderpriority) AS min_prio,
      |       MAX(o_orderpriority) AS max_prio,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY 1""".stripMargin

  /** Exact median via middle-row selection — engine-portable (unlike
    * approx_percentile or interpolation-policy-dependent medians), and
    * TWO-PHASE so parallelism is not capped at the number of groups (a
    * per-group row_number window sorts each group in ONE task — at 100×
    * scale that is five tasks sorting ~20M rows each):
    *
    *  1. histogram: count rows per (group, coarse price bucket) — one
    *     map-side-combined shuffle; the cumulative-count window then runs
    *     over the tiny bucket-level aggregate, not the data.
    *  2. locate the bucket(s) whose cumulative range covers the middle
    *     rank(s); broadcast them (≤2 rows per group).
    *  3. fine sort ONLY the rows inside those buckets (≈ cnt/buckets of
    *     the data), offset local row_number by the bucket's preceding
    *     cumulative count to recover the exact global rank.
    *
    * Bucket order is consistent with the (price, orderkey) total order
    * because the bucket is a monotonic function of price (equal prices
    * share a bucket), so concatenating per-bucket sorts IS the global
    * sort. */
  def exactMedian(spark: SparkSession, sfDir: String): DataFrame =
    rankSelect(spark, sfDir) { counts =>
      counts.select(col("o_orderpriority"),
        explode(array(floor((col("cnt") + 1) / 2),
          floor((col("cnt") + 2) / 2))).as("r"))
        .distinct() // odd counts: m1 == m2 -> one middle row
    }
      .groupBy(col("o_orderpriority"))
      .agg((sum(col("o_totalprice")) / count(lit(1))).as("median_price"))

  /** The shared two-phase rank-select core (used by exactMedian and
    * quartiles): `mkTargets` maps the per-group counts (group, cnt) to
    * target-rank rows (group, [extra cols...], r); the result is the
    * order rows sitting at exactly those global (price, orderkey) ranks,
    * with the extra target columns riding along. The histogram is
    * localCheckpoint'ed — it is a few thousand rows and three downstream
    * consumers (cumulative counts, counts, bucket location) would
    * otherwise each re-scan the orders parquet. */
  private def rankSelect(spark: SparkSession, sfDir: String)
      (mkTargets: DataFrame => DataFrame): DataFrame = {
    val ord = scan(spark, sfDir, "orders")
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
    val bucket = floor(col("o_totalprice") / 1000.0).cast("long")
    val hist = ord.groupBy(col("o_orderpriority"), bucket.as("bucket"))
      .agg(count(lit(1)).as("bn"))
      .localCheckpoint(true)
    val wb = Window.partitionBy(col("o_orderpriority")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum(col("bn")).over(wb)) // rows up to & incl. bucket
      .withColumn("lo", col("cum") - col("bn"))   // rows before this bucket
    val targets = mkTargets(
      hist.groupBy(col("o_orderpriority")).agg(sum(col("bn")).as("cnt")))
    val qBuckets = cum
      .join(targets.select(col("o_orderpriority"), col("r")), "o_orderpriority")
      .where(col("r") > col("lo") && col("r") <= col("cum"))
      .select(col("o_orderpriority"), col("bucket"), col("lo")).distinct()
    val wFine = Window.partitionBy(col("o_orderpriority"), col("bucket"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    ord.withColumn("bucket", bucket)
      .join(broadcast(qBuckets), Seq("o_orderpriority", "bucket"))
      .withColumn("grank", col("lo") + row_number().over(wFine))
      .join(broadcast(targets), Seq("o_orderpriority"))
      .where(col("grank") === col("r"))
  }

  private val exactMedianOracle =
    """WITH r AS (
      |  SELECT o_orderpriority, o_totalprice,
      |         row_number() OVER (PARTITION BY o_orderpriority
      |                            ORDER BY o_totalprice, o_orderkey) AS rn,
      |         count(*) OVER (PARTITION BY o_orderpriority) AS cnt
      |  FROM orders)
      |SELECT o_orderpriority,
      |       SUM(o_totalprice) / COUNT(*) AS median_price
      |FROM r
      |WHERE rn = CAST(floor((cnt + 1) / 2) AS BIGINT)
      |   OR rn = CAST(floor((cnt + 2) / 2) AS BIGINT)
      |GROUP BY 1""".stripMargin

  /** Pivot with an explicit value list (deterministic columns): order
    * counts per year by status. */
  def pivotAgg(spark: SparkSession, sfDir: String): DataFrame =
    scan(spark, sfDir, "orders")
      .groupBy(year(col("o_orderdate")).cast("int").as("y"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)

  private val pivotOracle =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
      |       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
      |       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
      |       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
      |FROM orders GROUP BY 1""".stripMargin

  /** CUBE over two dims: all four grouping combinations in one pass
    * (Expand-based, like rollup). */
  def cubeAgg(spark: SparkSession, sfDir: String): DataFrame =
    scan(spark, sfDir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        decSum(col("o_totalprice"), 2).cast("double").as("sum_price"))

  private val cubeOracle =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  /** Sliding window frame: 7-row moving sum of daily order totals —
    * ROWS BETWEEN framing with exact decimal arithmetic. The unpartitioned
    * window runs AFTER the per-day rollup, so its input is one row per
    * day (~2.5k rows for 7 years) regardless of fact-table size — bounded
    * at any scale. */
  def movingAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = scan(spark, sfDir, "orders")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
      .agg(decSum(col("o_totalprice"), 2).as("total"))
    val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
    daily
      .withColumn("moving7", sum(col("total")).over(w).cast("double"))
      .select(col("day"), col("total").cast("double").as("total"),
        col("moving7"))
  }

  private val movingOracle =
    """WITH d AS (
      |  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
      |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
      |  FROM orders GROUP BY 1)
      |SELECT day, CAST(total AS DOUBLE) AS total,
      |       CAST(SUM(total) OVER (ORDER BY day
      |                             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
      |            AS DOUBLE) AS moving7
      |FROM d""".stripMargin

  /** Range join: orders priced into [lo, hi) tiers via the bucketed
    * interval join (graft.ops.Ranges) — the equi-join-on-bucket shape
    * that replaces a cartesian-with-filter at scale — then a rollup per
    * tier. The tier table here is tiny (4 rows) so a broadcast BETWEEN
    * join would also work; the point is the bucketed plan, which stays
    * an equi-join when the interval side is millions of rows. */
  def rangeTiers(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tiers = Seq(
      ("T1_low", 0.0, 100000.0), ("T2_mid", 100000.0, 250000.0),
      ("T3_high", 250000.0, 400000.0), ("T4_top", 400000.0, 1000000.0))
      .toDF("tier", "lo", "hi")
    graft.ops.Ranges.bucketedRangeJoin(
        scan(spark, sfDir, "orders").select(col("o_orderkey"), col("o_totalprice")),
        "o_totalprice", tiers, "lo", "hi", width = 50000.0)
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n"),
        decSum(col("o_totalprice"), 2).cast("double").as("sum_price"))
  }

  private val rangeTiersOracle =
    """WITH tiers(tier, lo, hi) AS (VALUES
      |  ('T1_low', 0.0, 100000.0), ('T2_mid', 100000.0, 250000.0),
      |  ('T3_high', 250000.0, 400000.0), ('T4_top', 400000.0, 1000000.0))
      |SELECT tier, count(*) AS n,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders JOIN tiers
      |  ON o_totalprice >= lo AND o_totalprice < hi
      |GROUP BY 1""".stripMargin

  /** Grouped z-score outliers: orders priced ≥ 2σ above their priority
    * group's mean. The grouped-stats + join-back pattern, determinism-
    * hardened: mean and variance come from EXACT decimal sums (Σx, Σx²)
    * so every engine and partitioning derives identical doubles; the
    * z-threshold comparison is then plain double arithmetic. Stats
    * aggregate is 5 rows → broadcast back onto the fact scan. */
  def outliers(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = scan(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    val stats = ord.groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(28,2)")).cast("double").as("s1"),
        sum((col("o_totalprice") * col("o_totalprice"))
          .cast("decimal(38,4)")).cast("double").as("s2"))
      .select(col("o_orderpriority"),
        (col("s1") / col("n")).as("mean"),
        sqrt(col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n")))
          .as("sd"))
    ord.join(broadcast(stats), "o_orderpriority")
      .where(col("o_totalprice") >= col("mean") + lit(2.0) * col("sd"))
      .select(col("o_orderpriority"), col("o_orderkey"),
        col("o_totalprice"),
        ((col("o_totalprice") - col("mean")) / col("sd"))
          .cast("decimal(28,4)").cast("double").as("z"))
  }

  private val outliersOracle =
    """WITH st AS (
      |  SELECT o_orderpriority,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE)
      |           / COUNT(*) AS mean,
      |         sqrt(CAST(SUM(CAST(o_totalprice * o_totalprice
      |                           AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*)
      |              - (CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE)
      |                 / COUNT(*))
      |                * (CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE)
      |                   / COUNT(*))) AS sd
      |  FROM orders GROUP BY 1)
      |SELECT o.o_orderpriority, o.o_orderkey, o.o_totalprice,
      |       CAST(CAST((o.o_totalprice - st.mean) / st.sd AS DECIMAL(28,4))
      |            AS DOUBLE) AS z
      |FROM orders o JOIN st ON o.o_orderpriority = st.o_orderpriority
      |WHERE o.o_totalprice >= st.mean + 2.0 * st.sd""".stripMargin

  /** The salted two-phase aggregation under the correctness gate: same
    * result as a direct GROUP BY (which is exactly what the oracle runs),
    * but the first combine happens on (key, salt) so one hot key spreads
    * over 8 tasks instead of one straggler. l_returnflag is 3 keys over
    * 600k rows — precisely the hot-key shape. */
  def saltedAgg(spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.Skew.saltedAgg(
      scan(spark, sfDir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity").cast("decimal(18,2)").as("q")),
      "l_returnflag", salts = 8,
      partial = sum, combine = sum, valueCol = "q", outCol = "sum_qty")
      .select(col("l_returnflag"), col("sum_qty").cast("double").as("sum_qty"))

  private val saltedAggOracle =
    """SELECT l_returnflag,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY 1""".stripMargin

  /** FULL OUTER join coverage: customers × their 1996 orders, keeping
    * customers with no such orders AND orders whose customers fall
    * outside the (deliberately filtered) customer slice. Aggregated to
    * null-side counts so the unmatched semantics are what's checked. */
  def fullOuter(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = scan(spark, sfDir, "customer")
      .where(col("c_custkey") % 3 === 0)
      .select(col("c_custkey"), col("c_mktsegment"))
    val ord = scan(spark, sfDir, "orders")
      .where(year(col("o_orderdate")) === 1996)
      .select(col("o_custkey"), col("o_orderkey"))
    cust.join(ord, col("c_custkey") === col("o_custkey"), "full_outer")
      .agg(
        count(when(col("o_orderkey").isNull, 1)).as("cust_no_orders"),
        count(when(col("c_custkey").isNull, 1)).as("orders_no_cust"),
        count(when(col("c_custkey").isNotNull && col("o_orderkey").isNotNull,
          1)).as("matched"))
  }

  private val fullOuterOracle =
    """SELECT
      |  COUNT(*) FILTER (WHERE o.o_orderkey IS NULL) AS cust_no_orders,
      |  COUNT(*) FILTER (WHERE c.c_custkey IS NULL) AS orders_no_cust,
      |  COUNT(*) FILTER (WHERE c.c_custkey IS NOT NULL
      |                     AND o.o_orderkey IS NOT NULL) AS matched
      |FROM (SELECT c_custkey, c_mktsegment FROM customer
      |      WHERE c_custkey % 3 = 0) c
      |FULL OUTER JOIN (SELECT o_custkey, o_orderkey FROM orders
      |                 WHERE year(o_orderdate) = 1996) o
      |  ON c.c_custkey = o.o_custkey""".stripMargin

  /** Subquery coverage: scalar subquery (global average) + IN subquery
    * (European nations) — Catalyst rewrites both into joins
    * (RewritePredicateSubquery); the pushed/broadcast shapes are free. */
  def subqueries(spark: SparkSession, sfDir: String): DataFrame = {
    scan(spark, sfDir, "supplier").createOrReplaceTempView("g_supplier")
    scan(spark, sfDir, "nation").createOrReplaceTempView("g_nation")
    // the scalar average goes through an exact decimal sum so the
    // threshold double is bit-identical on both engines
    spark.sql(
      """SELECT s_suppkey, s_name
        |FROM g_supplier
        |WHERE s_acctbal > (SELECT CAST(SUM(CAST(s_acctbal AS DECIMAL(28,2)))
        |                               AS DOUBLE) / COUNT(*)
        |                   FROM g_supplier)
        |  AND s_nationkey IN (SELECT n_nationkey FROM g_nation
        |                      WHERE n_regionkey = 3)""".stripMargin)
  }

  private val subqueriesOracle =
    """SELECT s_suppkey, s_name
      |FROM supplier
      |WHERE s_acctbal > (SELECT CAST(SUM(CAST(s_acctbal AS DECIMAL(28,2)))
      |                               AS DOUBLE) / COUNT(*)
      |                   FROM supplier)
      |  AND s_nationkey IN (SELECT n_nationkey FROM nation
      |                      WHERE n_regionkey = 3)""".stripMargin

  /** Exact per-group quartiles (type-1: the value at rank ceil(p·cnt)),
    * generalizing the two-phase median machinery: one histogram shuffle,
    * locate the bucket containing EACH target rank from cumulative
    * counts, broadcast those buckets, fine-sort only their rows and pick
    * the rows whose recovered global rank hits a target. Parallelism
    * scales with buckets, not groups — the same reason e11 is two-phase. */
  def quartiles(spark: SparkSession, sfDir: String): DataFrame =
    rankSelect(spark, sfDir) { counts =>
      counts
        .select(col("o_orderpriority"),
          explode(array(lit(0.25), lit(0.5), lit(0.75))).as("p"), col("cnt"))
        .select(col("o_orderpriority"), col("p"),
          greatest(lit(1L), ceil(col("p") * col("cnt")).cast("long")).as("r"))
    }
      .select(col("o_orderpriority"), col("p"),
        col("o_totalprice").as("q_value"))

  private val quartilesOracle =
    """WITH r AS (
      |  SELECT o_orderpriority, o_totalprice,
      |         row_number() OVER (PARTITION BY o_orderpriority
      |                            ORDER BY o_totalprice, o_orderkey) AS rn,
      |         count(*) OVER (PARTITION BY o_orderpriority) AS cnt
      |  FROM orders),
      |p(p) AS (VALUES (CAST(0.25 AS DOUBLE)), (CAST(0.5 AS DOUBLE)),
      |                (CAST(0.75 AS DOUBLE)))
      |SELECT o_orderpriority, p, o_totalprice AS q_value
      |FROM r JOIN p ON rn = greatest(1, CAST(ceil(p * cnt) AS BIGINT))""".stripMargin

  /** SCD-2-style effective ranges: each customer's orders become
    * [valid_from, valid_to) versions via lead() over the per-key history
    * — the slowly-changing-dimension build every warehouse ETL (and the
    * reference's nightly dump pattern) eventually needs. One shuffle on
    * the key; open-ended current versions carry a null valid_to. */
  def scd2Ranges(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    scan(spark, sfDir, "orders")
      .where(col("o_custkey") % 100 === 0) // bounded slice for the oracle
      .withColumn("valid_to_date",
        lead(col("o_orderdate"), 1).over(w))
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("valid_from"),
        date_format(col("valid_to_date"), "yyyy-MM-dd").as("valid_to"),
        col("valid_to_date").isNull.as("is_current"))
  }

  private val scd2Oracle =
    """SELECT o_custkey, o_orderkey,
      |       strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
      |       strftime(lead(o_orderdate) OVER (PARTITION BY o_custkey
      |                                        ORDER BY o_orderdate, o_orderkey),
      |                '%Y-%m-%d') AS valid_to,
      |       lead(o_orderdate) OVER (PARTITION BY o_custkey
      |                               ORDER BY o_orderdate, o_orderkey) IS NULL
      |         AS is_current
      |FROM orders WHERE o_custkey % 100 = 0""".stripMargin

  /** Latest-row-per-group via max_by (arg-max): each customer's most
    * recent order — ONE map-side-combined aggregation instead of the
    * window row_number formulation (which shuffles every row then sorts
    * per group to keep one). Deterministic tie-break via an integer
    * composite key (epoch-days · 10^10 + orderkey — exact in a long on
    * both engines; DuckDB's arg_max has no struct comparator). */
  def latestPerGroup(spark: SparkSession, sfDir: String): DataFrame = {
    val ordKey = datediff(col("o_orderdate").cast("date"),
      lit("1970-01-01").cast("date")).cast("long") * 10000000000L +
      col("o_orderkey")
    scan(spark, sfDir, "orders")
      .groupBy(col("o_custkey"))
      .agg(
        max_by(col("o_orderkey"), ordKey).as("latest_order"),
        max(col("o_orderdate")).cast("date").as("latest_date"),
        count(lit(1)).as("n_orders"))
      .select(col("o_custkey"), col("latest_order"),
        date_format(col("latest_date"), "yyyy-MM-dd").as("latest_date"),
        col("n_orders"))
  }

  private val latestPerGroupOracle =
    """SELECT o_custkey,
      |       arg_max(o_orderkey,
      |               datediff('day', DATE '1970-01-01',
      |                        CAST(o_orderdate AS DATE)) * 10000000000
      |               + o_orderkey) AS latest_order,
      |       strftime(CAST(max(o_orderdate) AS DATE), '%Y-%m-%d') AS latest_date,
      |       count(*) AS n_orders
      |FROM orders GROUP BY 1""".stripMargin

  /** Exact multi-column distinct counts per group — the hash-oracled
    * exact twin of the HLL sketch (SketchSpec pins
    * `approx_count_distinct` within its rsd bound of THIS query's
    * values, mirroring the t15 heavy-hitters exact/sketch pair). Spark
    * plans multi-distinct via Expand + two-phase aggregation: the
    * map-side partial dedups per (group, distinct-col) before the
    * shuffle, so shuffle rows scale with distinct values, not input
    * rows. At 100 TB reach for the HLL twin unless exactness is a
    * requirement. */
  def distinctCounts(spark: SparkSession, sfDir: String): DataFrame =
    scan(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))

  private val distinctCountsOracle =
    """SELECT l_returnflag,
      |       COUNT(DISTINCT l_partkey) AS n_parts,
      |       COUNT(DISTINCT l_suppkey) AS n_supps,
      |       COUNT(*) AS n_rows
      |FROM lineitem GROUP BY 1""".stripMargin

  /** Data-quality audit: predicate checks (one lineitem scan), a
    * duplicate-PK check, and a dangling-FK anti-join, unioned into one
    * (check_name, n_violations) report — the pre-flight constraint sweep
    * run before a 100 TB load. A clean TPC-H harness yields all zeros;
    * the oracle proves the zeros are COMPUTED (any misclassified row
    * hash-mismatches), and ValidateSpec proves planted violations are
    * counted. */
  def dataAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val li = scan(spark, sfDir, "lineitem")
    val ord = scan(spark, sfDir, "orders")
    graft.ops.Validate.audit(li, Seq(
        "nonpositive_quantity" -> (col("l_quantity") <= 0),
        "null_orderkey" -> col("l_orderkey").isNull,
        "null_shipdate" -> col("l_shipdate").isNull))
      .unionAll(graft.ops.Validate.dupPk(ord, "o_orderkey",
        "duplicate_order_pk"))
      .unionAll(graft.ops.Validate.fkDangling(li, "l_orderkey",
        ord, "o_orderkey", "dangling_order_fk"))
  }

  private val dataAuditOracle =
    """SELECT 'nonpositive_quantity' AS check_name,
      |       CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_violations FROM lineitem
      |UNION ALL
      |SELECT 'null_orderkey',
      |       CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |FROM lineitem
      |UNION ALL
      |SELECT 'null_shipdate',
      |       CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |FROM lineitem
      |UNION ALL
      |SELECT 'duplicate_order_pk',
      |       CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
      |FROM orders
      |UNION ALL
      |SELECT 'dangling_order_fk', CAST(COUNT(*) AS BIGINT)
      |FROM lineitem
      |WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)""".stripMargin

  /** MERGE-style change classification: given a keyed target (orders
    * "yesterday": o_orderkey < 7500) and a source batch (orders with
    * shipping priority touched), classify every key as insert / update /
    * unchanged — the decision column a warehouse MERGE (or a CDC diff)
    * computes before applying. ONE full-outer join on the key; change
    * detection compares the tracked columns null-safely. The apply step
    * for JDBC targets is JdbcIdempotentSink; for files, partition
    * overwrite. */
  def mergeClassify(spark: SparkSession, sfDir: String): DataFrame = {
    val target = scan(spark, sfDir, "orders")
      .where(col("o_orderkey") < 7500)
      .select(col("o_orderkey").as("k"),
        col("o_orderstatus").as("t_status"),
        col("o_orderpriority").as("t_prio"))
    val source = scan(spark, sfDir, "orders")
      .select(col("o_orderkey").as("k"),
        col("o_orderstatus").as("s_status"),
        // every 3rd key arrives with a bumped priority -> update
        when(col("o_orderkey") % 3 === 0, lit("0-BUMPED"))
          .otherwise(col("o_orderpriority")).as("s_prio"))
    target.join(source, Seq("k"), "full_outer")
      .select(col("k"),
        when(col("t_status").isNull, "insert")
          .when(col("s_status").isNull, "delete")
          .when(col("s_status") === col("t_status") &&
            col("s_prio") === col("t_prio"), "unchanged")
          .otherwise("update").as("action"))
      .groupBy(col("action")).agg(count(lit(1)).as("n_keys"))
  }

  private val mergeClassifyOracle =
    """WITH t AS (SELECT o_orderkey AS k, o_orderstatus AS st,
      |                  o_orderpriority AS pr
      |           FROM orders WHERE o_orderkey < 7500),
      |s AS (SELECT o_orderkey AS k, o_orderstatus AS st,
      |             CASE WHEN o_orderkey % 3 = 0 THEN '0-BUMPED'
      |                  ELSE o_orderpriority END AS pr
      |      FROM orders),
      |c AS (
      |  SELECT COALESCE(s.k, t.k) AS k,
      |         CASE WHEN t.st IS NULL THEN 'insert'
      |              WHEN s.st IS NULL THEN 'delete'
      |              WHEN s.st = t.st AND s.pr = t.pr THEN 'unchanged'
      |              ELSE 'update' END AS action
      |  FROM s FULL OUTER JOIN t ON s.k = t.k)
      |SELECT action, count(*) AS n_keys FROM c GROUP BY 1""".stripMargin

  def all: Seq[NamedQuery] = Seq(
    NamedQuery("e25_merge_classify", mergeClassify,
      Some(mergeClassifyOracle)),
    NamedQuery("e24_data_audit", dataAudit, Some(dataAuditOracle)),
    NamedQuery("e23_distinct_counts", distinctCounts,
      Some(distinctCountsOracle)),
    NamedQuery("e18_full_outer", fullOuter, Some(fullOuterOracle)),
    NamedQuery("e22_latest_per_group", latestPerGroup,
      Some(latestPerGroupOracle)),
    NamedQuery("e21_scd2_ranges", scd2Ranges, Some(scd2Oracle)),
    NamedQuery("e20_quartiles", quartiles, Some(quartilesOracle)),
    NamedQuery("e19_subqueries", subqueries, Some(subqueriesOracle)),
    NamedQuery("e16_outliers", outliers, Some(outliersOracle)),
    NamedQuery("e17_salted_agg", saltedAgg, Some(saltedAggOracle)),
    NamedQuery("e15_range_tiers", rangeTiers, Some(rangeTiersOracle)),
    NamedQuery("e12_pivot", pivotAgg, Some(pivotOracle)),
    NamedQuery("e13_cube", cubeAgg, Some(cubeOracle)),
    NamedQuery("e14_moving_window", movingAgg, Some(movingOracle)),
    NamedQuery("e11_exact_median", exactMedian, Some(exactMedianOracle)),
    NamedQuery("e01_q1_agg", q1Agg, Some(q1Oracle)),
    NamedQuery("e02_q3_join_topk", q3JoinTopk, Some(q3Oracle)),
    NamedQuery("e03_rollup", rollupAgg, Some(rollupOracle)),
    NamedQuery("e04_semi_anti", semiAnti, Some(semiAntiOracle)),
    NamedQuery("e05_set_ops", setOps, Some(setOpsOracle)),
    NamedQuery("e06_window_topk", windowTopk, Some(windowTopkOracle)),
    NamedQuery("e07_scalar_funcs", scalarFuncs, Some(scalarFuncsOracle)),
    NamedQuery("e08_date_funcs", dateFuncs, Some(dateFuncsOracle)),
    NamedQuery("e09_array_funcs", arrayFuncs, Some(arrayFuncsOracle)),
    NamedQuery("e10_conditional_agg", conditionalAgg, Some(conditionalAggOracle)),
  )
}
