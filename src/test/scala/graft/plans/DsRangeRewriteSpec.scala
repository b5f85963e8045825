package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DsRangeRewriteSpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    DsRangeRewrite.install(spark)
  }

  test("date_format equality on the ntz shipdate becomes a pushed day RANGE") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .where(date_format(col("l_shipdate"), "yyyyMMdd") === "19960102")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(l_shipdate") &&
      plan.contains("LessThan(l_shipdate"),
      s"expected a pushed day range on the raw column in:\n$plan")
    assert(!plan.contains("date_format"),
      s"the unpushable function call must be gone:\n$plan")
    // value equivalence against the hand-written pushable form
    val expected = graft.ops.CoreOps.pushablePartitionFilter(
      spark.read.parquet(s"$sf/lineitem.parquet"),
      col("l_shipdate"), "19960102").count()
    assert(df.count() == expected && expected > 0)
  }

  test("literal-on-the-left and yyyy-MM-dd also rewrite") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .where(lit("1996-01-02") === date_format(col("l_shipdate"), "yyyy-MM-dd"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(l_shipdate") &&
      !plan.contains("date_format"))
    assert(df.count() > 0)
  }

  test("a malformed date literal matches nothing (rewritten to false)") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .where(date_format(col("l_shipdate"), "yyyyMMdd") === "not-a-date")
    assert(df.queryExecution.optimizedPlan.toString.contains("LocalRelation") ||
      df.count() == 0)
    assert(df.count() == 0)
  }

  test("DATE columns rewrite to a plain date equality") {
    val dated = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_shipdate").cast("date").as("d"))
    // materialize through parquet so `d` is a scanned DATE column
    val dir = java.nio.file.Files.createTempDirectory("graft_dsrw").toString
    dated.write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .where(date_format(col("d"), "yyyyMMdd") === "19960102")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(d,"), s"expected pushed date equality:\n$plan")
    assert(df.count() ==
      spark.read.parquet(dir).where(col("d") === lit("1996-01-02").cast("date"))
        .count())
  }

  test("overflow literals (20240231) match nothing — SMART resolution rejected") {
    // date_format never produces '20240231'; a lenient parse would resolve
    // it to 2024-02-29 and wrongly return all Feb 29 rows
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .where(date_format(col("l_shipdate"), "yyyyMMdd") === "20240231")
    assert(df.count() == 0)
    // and a zero-padded-mismatch literal likewise
    val df2 = spark.read.parquet(s"$sf/lineitem.parquet")
      .where(date_format(col("l_shipdate"), "yyyy-MM-dd") === "1996-1-2")
    assert(df2.count() == 0)
  }

  test("unparseable literal keeps NULL semantics under NOT") {
    import spark.implicits._
    val df = Seq((1L, Some("2024-01-01")), (2L, None))
      .toDF("id", "s")
      .select(col("id"), to_timestamp_ntz(col("s")).as("ts"))
    // original semantics: NOT(date_format(null,..) = 'x') is NULL -> row
    // dropped; the rewrite must not turn it into NOT(false) = true
    val kept = df.where(!(date_format(col("ts"), "yyyyMMdd") === "nope"))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L), s"null-ts row must stay dropped, got $kept")
  }

  test("a NULL string literal is left alone when the rule runs standalone") {
    // through the normal optimizer NullPropagation folds `= NULL` before
    // this rule ever sees it — but the rule is public and installable on
    // its own, so apply() must not NPE on a null-valued literal
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, DateFormatClass, EqualTo, Literal}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation}
    import org.apache.spark.sql.types.{StringType, TimestampType}
    val ts = AttributeReference("ts", TimestampType)()
    val cond = EqualTo(
      DateFormatClass(ts, Literal("yyyyMMdd"), Some("UTC")),
      Literal(null, StringType))
    val plan = Filter(cond, LocalRelation(ts))
    val rewritten = DsRangeRewrite(plan)
    assert(rewritten.fastEquals(plan),
      s"null literal must leave the comparison untouched:\n$rewritten")
  }

  test("a non-day pattern is left alone (not bijective per day)") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .where(date_format(col("l_shipdate"), "yyyyMM") === "199601")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("date_format"),
      s"month-grain format must not be rewritten by the day rule:\n$opt")
    assert(df.count() > 0)
  }
}
