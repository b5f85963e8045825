package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LevenshteinPrefilterSpec extends SparkSpec {
  import spark.implicits._

  // plan assertions need a non-foldable source (a literal LocalRelation
  // is constant-folded straight through the Filter) — scan parquet
  private def scanned = spark.read.parquet(s"$sf/nation.parquet")
    .select(col("n_name").as("a"),
      when(col("n_regionkey") === 0, concat(col("n_name"), lit("X")))
        .otherwise(concat(col("n_name"), lit(" plus a much longer suffix")))
        .as("b"))

  test("rewrite adds the length guard and preserves results exactly") {
    LevenshteinPrefilter.install(spark)
    val filtered = scanned.where(levenshtein(col("a"), col("b")) <= 2)
    val opt = filtered.queryExecution.optimizedPlan.toString
    assert(opt.contains("abs(") && opt.contains("length("),
      s"expected the length guard in the optimized plan:\n$opt")
    assert(opt.contains("levenshtein"), "the real comparison must remain")
    // only region-0 nations got the 1-char suffix (distance 1); the rest
    // differ by a 26-char suffix and must be dropped — by the guard alone
    val expected = spark.read.parquet(s"$sf/nation.parquet")
      .where(col("n_regionkey") === 0).count()
    assert(filtered.count() == expected && expected > 0)
  }

  test("rule is idempotent: optimizer fixpoint adds exactly one guard") {
    LevenshteinPrefilter.install(spark)
    val opt = scanned.where(levenshtein(col("a"), col("b")) <= 2)
      .queryExecution.optimizedPlan.toString
    assert("abs\\(".r.findAllIn(opt).size == 1,
      s"guard must appear exactly once:\n$opt")
  }

  test("null inputs stay NULL-semantics-identical under the guard") {
    LevenshteinPrefilter.install(spark)
    val withNull = Seq(("abc", null: String), ("abc", "abd"))
      .toDF("a", "b")
    // a NULL side makes the predicate NULL -> row filtered, same as before
    assert(withNull.where(levenshtein(col("a"), col("b")) <= 2).count() == 1)
  }

  test("strict < comparisons also get the (looser, still sound) guard") {
    LevenshteinPrefilter.install(spark)
    val filtered = scanned.where(levenshtein(col("a"), col("b")) < 2)
    val opt = filtered.queryExecution.optimizedPlan.toString
    assert(opt.contains("abs("), s"expected guard for <:\n$opt")
    val expected = spark.read.parquet(s"$sf/nation.parquet")
      .where(col("n_regionkey") === 0).count()
    assert(filtered.count() == expected)
  }
}
