package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one hot key
  private def skewed = (1 to 2000)
    .map(i => (if (i % 10 == 0) i.toLong else 7L, i))
    .toDF("k", "v")
  private def dim = Seq((7L, "hot"), (10L, "ten"), (20L, "twenty"))
    .toDF("k", "name")

  test("salted join returns exactly the plain join's rows") {
    val plain = skewed.join(dim, Seq("k")).select("k", "v", "name")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val salted = Skew.saltedJoin(skewed, dim, "k", salts = 8)
      .select("k", "v", "name")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(salted == plain && plain.nonEmpty)
  }

  test("salted join shuffles on (key, salt), spreading the hot key") {
    val plan = Skew.saltedJoin(skewed, dim, "k", salts = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), "shuffle key must include the salt")
  }

  test("salt is deterministic across recomputation and spreads the hot key") {
    val salted = skewed.withColumn("__s",
      pmod(xxhash64(col("k"), col("v")), lit(8L)).cast("int"))
    // recomputing the same plan twice yields identical salts (a task retry
    // would too — unlike monotonically_increasing_id)
    val a = salted.collect().map(_.toSeq).toSeq
    val b = salted.collect().map(_.toSeq).toSeq
    assert(a == b)
    // the hot key's rows land on many salts, not one
    val hotSalts = Skew.saltedAgg(skewed, "k", 8, sum, sum, "v", "s")
    assert(hotSalts.count() == skewed.select("k").distinct().count())
    val perSalt = skewed.where(col("k") === 7L)
      .withColumn("__s", pmod(xxhash64(col("k"), col("v")), lit(8L)))
      .groupBy("__s").count().count()
    assert(perSalt >= 6, s"hot key should spread over most of 8 salts")
  }

  test("two-phase salted agg equals the direct aggregation") {
    val direct = skewed.groupBy("k").agg(sum("v").as("s"))
      .as[(Long, Long)].collect().toMap
    val salted = Skew.saltedAgg(skewed, "k", 8, sum, sum, "v", "s")
      .as[(Long, Long)].collect().toMap
    assert(salted == direct)
  }
}
