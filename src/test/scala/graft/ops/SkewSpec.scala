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

  test("two-phase salted agg equals the direct aggregation") {
    val direct = skewed.groupBy("k").agg(sum("v").as("s"))
      .as[(Long, Long)].collect().toMap
    val salted = Skew.saltedAgg(skewed, "k", 8, sum, sum, "v", "s")
      .as[(Long, Long)].collect().toMap
    assert(salted == direct)
  }
}
