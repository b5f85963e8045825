package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ValidateSpec extends SparkSpec {
  import spark.implicits._

  test("audit counts each planted violation under its own check name") {
    val df = Seq(
      (1L, 5.0, "2024-01-01"),
      (2L, -1.0, "2024-01-02"), // nonpositive
      (3L, 0.0, null),          // nonpositive AND null date
      (4L, 2.0, "2024-01-03"),
    ).toDF("k", "qty", "d")
    val out = Validate.audit(df, Seq(
        "nonpositive_qty" -> (col("qty") <= 0),
        "null_date" -> col("d").isNull))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("nonpositive_qty" -> 2L, "null_date" -> 1L))
  }

  test("dupPk counts surplus rows; fkDangling counts orphans") {
    val parent = Seq(1L, 2L, 2L, 3L).toDF("pk")
    assert(Validate.dupPk(parent, "pk", "dup").collect().head.getLong(1) == 1L)
    val child = Seq(1L, 2L, 9L, 9L).toDF("fk")
    val dangling = Validate.fkDangling(child, "fk", parent.distinct(), "pk",
      "orphans").collect().head
    assert(dangling.getString(0) == "orphans" && dangling.getLong(1) == 2L)
  }

  test("audit is one scan regardless of check count") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
    val plan = Validate.audit(df, Seq(
        "a" -> (col("l_quantity") <= 0),
        "b" -> col("l_orderkey").isNull,
        "c" -> (col("l_discount") > 1)))
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      s"N checks must share one scan:\n$plan")
  }
}
