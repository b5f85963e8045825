package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sim.Similarity

class FloatCosineSpec extends SparkSpec {
  import spark.implicits._

  test("native expression matches the builtin double-fold bit-for-bit") {
    FloatCosine.register(spark)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").limit(100)
    val pairs = emb.select(col("vec_id").as("ia"), col("embedding").as("a"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("embedding").as("b")))
      .where(col("ia") < col("ib")).limit(500)
    val diff = pairs.select(
        expr("float_cosine(a, b)").as("native"),
        Similarity.cosine(Similarity.asDouble(col("a")),
          Similarity.asDouble(col("b"))).as("builtin"))
      .where(col("native") =!= col("builtin"))
      .count()
    assert(diff == 0, "native and builtin cosines must be bit-identical")
  }

  test("registers through SparkSessionExtensions builder hook") {
    // the injected builder produces the same expression the registry does
    val ext = new GraftExtensions
    // smoke: applying to a fresh extensions object must not throw
    ext.apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("handles degenerate inputs via eval path") {
    FloatCosine.register(spark)
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 2.0f), Array(-1.0f, -2.0f))).toDF("a", "b")
    val r = df.select(expr("float_cosine(a, b)").as("c")).as[Double].collect()
    assert(math.abs(r(0) - 1.0) < 1e-15)
    assert(math.abs(r(1) + 1.0) < 1e-15)
  }
}
