package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Noise-immune A/B for the native token_stats vs the staged-array
  * declarative formulation: alternates the two over the same corpus in
  * one session, so ambient host steal hits both sides equally. Prints
  * per-iteration seconds; judge the MINIMA (steal only ever adds). */
object TokenStatsProbe {

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val iters = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.TokenStats.register(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    docs.count() // warm footers/cache

    val en = TextOps.langStopwords.toMap.apply("en")
    def declarative: DataFrame = {
      val staged = docs.select(col("doc_id"), col("text"),
        TextOps.tokens(col("text")).as("toks"))
      staged.select(col("doc_id"),
        TextOps.qualityScore(size(col("toks")), length(col("text")),
          TextOps.punctCount(col("text")),
          TextOps.stopwordCountIn(col("toks"), en)).as("w"))
    }
    def native: DataFrame =
      docs.select(col("doc_id"), expr("token_stats(text)").as("ts"))
        .select(col("doc_id"),
          TextOps.qualityScore(col("ts.n_tokens"), col("ts.n_chars"),
            col("ts.n_punct"), col("ts.n_stop")).as("w"))

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val d = Array.fill(iters)(0.0)
    val n = Array.fill(iters)(0.0)
    for (i <- 0 until iters) {
      d(i) = time(declarative)
      n(i) = time(native)
      println(f"iter $i: declarative ${d(i)}%.3f  native ${n(i)}%.3f")
    }
    println(f"min: declarative ${d.min}%.3f  native ${n.min}%.3f")
    spark.stop()
  }
}
