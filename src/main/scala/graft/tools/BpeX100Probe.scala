package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: r16 verdict item 7 — where does the ×100-hot BPE tier's
  * time go? Times each trained-BPE query against a structurally
  * identical NO-BPE control (same explode/aggregate/window machinery,
  * `length(w)` in place of the trained scalar). If query ≈ control, the
  * residual is the machinery, not the fixpoint. */
object BpeX100Probe {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse("/tmp/x100r16_hot")

    def time(name: String)(f: => Long): Unit = {
      val t = System.nanoTime()
      val n = f
      println(f"[x100] $name%-28s ${(System.nanoTime()-t)/1e9}%7.2f s  rows=$n")
    }

    // warm: trains BPE (bounded sample) + page cache
    time("warmup_t37")(graft.queries.Registry
      .queries("t37_bpe_token_count")(spark, sf).count())

    time("t37_bpe_token_count")(graft.queries.Registry
      .queries("t37_bpe_token_count")(spark, sf).count())

    // control: t37's exact shape, length(w) instead of bpe_count(w)
    time("t37_control_no_bpe") {
      spark.read.parquet(s"$sf/documents.parquet")
        .where(col("text").isNotNull)
        .select(col("doc_id"),
          explode(split(lower(col("text")), "[^a-z0-9']+")).as("w"))
        .where(length(col("w")) > 0)
        .groupBy(col("doc_id"), col("w"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("ntok", length(col("w")).cast("long"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).cast("long").as("n_words"),
          sum(col("cnt") * col("ntok")).cast("long").as("n_bpe_tokens"))
        .count()
    }

    time("t24_sequence_pack")(graft.queries.Registry
      .queries("t24_sequence_pack")(spark, sf).count())
    time("t26_token_budget_mix")(graft.queries.Registry
      .queries("t26_token_budget_mix")(spark, sf).count())
    time("t39_bpe_tokenize")(graft.queries.Registry
      .queries("t39_bpe_tokenize")(spark, sf).count())
    time("s13_semantic_dedup")(graft.queries.Registry
      .queries("s13_semantic_dedup")(spark, sf).count())
  }
}
