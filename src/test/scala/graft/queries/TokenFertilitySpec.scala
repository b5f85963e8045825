package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Bpe

/** t44 — tokenizer fertility/compression: the saturation identity on the
  * harness corpus, and the under-served-language signal on a planted
  * wide-vocab corpus where the metric actually separates. */
class TokenFertilitySpec extends SparkSpec {

  test("harness corpus: fertility is EXACTLY 1.0 per lang (the 31-word " +
    "saturation, BpeSaturationSpec's ceiling surfacing in the metric)") {
    val out = Registry.queries("t44_token_fertility")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("fertility") == 1.0,
        s"${r.getAs[String]("lang")}: saturated BPE must emit one token " +
          s"per word, got ${r.getAs[Double]("fertility")}")
      assert(r.getAs[Double]("chars_per_token") > 1.0)
    }
  }

  test("planted wide-vocab corpus: a language built of UNSEEN words has " +
    "fertility > 1 and above the covered language — the rebalancing signal") {
    import spark.implicits._
    val syll = Array("ka", "to", "ri", "mu", "en", "so", "pla", "ver")
    def word(i: Int): String =
      Seq(i % 8, (i / 8) % 8, (i / 64) % 8, 7 - i % 8).map(syll).mkString
    val covered = (0 until 200).map(word)
    // rare: same syllable inventory, combinations training never saw
    val rare = (300 until 500).map(i =>
      Seq(7 - i % 8, (i / 64) % 8, (i / 8) % 8, i % 8).map(syll).mkString)
      .filterNot(covered.contains)
    val merges = Bpe.train(covered.flatMap(w => Seq(w, w)), 1000)
    val docs = Seq(
      ("cov", covered.take(50).mkString(" ")),
      ("rare", rare.take(50).mkString(" "))
    ).toDF("lang", "text").withColumn("n_chars", length(col("text")))
    val got = TextQueries.fertilityLayout(docs, merges).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Double]("fertility"), r.getAs[Long]("n_ws_tokens"))).toMap
    assert(got("cov")._2 == 50L && got("rare")._2 == 50L)
    assert(got("cov")._1 == 1.0,
      s"trained-on words must saturate to 1 token: ${got("cov")}")
    assert(got("rare")._1 > 1.2,
      s"unseen words must fragment — fertility ${got("rare")._1}")
  }
}
