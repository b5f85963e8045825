package graft.queries

import graft.SparkSpec

/** t43 — interpolated Kneser-Ney bigram scoring: hand-derived
  * probabilities, the continuation-count capability MLE lacks, and the
  * shared-staging plan shape. */
class KneserNeySpec extends SparkSpec {

  test("hand-computed interpolated KN (D = 0.75) on a planted corpus") {
    import spark.implicits._
    val docs = Seq(
      1L -> "a b a b a c", // occurrences: (a,b)×2 (b,a)×2 (a,c)
      2L -> "b a",
      3L -> "x" // one token: excluded
    ).toDF("doc_id", "text")
    // bc: (a,b)=2 (b,a)=3 (a,c)=1; cc: a·=3 b·=3; N1+(a,·)=2 N1+(b,·)=1
    // N1+(·,b)=1 N1+(·,a)=1 N1+(·,c)=1; N1+(·,·)=3
    val pab = (2 - 0.75) / 3 + (0.75 * 2 / 3) * (1.0 / 3)
    val pba = (3 - 0.75) / 3 + (0.75 * 1 / 3) * (1.0 / 3)
    val pac = (1 - 0.75) / 3 + (0.75 * 2 / 3) * (1.0 / 3)
    val got = TextQueries.knBigramLayout(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(1L, 2L))
    val d1 = -(2 * math.log(pab) + 2 * math.log(pba) + math.log(pac)) / 5
    val d2 = -math.log(pba)
    assert(got(1L)._1 == 5L)
    assert(math.abs(got(1L)._2 - d1) < 1e-6, s"d1: ${got(1L)._2} vs $d1")
    assert(math.abs(got(2L)._2 - d2) < 1e-6, s"d2: ${got(2L)._2} vs $d2")
  }

  test("continuation counts separate what MLE scores identically " +
    "(the 'Francisco' property)") {
    import spark.implicits._
    // q follows FOUR distinct contexts; u only ever follows t. Every
    // bigram occurs once with context count 1, so MLE says p = 1 for
    // all of them — t34 scores the two probe docs EQUALLY (nll 0).
    val docs = Seq(
      1L -> "p q", 2L -> "r q", 3L -> "s q",
      4L -> "x q", // probe: high-continuation transition
      5L -> "t u" // probe: phrase-locked transition
    ).toDF("doc_id", "text")
    // KN: p(q|x) = 0.25 + 0.75·(4/5), p(u|t) = 0.25 + 0.75·(1/5)
    val kn = TextQueries.knBigramLayout(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(kn(4L) - -math.log(0.25 + 0.75 * 0.8)) < 1e-6)
    assert(math.abs(kn(5L) - -math.log(0.25 + 0.75 * 0.2)) < 1e-6)
    assert(kn(5L) > kn(4L),
      "the phrase-locked transition must score worse under KN")
    val mle = TextQueries.bigramLayout(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(mle(4L) == 0.0 && mle(5L) == 0.0,
      "MLE must be blind to the continuation difference")
  }

  test("plan: one tokenization lineage; the (w1,w2) staging exchange " +
    "reused by frequency, probe, and model tables (AQE stage cache)") {
    val df = Registry.queries("t43_kneser_ney_logprob")(spark, sf)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("tokens_of".r.findAllIn(fin).size == 1 &&
      "split\\(lower\\(trim\\(".r.findAllIn(fin).isEmpty,
      s"t43 must tokenize the corpus exactly once (native):\n$fin")
    // probe + ctx + cont all re-enter through the staged exchange; the
    // type total re-aggregates ctx (NOT a fourth corpus-scale pass)
    assert("ReusedExchange".r.findAllIn(fin).size >= 2,
      s"bfreq consumers must reuse the bigram exchange:\n$fin")
    assert("Scan parquet".r.findAllIn(fin).size == 1,
      s"t43 must scan the corpus exactly once:\n$fin")
  }
}
