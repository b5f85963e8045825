package graft.queries

import graft.SparkSpec

/** Bigram-LM scoring (t34) on a planted corpus with hand-derivable
  * probabilities, plus the short-doc exclusion and normalization rules. */
class BigramLogprobSpec extends SparkSpec {

  test("hand-computed conditional NLL on a planted corpus") {
    import spark.implicits._
    val docs = Seq(
      1L -> "a b a c", // bigrams (a,b) (b,a) (a,c)
      2L -> "a b", // (a,b)
      3L -> "c", // one token: no transition, excluded
      4L -> "", // zero tokens: excluded
      5L -> "  A  B \t" // normalizes to "a b": (a,b)
    ).toDF("doc_id", "text")
    // corpus counts: (a,b)=3 (b,a)=1 (a,c)=1; contexts: a·=4, b·=1
    val got = TextQueries.bigramLayout(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(1L, 2L, 5L))
    val d1 = -(math.log(3.0 / 4) + math.log(1.0 / 1) + math.log(1.0 / 4)) / 3
    val d2 = -math.log(3.0 / 4)
    assert(got(1L)._1 == 3L)
    assert(math.abs(got(1L)._2 - d1) < 1e-6, s"d1: ${got(1L)._2} vs $d1")
    assert(got(2L) == got(5L), "equal normalized texts must score equally")
    assert(math.abs(got(2L)._2 - d2) < 1e-6)
  }

  test("an in-vocabulary doc with scrambled word order scores WORSE than " +
    "the fluent one (the capability unigram scoring lacks)") {
    import spark.implicits._
    // 'x y' dominates the corpus; 'y x' never occurs as a transition
    // except in the scrambled doc itself
    val base = (10L to 29L).map(i => i -> "x y x y x y")
    val docs = (base :+ (1L -> "x y x y x y") :+ (2L -> "y y x x y x"))
      .toDF("doc_id", "text")
    val got = TextQueries.bigramLayout(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(2L) > got(1L),
      s"scrambled ${got(2L)} must out-score fluent ${got(1L)}")
    // ...while their unigram distributions are IDENTICAL (both three x,
    // three y), so t23 by construction cannot separate them
  }
}
