package graft.queries

import graft.SparkSpec

/** t45 — BM25 retrieval: hand-derived scores, the two capabilities
  * tf·idf lacks (length normalization, idf saturation), and the
  * top-k plan shape. */
class Bm25Spec extends SparkSpec {

  private val k1 = 1.2
  private val b = 0.75

  test("hand-computed Lucene-form BM25 on a planted corpus; same-tf " +
    "longer doc scores LOWER (the normalization tf*idf lacks)") {
    import spark.implicits._
    val docs = Seq(
      1L -> "q x",
      2L -> "q x x x x x",
      3L -> "x y").toDF("doc_id", "text")
    val got = TextQueries.bm25Layout(docs, Seq("q"), k = 5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // N=3 total_dl=10 avgdl=10/3 df(q)=2 idf=ln(1.6)
    val idf = math.log(1.0 + ((3.0 - 2.0) + 0.5) / (2.0 + 0.5))
    def tfn(dl: Double) =
      (1.0 * (k1 + 1)) / (1.0 + k1 * ((1.0 - b) + b * (dl / (10.0 / 3))))
    assert(got.keySet == Set(1L, 2L), "only matching docs may rank")
    assert(got(1L)._1 == 1L && got(1L)._2 == 2L)
    assert(math.abs(got(1L)._3 - idf * tfn(2)) < 1e-6, s"${got(1L)}")
    assert(math.abs(got(2L)._3 - idf * tfn(6)) < 1e-6, s"${got(2L)}")
    assert(got(1L)._3 > got(2L)._3,
      "same tf in a longer doc must score lower")
  }

  test("idf saturation: at equal tf and dl, the rarer term outranks " +
    "the corpus-common one") {
    import spark.implicits._
    // 'c' appears in every doc; 'r' only in doc 1. Docs 1 and 2 are the
    // probe pair: same length, one match each.
    val docs = Seq(
      1L -> "r x",
      2L -> "c x",
      3L -> "c y",
      4L -> "c z").toDF("doc_id", "text")
    val got = TextQueries.bm25Layout(docs, Seq("r", "c"), k = 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(1L) > got(2L),
      s"rare-term doc ${got(1L)} must outrank common-term doc ${got(2L)}")
  }

  test("plan: top-k is TakeOrderedAndProject (no global sort); the " +
    "query-term filter prunes the exploded stream before any exchange") {
    val df = Registry.queries("t45_bm25_retrieval")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(s.contains("TakeOrderedAndProject"),
      s"top-k must not globally sort:\n$s")
    // the retrieval lineage: the IN-filter sits directly above the
    // Generate (plan prints parents first), with no Exchange between —
    // postings prune scan-side, before any shuffle
    val gen = s.indexOf("Generate explode")
    assert(gen >= 0, s"expected an explode stage:\n$s")
    val fil = "Filter [a-z_#0-9]+ IN \\(".r.findFirstMatchIn(s).map(_.start)
      .getOrElse(fail(s"expected the query-term IN filter:\n$s"))
    assert(fil < gen && !s.substring(fil, gen).contains("Exchange"),
      s"the term filter must sit on the explode, pre-exchange:\n$s")
    // exactly ONE tokenization in the retrieval lineage: a non-outer
    // explode would infer size/isnotnull filters below the staging
    // projection and tokenize 3x per row (caught by this pin)
    val retrieval = s.substring(0, s.indexOf("BroadcastExchange").max(gen))
    assert("tokens_of".r.findAllIn(retrieval).size == 1,
      s"retrieval lineage must tokenize exactly once:\n$s")
  }
}
