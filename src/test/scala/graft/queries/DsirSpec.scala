package graft.queries

import graft.SparkSpec

/** DSIR-style importance scoring (t36): hand-checkable scores on a
  * planted corpus, target-domain enrichment where the vocabularies
  * actually differ, and the corpus-level sanity that selection enriches
  * the target fraction over its base rate. */
class DsirSpec extends SparkSpec {

  test("planted corpus: disjoint target vocabulary → exactly the target " +
    "docs selected, scores match the hand formula") {
    import spark.implicits._
    // target docs speak {ml model}, general docs speak {cat dog}
    val docs = Seq(
      (1L, "tgt", "ml model"),
      (2L, "tgt", "model ml"),
      (3L, "gen", "cat dog"),
      (4L, "gen", "dog cat"),
      (5L, "gen", "cat cat")
    ).toDF("doc_id", "source", "text")
    val out = TextQueries.dsirLayout(docs, Seq("tgt"), k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._1).toSet == Set(1L, 2L),
      s"selection must pick the target-vocabulary docs: ${out.toSeq}")
    // hand formula: V=4 distinct terms, C=10 tokens, T=4 target tokens.
    // 'ml': cf=2, tft=2 -> lw = ln(3/8) - ln(3/14); same for 'model'.
    val lw = math.log(3.0 / 8) - math.log(3.0 / 14)
    val want = BigDecimal((lw + lw) / 2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.forall(r => math.abs(r._3 - want) < 1e-9),
      s"expected score $want, got ${out.toSeq}")
    assert(out.forall(_._2 == 2L))
  }

  test("tie-break: equal scores order by doc_id (the engine-stable " +
    "selection boundary)") {
    import spark.implicits._
    val docs = Seq(
      (7L, "gen", "cat"), (3L, "gen", "cat"), (5L, "gen", "cat"),
      (1L, "tgt", "cat")
    ).toDF("doc_id", "source", "text")
    // all docs have the identical single token => identical score; k=2
    // must keep the two lowest doc_ids
    val got = TextQueries.dsirLayout(docs, Seq("tgt"), k = 2).collect()
      .map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 3L), s"got $got")
  }

  test("sf0.001 corpus: top-100 enriches the src0/src1 slice over its " +
    "base rate") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sel = TextQueries.dsirLayout(
      docs.select("doc_id", "source", "text"), Seq("src0", "src1"), k = 100)
    val joined = sel.join(docs.select("doc_id", "source"), "doc_id")
    val inTarget = joined
      .where(org.apache.spark.sql.functions.col("source")
        .isin("src0", "src1")).count()
    // base rate is 10% (2 of 20 uniform sources); the synthetic corpus
    // has near-uniform vocab across sources, so demand only real
    // enrichment, not separation
    assert(inTarget > 10L, s"top-100 holds only $inTarget target docs")
  }
}
