package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** t46 — reciprocal-rank fusion of the sparse (t45 BM25) and dense
  * (s01 cosine) retrievers. Pins the fusion arithmetic on a
  * hand-computed fixture, the one-sided/zero-rank convention, and the
  * registered row's consistency with its two source rankings.
  *
  * Mutation kills recorded in BASELINE.md: RrfK 60 → 61 fails the
  * hand-computed fixture (every contribution shifts); dropping the
  * `> 0` guard fails the one-sided test (rank-0 docs would contribute
  * floor(1e12/60) instead of 0 and storm the top). */
class RrfFusionSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed fusion: overlap compounds, ranks dense from 1") {
    // sparse: a=1 b=2 c=3 ; dense: b=1 d=2 a=3
    val sparse = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "sparse_rank")
    val dense = Seq((20L, 1), (40L, 2), (10L, 3)).toDF("doc_id", "dense_rank")
    val out = TextQueries.rrfFuse(sparse, dense).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getLong(4)))
    def c(rank: Int): Long =
      if (rank == 0) 0L else TextQueries.RrfScale / (TextQueries.RrfK + rank)
    // doc 20: ranks (2,1) → 1e12/62 + 1e12/61; doc 10: (1,3); 30: (3,0);
    // 40: (0,2)
    val expect = Seq(
      (20L, 2, 1), (10L, 1, 3), (40L, 0, 2), (30L, 3, 0))
      .map { case (d, s, dn) => (d, s, dn, c(s) + c(dn)) }
      .sortBy { case (d, _, _, sc) => (-sc, d) }
      .zipWithIndex
      .map { case ((d, s, dn, sc), i) => (i + 1, d, s, dn, sc) }
    assert(out.sortBy(_._1).toSeq == expect)
    // sanity on the fixture itself: the two-list doc fused above any
    // one-list doc despite neither #1 alone — the point of RRF
    assert(out.minBy(_._1)._2 == 20L)
  }

  test("one-sided docs carry rank 0 and a single contribution; " +
    "nothing is null") {
    val sparse = Seq((1L, 1)).toDF("doc_id", "sparse_rank")
    val dense = Seq((2L, 1)).toDF("doc_id", "dense_rank")
    val out = TextQueries.rrfFuse(sparse, dense).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(!(0 until r.length).exists(r.isNullAt))
      assert(r.getLong(4) == TextQueries.RrfScale / (TextQueries.RrfK + 1))
    }
    assert(out.find(_.getLong(1) == 1L).get.getInt(3) == 0) // no dense rank
    assert(out.find(_.getLong(1) == 2L).get.getInt(2) == 0) // no sparse rank
  }

  test("registered t46 is consistent with its own source rankings " +
    "(sf0.001)") {
    val fused = Registry.queries("t46_rrf_fusion")(spark, sf).collect()
    assert(fused.length == TextQueries.RrfTopK)
    val sparse = TextQueries.bm25Layout(
        spark.read.parquet(s"$sf/documents.parquet"),
        TextQueries.Bm25Query, k = TextQueries.RrfDepth)
      .collect().zipWithIndex
      .map { case (r, i) => r.getAs[Long]("doc_id") -> (i + 1) }.toMap
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val dense = graft.sim.Similarity.bruteForceTopK(
        emb.where(col("vec_id") === 0), emb, k = TextQueries.RrfDepth)
      .collect()
      .map(r => r.getAs[Long]("neighbor_id") -> r.getAs[Int]("rank")).toMap
    fused.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      val s = r.getAs[Int]("sparse_rank")
      val dn = r.getAs[Int]("dense_rank")
      assert(s == sparse.getOrElse(d, 0), s"sparse rank drift for $d")
      assert(dn == dense.getOrElse(d, 0), s"dense rank drift for $d")
      assert(s > 0 || dn > 0, s"doc $d in fused top-k from neither list")
      def c(rank: Int): Long =
        if (rank == 0) 0L else TextQueries.RrfScale / (TextQueries.RrfK + rank)
      assert(r.getAs[Long]("rrf_score") == c(s) + c(dn))
    }
  }
}
