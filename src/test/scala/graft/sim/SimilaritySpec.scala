package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("cosine of a vector with itself is 1") {
    val r = emb.limit(3)
      .select(Similarity.cosine(
        Similarity.asDouble(col("embedding")),
        Similarity.asDouble(col("embedding"))).as("c"))
      .as[Double].collect()
    assert(r.forall(c => math.abs(c - 1.0) < 1e-12))
  }

  test("brute-force top-k is ordered, excludes self, has k rows per query") {
    val out = Similarity.bruteForceTopK(emb.where(col("vec_id") < 3), emb, k = 5)
      .collect()
    assert(out.length == 15)
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    byQ.foreach { case (q, rows) =>
      val ranked = rows.sortBy(_.getAs[Int]("rank"))
      assert(ranked.map(_.getAs[Int]("rank")).toSeq == (1 to 5))
      assert(!rows.exists(_.getAs[Long]("neighbor_id") == q))
      val sims = ranked.map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH ANN recall@10 vs brute force is usable (>= 0.5)") {
    val queries = emb.where(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(queries, emb, k = 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = Similarity.lshTopK(queries, emb, k = 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall")
  }

  test("IVF top-k probes nprobe cells and returns ranked neighbors") {
    val cents = Similarity.hyperplanes(8, 64, seed = 11L)
    val queries = emb.where(col("vec_id") < 3)
    val out = Similarity.ivfTopK(queries, emb, cents, k = 5, nprobe = 2)
      .collect()
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.values.foreach { rows =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rows.length))
      assert(rows.length <= 5 && rows.nonEmpty)
    }
    // nprobe=2 of 8 cells: candidates must be a strict subset of the corpus
    val exact = Similarity.bruteForceTopK(queries, emb, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = out
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.2, s"ivf recall $recall") // coarse cells, lenient bound
  }

  test("IVF assignment puts every vector in a valid cell") {
    val cents = Similarity.hyperplanes(4, 64, seed = 7L)
    val out = Similarity.ivfAssign(emb.limit(50), cents)
      .select("cell").as[Int].collect()
    assert(out.forall(c => c >= 0 && c < 4))
    assert(out.toSet.size > 1) // not everything in one cell
  }
}
