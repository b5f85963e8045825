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

  test("kmeans is deterministic and recovers well-separated clusters") {
    val rnd = new scala.util.Random(7)
    // two tight clusters around +10 and -10 in every dim
    val sample = Array.tabulate(40) { i =>
      val base = if (i % 2 == 0) 10.0 else -10.0
      Array.fill(4)(base + rnd.nextGaussian() * 0.1)
    }
    val c1 = Similarity.kmeans(sample, k = 2, iters = 5)
    val c2 = Similarity.kmeans(sample.map(_.clone()), k = 2, iters = 5)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq) // bit-identical
    val means = c1.map(_.sum / 4)
    assert(means.exists(m => math.abs(m - 10) < 0.5) &&
      means.exists(m => math.abs(m + 10) < 0.5), means.toSeq.toString)
    // k > sample size degrades gracefully
    assert(Similarity.kmeans(sample.take(3), k = 8).length == 3)
  }

  test("trained IVF centroids beat untrained recall on a clustered corpus") {
    val rnd = new scala.util.Random(123)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextDouble() * 10 - 5))
    val vecs = (0 until 400).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 1.5).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.where(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(queries, df, k = 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    def recall(cents: Array[Array[Double]]): Double = {
      val approx = Similarity.ivfTopK(queries, df, cents, k = 10, nprobe = 2)
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      exact.intersect(approx).size.toDouble / exact.size
    }
    val trained = recall(Similarity.trainCentroids(df, k = 8))
    val untrained = recall(Similarity.hyperplanes(8, 64, seed = 11L))
    assert(trained >= 0.8, s"trained recall $trained")
    assert(trained >= untrained + 0.1,
      s"trained $trained should beat untrained $untrained by >= 0.1")
  }

  test("trainCentroids on an empty sample raises the engine's NoData error") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val e = intercept[graft.GraftError.NoData] {
      Similarity.trainCentroids(empty, k = 8)
    }
    assert(e.code == 9998 && e.getMessage.contains("trainCentroids"))
  }

  test("IVF assignment puts every vector in a valid cell") {
    val cents = Similarity.hyperplanes(4, 64, seed = 7L)
    val out = Similarity.ivfAssign(emb.limit(50), cents)
      .select("cell").as[Int].collect()
    assert(out.forall(c => c >= 0 && c < 4))
    assert(out.toSet.size > 1) // not everything in one cell
  }
}
