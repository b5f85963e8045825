package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product-quantization ANN (s17): trainer determinism, the SQ8 grid
  * rule, and a full independent plain-Scala re-derivation of the
  * pipeline — per-subspace argmin codes, integer-grid reconstruction,
  * the `rnorm2 − 2·dot` coarse boundary, and the exact-cosine rerank —
  * compared row-for-row against the engine output. */
class PqSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("trainPQ: deterministic across calls; m × k × dim/m shapes") {
    val a = Similarity.trainPQ(emb, m = 4, k = 16)
    val b = Similarity.trainPQ(emb, m = 4, k = 16)
    assert(a.length == 4)
    assert(a.forall(_.length == 16))
    assert(a.forall(_.forall(_.length == 16)))
    assert(a.map(_.map(_.toSeq).toSeq).toSeq == b.map(_.map(_.toSeq).toSeq).toSeq,
      "trained codebooks must be bit-reproducible")
    // distinct codebooks per subspace (the subspaces see different data)
    assert(a(0).map(_.toSeq).toSeq != a(1).map(_.toSeq).toSeq)
  }

  test("quantizePQ is exactly the SQ8 floor rule, clamped to ±127") {
    val cbs = Array(Array(Array(0.5, -3.0, 1.99, -0.016, 0.0)))
    val q = Similarity.quantizePQ(cbs)
    assert(q(0)(0).toSeq == Seq(32, -127, 127, -2, 0))
  }

  test("trainPQ refuses a dim not divisible by m") {
    intercept[IllegalArgumentException] {
      Similarity.trainPQ(emb, m = 5, k = 4)
    }
  }

  test("pqTopK == independent plain-Scala re-derivation (codes, integer " +
    "ADC, crank boundary, exact rerank)") {
    val cbs = Similarity.trainPQ(emb, m = 4, k = 16)
    val got = Similarity.pqTopK(emb.where(col("vec_id") < 5), emb, cbs,
        k = 10, coarseK = 50)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))

    // ---- plain-Scala reference: shares ONLY the trained codebooks ----
    val rows = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val qcb = Similarity.quantizePQ(cbs)
    val m = cbs.length; val sub = cbs(0)(0).length

    def codesOf(v: Array[Float]): Array[Int] = Array.tabulate(m) { s =>
      var best = 0; var bd = Double.MaxValue
      for (c <- cbs(s).indices) {
        var d = 0.0
        for (i <- 0 until sub) {
          val t = v(s * sub + i).toDouble - cbs(s)(c)(i); d += t * t
        }
        if (d < bd) { bd = d; best = c } // strict <: ties keep lowest code
      }
      best
    }
    def reconOf(codes: Array[Int]): Array[Int] =
      codes.zipWithIndex.flatMap { case (c, s) => qcb(s)(c) }
    def quant(v: Array[Float]): Array[Int] =
      v.map(x => math.max(-127, math.min(127,
        math.floor(x.toDouble * 64).toInt)))
    def dotI(a: Array[Int], b: Array[Int]): Long =
      a.zip(b).map { case (x, y) => x.toLong * y.toLong }.sum
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      for (i <- a.indices) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; nx += x * x; ny += y * y
      }
      dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    val encoded = rows.map { case (id, v) =>
      val r = reconOf(codesOf(v)); (id, r, dotI(r, r))
    }
    val expected = rows.filter(_._1 < 5).sortBy(_._1).flatMap {
      case (qid, qv) =>
        val qq = quant(qv)
        val cand = encoded.filter(_._1 != qid)
          .map { case (id, r, rn2) => (id, rn2 - 2L * dotI(qq, r)) }
          .sortBy { case (id, coarse) => (coarse, id) }
          .take(50).map(_._1).toSet
        rows.filter(r => cand(r._1))
          .map { case (id, v) => (id, cosine(qv, v)) }
          .sortBy { case (id, sim) => (-sim, id) }
          .take(10).zipWithIndex
          .map { case ((id, sim), i) =>
            (qid, i + 1, id, BigDecimal(sim)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
    }
    assert(got.toSeq == expected.toSeq)
  }

  test("PQ recall@10 vs exact brute force is high on the harness corpus " +
    "at s17's geometry") {
    import graft.queries.SimilarityQueries._
    val cbs = Similarity.trainPQ(emb, m = PqM, k = PqK)
    val pq = Similarity.pqTopK(emb.where(col("vec_id") < 5), emb, cbs,
        k = 10, coarseK = PqCoarseK)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = Similarity.bruteForceTopK(
        emb.where(col("vec_id") < 5), emb, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (pq & exact).size.toDouble / exact.size
    assert(recall >= 0.7, s"PQ recall@10 = $recall")
  }
}
