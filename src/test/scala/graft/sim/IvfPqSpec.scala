package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Composed IVF-PQ ANN (s19): residual-codebook trainer determinism, a
  * full plain-Scala re-derivation of the pipeline (cell assign, residual
  * encode, per-cell quantized query, integer ADC with the qnorm2 term,
  * exact rerank) compared row-for-row, and recall@10 vs brute force. */
class IvfPqSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("trainResidualPQ: deterministic; m × k × dim/m shapes") {
    val cents = Similarity.trainCentroids(emb, k = 8)
    val a = Similarity.trainResidualPQ(emb, cents, m = 8, k = 16)
    val b = Similarity.trainResidualPQ(emb, cents, m = 8, k = 16)
    assert(a.length == 8 && a.forall(_.length == 16) &&
      a.forall(_.forall(_.length == 8)))
    assert(a.map(_.map(_.toSeq).toSeq).toSeq == b.map(_.map(_.toSeq).toSeq).toSeq)
    // residual codebooks differ from raw-vector codebooks over the same
    // sample — they model v − c(v), not v
    val raw = Similarity.trainPQ(emb, m = 8, k = 16)
    assert(a.map(_.map(_.toSeq).toSeq).toSeq != raw.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("ivfPqTopK == independent plain-Scala re-derivation (cells, " +
    "residual codes, qnorm2-carrying integer ADC, exact rerank)") {
    val cents = Similarity.trainCentroids(emb, k = 8)
    val cbs = Similarity.trainResidualPQ(emb, cents, m = 8, k = 16)
    val got = Similarity.ivfPqTopK(emb.where(col("vec_id") < 5), emb,
        cents, cbs, k = 10, nprobe = 2, coarseK = 50)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))

    // ---- plain-Scala reference: shares ONLY the trained structures ----
    val rows = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val qcb = Similarity.quantizePQ(cbs)
    val m = cbs.length; val sub = cbs(0)(0).length; val dim = m * sub

    def cellOf(v: Array[Double]): Int = {
      var best = 0; var bd = Double.MaxValue
      for (c <- cents.indices) {
        var d = 0.0
        for (i <- 0 until dim) { val t = v(i) - cents(c)(i); d += t * t }
        if (d < bd) { bd = d; best = c }
      }
      best
    }
    def probesOf(v: Array[Double], nprobe: Int): Seq[Int] =
      cents.indices.map { c =>
        var d = 0.0
        for (i <- 0 until dim) { val t = v(i) - cents(c)(i); d += t * t }
        (d, c)
      }.sortBy(identity).take(nprobe).map(_._2)
    def residOf(v: Array[Double], cell: Int): Array[Double] =
      Array.tabulate(dim)(i => v(i) - cents(cell)(i))
    def codesOf(r: Array[Double]): Array[Int] = Array.tabulate(m) { s =>
      var best = 0; var bd = Double.MaxValue
      for (c <- cbs(s).indices) {
        var d = 0.0
        for (i <- 0 until sub) { val t = r(s * sub + i) - cbs(s)(c)(i); d += t * t }
        if (d < bd) { bd = d; best = c }
      }
      best
    }
    def quant(v: Array[Double]): Array[Int] =
      v.map(x => math.max(-127, math.min(127, math.floor(x * 64).toInt)))
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
    val encoded = rows.map { case (id, vf) =>
      val v = vf.map(_.toDouble)
      val cell = cellOf(v)
      val rec = codesOf(residOf(v, cell)).zipWithIndex
        .flatMap { case (c, s) => qcb(s)(c) }
      (id, cell, rec, dotI(rec, rec))
    }
    val expected = rows.filter(_._1 < 5).sortBy(_._1).flatMap {
      case (qid, qvf) =>
        val qv = qvf.map(_.toDouble)
        val probed = probesOf(qv, 2).toSet
        val perCellQ = probed.map(c => c -> quant(residOf(qv, c))).toMap
        val cand = encoded
          .filter { case (id, cell, _, _) => id != qid && probed(cell) }
          .map { case (id, cell, rec, rn2) =>
            val qq = perCellQ(cell)
            (id, dotI(qq, qq) - 2L * dotI(qq, rec) + rn2)
          }
          .sortBy { case (id, coarse) => (coarse, id) }
          .take(50).map(_._1).toSet
        rows.filter(r => cand(r._1))
          .map { case (id, v) => (id, cosine(qvf, v)) }
          .sortBy { case (id, sim) => (-sim, id) }
          .take(10).zipWithIndex
          .map { case ((id, sim), i) =>
            (qid, i + 1, id, BigDecimal(sim)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
    }
    assert(got.toSeq == expected.toSeq)
  }

  test("IVF-PQ recall@10 is high on a CLUSTERED corpus at nprobe 2/8 — " +
    "the structure IVF exists to exploit") {
    import spark.implicits._
    // On the near-uniform harness embeddings, IVF recall tracks the
    // probed fraction by construction (measured: 0.26/0.5/0.6/0.7 at
    // nprobe 1-4 of 8) — pruning 6/8 of an unclustered corpus prunes
    // 6/8 of its true neighbors. The operator's claim is about CLUSTERED
    // corpora (real embedding spaces), so that is what this pins, the
    // SimilaritySpec trained-vs-untrained pattern.
    val rnd = new scala.util.Random(123)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextDouble() * 10 - 5))
    val vecs = (0 until 400).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.5).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val cents = Similarity.trainCentroids(df, k = 8, sampleMod = 1)
    val cbs = Similarity.trainResidualPQ(df, cents, m = 8, k = 16,
      sampleMod = 1)
    val queries = df.where(col("vec_id") < 5)
    val got = Similarity.ivfPqTopK(queries, df, cents, cbs,
        k = 10, nprobe = 2, coarseK = 50)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = Similarity.bruteForceTopK(queries, df, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF-PQ recall@10 on clustered corpus = $recall")
    info(f"clustered-corpus recall@10 = $recall%.3f at nprobe 2/8")
  }
}
