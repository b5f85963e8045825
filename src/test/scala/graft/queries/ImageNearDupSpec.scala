package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.Multimodal

/** s16 perceptual-hash image near-dup, verified against an INDEPENDENT
  * plain-Scala replica that never touches a PNG byte — it recomputes
  * every hash from the synthesis arithmetic and brute-forces ALL pairs,
  * so the engine's decode, aHash, and banded join are all under test at
  * once. Separate tests pin the banding's pigeonhole losslessness on
  * adversarial hand-built hashes and the payload-free join plan. */
class ImageNearDupSpec extends SparkSpec {

  // ---- plain-Scala replica: arithmetic only, no decode, no banding ----

  private def sampleBits(docId: Long): Array[Int] = {
    val seed = if (docId % 10 == 7) docId - 7 else docId
    val pert = docId % 10 == 7
    val w = (4 + seed % 29).toInt; val h = (3 + seed % 17).toInt
    val s = Array.tabulate(64) { b =>
      val i = b / 8; val j = b % 8
      val fx = i * w / 8; val fy = j * h / 8
      val g = Multimodal.grayMixAt(fx, fy, seed)
      if (pert && fx == 0 && fy == 0) (g + Multimodal.NearDupBump) % 256 else g
    }
    val tot = s.map(_.toLong).sum
    s.map(v => if (64L * v >= tot) 1 else 0)
  }

  private def replica(ids: Seq[Long], maxHamming: Int): Set[(Long, Long, Int)] = {
    val bits = ids.map(id => id -> sampleBits(id)).toMap
    (for {
      a <- ids; b <- ids if a < b
      d = bits(a).zip(bits(b)).count { case (x, y) => x != y }
      if d <= maxHamming
    } yield (a, b, d)).toSet
  }

  // ----------------------------------------------------------------------

  test("s16 matches the arithmetic brute-force replica exactly on sf0.001") {
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id")).collect().map(_.getLong(0)).toIndexedSeq
    val expect = replica(ids, maxHamming = 3)
    val got = SimilarityQueries.imageNearDup(spark, sf).collect()
      .map((r: Row) => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expect,
      s"engine pairs diverge from replica:\n missing=${expect -- got}\n extra=${got -- expect}")
    // the corpus plants one near-dup copy per id % 10 == 7; all 50 must
    // surface at this scale (measured: every planted pair is at Hamming
    // <= 1 for ids < 500 — no origin-pixel mod-256 wrap in range)
    val planted = got.filter { case (a, b, _) => b - a == 7 && b % 10 == 7 }
    assert(planted.size == 50, s"expected 50 planted pairs, got ${planted.size}")
    assert(planted.forall(_._3 <= 1),
      s"planted copies should sit at Hamming <= 1: ${planted.filter(_._3 > 1)}")
  }

  test("banding is lossless at the radius: a 3-bit edit concentrated in one " +
    "band is found; distance 4 is excluded") {
    import spark.implicits._
    // base hash: alternating bits; partner flips 3 bits inside band 0
    // (hash_hi bits 16..31) — the other 3 bands stay identical, so the
    // pigeonhole candidate join MUST surface the pair
    val hi = 0x55555555L; val lo = 0x55555555L
    val hi3 = hi ^ (0x7L << 16) // 3 flips in band 0
    val hi4 = hi ^ (0x3L << 16) ^ (0x3L << 0) // 4 flips across 2 bands
    val hashes = Seq(
      (1L, hi, lo), (2L, hi3, lo), (3L, hi4, lo)
    ).toDF("asset_id", "hash_hi", "hash_lo")
    val got = SimilarityQueries.imageHashPairs(hashes, maxHamming = 3)
      .collect().map((r: Row) => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got.contains((1L, 2L, 3)), s"Hamming-3 pair must be found: $got")
    assert(!got.exists { case (a, b, _) => Set(a, b) == Set(1L, 3L) },
      s"Hamming-4 pair must be excluded by the radius: $got")
    // 2 vs 3: differs in 3+2+2=... recompute: hi3^hi4 flips bits {16,17,18}^{16,17,0,1}
    // = {18,0,1} -> distance 3, shares bands 1..3 -> must also be found
    assert(got.contains((2L, 3L, 3)), s"the 2-3 pair is also within radius: $got")
  }

  test("maxHamming above the lossless radius is rejected") {
    import spark.implicits._
    val hashes = Seq((1L, 0L, 0L)).toDF("asset_id", "hash_hi", "hash_lo")
    intercept[IllegalArgumentException](
      SimilarityQueries.imageHashPairs(hashes, maxHamming = 4))
  }

  test("plan: payloads never ride the band exchanges; no cartesian join; " +
    "decode+hash materialized once (ReusedExchange)") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.Exchange
    val df = SimilarityQueries.imageNearDup(spark, sf)
    val plan = df.queryExecution.executedPlan
    val root = plan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p                        => p
    }
    val exchanges = root.collect { case e: Exchange => e }
    assert(exchanges.nonEmpty, "expected the band-keyed candidate exchanges")
    exchanges.foreach { e =>
      assert(!e.output.exists(
          _.dataType == org.apache.spark.sql.types.BinaryType),
        s"a payload rode an exchange: ${e.output.map(_.name).mkString(",")}")
    }
    val s = plan.toString
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"),
      s"the candidate stage must be an equi-join:\n$s")
    // The self-join's two sides must share ONE materialized decode+hash
    // pass. The bait is real: a bare self-join duplicates the lineage and
    // ImageIO runs twice. The band-keyed repartition ends both sides at
    // an identical Exchange, which AQE's stage cache dedupes AT RUNTIME —
    // so execute first, then read the FINAL plan (the initial plan never
    // shows the reuse), cutting off the echoed initial-plan section.
    df.collect()
    val finalStr = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(finalStr.contains("ReusedExchange"),
      s"decode+hash must run once, reused across the self-join:\n$finalStr")
    assert("MapPartitions".r.findAllIn(finalStr).size == 2,
      s"expected exactly one synth + one hash MapPartitions chain:\n$finalStr")
  }
}
