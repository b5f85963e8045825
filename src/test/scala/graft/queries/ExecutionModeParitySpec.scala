package graft.queries

import org.apache.spark.sql.Row

import graft.SparkSpec

/** Execution-mode parity, completing the trilogy (CodegenParitySpec:
  * interpreted vs compiled; SpillParitySpec: spilled vs in-memory):
  * results must be independent of HOW the plan executes —
  *
  *   - AQE off vs on (runtime re-planning must not change values), and
  *   - shuffle partition count 5 vs 1 (single-partition execution is
  *     the degenerate ordering that exposes partition-order leaks): every
  *     aggregation order, window frame, and tie-break must be
  *     partitioning-independent. This is the direct test of the repo's
  *     determinism discipline — decimal-exact double sums, total-order
  *     tie-breaks, min-id survivors — on the shapes most likely to leak
  *     partition order: floating aggregation (s08 pool, e16 z-scores),
  *     rank selection (e11/e20), sampling (t08/t12), salted agg (e17),
  *     as-of resolution (ev05), heavy hitters (t15).
  *
  * Rows are compared as sorted multisets: OUTPUT order may legitimately
  * differ across modes (no global ORDER BY contract); values must not.
  */
class ExecutionModeParitySpec extends SparkSpec with graft.IsolatedSession {

  private def collectWith(name: String, knobs: Seq[(String, String)]): Seq[String] = {
    val conf = spark.conf
    val saved = knobs.map { case (k, _) => k -> conf.getOption(k) }
    knobs.foreach { case (k, v) => conf.set(k, v) }
    try Registry.queries(name)(spark, sf).collect()
      .map((_: Row).toString).sorted.toSeq
    finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  private val Queries = Seq("e01_q1_agg", "e11_exact_median", "e16_outliers",
    "e17_salted_agg", "e20_quartiles", "ev05_asof_view_click",
    "s08_embedding_pool", "t08_systematic_sample", "t12_stratified_sample",
    "t15_heavy_hitters",
    // round-9 additions: broadcast-probe + anti-join (t21), the LCG
    // window rank (t22), and the decimal-summed floating score (t23 —
    // the shape MOST likely to leak partition order without the
    // decimal-addend discipline) must be replan/partitioning-independent
    "t21_decontaminate", "t22_source_quota", "t23_unigram_logprob",
    "t24_sequence_pack",
    // round-10 additions: the exact-collapse near-dup shapes — rep
    // grouping (min-id/min_by), band/chunk joins on reps, and the
    // intra/cross pair expansion union must be replan- and
    // partitioning-independent
    "s03_minhash_neardup", "s04_simhash_neardup",
    // round-11 additions: the quantized two-stage ANN — an integer coarse
    // top-k boundary feeding a float rerank — and the md5-keyed epoch
    // layout; all their windows must be replan- and
    // partitioning-independent
    "s14_ann_quantized", "t28_epoch_shuffle",
    // round-14 additions: the shuffled gram join + per-doc hit count,
    // and its bloom-gated twin (subquery sketch + might_contain filter),
    // must be replan- and partitioning-independent
    "t30_contamination_score", "t31_bloom_contamination",
    "t32_bloom_incremental_dedup")

  test("the suite is not vacuous: most shapes return rows at this SF") {
    // e16 legitimately yields zero outliers at small SF — empty==empty is
    // a valid parity for it; this guards against ALL queries going empty
    val nonEmpty = Queries.count(n => collectWith(n, Seq.empty).nonEmpty)
    assert(nonEmpty >= Queries.size - 1, s"only $nonEmpty shapes returned rows")
  }

  Queries.foreach { name =>
    test(s"$name: AQE off == AQE on") {
      val off = collectWith(name, Seq("spark.sql.adaptive.enabled" -> "false"))
      val on = collectWith(name, Seq("spark.sql.adaptive.enabled" -> "true"))
      assert(off === on, s"$name changes values under AQE")
    }

    test(s"$name: shuffle partition count must not change values") {
      val p5 = collectWith(name, Seq("spark.sql.shuffle.partitions" -> "5"))
      val p1 = collectWith(name, Seq("spark.sql.shuffle.partitions" -> "1"))
      assert(p5 === p1, s"$name values depend on the partitioning")
    }
  }
}
