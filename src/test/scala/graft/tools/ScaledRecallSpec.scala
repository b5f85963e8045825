package graft.tools

import graft.SparkSpec
import graft.ops.CoreOps

/** LSH recall at scale, independently verified (r13 verdict item 4): the
  * dump-time oracles for t29/s15 share candidate constants with the
  * engine, so a recall regression (e.g. a band/table count change, a
  * signature bug that still hashes consistently) is invisible to them.
  * [[RecallProbe]] brute-forces ground truth over a 1-in-N id slice and
  * this spec pins recall == 1.0 AND value-identity on ×10-GROW and
  * ×10-HOT worlds built from sf0.001 via the production ScaleUp tool —
  * the same two axes the BASELINE.md scale matrix measures (grow:
  * de-correlated cipher text / disjoint keys; hot: every text and vector
  * duplicated verbatim — the collapse-routing stress shape).
  *
  * The real-×10 (sf0.1-based) runs of the same probe are recorded in
  * BASELINE.md round-14; this spec keeps the property pinned in-suite at
  * a scale the suite can afford.
  */
class ScaledRecallSpec extends SparkSpec {

  private def buildWorld(mode: String): String = {
    val dir = trackedTempDir(s"recall-x10-$mode")
    Seq("documents", "embeddings").foreach { t =>
      ScaleUp.scaleTable(CoreOps.scan(spark, sf, t), t, 10, mode)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  for (mode <- Seq("grow", "hot")) {
    lazy val world = buildWorld(mode)

    test(s"t29 LSH recovers the full brute-force survivor set (x10-$mode)") {
      val p = RecallProbe.t29(spark, world, n = 10, r = 3)
      assert(p.truth > 0, "vacuous probe: empty ground-truth slice")
      assert(p.missed == 0 && p.mismatched == 0,
        s"t29 recall broke on the $mode axis: $p")
    }

    test(s"s15 LSH recovers the full brute-force survivor set (x10-$mode)") {
      val p = RecallProbe.s15(spark, world, n = 10, r = 3)
      assert(p.truth > 0, "vacuous probe: empty ground-truth slice")
      assert(p.missed == 0 && p.mismatched == 0,
        s"s15 recall broke on the $mode axis: $p")
    }
  }
}
