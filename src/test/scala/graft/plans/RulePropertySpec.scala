package graft.plans

import graft.SparkSpec

/** Randomized soundness checks for the round-5 primitives — pure-Scala
  * references on seeded random inputs (deterministic, no flakes). */
class RulePropertySpec extends SparkSpec {

  /** Classic O(nm) edit-distance DP — the independent reference. */
  private def editDistance(a: String, b: String): Int = {
    val (n, m) = (a.length, b.length)
    val prev = Array.tabulate(m + 1)(identity)
    val cur = new Array[Int](m + 1)
    for (i <- 1 to n) {
      cur(0) = i
      for (j <- 1 to m) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
      }
      Array.copy(cur, 0, prev, 0, m + 1)
    }
    prev(m)
  }

  test("LevenshteinPrefilter guard is SOUND: length gap never exceeds distance") {
    // the rewrite is correct iff  abs(|a|-|b|) <= editDistance(a,b)  for
    // all strings — i.e. the guard can only remove rows the comparison
    // would remove anyway
    val rnd = new scala.util.Random(42)
    def randStr(): String =
      Seq.fill(rnd.nextInt(30))(('a' + rnd.nextInt(4)).toChar).mkString
    (1 to 500).foreach { _ =>
      val (a, b) = (randStr(), randStr())
      val d = editDistance(a, b)
      assert(math.abs(a.length - b.length) <= d,
        s"guard unsound for ('$a','$b'): gap ${math.abs(a.length - b.length)} > dist $d")
    }
  }

  test("guarded filter equals unguarded filter on random pairs (end-to-end)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    LevenshteinPrefilter.install(spark)
    val rnd = new scala.util.Random(7)
    def randStr(): String =
      Seq.fill(rnd.nextInt(20))(('a' + rnd.nextInt(3)).toChar).mkString
    val pairs = Seq.fill(200)((randStr(), randStr()))
    val expected = pairs.filter { case (a, b) => editDistance(a, b) <= 3 }.size
    // parquet-backed to defeat constant folding (rule must actually fire)
    val dir = java.nio.file.Files.createTempDirectory("graft_levprop").toString
    pairs.toDF("a", "b").write.mode("overwrite").parquet(dir)
    val got = spark.read.parquet(dir)
      .where(levenshtein(col("a"), col("b")) <= 3).count()
    assert(got == expected, s"rule changed semantics: $got vs $expected")
  }

  test("kmeans invariants on random samples: count, convexity, determinism") {
    val rnd = new scala.util.Random(99)
    (1 to 10).foreach { _ =>
      val n = 5 + rnd.nextInt(60)
      val sample = Array.fill(n)(Array.fill(4)(rnd.nextDouble() * 20 - 10))
      val k = 1 + rnd.nextInt(10)
      val cents = graft.sim.Similarity.kmeans(sample, k, iters = 3)
      assert(cents.length == math.min(k, n))
      // each centroid is a mean of sample points (or an initial sample
      // point) -> every coordinate stays inside the sample's bounding box
      for (d <- 0 until 4) {
        val (lo, hi) = (sample.map(_(d)).min, sample.map(_(d)).max)
        assert(cents.forall(c => c(d) >= lo - 1e-9 && c(d) <= hi + 1e-9),
          "centroid escaped the sample's convex bounds")
      }
      val again = graft.sim.Similarity.kmeans(sample.map(_.clone()), k, 3)
      assert(cents.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    }
  }
}
