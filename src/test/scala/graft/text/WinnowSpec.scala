package graft.text

import graft.SparkSpec
import graft.functions.WinnowPrints
import graft.queries.TextQueries
import org.apache.spark.unsafe.types.UTF8String

/** Winnowed substring fingerprints + the t38 pair layout: the expression
  * against a brute-force reference, the SWA detection guarantee at
  * shifted offsets, and the s18-style ubiquity cap. */
class WinnowSpec extends SparkSpec {

  private def md5fp(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).take(8)
      .map(b => f"$b%02x").mkString
  }

  /** Brute-force reference: every window's min fingerprint, distinct. */
  private def reference(text: String, l: Int, w: Int): Set[String] = {
    if (text.length < l + w - 1) return Set.empty
    val fps = (0 to text.length - l).map(i => md5fp(text.substring(i, i + l)))
    (0 to fps.length - w).map(s => fps.slice(s, s + w).min).toSet
  }

  private def computed(text: String, l: Int, w: Int): Set[String] = {
    val arr = WinnowPrints.compute(UTF8String.fromString(text), l, w)
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString).toSet
  }

  test("expression == brute-force reference on random strings (incl. " +
    "repeats that force hash ties in a window)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 60) {
      val l = 1 + rnd.nextInt(6)
      val w = 1 + rnd.nextInt(5)
      // tiny alphabet: plenty of repeated grams, so equal fingerprints
      // land in one window and the by-value selection rule is exercised
      val n = rnd.nextInt(40)
      val text = Array.fill(n)(('a' + rnd.nextInt(3)).toChar).mkString
      assert(computed(text, l, w) == reference(text, l, w),
        s"trial $trial l=$l w=$w text=$text")
    }
  }

  test("a doc shorter than L+W-1 yields no prints") {
    assert(computed("abcdef", 5, 3).isEmpty) // needs 7 chars
    assert(computed("abcdefg", 5, 3).nonEmpty)
  }

  test("SWA guarantee: a shared substring of length >= L+W-1 at " +
    "DIFFERENT offsets shares at least one selected fingerprint") {
    val rnd = new scala.util.Random(11)
    val shared = Array.fill(20)(('a' + rnd.nextInt(26)).toChar).mkString
    for (trial <- 0 until 20) {
      def pad(n: Int) = Array.fill(n)(('A' + rnd.nextInt(26)).toChar).mkString
      val a = pad(rnd.nextInt(30)) + shared + pad(rnd.nextInt(30))
      val b = pad(rnd.nextInt(30)) + shared + pad(rnd.nextInt(30))
      // L=10, W=11: guarantee kicks in at 20 = |shared|
      assert(computed(a, 10, 11).intersect(computed(b, 10, 11)).nonEmpty,
        s"trial $trial: no shared print for offset-shifted repeat")
    }
  }

  test("layout surfaces offset-shifted repeats; ubiquity cap starves " +
    "boilerplate-only pairs but exact verify still counts capped prints") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    def rstr(n: Int) = Array.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    val boiler = rstr(40) // in every doc → df 6 > cap 3
    val repeatA = rstr(30) // shared by 21 and 22 at different offsets
    val docs = Seq(
      21L -> (boiler + rstr(10) + repeatA + rstr(5)),
      22L -> (rstr(25) + repeatA + boiler),
      25L -> (boiler + rstr(40)),
      27L -> (rstr(7) + boiler + rstr(33)),
      28L -> (boiler + rstr(41)),
      29L -> (rstr(19) + boiler + rstr(21))
    ).toDF("doc_id", "text")
    // L=10, W=6: guarantee at 15 chars; both boiler (40) and repeatA
    // (30) are long enough to be guaranteed-detected. NOTE every pair
    // here is a TRUE repeat pair (all six share boiler), so the cap's
    // contract is pruning, not correctness: the capped run must be a
    // SUBSET of the uncapped one, must still contain the rare-print
    // pair (21,22) — its repeatA prints have df 2 — and must prune the
    // bulk of the boilerplate-only pairs (edge windows mix boiler grams
    // with doc-specific neighbors, so a FEW boiler-derived prints get
    // per-doc-dependent selection and df <= cap; those legitimately
    // survive).
    val capped = TextQueries.winnowLayout(docs, gramLen = 10, window = 6,
        maxDf = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toMap2
    val uncapped = TextQueries.winnowLayout(docs, 10, 6, maxDf = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toMap2
    assert(uncapped.keySet.size == 15,
      s"all 15 pairs share boiler uncapped, got ${uncapped.keySet}")
    assert(capped.contains((21L, 22L)), s"rare-print pair lost: $capped")
    assert(capped.keySet.subsetOf(uncapped.keySet))
    assert(capped.size < uncapped.size,
      s"the cap must prune boilerplate-only pairs, got ${capped.keySet}")
    // exact verify counts ALL shared prints for surfaced pairs — the
    // capped run reports the same n_shared the uncapped run does
    capped.foreach { case (p, n) =>
      assert(n == uncapped(p), s"pair $p: capped n_shared $n != ${uncapped(p)}")
    }
  }

  private implicit class ToMap2(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[(Long, Long), Long] =
      rows.map { case (a, b, n) => ((a, b), n) }.toMap
  }
}
