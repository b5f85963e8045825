package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The pigeonhole losslessness proof for [[SimilarityQueries.bandedHammingPairs]]
  * made executable at several geometries (r14 verdict item 7): banded
  * output must equal an all-pairs brute force EXACTLY — including
  * worst-case pairs whose differing bits are spread across the maximum
  * number of distinct bands, the adversarial placement for banding. */
class BandedHammingSpec extends SparkSpec {

  private val rnd = new scala.util.Random(0xBADC0DEL)

  /** n random hashes of `words` unsigned 32-bit words, plus planted
    * pairs at Hamming d = 0..spread, each d-th pair's flips placed in d
    * DISTINCT bands (the pigeonhole worst case for that distance). */
  private def corpus(n: Int, words: Int, bandBits: Int, spread: Int)
      : Seq[(Long, Seq[Long])] = {
    def randHash(): Seq[Long] =
      Seq.fill(words)(rnd.nextLong() & 0xFFFFFFFFL)
    val base = (0L until n.toLong).map(i => i -> randHash())
    val planted = (0 to spread).flatMap { d =>
      val id = 1000L + 2 * d
      val h = randHash()
      // flip one bit in each of d distinct bands: bit position
      // band*bandBits (global), mapped into (word, in-word bit)
      val flipped = (0 until d).foldLeft(h) { (acc, band) =>
        val globalBit = band * bandBits
        val w = globalBit / 32
        val bit = 31 - (globalBit % 32) // msb-first within the word
        acc.updated(w, acc(w) ^ (1L << bit))
      }
      Seq(id -> h, (id + 1) -> flipped)
    }
    base ++ planted
  }

  private def run(rows: Seq[(Long, Seq[Long])], words: Int,
                  bandBits: Int, maxHamming: Int): Set[(Long, Long, Int)] = {
    val wordCols = (0 until words).map(i => s"h$i")
    val df = spark.createDataFrame(
      rows.map { case (id, h) => (id, h(0), h.lift(1).getOrElse(0L),
        h.lift(2).getOrElse(0L), h.lift(3).getOrElse(0L)) })
      .toDF("asset_id", "h0", "h1", "h2", "h3")
      .select((col("asset_id") +: wordCols.map(col)): _*)
    SimilarityQueries.bandedHammingPairs(df, wordCols, bandBits, maxHamming)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  private def brute(rows: Seq[(Long, Seq[Long])], maxHamming: Int)
      : Set[(Long, Long, Int)] =
    (for {
      (ia, ha) <- rows; (ib, hb) <- rows if ia < ib
      d = ha.zip(hb).map { case (x, y) =>
        java.lang.Long.bitCount(x ^ y) }.sum
      if d <= maxHamming
    } yield (ia, ib, d)).toSet

  private def proveLossless(words: Int, bandBits: Int): Unit = {
    val nBands = 32 * words / bandBits
    val maxH = nBands - 1
    val rows = corpus(n = 250, words, bandBits, spread = maxH)
    val got = run(rows, words, bandBits, maxH)
    val want = brute(rows, maxH)
    // the planted worst-case pairs must all be present or the corpus
    // failed to exercise the pigeonhole edge
    for (d <- 0 to maxH)
      assert(want.exists(p => p._1 == 1000L + 2 * d && p._3 == d),
        s"corpus lost its planted distance-$d pair")
    assert(got == want,
      s"${nBands}x$bandBits banding is NOT lossless at hamming <= $maxH: " +
        s"missed=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("s16 geometry: 64-bit hash, 4x16-bit bands, lossless to hamming 3") {
    proveLossless(words = 2, bandBits = 16)
  }

  test("scale geometry: 128-bit hash, 4x32-bit bands, lossless to hamming 3") {
    proveLossless(words = 4, bandBits = 32)
  }

  test("wide-radius geometry: 128-bit hash, 16x8-bit bands, lossless to hamming 15") {
    proveLossless(words = 4, bandBits = 8)
  }

  test("a leaky geometry is refused, never silently run") {
    val df = spark.range(1).select(col("id").as("asset_id"),
      lit(0L).as("h0"), lit(0L).as("h1"))
    // 4 bands can only be lossless to hamming 3
    intercept[IllegalArgumentException](
      SimilarityQueries.bandedHammingPairs(df, Seq("h0", "h1"), 16, 4))
    intercept[IllegalArgumentException](
      SimilarityQueries.bandedHammingPairs(df, Seq("h0"), 24, 0))
    intercept[IllegalArgumentException](
      SimilarityQueries.bandedHammingPairs(df, Seq.empty, 16, 0))
  }

  test("the s16 wrapper is the 2-word 16-bit special case, bit for bit") {
    val rows = corpus(n = 120, words = 2, bandBits = 16, spread = 3)
    val df = spark.createDataFrame(
      rows.map { case (id, h) => (id, h(0), h(1)) })
      .toDF("asset_id", "hash_hi", "hash_lo")
    val wrapper = SimilarityQueries.imageHashPairs(df, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(wrapper == brute(rows, 3))
  }
}
