package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** t33 priority sampling, verified against an INDEPENDENT plain-Scala
  * replica (java MessageDigest + raw double arithmetic — no Spark
  * expressions, no shared helper code), plus the determinism and plan
  * invariants the operator's 100 TB story rests on. */
class WeightedSampleSpec extends SparkSpec {

  // ---- plain-Scala replica of the whole t33 pipeline -------------------

  private val stop = Set("the", "and", "of", "to", "is", "in")

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def quality(text: String): Double = {
    val toks = text.trim.toLowerCase
      .split("[ \t\n\f\r]+").filter(_.nonEmpty)
    val nTokens = toks.length
    val nChars = text.length
    val nPunct = text.count(".,!?;:".contains(_))
    val nStop = toks.count(stop.contains)
    val lenScore =
      if (nTokens >= 10 && nTokens <= 1000) 1.0
      else if (nTokens < 10) nTokens.toDouble / 10.0
      else 1000.0 / nTokens.toDouble
    val punctScore =
      if (nPunct.toDouble / math.max(nChars.toDouble, 1.0) <= 0.1) 1.0 else 0.5
    val stopRatio = nStop.toDouble / math.max(nTokens.toDouble, 1.0)
    val stopScore = if (stopRatio >= 0.01 && stopRatio <= 0.6) 1.0 else 0.5
    round6((lenScore + punctScore + stopScore) / 3.0)
  }

  private def uniform(docId: Long): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"ps:$docId".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    (java.lang.Long.parseLong(hex.substring(0, 8), 16) + 1L).toDouble /
      4294967296.0
  }

  private def replica(rows: Seq[(Long, String)], k: Int): Seq[(Long, Double, Double)] =
    rows.map { case (id, text) =>
      val w = quality(text)
      (id, w, w / uniform(id))
    }.sortBy { case (id, _, pr) => (-pr, id) }
      .take(k)
      .map { case (id, w, pr) => (id, w, round6(pr)) }

  // ----------------------------------------------------------------------

  test("t33 matches the plain-Scala replica exactly on sf0.001") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val input = docs.collect().toIndexedSeq
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = replica(input, k = 64)

    val got = TextQueries.weightedSample(spark, sf).collect().toIndexedSeq
      .map((r: Row) => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy { case (id, _, _) => id }
    assert(got == expect.sortBy(_._1),
      s"engine sample diverges from the replica:\n got=$got\n exp=${expect.sortBy(_._1)}")
  }

  test("heavier docs are overrepresented on a planted skewed corpus") {
    // 200 docs; ids 0-19 get quality-1.0 text, ids 20-199 degenerate
    // 2-token text with weight (0.2+1+0.5)/3 ~ 0.5667 — a 1.76x skew.
    // Priority sampling includes item i with probability ~ min(1, w_i/tau)
    // (tau the k-th threshold), so the heavy 10% of the corpus should
    // hold MORE than 10% of the k=20 slots but nowhere near all of them;
    // the exact selection must agree with the replica regardless.
    val good = "the quick brown fox jumps over the lazy dog and runs to town " * 2
    val rows = (0L until 200L).map { id =>
      (id, if (id < 20) good else "xx yy")
    }
    val df = spark.createDataFrame(rows).toDF("doc_id", "text")
    val got = TextQueries.prioritySample(df, k = 20).collect().toIndexedSeq
      .map((r: Row) => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got == replica(rows, 20).sortBy(_._1))
    val heavyTaken = got.count(_._1 < 20L)
    // population share is 20/200 = 2 slots; weighted inclusion should beat it
    assert(heavyTaken > 2,
      s"expected >2/20 slots for the 1.76x-heavier 10%, got $heavyTaken/20")
  }

  test("k >= n returns every row; k < 1 rejected") {
    val rows = (0L until 5L).map(id => (id, s"doc $id body text"))
    val df = spark.createDataFrame(rows).toDF("doc_id", "text")
    assert(TextQueries.prioritySample(df, k = 64).count() == 5)
    intercept[IllegalArgumentException](TextQueries.prioritySample(df, 0))
  }

  test("plan: TakeOrderedAndProject partial top-k, no global sort, no shuffle") {
    val s = TextQueries.weightedSample(spark, sf)
      .queryExecution.executedPlan.toString
    assert(s.contains("TakeOrderedAndProject"),
      s"top-k must be TakeOrderedAndProject:\n$s")
    assert(!s.contains("Exchange"),
      s"a pure map + partial top-k must not shuffle:\n$s")
    assert(!"(?m)^\\s*[+:]?-?\\s*Sort ".r.findFirstIn(s).isDefined,
      s"no global Sort node expected:\n$s")
    // r15: the weight inputs come from the native token_stats expression
    // (one codegen pass, no token array); the regex-split formulation
    // must be gone from the plan entirely
    assert(s.contains("token_stats"),
      s"weight inputs must come from the native token_stats pass:\n$s")
    assert("split\\(lower\\(trim\\(".r.findAllIn(s).isEmpty,
      s"no regex tokenization should remain in the plan:\n$s")
  }
}
