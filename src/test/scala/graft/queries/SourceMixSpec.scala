package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** t42 — temperature-weighted source mixing allocation: hand-derived
  * apportionment, the sum-to-budget invariant, zero-token edge, and the
  * one-corpus-pass plan shape. */
class SourceMixSpec extends SparkSpec {

  test("hand-computed alpha=1/2 largest-remainder apportionment") {
    import spark.implicits._
    // tokens: A=16 B=4 C=1 -> weights 4·2^20, 2·2^20, 1·2^20 (sqrt exact)
    val docs = Seq(
      "A" -> ("w " * 16).trim,
      "B" -> "w w w w",
      "C" -> "w").toDF("source", "text")
    val got = TextQueries.mixAllocLayout(docs, budget = 10L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // W = 7·2^20; floors: A 10·4/7=5, B 10·2/7=2, C 10·1/7=1 (sum 8)
    // remainders: B (6·2^20/7·2^20 scaled) > A > C  ->  +1 to B, A
    assert(got("A") == ((16L, 4L * 1048576, 6L)), s"A: ${got("A")}")
    assert(got("B") == ((4L, 2L * 1048576, 3L)), s"B: ${got("B")}")
    assert(got("C") == ((1L, 1L * 1048576, 1L)), s"C: ${got("C")}")
    // the alpha=1/2 flattening: raw token shares are 76/19/5 %, the
    // allocated shares are 60/30/10 % — tail sources up-weighted
  }

  test("quotas sum EXACTLY to the budget on the harness corpus") {
    val out = TextQueries.mixAllocLayout(
      spark.read.parquet(s"$sf/documents.parquet"), budget = 999983L)
    val total = out.agg(sum(col("quota"))).collect()(0).getLong(0)
    assert(total == 999983L, s"largest-remainder must be exact, got $total")
  }

  test("a zero-token source gets quota 0; the others absorb the full budget") {
    import spark.implicits._
    val docs = Seq(
      "A" -> "w w w w",
      "B" -> "w w w w",
      "empty" -> "   ").toDF("source", "text")
    val got = TextQueries.mixAllocLayout(docs, budget = 7L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(got("empty") == 0L)
    assert(got("A") + got("B") == 7L)
  }

  test("plan: ONE corpus pass — a single source-keyed exchange, text " +
    "never shuffles, windows run on the per-source table") {
    val df = Registry.queries("t42_source_mix_alloc")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("Scan parquet".r.findAllIn(s).size == 1,
      s"t42 must scan the corpus exactly once:\n$s")
    assert("tokens_of".r.findAllIn(s).size == 1,
      s"t42 must tokenize exactly once:\n$s")
    val exch = "Exchange hashpartitioning\\(([a-z_]+)#"
      .r.findAllMatchIn(s).map(_.group(1)).toSeq
    assert(exch == Seq("source"),
      s"exactly one hash exchange, on source, got $exch:\n$s")
    // map-side combine: the corpus collapses to |sources| rows BEFORE
    // the exchange; everything downstream (the single-partition window
    // stack) moves per-source rows only, and text dies at the scan
    assert(s.contains("partial_count") && s.contains("partial_sum"),
      s"partial aggregation must combine map-side:\n$s")
    val afterExchange = s.split("Exchange hashpartitioning").head
    assert(!afterExchange.contains("text#"),
      s"text must die at the scan, below the exchange:\n$s")
  }
}
