package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Double =
    Seq(Tuple1(text)).toDF("t").select(c.as("v")).as[Double].collect().head

  test("the explicit whitespace class splits every Java \\s character, incl. \\x0B") {
    // TextOps.WhitespaceClass exists because Java's \s includes vertical
    // tab while DuckDB RE2's does not; both the engine and the oracles
    // now spell [ \t\n\x0B\f\r] verbatim. Pin the ENGINE half: every
    // character of the class acts as a token separator, so a \x0B-bearing
    // doc can never tokenize differently from what the oracle SQL (same
    // class, same RE2 escape) computes.
    val seps = Seq(' ', '\t', '\n', '\u000B', '\f', '\r')
    seps.foreach { s =>
      val toks = Seq(Tuple1(s"ab${s}cd")).toDF("t")
        .select(TextOps.tokens(col("t")).as("v"))
        .as[Seq[String]].collect().head
      assert(toks == Seq("ab", "cd"), s"separator 0x${s.toInt.toHexString}")
    }
    // and the BPE-ish count treats them as non-tokens, not punctuation
    val n = Seq(Tuple1("ab\u000Bcd")).toDF("t")
      .select(TextOps.bpeishTokenCount(col("t")).as("v"))
      .as[Int].collect().head
    assert(n == 2, s"bpeish count $n")
  }

  test("dupLineCharFraction counts all copies of duplicated lines") {
    // lines: "aaaa" (x2, 8 chars) + "bb" (1, 2 chars) -> 8/10
    val v = one(TextOps.dupLineCharFraction(col("t")), "aaaa\nbb\naaaa")
    assert(math.abs(v - 0.8) < 1e-12)
    assert(one(TextOps.dupLineCharFraction(col("t")), "") == 0.0)
    assert(one(TextOps.dupLineCharFraction(col("t")), "x\ny\nz") == 0.0)
  }

  test("topBigramTokenFraction flags degenerate repetition, clamps at 1") {
    // "spam ham spam ham spam" -> top bigram "spam ham" x2 of 4 -> 4/5
    val v = one(TextOps.topBigramTokenFraction(col("t")),
      "spam ham spam ham spam")
    assert(math.abs(v - 0.8) < 1e-12)
    // pathological single-token repetition clamps to 1.0
    assert(one(TextOps.topBigramTokenFraction(col("t")), "a a a a a") == 1.0)
    // all-distinct text scores low
    assert(one(TextOps.topBigramTokenFraction(col("t")),
      "one two three four five six seven eight nine ten") == 0.2)
    assert(one(TextOps.topBigramTokenFraction(col("t")), "solo") == 0.0)
  }

  test("redact masks emails and long digit runs, leaves prose alone") {
    val out = Seq(Tuple1(
      "mail bob.smith+x@example.co.uk or call +1 (555) 123-4567 today"))
      .toDF("t").select(TextOps.redact(col("t")).as("v"))
      .as[String].collect().head
    assert(out == "mail <EMAIL> or call +<NUMBER> today", out)
    val clean = Seq(Tuple1("no pii here, just 42 words"))
      .toDF("t").select(TextOps.redact(col("t")).as("v"))
      .as[String].collect().head
    assert(clean == "no pii here, just 42 words")
  }
}
