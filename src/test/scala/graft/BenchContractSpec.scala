package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench methodology so it can't silently degrade:
  *
  *   - the default repeat count stays >= 3 (median-of-3 is what tamed the
  *     documented ±30% single-shot drift — BASELINE.md round-6 section);
  *   - a query with ANY failed run reports -1 and is excluded from the
  *     total, instead of summing a median of its surviving runs next to
  *     failed>0 (the r7 ADVICE finding);
  *   - if a local bench JSON is present, it was produced by a >= 3-run
  *     zero-failure pass — a CI-shape check that an env-var override
  *     didn't sneak single-shot numbers into the record.
  */
class BenchContractSpec extends AnyFunSuite {

  test("default bench repeat count is at least 3") {
    assert(Bench.DefaultRuns >= 3)
  }

  test("median of clean runs is the middle value") {
    assert(Bench.medianOrFail(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(Bench.medianOrFail(Seq(5.0)) == 5.0)
  }

  test("any failed run poisons the query's reported time") {
    assert(Bench.medianOrFail(Seq(1.0, -1.0, 2.0)) == -1.0)
    assert(Bench.medianOrFail(Seq(-1.0, -1.0, -1.0)) == -1.0)
    assert(Bench.medianOrFail(Seq.empty) == -1.0)
  }

  test("probe invocations (filtered or <3 runs) cannot overwrite the record artifact") {
    assert(Bench.outFileFor(None, filtered = false, runs = 3) == "BENCH_LOCAL.json")
    assert(Bench.outFileFor(None, filtered = true, runs = 3) == "BENCH_PROBE.json")
    assert(Bench.outFileFor(None, filtered = false, runs = 1) == "BENCH_PROBE.json")
    assert(Bench.outFileFor(Some("X.json"), filtered = true, runs = 1) == "X.json")
  }

  test("BASELINE.md's bench number-of-record quotes BENCH_LOCAL.json verbatim") {
    // The r12 verdict's top finding: the doc said "44.06 s … quoted from
    // BENCH_LOCAL.json" while the committed artifact read 35.15 s — a
    // later run overwrote the file and the quote silently drifted. The
    // LATEST quote in the chronicle (the number of record) must match the
    // artifact it claims to quote: total to the quoted precision, query
    // count, and failed count exactly.
    val base = new java.io.File("BASELINE.md")
    val bench = new java.io.File("BENCH_LOCAL.json")
    if (base.exists() && bench.exists()) {
      // BASELINE.md carries UTF-8 punctuation; the JVM default charset may
      // not be UTF-8 under sbt
      val doc = new String(java.nio.file.Files.readAllBytes(base.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
      val quoteRe =
        """quoted from BENCH_LOCAL\.json: \*\*([0-9.]+) s / (\d+)\s*\n?queries / (\d+) failed\*\*""".r
      val quotes = quoteRe.findAllMatchIn(doc).toSeq
      assert(quotes.nonEmpty, "BASELINE.md has no machine-readable bench quote")
      val m = quotes.last // chronicle order: the last quote is the record
      val (qTotal, qQueries, qFailed) =
        (m.group(1).toDouble, m.group(2).toInt, m.group(3).toInt)

      val benchSrc = scala.io.Source.fromFile(bench)
      val json = try benchSrc.mkString finally benchSrc.close()
      val aTotal = """"value":\s*([0-9.eE+-]+)""".r
        .findFirstMatchIn(json).map(_.group(1).toDouble)
      val aFailed = """"failed":\s*(\d+)""".r
        .findFirstMatchIn(json).map(_.group(1).toInt)
      val aQueries = """"queries":\s*\{([^}]*)\}""".r
        .findFirstMatchIn(json).map(_.group(1).count(_ == ':'))
      assert(aTotal.isDefined && aFailed.isDefined && aQueries.isDefined,
        "BENCH_LOCAL.json missing value/failed/queries fields")
      // Refresh-tolerant direction (r13 verdict): the artifact is gitignored
      // and the driver's post-commit bench rewrites it on every round, so a
      // FASTER artifact than the quoted record is a refresh trigger, not a
      // defect — the doc under-claims and the next BASELINE.md section should
      // true it up. Only the over-claim direction (doc quotes a better number
      // than the artifact supports) is a hard failure.
      assert(aTotal.get <= qTotal + 0.005 + 1e-9,
        s"BASELINE.md quotes $qTotal s but BENCH_LOCAL.json reads ${aTotal.get} s " +
          "(slower than the quote — the doc over-claims; re-record the quote)")
      if (qTotal - aTotal.get > 0.005)
        info(s"BENCH_LOCAL.json (${aTotal.get} s) is faster than the quoted " +
          s"$qTotal s — quote refresh pending, not a failure")
      assert(aQueries.get == qQueries,
        s"BASELINE.md quotes $qQueries queries but artifact has ${aQueries.get}")
      assert(aFailed.get == qFailed,
        s"BASELINE.md quotes $qFailed failed but artifact says ${aFailed.get}")
    }
  }

  test("a recorded local bench JSON (if present) is >= 3 runs, 0 failed") {
    val f = new java.io.File("BENCH_LOCAL.json")
    if (f.exists()) {
      val s = scala.io.Source.fromFile(f)
      val json = try s.mkString finally s.close()
      def intField(k: String): Option[Int] =
        (s""""$k":\\s*(\\d+)""".r).findFirstMatchIn(json).map(_.group(1).toInt)
      assert(intField("runs").exists(_ >= 3),
        s"BENCH_LOCAL.json runs field missing or < 3")
      assert(intField("failed").contains(0),
        s"BENCH_LOCAL.json failed field missing or nonzero")
    }
  }
}
