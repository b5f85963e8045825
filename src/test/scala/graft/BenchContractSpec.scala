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
