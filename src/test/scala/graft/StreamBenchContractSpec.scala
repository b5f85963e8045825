package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the streaming-bench methodology and its recorded artifact — the
  * BenchContractSpec discipline applied to STREAMBENCH_LOCAL.json:
  *
  *   - the replay chunk sizes are compile-time constants (a smaller chunk
  *     would inflate batch counts and flatter the p95);
  *   - p95 is nearest-rank over non-empty batches;
  *   - if the artifact is committed, it carries both stages with sane
  *     fields (all batches ran, positive rates);
  *   - BASELINE.md's streaming quote matches the artifact verbatim — a
  *     doc/artifact split fails in-suite, like the main bench number.
  */
class StreamBenchContractSpec extends AnyFunSuite {

  test("replay chunk sizes are the recorded methodology") {
    assert(StreamBench.EventChunk == 5000)
    assert(StreamBench.DocChunk == 500)
  }

  test("p95 is nearest-rank: small-sample pins") {
    assert(StreamBench.p95(Seq(5L)) == 5L)
    assert(StreamBench.p95((1L to 20L)) == 19L)
    assert(StreamBench.p95((1L to 100L)) == 95L)
    intercept[IllegalArgumentException](StreamBench.p95(Seq.empty))
  }

  private def artifact(): Option[String] = {
    val f = new java.io.File("STREAMBENCH_LOCAL.json")
    if (!f.exists()) None
    else Some(new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8))
  }

  private def stageField(json: String, stage: String, field: String): Option[Long] =
    (s""""$stage":\\{[^}]*"$field":([0-9]+)""".r)
      .findFirstMatchIn(json).map(_.group(1).toLong)

  test("a recorded streaming artifact (if present) has both stages, sane") {
    artifact().foreach { json =>
      for (stage <- Seq("windowed_counts", "neardup_gate")) {
        assert(stageField(json, stage, "rows").exists(_ > 0), s"$stage rows")
        assert(stageField(json, stage, "batches").exists(_ >= 5),
          s"$stage must replay in multiple micro-batches")
        assert(stageField(json, stage, "rows_per_s").exists(_ > 0),
          s"$stage throughput")
        assert(stageField(json, stage, "p95_batch_ms").exists(_ > 0),
          s"$stage tail latency")
      }
      // every input row must have been replayed: rows == batches × chunk
      // only for the full default replay (guards a truncated probe being
      // committed as the record)
      assert(stageField(json, "windowed_counts", "rows")
        .contains(100000L), "windowed stage must replay the full sf0.1 events")
      assert(stageField(json, "neardup_gate", "rows")
        .contains(5000L), "gate stage must replay the full sf0.1 documents")
    }
  }

  test("BASELINE.md's streaming quote matches STREAMBENCH_LOCAL.json") {
    val base = new java.io.File("BASELINE.md")
    (artifact(), if (base.exists()) Some(base) else None) match {
      case (Some(json), Some(b)) =>
        val doc = new String(java.nio.file.Files.readAllBytes(b.toPath),
          java.nio.charset.StandardCharsets.UTF_8)
        // \s+ between tokens: the quote may wrap across doc lines
        val quoteRe =
          ("""quoted from STREAMBENCH_LOCAL\.json:\s+\*\*(\d+)\s+rows/s\s+windowed\s+""" +
            """\(p95\s+(\d+)\s+ms\)\s+/\s+(\d+)\s+rows/s\s+gate\s+\(p95\s+(\d+)\s+ms\)\*\*""").r
        val quotes = quoteRe.findAllMatchIn(doc).toSeq
        assert(quotes.nonEmpty,
          "BASELINE.md must quote the committed streaming artifact")
        val m = quotes.last
        assert(stageField(json, "windowed_counts", "rows_per_s")
            .contains(m.group(1).toLong),
          s"windowed rows/s quote ${m.group(1)} != artifact")
        assert(stageField(json, "windowed_counts", "p95_batch_ms")
            .contains(m.group(2).toLong),
          s"windowed p95 quote ${m.group(2)} != artifact")
        assert(stageField(json, "neardup_gate", "rows_per_s")
            .contains(m.group(3).toLong),
          s"gate rows/s quote ${m.group(3)} != artifact")
        assert(stageField(json, "neardup_gate", "p95_batch_ms")
            .contains(m.group(4).toLong),
          s"gate p95 quote ${m.group(4)} != artifact")
      case _ => // nothing committed yet — nothing to pin
    }
  }
}
