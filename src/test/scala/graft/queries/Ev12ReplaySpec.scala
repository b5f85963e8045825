package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.Row

import graft.SparkSpec

/** ev12_stream_dedup_replay — exactly-once ingestion over an
  * at-least-once feed. Pins the claims the CORRECTNESS row rests on:
  * the feed really redelivers (~1/7 of every batch arrives twice), the
  * deduped replay is identical to the oracled batch twin ev01, and the
  * DEDUP-LESS twin diverges on exactly the same feed — the in-suite
  * shadow of the dedup-removal mutant (recorded kill in BASELINE r17). */
class Ev12ReplaySpec extends SparkSpec {
  import spark.implicits._

  private def corpusRows = EventQueries.readEvents(spark, sf)
    .select($"event_id", $"ts", $"event_type", $"value")
    .as[(Long, Timestamp, String, Double)].collect()

  test("the feed genuinely redelivers: id-identical duplicates in " +
    "later batches, original event set unchanged") {
    val rows = corpusRows
    val base = EventQueries.boundedDisorderBatches(rows)
    val fed = EventQueries.duplicatedBatches(base)
    val nDup = fed.flatten.size - base.flatten.size
    assert(nDup > rows.length / 10,
      s"only $nDup redeliveries on ${rows.length} events — the dedup " +
        "state would be untested")
    // redeliveries are EXACT copies of corpus rows, never new events
    val corpus = rows.toSet
    assert(fed.flatten.forall(corpus.contains),
      "a redelivered row mutated in flight")
    assert(fed.flatten.toSet == corpus, "feed lost original events")
  }

  test("deduped replay == batch twin ev01 (set identity); the dedup-less " +
    "twin DIVERGES on the same redelivered feed") {
    def key(r: Row) = (r.getString(0), r.getString(1), r.getLong(2),
      r.getDouble(3))
    val streamed = EventQueries.streamDedupReplay(spark, sf)
      .collect().map(key).toSet
    val batch = EventQueries.hourly(spark, sf).collect().map(key).toSet
    assert(batch.size > 100, s"batch twin lost its corpus: ${batch.size}")
    assert(streamed == batch,
      s"exactly-once path diverged: stream-only=${(streamed -- batch).take(3)}" +
        s" batch-only=${(batch -- streamed).take(3)}")

    // shadow mutant: the SAME redelivered feed through the DEDUP-LESS
    // aggregation (unified API, batch mode — watermark is a no-op on a
    // batch DataFrame) must double-count the redeliveries; if it
    // didn't, the ev12 row would pass vacuously and the recorded
    // dedup-removal kill would lie
    val rows = corpusRows
    val fed = EventQueries
      .duplicatedBatches(EventQueries.boundedDisorderBatches(rows))
      .flatten.toSeq
    assert(fed.size > rows.length,
      "the duplicated feed collapsed — nothing for dedup to absorb")
    val noDedup = graft.streaming.StreamOps.windowedCounts(
        fed.toDF("event_id", "ts", "event_type", "value"),
        "1 hour", "96 hours")
      .select(org.apache.spark.sql.functions.date_format(
        org.apache.spark.sql.functions.col("window_start"),
        "yyyy-MM-dd HH").as("hour"),
        $"event_type", $"n", $"sum_value")
      .collect().map(key).toSet
    assert(noDedup != batch,
      "dedup-less twin matched the oracle — redeliveries were not live")
    assert(noDedup.toSeq.map(_._3).sum == fed.size,
      "dedup-less twin must count every fed row exactly once")
  }
}
