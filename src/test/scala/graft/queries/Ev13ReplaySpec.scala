package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.StreamOps

/** ev13_stream_click_join_replay — the stream-stream interval join made
  * driver-visible. StreamBatchEquivalenceSpec proves the watermarked
  * join's stream==batch identity (10-min window); this spec pins the
  * CORRECTNESS row's own claims at its 4-hour window: the replay feeds
  * two genuinely multi-batch streams and equals the batch twin. */
class Ev13ReplaySpec extends SparkSpec {
  import spark.implicits._

  test("the feed is two real multi-batch streams (interleaved cohorts)") {
    val ev = EventQueries.readEvents(spark, sf)
    val perType = ev.groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perType.getOrElse("view", 0L) > 50 &&
      perType.getOrElse("click", 0L) > 50,
      s"corpus lost its view/click populations: $perType")
    // 2-day cohorts over the corpus span: the replay must be multi-batch
    val span = ev.agg((max(unix_micros(col("ts"))) -
      min(unix_micros(col("ts")))) / (2L * 86400 * 1000000)).head().getDouble(0)
    assert(span >= 5, s"corpus spans only $span cohorts — near-single-batch")
  }

  test("streamed interval-join replay == batch twin on sf0.001 " +
    "(set identity, nonempty)") {
    def key(r: Row) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))
    val streamed = EventQueries.streamClickJoinReplay(spark, sf)
      .collect().map(key).toSet
    val ev = EventQueries.readEvents(spark, sf)
    def side(t: String) = ev.where(col("event_type") === t)
      .select(col("event_id"), col("ts"), col("user_id"))
    val batch = StreamOps.clickThroughJoin(side("view"), side("click"),
        within = "4 hours", lateness = "30 minutes")
      .select(col("user_id"), col("view_id"), col("click_id"),
        unix_micros(col("view_ts")).as("view_us"),
        unix_micros(col("click_ts")).as("click_us"))
      .collect().map(key).toSet
    assert(batch.size >= 10, s"batch twin too thin: ${batch.size} pairs")
    assert(streamed == batch,
      s"stream-stream join diverged: stream-only=${(streamed -- batch).take(3)}" +
        s" batch-only=${(batch -- streamed).take(3)}")
  }
}
