package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The sampled-feed streaming cell (BASELINE.md round-19) is only a
  * faithful "×100 rate structure at bounded volume" measurement if the
  * sampler is ALL-OR-NOTHING per original key: a kept user must keep
  * every one of its events (sessions, view→click pairs, per-user rate
  * intact), and on a `hot` world a kept user's event count must equal
  * the unsampled world's — otherwise the cell benches thinned sessions
  * and the scale claim is hollow. */
class SampleStreamWorldSpec extends SparkSpec {
  import SampleStreamWorld.sampleByKey

  private lazy val events = spark.read.parquet(s"$sf/events.parquet")

  test("all-or-nothing per key: a sampled key keeps every one of its rows") {
    val hot3 = ScaleUp.scaleTable(events, "events", 3, "hot")
    val kept = sampleByKey(hot3, "user_id", 4)
    // per-user counts of the kept slice == per-user counts of the full
    // world for exactly the kept users (no user is thinned)
    val full = hot3.groupBy("user_id").count().withColumnRenamed("count", "n")
    val kc = kept.groupBy("user_id").count().withColumnRenamed("count", "k")
    assert(kc.join(full, "user_id").where(col("k") =!= col("n"))
      .count() === 0, "a kept user lost rows — per-row sampling detected")
    assert(kc.count() > 0, "sample must keep someone at denom 4")
    assert(kc.count() < full.count(), "sample must drop someone at denom 4")
  }

  test("hot-world rate preservation: kept users see the full ×F rate") {
    val hot3 = ScaleUp.scaleTable(events, "events", 3, "hot")
    val base = events.groupBy("user_id").count()
      .withColumnRenamed("count", "n1")
    val kept = sampleByKey(hot3, "user_id", 4)
      .groupBy("user_id").count().withColumnRenamed("count", "nf")
    // hot keeps original user ids, so a kept user's scaled count is
    // exactly F x its base count — the "×F per-key rate" the cell quotes
    assert(kept.join(base, "user_id")
      .where(col("nf") =!= col("n1") * 3).count() === 0)
  }

  test("grow-world replica coherence: an original key is kept in ALL " +
    "replicas or none (key cardinality scales F/N at unchanged rate)") {
    val grow3 = ScaleUp.scaleTable(events, "events", 3, "grow")
    val kept = sampleByKey(grow3, "user_id", 4)
      .select(pmod(col("user_id"), lit(ScaleUp.Stride)).as("orig"),
        (col("user_id") / ScaleUp.Stride).cast("int").as("replica"))
      .groupBy("orig").agg(countDistinct(col("replica")).as("reps"))
    assert(kept.where(col("reps") =!= 3).count() === 0,
      "a kept original user must appear in all 3 replicas")
  }

  test("sampler is deterministic and sfDir-independent (pure function " +
    "of the pre-shift key)") {
    val a = sampleByKey(events, "user_id", 4).select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = sampleByKey(events, "user_id", 4).select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a === b)
  }
}
