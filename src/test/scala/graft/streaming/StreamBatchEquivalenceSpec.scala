package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.EventQueries

/** Stream == batch CORPUS equivalence (r13 verdict item 2).
  *
  * The streaming tier's fixtures prove the state machinery on handfuls of
  * rows; the oracled batch twins (ev01/ev02/ev06) prove the batch
  * formulations against DuckDB. What neither proved is that REPLAYING the
  * full sf0.01 events corpus through the incremental path — micro-batches,
  * watermarks, state stores — converges to the exact batch answers: a
  * subtle watermark/state bug that preserves the fixtures could hide.
  * These tests close that gap by feeding all 10k corpus events through
  * MemoryStream in many micro-batches and asserting output IDENTITY with
  * the same oracled transforms run as batch.
  *
  * Feed discipline, per operator:
  *  - watermarked ops (windowedCounts, clickThroughJoin) get a
  *    BOUNDED-DISORDER feed: events are bucketed by `ts + jitter` where
  *    jitter < the watermark lateness, so real out-of-order arrival is
  *    exercised while the watermark contract guarantees zero late drops —
  *    the precondition for identity with batch (which drops nothing). For
  *    the aggregation the jitter also exceeds the WINDOW length (drops key
  *    off window.end, not ts). A planted watermark off-by-one (lateness
  *    ignored -> 0) makes jittered rows late and the identity fails — the
  *    mutation protocol in BASELINE.md round-14 records the kill.
  *  - the stateful sessionizer gets a TIME-SORTED feed: mapGroupsWithState
  *    carries no watermark, so its contract is in-order-per-key arrival
  *    (production shape: fed by a watermark-sorted/deduped upstream).
  *
  * Precision note (checked against the corpus before writing this): the
  * stateful sessionize compares millisecond gaps (> 1800000 ms) while the
  * ev02 twin compares floor-second gaps (> 1800 s) and the ev06 builtin
  * compares microsecond gaps (>= 30 min). The three agree on every
  * adjacent per-user gap in the sf0.01 corpus (the one near-boundary gap,
  * 1800.886 s, splits under all three), so identity is exact; the planted
  * boundary rows below pin the >-vs->= edge explicitly where the
  * semantics DO coincide.
  */
class StreamBatchEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private val dir = s"$testdataRoot/sf0.01"

  private lazy val corpus: DataFrame = EventQueries.readEvents(spark, dir)

  test("windowedCounts: sf0.01 replay in 15 disordered micro-batches == batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val rows = corpus
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .as[(Long, Timestamp, String, Double)].collect()

    // bounded-disorder batching: bucket by (ts + jitter) so ~3/4 of events
    // arrive 30-90 min later than cohorts. The jitter deliberately EXCEEDS
    // the 1-hour window length: streaming aggregation drops a late row only
    // once its whole WINDOW is expired (window.end < watermark), so a
    // disorder smaller than the window can never be dropped under ANY
    // lateness and would leave watermark semantics untested (measured: a
    // lateness-zeroing mutant survived a 15-min-jitter feed). At 90 min of
    // disorder the 2-hour lateness is what keeps every row — the
    // off-by-one mutant (lateness ignored -> 0) drops the rows whose hour
    // closed before a later batch's max event time, and identity fails.
    val bucketMs = 2L * 24 * 3600 * 1000
    def jitterMs(id: Long): Long = (id % 4) * 30 * 60 * 1000L
    val batches = rows.groupBy(r => (r._2.getTime + jitterMs(r._1)) / bucketMs)
      .toSeq.sortBy(_._1).map(_._2.toSeq)
    assert(batches.size >= 10, s"expected a real multi-batch replay, got ${batches.size}")

    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "event_type", "value")
    // APPEND mode: a window only emits once the watermark finalizes it —
    // the mode where watermark semantics actually gate the output (complete
    // mode would re-emit everything and mask watermark bugs entirely).
    val q = StreamOps.windowedCounts(df, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("eqv_win")
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      // flush sentinel: advance the watermark past every real window's
      // close so append mode emits the tail windows; excluded from compare
      val maxTs = rows.map(_._2.getTime).max
      mem.addData((-1L, new Timestamp(maxTs + 4 * 3600 * 1000L), "__flush", 0.0))
      q.processAllAvailable()

      val streamed = spark.table("eqv_win")
        .where(col("event_type") =!= "__flush")
        .as[(Timestamp, String, Long, Double)].collect()
        .map { case (w, t, n, s) => (w.getTime, t, n, s) }.toSet
      val batch = StreamOps.windowedCounts(corpus
          .select(col("event_id"), col("ts"), col("event_type"), col("value")),
          "1 hour", "2 hours")
        .as[(Timestamp, String, Long, Double)].collect()
        .map { case (w, t, n, s) => (w.getTime, t, n, s) }.toSet
      assert(batch.nonEmpty && batch.size > 1000,
        s"batch twin lost its corpus: ${batch.size} windows")
      assert(streamed == batch,
        s"stream replay diverged from batch: stream-only=" +
          s"${(streamed -- batch).take(5)} batch-only=${(batch -- streamed).take(5)}")
    } finally q.stop()
  }

  test("sessionize: sf0.01 replay (plus planted 30:00.000 boundary) == ev02 batch twin") {
    implicit val sqlCtx = spark.sqlContext
    // planted boundary rows, fed to BOTH sides: user 900001's gap is
    // EXACTLY 30:00.000 (whole seconds, so ms and floor-second gap
    // semantics coincide: NOT > threshold -> one session of 2 on both
    // sides; a `>` -> `>=` off-by-one in either machine splits it and the
    // identity fails). User 900002's 30:01 gap pins the split direction.
    val planted = Seq(
      (900001L, Timestamp.valueOf("2024-01-05 00:00:00")),
      (900001L, Timestamp.valueOf("2024-01-05 00:30:00")),
      (900002L, Timestamp.valueOf("2024-01-06 00:00:00")),
      (900002L, Timestamp.valueOf("2024-01-06 00:30:01")))
    val corpusRows = corpus.select(col("user_id"), col("ts"))
      .as[(Long, Timestamp)].collect().toSeq
    val all = (corpusRows ++ planted).sortBy(r => (r._2.getTime, r._1))
    val batches = all.grouped(1 + all.size / 15).toSeq

    val mem = MemoryStream[(Long, Timestamp)]
    val q = StreamOps.sessionize(mem.toDS(), gapMs = 30 * 60 * 1000L,
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.format("memory").queryName("eqv_sess")
      .outputMode("update").start()
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      // final state per session: updates grow n monotonically at a fixed
      // session_start, so max(n) per (user, start) is the converged count;
      // session_seq is the per-user rank of the start — ev02's key shape
      val finals = spark.table("eqv_sess")
        .groupBy(col("user_id"), col("session_start"))
        .agg(max(col("n_events")).as("n_events"))
      val seqd = finals.withColumn("session_seq",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id")).orderBy(col("session_start")))
            .cast("long"))
        .select(col("user_id"), col("session_seq"), col("n_events"))
        .as[(Long, Long, Long)].collect().toSet

      val batchTwin = StreamOps.sessionizeBatch(
          corpus.select(col("user_id"), col("ts"), col("event_id"))
            .unionByName(planted.toDF("user_id", "ts")
              .withColumn("event_id", col("user_id"))))
        .select(col("user_id"), col("session_seq").cast("long"),
          col("n_events"))
        .as[(Long, Long, Long)].collect().toSet

      assert(batchTwin.size > 9000, s"batch twin lost its corpus: ${batchTwin.size}")
      assert(seqd == batchTwin,
        s"stateful replay diverged from ev02 twin: stream-only=" +
          s"${(seqd -- batchTwin).take(5)} batch-only=${(batchTwin -- seqd).take(5)}")
      // the planted boundary user resolved as ONE session of 2 on both sides
      assert(seqd.contains((900001L, 1L, 2L)),
        "exact-30:00.000 gap must NOT split (gap comparison is strict >)")
      assert(seqd.contains((900002L, 2L, 1L)), "30:01 gap must split")
    } finally q.stop()
  }

  test("sessionize: stream finals == ev06 session_window builtin on the raw corpus") {
    implicit val sqlCtx = spark.sqlContext
    // no planted rows here: ev06's builtin splits at >= 30:00 in µs while
    // the stateful machine splits at > 30:00 in ms — semantics that agree
    // on every real corpus gap (verified: nearest boundary gap 1800.886 s)
    // but would diverge on an exact-boundary plant by design.
    val corpusRows = corpus.select(col("user_id"), col("ts"))
      .as[(Long, Timestamp)].collect().toSeq
      .sortBy(r => (r._2.getTime, r._1))
    val batches = corpusRows.grouped(1 + corpusRows.size / 15).toSeq

    val mem = MemoryStream[(Long, Timestamp)]
    val q = StreamOps.sessionize(mem.toDS(), gapMs = 30 * 60 * 1000L,
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.format("memory").queryName("eqv_sess6")
      .outputMode("update").start()
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      val streamed = spark.table("eqv_sess6")
        .groupBy(col("user_id"), col("session_start"))
        .agg(max(col("n_events")).as("n_events"))
        .select(col("user_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss")
            .as("session_start"),
          col("n_events"))
        .as[(Long, String, Long)].collect().toSet
      val builtin = EventQueries.readEvents(spark, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
            .as("session_start"),
          col("n_events"))
        .as[(Long, String, Long)].collect().toSet
      assert(builtin.size > 9000)
      assert(streamed == builtin,
        s"stateful machine diverged from session_window: stream-only=" +
          s"${(streamed -- builtin).take(5)} builtin-only=${(builtin -- streamed).take(5)}")
    } finally q.stop()
  }

  test("clickThroughJoin: sf0.01 replay in disordered micro-batches == batch twin") {
    implicit val sqlCtx = spark.sqlContext
    def side(t: String) = corpus.where(col("event_type") === t)
      .select(col("event_id"), col("ts"), col("user_id"))
      .as[(Long, Timestamp, Long)].collect()
    val (viewRows, clickRows) = (side("view"), side("click"))

    val bucketMs = 2L * 24 * 3600 * 1000
    def jitterMs(id: Long): Long = (id % 4) * 5 * 60 * 1000L
    def buckets(rows: Array[(Long, Timestamp, Long)]) =
      rows.groupBy(r => (r._2.getTime + jitterMs(r._1)) / bucketMs)
    val keys = (buckets(viewRows).keySet ++ buckets(clickRows).keySet).toSeq.sorted

    val vMem = MemoryStream[(Long, Timestamp, Long)]
    val cMem = MemoryStream[(Long, Timestamp, Long)]
    def df(m: MemoryStream[(Long, Timestamp, Long)]) =
      m.toDF().toDF("event_id", "ts", "user_id")
    // lateness 30 min > the 15-min feed jitter: nothing is ever late, and
    // a view's join-state retention (view_ts + 10 min + lateness) always
    // outlives the latest arrival of its candidate clicks — both
    // preconditions for identity with the batch run of the SAME function.
    val q = StreamOps.clickThroughJoin(df(vMem), df(cMem),
        within = "10 minutes", lateness = "30 minutes")
      .writeStream.format("memory").queryName("eqv_ct")
      .outputMode("append").start()
    try {
      val vB = buckets(viewRows); val cB = buckets(clickRows)
      keys.foreach { k =>
        vB.get(k).foreach(b => vMem.addData(b.toSeq))
        cB.get(k).foreach(b => cMem.addData(b.toSeq))
        q.processAllAvailable()
      }
      val streamed = spark.table("eqv_ct")
        .select(col("user_id"), col("view_id"), col("click_id"))
        .as[(Long, Long, Long)].collect().toSet
      val batch = StreamOps.clickThroughJoin(
          corpus.where(col("event_type") === "view")
            .select(col("event_id"), col("ts"), col("user_id")),
          corpus.where(col("event_type") === "click")
            .select(col("event_id"), col("ts"), col("user_id")),
          within = "10 minutes", lateness = "30 minutes")
        .select(col("user_id"), col("view_id"), col("click_id"))
        .as[(Long, Long, Long)].collect().toSet
      assert(batch.nonEmpty, "batch twin produced no click-throughs")
      assert(streamed == batch,
        s"stream-stream join diverged from batch: stream-only=" +
          s"${(streamed -- batch).take(5)} batch-only=${(batch -- streamed).take(5)}")
    } finally q.stop()
  }

  test("near-dup gate: sf0.01 t27-shaped replay through the REAL stream " +
    "(foreachBatch + checkpoint + parquet sink) == one-shot batch gate") {
    // The last fixture-only streaming operator (r14 verdict item 6): the
    // gate's per-batch core is a pure function of (batch, corpus), so a
    // multi-batch replay of the full t27 feed must equal the ONE-SHOT
    // batch call row-for-row — including match_id min-id tie-breaks and
    // match_jaccard values, not just the passed bit. Runs through
    // startNearDupGate itself (writeStream/foreachBatch/checkpoint), so
    // sink exactly-once and gate determinism are both on the line.
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // the exact t27 feed: perturbed copies of every 10th corpus doc —
    // guaranteed planted near-matches at every SF
    val perturbed = docs.where(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" nightly batch")).as("text"))
      .as[(Long, String)].collect().toSeq
    assert(perturbed.size >= 50, s"t27 feed lost its corpus: ${perturbed.size} rows")
    // plus genuinely novel docs so BOTH verdicts flow through the sink
    // (every perturbed copy flags; an all-flagged feed would leave the
    // passed=1 path untested)
    val novel = (0 until 8).map { i =>
      (2500000L + i, s"zzqx$i novel telemetry shard $i unmatched " +
        s"vocabulary qqz$i plasma$i lattice$i " * 3)
    }
    // designed TIE: two corpus docs with identical text matching one feed
    // row at equal jaccard — makes the gate's min-id survivor tie-break
    // load-bearing (an inverted tie-break flips match_id 8000001->8000002
    // and the plain-Scala re-derivation below catches it)
    val tieText = "tiebreak corpus sentinel alpha beta gamma delta " * 4
    val corpus = docs.unionAll(
      Seq((8000001L, tieText), (8000002L, tieText)).toDF("doc_id", "text"))
    val feed = perturbed ++ novel :+ (2600000L -> (tieText + " nightly"))
    val batches = feed.grouped((feed.size / 7).max(1)).toSeq
    assert(batches.size >= 7, s"expected a real multi-batch replay")

    val out = java.nio.file.Files.createTempDirectory("gate_eqv").toString
    val ckpt = java.nio.file.Files.createTempDirectory("gate_ckpt").toString
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.startNearDupGate(
      mem.toDF().toDF("doc_id", "text"), corpus, "text", "doc_id", 0.5,
      out, ckpt)
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    } finally q.stop()

    def key(df: DataFrame) = df
      .select(col("id"), col("match_id"), col("match_jaccard"), col("passed"))
      .as[(Long, Option[Long], Option[Double], Int)].collect().toSet
    val streamed = key(spark.read.parquet(out))
    val oneShot = key(StreamOps.nearDupGateBatch(
      feed.toDF("doc_id", "text"), corpus, "text", "doc_id", 0.5))
    assert(streamed.size == feed.size,
      s"sink must carry every fed row exactly once: ${streamed.size} vs ${feed.size}")
    assert(oneShot.exists(_._4 == 0) && oneShot.exists(_._4 == 1),
      "feed must exercise both verdicts or the equivalence is vacuous")
    assert(streamed == oneShot,
      s"replayed gate diverged from the batch gate: stream-only=" +
        s"${(streamed -- oneShot).take(5)} batch-only=${(oneShot -- streamed).take(5)}")

    // Independent expectation for the gate LAYER itself (the stream ==
    // one-shot identity above shares nearDupGateBatch on both sides, so
    // a gate-logic mutation cancels out of it): re-derive every verdict
    // in plain Scala from the ORACLED primitive's pairs — max jaccard,
    // min-id survivor tie-break, passed = no pair at all — and require
    // the sink to carry exactly that.
    val pairs = graft.dedup.Dedup
      .nearDupAgainst(corpus, feed.toDF("doc_id", "text"), "text", "doc_id", 0.5)
      .select(col("batch_id"), col("corpus_id"), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSeq
    val best = pairs.groupBy(_._1).map { case (id, ps) =>
      val top = ps.map(p => (p._3, p._2)).sortBy(p => (-p._1, p._2)).head
      id -> ((Some(top._2): Option[Long], Some(top._1): Option[Double], 0))
    }
    val expected = feed.map { case (id, _) =>
      val (m, j, p) = best.getOrElse(id, (None, None, 1))
      (id, m, j, p)
    }.toSet
    assert(streamed == expected,
      s"gate verdicts diverge from the plain-Scala re-derivation: " +
        s"stream-only=${(streamed -- expected).take(5)} " +
        s"expected-only=${(expected -- streamed).take(5)}")
  }
}
