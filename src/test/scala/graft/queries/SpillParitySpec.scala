package graft.queries

import org.apache.spark.sql.Row

import graft.SparkSpec

/** Memory-pressure parity: at 100 TB the external sorters and window
  * buffers WILL spill — a query whose results depend on whether an
  * operator stayed in memory is broken in a way small-data tests never
  * see. Force the window/session/sort-merge-join buffers to spill after
  * 32 rows and hash aggregation to abandon its map after 5 rows (the
  * Knobs list below), and require bit-identical results to the
  * default in-memory execution for the shapes that buffer the most:
  * wide aggregation, window top-k/moving frames, sessionization,
  * dedup-by-key, and the two-phase median. */
class SpillParitySpec extends SparkSpec with graft.IsolatedSession {

  private val Knobs = Seq(
    // hash aggregation abandons its map and falls back to sort-based
    // after 5 rows (Spark's purpose-built fallback-testing conf)
    "spark.sql.TungstenAggregate.testFallbackStartsAt" -> "5, 10",
    // window operator buffers spill to disk after 32 rows (not lower:
    // a forced spill every handful of rows on a large partition floods
    // the heap with spill-writer buffers — the probe OOM'd at 4)
    "spark.sql.windowExec.buffer.spill.threshold" -> "32",
    "spark.sql.windowExec.buffer.in.memory.threshold" -> "32",
    // session-window merging buffers likewise
    "spark.sql.sessionWindow.buffer.spill.threshold" -> "32",
    "spark.sql.sessionWindow.buffer.in.memory.threshold" -> "32",
    // sort-merge join's buffered-matches array spills after 32 rows
    "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "32",
    "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "32",
    // object aggregation (SpaceSaving etc.) falls back to sort-based
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "2")

  private val Queries = Seq("e01_q1_agg", "e06_window_topk",
    "e14_moving_window", "ev02_sessions", "ev06_session_windows",
    "t01_dedup_groups", "e11_exact_median", "s03_minhash_neardup")

  private def collectWith(name: String, knobs: Seq[(String, String)]): Seq[String] = {
    val conf = spark.conf
    val saved = knobs.map { case (k, _) => k -> conf.getOption(k) }
    knobs.foreach { case (k, v) => conf.set(k, v) }
    try Registry.queries(name)(spark, sf).collect()
      .map((_: Row).toString).sorted.toSeq
    finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("the knobs actually bite: forced run reports spill bytes > 0") {
    // without this, a Spark upgrade renaming any knob would turn every
    // parity test below vacuous (the codegen-parity canary lesson).
    // Spill is attributed to THIS suite's jobs only — suites run
    // concurrently on a shared SparkContext, so an unscoped listener
    // could be fed spill by a neighbour and pass with dead knobs.
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
    val group = s"spill-canary-${System.nanoTime()}"
    val ourStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val spilled = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (j.properties != null &&
            group == j.properties.getProperty("spark.jobGroup.id"))
          j.stageIds.foreach(ourStages.add(_))
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null && ourStages.contains(t.stageId))
          spilled.addAndGet(t.taskMetrics.memoryBytesSpilled +
            t.taskMetrics.diskBytesSpilled)
    }
    spark.sparkContext.addSparkListener(listener)
    spark.sparkContext.setJobGroup(group, "SpillParitySpec knob canary")
    try {
      Queries.foreach(collectWith(_, Knobs))
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (spilled.get() == 0 && System.nanoTime() < deadline)
        Thread.sleep(100) // task-end events arrive asynchronously
      assert(spilled.get() > 0,
        "forced-spill run reported zero spill bytes across the canary's " +
          "own jobs — knobs are dead")
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  Queries.foreach { name =>
    test(s"$name: forced-spill execution == in-memory execution") {
      val spilled = collectWith(name, Knobs)
      val default = collectWith(name, Seq.empty)
      assert(spilled.nonEmpty, s"$name returned nothing — vacuous")
      assert(spilled === default,
        s"$name diverges under spill pressure")
    }
  }
}
