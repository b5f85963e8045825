package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

/** Streaming-tier benchmark: replay the sf events/documents tables through
  * the two headline streaming operators in fixed-size micro-batches and
  * record throughput + tail latency. The spec tier proves the streaming
  * semantics (watermarks, state, exactly-once); this main makes their
  * PERFORMANCE a recorded artifact so a regression (a state blowup, a
  * per-batch corpus re-scan, a broadcast that stopped broadcasting) moves
  * a number the round can see, instead of hiding behind green specs.
  *
  *   - `windowedCounts`: the sf events stream (100k rows at sf0.1) in
  *     EventChunk-row micro-batches through the watermarked tumbling
  *     window — the stateful-agg path.
  *   - near-dup ingest gate: the documents table replayed in DocChunk-row
  *     micro-batches against the full document corpus through
  *     [[StreamOps.nearDupGateBatch]] (inside foreachBatch with a real
  *     parquet sink) — the batch-broadcast LSH gate path.
  *
  * Prints ONE JSON line and writes it to `STREAMBENCH_LOCAL.json` (the
  * artifact BASELINE.md quotes; StreamBenchContractSpec pins the quote
  * against the file). Micro-batch latencies come from the engine's own
  * StreamingQueryProgress (`triggerExecution`), p95 over non-empty
  * batches.
  */
object StreamBench {

  val EventChunk = 5000
  val DocChunk = 500

  /** p95 by nearest-rank over the recorded non-empty batches. */
  def p95(durations: Seq[Long]): Long = {
    require(durations.nonEmpty, "no batches recorded")
    val sorted = durations.sorted
    sorted(math.ceil(0.95 * sorted.size).toInt - 1)
  }

  private final case class StageResult(rows: Long, batches: Int,
                                       wallSec: Double, p95Ms: Long) {
    def rowsPerSec: Long = math.round(rows / wallSec)
    def json(name: String): String =
      s""""$name":{"rows":$rows,"batches":$batches,""" +
        f""""wall_sec":$wallSec%.2f,"rows_per_s":$rowsPerSec,""" +
        s""""p95_batch_ms":$p95Ms}"""
  }

  private def progressDurations(
      q: org.apache.spark.sql.streaming.StreamingQuery): Seq[Long] =
    q.recentProgress.toSeq
      .filter(_.numInputRows > 0)
      .map(_.durationMs.get("triggerExecution").toLong)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // recentProgress must retain every replay batch for the p95
      .config("spark.sql.streaming.numRecentProgressUpdates", "200")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val scratch = java.nio.file.Files.createTempDirectory("graft-streambench")

    // ---- stage 1: watermarked windowed counts over the events replay ----
    val events = graft.queries.EventQueries.readEvents(spark, sfDir)
      .select(col("event_id"), col("ts"), col("event_type"),
        col("value").cast("double"))
      .as[(Long, Timestamp, String, Double)]
      .collect()
    val evMem = MemoryStream[(Long, Timestamp, String, Double)]
    val evQuery = StreamOps.windowedCounts(
        evMem.toDF().toDF("event_id", "ts", "event_type", "value"))
      .writeStream.format("noop").outputMode("update")
      .option("checkpointLocation", s"$scratch/ev_chk")
      .start()
    val evT0 = System.nanoTime()
    events.grouped(EventChunk).foreach { chunk =>
      evMem.addData(chunk.toSeq)
      evQuery.processAllAvailable()
    }
    val evWall = (System.nanoTime() - evT0) / 1e9
    val evDur = progressDurations(evQuery)
    evQuery.stop()
    val windowed = StageResult(events.length.toLong, evDur.size, evWall,
      p95(evDur))

    // ---- stage 2: near-dup ingest gate over the documents replay ----
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).cache()
    // materialize OUTSIDE the timed window: the gate indexes the corpus
    // once per stream (GateCorpusIndex), and this collect feeds the replay
    corpus.count()
    val docs = corpus.as[(Long, String)].collect()
    val docMem = MemoryStream[(Long, String)]
    val gateQuery = StreamOps.startNearDupGate(
      docMem.toDF().toDF("doc_id", "text")
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")),
      corpus, "text", "doc_id", threshold = 0.5,
      s"$scratch/gate_out", s"$scratch/gate_chk")
    val gateT0 = System.nanoTime()
    docs.grouped(DocChunk).foreach { chunk =>
      docMem.addData(chunk.toSeq)
      gateQuery.processAllAvailable()
    }
    val gateWall = (System.nanoTime() - gateT0) / 1e9
    val gateDur = progressDurations(gateQuery.query)
    gateQuery.stop()
    // the gate must have actually gated: every replayed doc is its own
    // corpus duplicate, so passed=0 everywhere — a sanity floor, not a tune
    val gated = spark.read.parquet(s"$scratch/gate_out")
    require(gated.count() == docs.length.toLong,
      "gate output must carry every replayed doc")
    require(gated.where(col("passed") === 1).count() == 0,
      "every replayed doc duplicates the corpus; none may pass the gate")
    val gate = StageResult(docs.length.toLong, gateDur.size, gateWall,
      p95(gateDur))

    val json = s"""{"metric":"stream_bench","sf":"$sfDir",""" +
      s""""event_chunk":$EventChunk,"doc_chunk":$DocChunk,""" +
      windowed.json("windowed_counts") + "," + gate.json("neardup_gate") + "}"
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("STREAMBENCH_LOCAL.json"), json + "\n")
    spark.stop()
  }
}
