package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.SparkSpec

/** The drain harness itself must be trustworthy: incremental file-stream
  * execution of windowedCounts equals the batch plan on the harness
  * events table (staged as a directory — the file-stream source requires
  * one; the harness ships events as a single file). The multi-batch
  * volume runs are recorded in BASELINE.md. */
class StreamDrainSpec extends SparkSpec {
  test("file-stream drain reproduces the batch windows exactly") {
    val dir = Files.createTempDirectory("drain")
    val table = Files.createDirectory(dir.resolve("events.parquet"))
    Files.copy(Paths.get(s"$sf/events.parquet"),
      table.resolve("part-0.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val r = StreamDrain.drain(spark, dir.toString, filesPerTrigger = 1)
    assert(r.matches, "incremental result must equal the batch plan")
    assert(r.rows > 0 && r.batches >= 1)
  }
}
