package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compaction collapses a sprayed directory and preserves every row") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact")
      .resolve("t").toString
    // spray 40 tiny files (one per append — the streaming-sink pathology)
    (0 until 40).foreach { i =>
      Seq((i.toLong, s"row-$i", i * 1.5)).toDF("id", "name", "v")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val before = spark.read.parquet(dir).collect().map(_.toSeq).toSet
    assert(before.size == 40)
    val stats = Compaction.compact(spark, dir, targetFileBytes = 64 * 1024)
    assert(stats.filesBefore == 40 && stats.rows == 40)
    assert(stats.filesAfter < 40 && stats.filesAfter >= 1,
      s"expected consolidation, got ${stats.filesAfter} files")
    // content identical, schema identical
    val after = spark.read.parquet(dir)
    assert(after.collect().map(_.toSeq).toSet == before)
    assert(after.schema.fieldNames.sorted.toSeq == Seq("id", "name", "v"))
    // idempotent: compacting a compacted dir converges
    val again = Compaction.compact(spark, dir, targetFileBytes = 64 * 1024)
    assert(again.filesAfter == stats.filesAfter && again.rows == 40)
    assert(spark.read.parquet(dir).collect().map(_.toSeq).toSet == before)
  }

  test("compaction refuses an empty directory loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_empty")
    intercept[IllegalArgumentException] {
      Compaction.compact(spark, dir.toString)
    }
  }
}
