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

  test("compaction works through an explicit file:// Hadoop FS path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_fs")
      .resolve("t").toString
    (0 until 10).foreach { i =>
      Seq((i.toLong, s"row-$i")).toDF("id", "name")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val before = spark.read.parquet(dir).collect().map(_.toSeq).toSet
    val stats = Compaction.compact(spark, s"file://$dir",
      targetFileBytes = 64 * 1024)
    assert(stats.filesBefore == 10 && stats.rows == 10)
    assert(stats.filesAfter < 10)
    assert(spark.read.parquet(dir).collect().map(_.toSeq).toSet == before)
    // _SUCCESS marker written by the rewrite must not break a re-run
    assert(new java.io.File(dir, "_SUCCESS").exists())
    val again = Compaction.compact(spark, s"file://$dir",
      targetFileBytes = 64 * 1024)
    assert(again.rows == 10)
  }

  test("crash between the swap renames is recovered on the next run") {
    val parent = java.nio.file.Files.createTempDirectory("graft_compact_cr")
    val dir = parent.resolve("t").toString
    (0 until 6).foreach { i =>
      Seq((i.toLong, s"row-$i")).toDF("id", "name")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val before = spark.read.parquet(dir).collect().map(_.toSeq).toSet
    // simulate a crash AFTER `live -> __retired` and BEFORE promote:
    // the live dir is gone, the data sits whole in __retired
    val live = new java.io.File(dir)
    val retired = new java.io.File(parent.toFile, "t__retired")
    assert(live.renameTo(retired))
    val stats = Compaction.compact(spark, dir, targetFileBytes = 64 * 1024)
    assert(stats.rows == 6 && !retired.exists())
    assert(spark.read.parquet(dir).collect().map(_.toSeq).toSet == before)
  }

  test("crash after the commit marker but before promote restores cleanly") {
    val parent = java.nio.file.Files.createTempDirectory("graft_compact_mk")
    val dir = parent.resolve("t").toString
    (0 until 4).foreach { i =>
      Seq((i.toLong, s"row-$i")).toDF("id", "name")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val before = spark.read.parquet(dir).collect().map(_.toSeq).toSet
    // simulate: live -> __retired happened, marker written, promote didn't
    val retired = new java.io.File(parent.toFile, "t__retired")
    assert(new java.io.File(dir).renameTo(retired))
    assert(new java.io.File(retired, "_graft_retired").createNewFile())
    val stats = Compaction.compact(spark, dir, targetFileBytes = 64 * 1024)
    assert(stats.rows == 4 && !retired.exists())
    // the marker must not have ridden back into the live dir
    assert(!new java.io.File(dir, "_graft_retired").exists())
    assert(spark.read.parquet(dir).collect().map(_.toSeq).toSet == before)
  }

  test("a committed __retired leftover (marker present) is auto-cleaned") {
    val parent = java.nio.file.Files.createTempDirectory("graft_compact_cl")
    val dir = parent.resolve("t").toString
    (0 until 4).foreach { i =>
      Seq((i.toLong, s"row-$i")).toDF("id", "name")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val before = spark.read.parquet(dir).collect().map(_.toSeq).toSet
    // simulate: swap committed, only the cleanup delete died
    val retired = new java.io.File(parent.toFile, "t__retired")
    assert(retired.mkdirs())
    assert(new java.io.File(retired, "_graft_retired").createNewFile())
    val stats = Compaction.compact(spark, dir, targetFileBytes = 64 * 1024)
    assert(stats.rows == 4 && !retired.exists())
    assert(spark.read.parquet(dir).collect().map(_.toSeq).toSet == before)
  }

  test("a failed staging write leaves the live dir untouched; the next " +
      "run clears the stale staging and succeeds") {
    val parent = java.nio.file.Files.createTempDirectory("graft_compact_fw")
    val dir = parent.resolve("t").toString
    (0 until 4).foreach { i =>
      Seq((i.toLong, s"row-$i")).toDF("id", "name")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val goodFiles = new java.io.File(dir).listFiles().map(_.getName).toSet
    // plant a conflicting-schema file: the rewrite's scan fails at
    // execution time, i.e. mid-write, after staging exists
    Seq(("not-a-long", "x")).toDF("id", "name")
      .coalesce(1).write.mode("append").parquet(dir)
    val allFiles = new java.io.File(dir).listFiles().map(_.getName).toSet
    intercept[Exception] {
      Compaction.compact(spark, dir, targetFileBytes = 64 * 1024)
    }
    // live dir byte-for-byte untouched; no half-swap state
    assert(new java.io.File(dir).listFiles().map(_.getName).toSet == allFiles)
    assert(!new java.io.File(parent.toFile, "t__retired").exists())
    // heal the input and re-run: entry must clear the stale staging
    (allFiles -- goodFiles).foreach { f =>
      assert(new java.io.File(dir, f).delete())
    }
    val stats = Compaction.compact(spark, dir, targetFileBytes = 64 * 1024)
    assert(stats.rows == 4)
    assert(!new java.io.File(parent.toFile, "t__compacting").exists())
    assert(spark.read.parquet(dir).count() == 4)
  }

  test("a single-FILE parquet table compacts into a directory") {
    // the harness testdata ships each table as ONE bare parquet file —
    // the retire rename then produces a retired FILE, which cannot hold
    // the commit marker; the swap must still complete (marker degrades to
    // a warning, it must not throw mid-swap)
    val parent = java.nio.file.Files.createTempDirectory("graft_compact_1f")
    val tmp = parent.resolve("w").toString
    Seq.tabulate(100)(i => (i.toLong, s"row-$i")).toDF("id", "name")
      .coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val table = new java.io.File(parent.toFile, "t.parquet")
    assert(part.renameTo(table))
    val before = spark.read.parquet(table.toString).collect()
      .map(_.toSeq).toSet
    val stats = Compaction.compact(spark, table.toString,
      targetFileBytes = 1024)
    assert(stats.filesBefore == 1 && stats.rows == 100)
    assert(table.isDirectory, "the compacted table is a directory")
    assert(!new java.io.File(parent.toFile, "t.parquet__retired").exists())
    assert(spark.read.parquet(table.toString).collect()
      .map(_.toSeq).toSet == before)
  }

  test("compacting a filesystem root is refused with a clear error") {
    val e = intercept[IllegalArgumentException] {
      Compaction.compact(spark, "file:///")
    }
    assert(e.getMessage.contains("filesystem root"))
  }

  test("a leftover __retired NEXT TO a live dir aborts instead of guessing") {
    val parent = java.nio.file.Files.createTempDirectory("graft_compact_dup")
    val dir = parent.resolve("t").toString
    Seq((1L, "a")).toDF("id", "name").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val retired = new java.io.File(parent.toFile, "t__retired")
    assert(retired.mkdirs())
    val e = intercept[java.io.IOException] {
      Compaction.compact(spark, dir)
    }
    assert(e.getMessage.contains("__retired"))
    // the live table was not touched
    assert(spark.read.parquet(dir).count() == 1)
  }
}
