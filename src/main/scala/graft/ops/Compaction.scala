package graft.ops

import org.apache.spark.sql.SparkSession

/** Small-file compaction — the operational sweep every long-lived 100 TB
  * parquet table needs: streaming sinks and frequent small appends leave
  * thousands of KB-sized files, and scan cost becomes file-open bound
  * (driver listing, footer reads, task-per-file scheduling) instead of
  * data bound.
  *
  * `compact` rewrites a directory to ~`targetFileBytes` files: one pass
  * reads the current files, repartitions to ceil(bytes/target), writes to
  * a staging dir, then atomically swaps directories. Row content is
  * byte-for-byte preserved (no schema projection, no reordering
  * semantics claimed — parquet row order was never a contract).
  *
  * The swap is rename-based: on a real object store you would write to a
  * new versioned location and flip a table pointer (or use a table
  * format's commit protocol); the directory rename here is the
  * file-system analogue and keeps the operator dependency-free.
  */
object Compaction {

  final case class Stats(filesBefore: Int, filesAfter: Int,
                         bytes: Long, rows: Long)

  private def parquetFiles(dir: java.io.File): Array[java.io.File] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))

  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Stats = {
    val dir = new java.io.File(path)
    val before = parquetFiles(dir)
    require(before.nonEmpty, s"no parquet files under $path")
    val bytes = before.map(_.length).sum
    val nOut = math.max(1, ((bytes + targetFileBytes - 1) /
      targetFileBytes).toInt)
    val staging = new java.io.File(dir.getParentFile,
      dir.getName + "__compacting")
    val df = spark.read.parquet(path)
    val rows = df.count()
    // repartition (round-robin) spreads rows evenly across the target
    // files; coalesce could skew when input files are uneven
    df.repartition(nOut).write.mode("overwrite")
      .parquet(staging.getAbsolutePath)
    // swap: retire the old dir, promote staging
    val retired = new java.io.File(dir.getParentFile,
      dir.getName + "__retired")
    if (retired.exists()) deleteRec(retired)
    if (!dir.renameTo(retired))
      throw new java.io.IOException(s"could not retire $dir")
    if (!staging.renameTo(dir)) {
      retired.renameTo(dir) // roll back
      throw new java.io.IOException(s"could not promote $staging")
    }
    deleteRec(retired)
    Stats(before.length, parquetFiles(dir).length, bytes, rows)
  }

  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete(); ()
  }
}
