package graft.ops

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the operational sweep every long-lived 100 TB
  * parquet table needs: streaming sinks and frequent small appends leave
  * thousands of KB-sized files, and scan cost becomes file-open bound
  * (driver listing, footer reads, task-per-file scheduling) instead of
  * data bound.
  *
  * `compact` rewrites a directory to ~`targetFileBytes` files: one pass
  * reads the current files, repartitions to ceil(bytes/target), writes to
  * a staging dir, then swaps directories. Row content is byte-for-byte
  * preserved (no schema projection, no reordering semantics claimed —
  * parquet row order was never a contract). The row count is read from
  * the COMMITTED staging files' parquet footers — no second scan of the
  * data, and exact by construction: footer metadata reflects what was
  * actually committed, so stage re-execution (fetch failure,
  * speculation) cannot inflate it the way an accumulator-backed
  * `observe` metric can. The footer walk is one driver-side metadata
  * read per OUTPUT file, and output files are ~`targetFileBytes` each,
  * so the walk is bounded by the directory's compacted size.
  *
  * All filesystem work goes through the Hadoop `FileSystem` API resolved
  * from the path's scheme, so the same operator runs on `file://`, HDFS,
  * or any mounted Hadoop-compatible store; `_SUCCESS` markers and CRC
  * sidecars are tolerated (ignored by the listing, retired with the old
  * directory). Every `rename` is checked — a false return aborts loudly
  * instead of silently dropping the table.
  *
  * Crash safety: the swap is two renames (live → `__retired`, staging →
  * live), with a `_graft_retired` marker file dropped into `__retired`
  * between them. If a previous run died between the renames, the live
  * directory is missing and the data sits whole in `__retired` —
  * `compact` detects that on entry and restores it before doing anything
  * else. A leftover `__retired` NEXT TO a live directory carrying the
  * marker means the swap committed and only the cleanup delete died —
  * that state is unambiguous (live is the new data), so the leftover is
  * deleted and the run proceeds. A marker-less `__retired` next to a
  * live directory is unexplained (manual copy? foreign tool?), and
  * aborts. Callers must ensure a single writer
  * (no appends during the pass): files appended between the listing and
  * the swap would be silently dropped by the rewrite. On an eventually-
  * consistent object store without atomic rename you would instead write
  * to a versioned location and flip a table-format pointer; the rename
  * swap covers filesystems with rename semantics (local, HDFS).
  */
object Compaction {

  final case class Stats(filesBefore: Int, filesAfter: Int,
                         bytes: Long, rows: Long)

  private def parquetFiles(fs: FileSystem, dir: Path): Array[FileStatus] =
    if (!fs.exists(dir)) Array.empty
    else fs.listStatus(dir)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))

  /** Exact row count from the file's footer — metadata only, no data
    * pages read. */
  private def footerRowCount(fs: FileSystem, st: FileStatus): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromStatus(st, fs.getConf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try reader.getRecordCount finally reader.close()
  }

  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Stats = {
    val dir = new Path(path)
    require(dir.getParent != null,
      s"cannot compact a filesystem root: $path (the swap needs a sibling " +
        "staging directory)")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val retired = new Path(dir.getParent, dir.getName + "__retired")
    val staging = new Path(dir.getParent, dir.getName + "__compacting")
    val marker = new Path(retired, "_graft_retired")

    // Recover from a crash between the two swap renames: the data is
    // whole in __retired and the live dir is gone — restore it (dropping
    // the commit marker so it doesn't ride back into the live dir). If
    // BOTH exist, the marker disambiguates: marker present means the swap
    // committed and only the cleanup delete died (live is the new data —
    // finish the delete and proceed); marker absent is unexplained
    // foreign state, so refuse rather than guess which copy is current.
    if (fs.exists(retired)) {
      if (!fs.exists(dir)) {
        if (fs.exists(marker) && !fs.delete(marker, false))
          throw new java.io.IOException(
            s"crash recovery failed: could not drop $marker before restore")
        if (!fs.rename(retired, dir))
          throw new java.io.IOException(
            s"crash recovery failed: could not restore $retired to $dir")
      } else if (fs.exists(marker)) {
        if (!fs.delete(retired, true))
          throw new java.io.IOException(
            s"could not clear committed leftover $retired")
      } else {
        throw new java.io.IOException(
          s"leftover $retired next to live $dir without a commit marker — " +
            "manual copy or foreign tool state; resolve manually")
      }
    }
    // stale staging from an aborted rewrite is safe to discard: the live
    // dir was never touched before the swap
    if (fs.exists(staging) && !fs.delete(staging, true))
      throw new java.io.IOException(s"could not clear stale staging $staging")

    val before = parquetFiles(fs, dir)
    require(before.nonEmpty, s"no parquet files under $path")
    val bytes = before.map(_.getLen).sum
    val nOut = math.max(1, ((bytes + targetFileBytes - 1) /
      targetFileBytes).toInt)
    // repartition (round-robin) spreads rows evenly across the target
    // files; coalesce could skew when input files are uneven
    spark.read.parquet(path)
      .repartition(nOut).write.mode("overwrite")
      .parquet(staging.toString)
    // rows from the committed files' footers, not an observe() metric: an
    // accumulator rides the write stage and over-counts if a task is
    // re-executed (fetch failure, speculation); footers are a ledger of
    // what was committed
    val rows = parquetFiles(fs, staging).map(footerRowCount(fs, _)).sum

    // swap: retire the old dir, mark it as committed-for-retirement, then
    // promote staging. The marker lets a later run tell "cleanup died
    // after a committed swap" apart from foreign state.
    if (!fs.rename(dir, retired))
      throw new java.io.IOException(s"could not retire $dir")
    // best-effort marker: a single-FILE table retires as a file, which
    // can't contain a marker (createNewFile under a file THROWS, it does
    // not return false) — degrade to the round-5 behavior (a crash before
    // cleanup needs manual resolution) instead of dying mid-swap
    val marked =
      try fs.createNewFile(marker)
      catch { case _: java.io.IOException => false }
    if (!marked)
      System.err.println(s"[compact] warning: could not write $marker — a " +
        "crash before cleanup would need manual resolution")
    if (!fs.rename(staging, dir)) {
      val unmarked = !fs.exists(marker) || fs.delete(marker, false)
      if (!unmarked || !fs.rename(retired, dir))
        throw new java.io.IOException(
          s"could not promote $staging AND rollback of $retired failed — " +
            s"data is intact in $retired; restore manually")
      throw new java.io.IOException(s"could not promote $staging")
    }
    if (!fs.delete(retired, true))
      throw new java.io.IOException(
        s"compaction succeeded but could not delete $retired; a later run " +
          "clears it on entry via the commit marker (or refuses if the " +
          "marker write above was degraded — then remove it manually)")
    Stats(before.length, parquetFiles(fs, dir).length, bytes, rows)
  }
}
