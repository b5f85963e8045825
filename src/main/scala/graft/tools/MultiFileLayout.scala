package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ops.Compaction

/** Rewrites each table of a (copied!) testdata directory from one parquet
  * file into ~`filesPerTable` files via [[Compaction.compact]] — the
  * harness testdata ships every table as a SINGLE file with a single row
  * group, so every scan in the bench is one task no matter how many cores
  * the session has. Splitting the layout lets the same bench measure what
  * actually happens at scale: one task per file/row-group, all cores busy.
  *
  * Tables under `minBytes` (the broadcast dims: region, nation, supplier)
  * are left alone — splitting a 3 KB table is the small-file pathology
  * this repo's compaction exists to UNDO.
  *
  * Usage: `runMain graft.tools.MultiFileLayout <dir> [filesPerTable]`
  * (mutates `<dir>` in place — point it at a copy, never at
  * /root/testdata).
  */
object MultiFileLayout {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: MultiFileLayout <dir> [filesPerTable]")
    val dir = new java.io.File(args(0))
    val filesPerTable = if (args.length > 1) args(1).toInt else 24
    val minBytes = 100L * 1024
    require(dir.isDirectory, s"$dir is not a directory")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def sizeOf(f: java.io.File): Long =
      if (f.isFile) f.length
      else Option(f.listFiles).getOrElse(Array.empty).map(sizeOf).sum
    dir.listFiles.filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .foreach { t =>
        val bytes = sizeOf(t)
        if (bytes < minBytes) {
          println(s"${t.getName}: ${bytes}B — left as-is (broadcast dim)")
        } else {
          val target = math.max(16L * 1024, bytes / filesPerTable)
          val s = Compaction.compact(spark, t.getAbsolutePath, target)
          println(s"${t.getName}: ${s.filesBefore} -> ${s.filesAfter} files" +
            s" (${s.rows} rows, ${s.bytes}B)")
        }
      }
    spark.stop()
  }
}
