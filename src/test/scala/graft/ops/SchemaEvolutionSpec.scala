package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Schema drift across parquet writes — the 100 TB lakehouse reality: a
  * producer adds a column mid-stream and readers must keep working over
  * the mixed directory. Pins the three behaviors a pipeline relies on:
  * mergeSchema unions the schemas (null-filling old files), the default
  * read stays cheap (no footer sweep), and writes into the evolved table
  * via unionByName backfill missing columns deterministically. */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("mergeSchema reads v1+v2 files as one table, null-filling v1 rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 0.9)).toDF("id", "name", "score")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "name", "score"))
    val rows = merged.select("id", "score").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(rows == Map(1L -> None, 2L -> None, 3L -> Some(0.9)))
  }

  test("unionByName with allowMissingColumns backfills a drifting producer") {
    val v1 = Seq((1L, "a")).toDF("id", "name")
    val v2 = Seq((2L, 0.5, "b")).toDF("id", "score", "name") // reordered + new col
    val all = v1.unionByName(v2, allowMissingColumns = true)
    assert(all.columns.toSeq == Seq("id", "name", "score"))
    val byId = all.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).isNullAt(2) && byId(2L).getDouble(2) == 0.5)
    // positional union would have mis-mapped name/score — that is the bug
    // this idiom prevents; schema equality is what the assert pins
  }

  test("TSV transport tolerates a WIDER file than the mapping (extra cols ignored)") {
    // the reference's mapping-driven projection reads only mapped source
    // columns; a producer appending trailing columns must not break it
    val dir = java.nio.file.Files.createTempDirectory("graft_wide").toString
    val f = new java.io.File(dir, "wide.tsv")
    val w = new java.io.PrintWriter(f)
    w.println("hdr.id\thdr.name\thdr.extra")
    w.println("1\talice\tignored")
    w.println("2\tbob\talso-ignored")
    w.close()
    val df = graft.ops.TsvSource.read(spark, f.getAbsolutePath)
    assert(df.columns.length == 3)
    val projected = df.select(col("id"), col("name"))
    assert(projected.collect().map(_.getString(1)).sorted.toSeq ==
      Seq("alice", "bob"))
  }
}
