package graft.queries

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.CoreOps

/** p14_catalog_scan — the reference's real addressing
  * (`select * from hive_db.hive_table where ds=`, HiveToMysql.java:227)
  * through the SESSION CATALOG: saveAsTable registers a ds-partitioned
  * table in the metastore, CoreOps.scanSource reads it back by name, and
  * the `ds =` filter must be resolved against partition METADATA at
  * planning time — not as a row-level filter over all files. The
  * path-based twin is PartitionedWriteSpec; this spec pins the
  * catalog-table shape the driver's CORRECTNESS row rests on. */
class CatalogScanSpec extends SparkSpec {

  test("catalog ds= filter prunes to exactly one metastore partition " +
    "at planning time (pruned file-index roots)") {
    val tbl = ParityQueries.stageCatalogTable(spark, sf)
    val filtered = CoreOps.partitionFilter(
      CoreOps.scanSource(spark, sf, tbl, Some("graft_wh")),
      col("ds"), "19960102")

    val scans = filtered.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.size == 1, s"expected one file scan, got ${scans.size}")
    val scan = scans.head
    // the partition predicate must live in partitionFilters (metadata
    // resolution), NOT dataFilters (per-row evaluation over all files)
    assert(scan.partitionFilters.exists(_.toString.contains("ds")),
      s"ds= did not become a partition filter: ${scan.partitionFilters}")
    assert(!scan.dataFilters.exists(_.toString.contains("ds")),
      s"ds= degraded to a row-level data filter: ${scan.dataFilters}")
    // planning-time catalog pruning rebuilds the file index over ONLY the
    // matching partition's directory — "plans one partition's files,
    // never lists the rest". (The Hive-metastore flavor of this prints
    // PrunedInMemoryFileIndex; the in-memory catalog prints an
    // InMemoryFileIndex whose root paths are the pruned partition dirs —
    // root paths, not just files, is the listing-never-happened proof.)
    val roots = scan.relation.location.rootPaths.map(_.toString)
    assert(roots.nonEmpty && roots.forall(_.contains("ds=19960102")),
      s"file index was built over unpruned roots: ${roots.mkString(",")}")
    assert(scan.relation.location.partitionSchema.fieldNames.toSeq == Seq("ds"))
    assert(scan.relation.location.inputFiles.nonEmpty)
    // exactly the one ds directory survives pruning
    assert(scan.relation.location.inputFiles.forall(_.contains("ds=19960102")),
      s"pruned index still lists other partitions: " +
        s"${scan.relation.location.inputFiles.take(3).mkString(",")}")
  }

  test("p14 values match reading the raw parquet with the same predicate") {
    val got = ParityQueries.catalogScan(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getString(3))).toSet
    val want = spark.read.parquet(s"$sf/lineitem.parquet")
      .where(date_format(col("l_shipdate"), "yyyyMMdd") === "19960102")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        date_format(col("l_shipdate"), "yyyyMMdd"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getString(3))).toSet
    assert(want.nonEmpty, "ds=19960102 must exist at sf0.001")
    assert(got == want)
  }
}
