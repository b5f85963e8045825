package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in graft.queries.* (one NamedQuery per implemented
  * operator, parity + engine + LLM-pipeline); this object only adapts the
  * registry to the driver's Map shape. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Registry.queries("p01_flagship")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 + extensions. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Registry.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables — since round 9 EVERY query has one: the seeded
    * LSH/MinHash/SimHash internals are oracled via dump-time VALUES
    * literals (queries.HashOracles), so no rows-only entries remain. */
  def oracleSql: Map[String, String] = graft.queries.Registry.oracleSql
}
