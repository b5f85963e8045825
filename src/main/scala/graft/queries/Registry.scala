package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine capability: a Spark query over the harness tables
  * plus (when SQL-expressible) a DuckDB oracle the driver hash-compares
  * against. Column names/types must match the oracle exactly — the driver
  * sorts columns by name before hashing. */
final case class NamedQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  /** All registered queries, parity first. Order is informational only. */
  def all: Seq[NamedQuery] =
    ParityQueries.all ++ EngineQueries.all ++ TextQueries.all ++
      SimilarityQueries.all ++ EventQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
