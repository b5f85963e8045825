package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftError

/** The reference's TSV transport quirks (SURVEY.md §2 rows 4, 5, 10):
  * the `hive -e` CLI emits a TSV whose header names may be prefixed
  * `table.field`, may RE-EMIT the header mid-stream, and whose rows must be
  * at least as wide as the mapped schema.
  *
  * On Spark these are artifacts of a transport that no longer exists (the
  * catalog read replaces it), but they are implemented faithfully so data
  * produced by the reference's stage A can be ingested.
  */
object TsvSource {

  /** Strip `table.` prefix through the FIRST dot only
    * (getSrcFieldName, HiveToMysql.java:532-545). */
  def stripPrefix(name: String): String = {
    val i = name.indexOf('.')
    if (i >= 0) name.substring(i + 1) else name
  }

  /** Read a reference-style TSV: header on line 1 (possibly `tbl.field`
    * prefixed), header echoes dropped, literal "NULL" text left intact for
    * CoreOps.normalizeNulls, short rows fatal via requireFullWidth (9996).
    *
    * Implemented with the csv reader (distributed, splittable) rather than
    * a driver-side line loop (HiveToMysql.java:345-369): at 100 TB the TSV
    * is many blocks and each task parses its own split in parallel.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = try { spark.read
      .option("sep", "\t")
      .option("header", "true")
      // PERMISSIVE + explicit width check: FAILFAST would also abort on
      // header echoes, which must be *filtered*, not fatal.
      .option("mode", "PERMISSIVE")
      // distinguish "row is too short" (missing trailing cells -> null)
      // from "cell is legitimately empty" (-> ""): with the default
      // nullValue="" both read back as null and requireFullWidth would
      // abort (9996) on valid empty cells; the \\u0001 sentinel never occurs.
      .option("nullValue", "\u0001")
      .csv(path)
    } catch {
      // A zero-byte/headerless TSV gives the csv reader nothing to infer a
      // schema from; the reference aborts this with 9995
      // (HiveToMysql.java:302) — e.g. a truncated stage-A artifact.
      case e: org.apache.spark.sql.AnalysisException
          if e.getMessage.contains("Unable to infer schema") =>
        throw GraftError.MissingHeader(s"$path has no header line")
    }
    if (raw.columns.isEmpty)
      throw GraftError.MissingHeader(s"$path has no header line")
    val rawNames = raw.columns.toSeq
    val stripped = raw.toDF(rawNames.map(stripPrefix).toIndexedSeq: _*)
    dropHeaderEchoes(stripped, rawNames)
  }

  /** §2 row 5 — drop any data row that IS the header (hive CLI re-emits
    * headers mid-stream; currentLineIsHeader HiveToMysql.java:402-405).
    * Deliberate fix vs the reference: it used `indexOf` CONTAINMENT, which
    * can drop legitimate rows embedding the header text (SURVEY.md §7.3a);
    * here a row is an echo only when EVERY cell equals its header name
    * (prefixed or stripped form). */
  def dropHeaderEchoes(df: DataFrame, rawHeaderNames: Seq[String]): DataFrame = {
    val isEcho = df.columns.zip(rawHeaderNames).map { case (c, rawName) =>
      col(c) === lit(rawName) || col(c) === lit(stripPrefix(rawName))
    }.reduce(_ && _)
    df.where(!coalesce(isEcho, lit(false)))
  }

  /** §2 row 10 — row-width validation (exit 9996): with the csv reader a
    * short line manifests as nulls in its rightmost columns; the reference
    * aborts the whole run when a row is narrower than the mapped schema
    * (HiveToMysql.java:435-441). LIMIT-1 existence check — no full scan on
    * the happy path beyond the one the sink does anyway. */
  def requireFullWidth(df: DataFrame, mappedSrcCols: Seq[String]): DataFrame = {
    val required = mappedSrcCols.filter(df.columns.contains)
    if (required.nonEmpty) {
      val anyShort = df
        .where(required.map(col(_).isNull).reduce(_ || _))
        .limit(1).count() > 0
      if (anyShort)
        throw GraftError.RowWidthMismatch(
          s"rows narrower than mapped schema (cols ${required.mkString(",")})")
    }
    df
  }

  /** Write a DataFrame as a reference-style TSV (stage-A artifact shape:
    * header line with `table.field` names, literal NULL text for nulls).
    * Used by tests and the round-trip correctness query. */
  def write(df: DataFrame, path: String, tablePrefix: String): Unit = {
    val prefixed =
      df.toDF(df.columns.map(c => s"$tablePrefix.$c").toIndexedSeq: _*)
    prefixed.write
      .option("sep", "\t")
      .option("header", "true")
      .option("nullValue", "NULL")
      .mode("overwrite")
      .csv(path)
  }
}
