package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the LATEST right row of
  * the same key whose time is at-or-before the left row's time — the
  * classic "event × most recent state" lookup (trade×quote, event×last
  * config push, view×last click).
  *
  * Spark has no native as-of join; the naive formulations both die at
  * scale:
  *   - a theta join `l.key = r.key AND r.ts <= l.ts` + groupBy-max
  *     multiplies each key group into a per-key cross product before
  *     re-aggregating (quadratic in hot keys);
  *   - a correlated subquery per left row is a driver-side loop.
  *
  * This implementation is the union + ordered-window trick: tag both
  * inputs, union them (cheap — no shuffle yet), then one window over
  * (key) ordered by (ts, side) carries the latest right payload forward
  * with `last(_, ignoreNulls = true)`. Exactly ONE shuffle on the key,
  * work linear in rows, no per-key blowup — the same plan survives a
  * 1000-executor run with hot keys (AQE can split a skewed key's sort).
  *
  * Right rows sort BEFORE left rows at equal timestamps (side 0 < 1), so
  * a right row exactly at the left row's time is visible — "at-or-before",
  * matching DuckDB/kdb ASOF semantics (the oracle runs DuckDB's native
  * ASOF JOIN against this implementation: two different algorithms, same
  * answer).
  *
  * The right side must be unique per (key, ts) for a deterministic
  * result; callers dedupe with max_by on a tiebreak id first (see
  * EventQueries.asofViewClick).
  */
object AsOf {

  /** `payload` columns are carried from the right side onto each left row
    * (all null when no right row precedes it). `leftCols` selects the
    * left columns to keep.
    *
    * The payload travels as ONE struct (null for left rows), so the
    * window's `last(_, ignoreNulls)` picks whole right ROWS — carrying
    * each payload column independently would stitch together a
    * combination no single right row ever had whenever payload values
    * are null (and diverge from ASOF semantics / the DuckDB oracle). */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               leftCols: Seq[String], payload: Seq[String]): DataFrame = {
    val sideLit = "__side"
    val rp = "__rpayload"
    val l = left.select(
      (Seq(col(key), col(ts), lit(1).as(sideLit)) ++
        leftCols.map(col) :+
        lit(null).cast(structTypeOf(right, payload)).as(rp)): _*)
    val r = right.select(
      (Seq(col(key), col(ts), lit(0).as(sideLit)) ++
        leftCols.map(c => lit(null).as(c)) :+
        struct(payload.map(col): _*).as(rp)): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col(sideLit))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(rp, last(col(rp), ignoreNulls = true).over(w))
      .where(col(sideLit) === 1)
      .select((Seq(col(key), col(ts)) ++ leftCols.map(col) ++
        payload.map(c => col(s"$rp.$c").as(c))): _*)
  }

  private def structTypeOf(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => df.schema(c).copy(name = c)))
}
