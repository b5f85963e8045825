package graft.plans

import java.time.{LocalDate, ZoneId}
import java.time.format.DateTimeFormatter

import scala.util.Try

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: rewrite `date_format(col, '<day pattern>') = '<lit>'`
  * into pushable predicates on the raw column.
  *
  * Why this matters at 100 TB: the function call hides the column from
  * the data-source pushdown translator, so the parquet scan pushes only
  * `IsNotNull` and reads every row-group. The rewritten plain
  * equality/range pushes real comparisons — row-group stats (and, on a
  * date-partitioned table, partition pruning) skip the data entirely.
  * This is the reference's `where ds=` filter (HiveToMysql.java:227) as
  * users naturally write it; the engine fixes the plan instead of asking
  * users to know pushdown rules (CoreOps.pushablePartitionFilter is the
  * hand-written equivalent this rule automates).
  *
  * Exact-semantics rewrites, by input type:
  *   - DATE `d`: formatted-string equality is injective on valid dates →
  *     `d = DATE'lit'`;
  *   - TIMESTAMP_NTZ `t` (analyzer shape `date_format(cast(t as
  *     timestamp), p)`): the cast interprets the wall clock in the
  *     session zone and date_format prints in the same zone — identity
  *     on the wall clock → `t >= day 00:00 AND t < next-day 00:00` in
  *     wall-clock micros;
  *   - TIMESTAMP `t`: the day boundary lives in the format's zone →
  *     the same range with instants computed via `fmt.timeZoneId`.
  * An unparseable literal matches nothing → rewritten to `false`.
  * Only day-grain bijective patterns (yyyyMMdd / yyyy-MM-dd) rewrite.
  *
  * Install via `DsRangeRewrite.install(spark)`
  * (spark.experimental.extraOptimizations) or `GraftExtensions` at
  * session build.
  */
object DsRangeRewrite extends Rule[LogicalPlan] {

  private val patterns = Map(
    "yyyyMMdd" -> DateTimeFormatter.ofPattern("yyyyMMdd"),
    "yyyy-MM-dd" -> DateTimeFormatter.ofPattern("yyyy-MM-dd"))

  private val MicrosPerDay = 86400L * 1000000L

  private def range(col: Expression, lo: Long, hi: Long,
                    dt: DataType): Expression =
    And(GreaterThanOrEqual(col, Literal(lo, dt)),
      LessThan(col, Literal(hi, dt)))

  private def rewrite(fmt: DateFormatClass, lit: Literal): Option[Expression] = {
    val pattern = fmt.right match {
      case Literal(p: UTF8String, StringType) => patterns.get(p.toString)
      case _                                  => None
    }
    // a NULL string literal never reaches here through the standard
    // optimizer (NullPropagation folds `= NULL` first), but the rule is
    // also installable standalone — leave the comparison alone rather
    // than NPE on lit.value
    if (lit.value == null) return None
    pattern.flatMap { pat =>
      val raw = lit.value.asInstanceOf[UTF8String].toString
      // round-trip check: DateTimeFormatter's default SMART resolver maps
      // overflow literals like 20240231 to a real date (2024-02-29) — but
      // date_format NEVER produces such a string, so the original
      // predicate matches nothing and the rewrite must too
      val parsed = Try(LocalDate.parse(raw, pat)).toOption
        .filter(d => d.format(pat) == raw)
      // no-match replacement must stay null-preserving: the original
      // equality is NULL (not FALSE) for a NULL column, which differs
      // under NOT/COALESCE
      def noMatch(c: Expression): Expression =
        If(IsNull(c), Literal(null, BooleanType), Literal.FalseLiteral)
      def orFalse(c: Expression)(f: LocalDate => Expression): Option[Expression] =
        Some(parsed.map(f).getOrElse(noMatch(c)))
      fmt.left match {
        // analyzer inserts Cast(x -> timestamp) for date/ntz inputs
        case c: Cast if c.dataType == TimestampType &&
            c.child.dataType == DateType =>
          orFalse(c.child)(day => EqualTo(c.child,
            Literal(day.toEpochDay.toInt, DateType)))
        case c: Cast if c.dataType == TimestampType &&
            c.child.dataType == TimestampNTZType =>
          orFalse(c.child) { day =>
            val lo = day.toEpochDay * MicrosPerDay
            range(c.child, lo, lo + MicrosPerDay, TimestampNTZType)
          }
        case t if t.dataType == TimestampType =>
          fmt.timeZoneId.flatMap { tz =>
            orFalse(t) { day =>
              def micros(d: LocalDate) =
                d.atStartOfDay(ZoneId.of(tz)).toInstant.getEpochSecond *
                  1000000L
              range(t, micros(day), micros(day.plusDays(1)), TimestampType)
            }
          }
        case _ => None
      }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      f.copy(condition = cond.transform {
        case eq @ EqualTo(fmt: DateFormatClass, lit @ Literal(_, StringType)) =>
          rewrite(fmt, lit).getOrElse(eq)
        case eq @ EqualTo(lit @ Literal(_, StringType), fmt: DateFormatClass) =>
          rewrite(fmt, lit).getOrElse(eq)
      })
  }

  /** Idempotently add this rule to the session's experimental optimizer
    * extensions. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(this))
      spark.experimental.extraOptimizations = cur :+ this
  }
}
