package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: guard `levenshtein(a, b) <= k` with the free lower
  * bound `abs(length(a) - length(b)) <= k`.
  *
  * Why this matters at 100 TB: edit distance is an O(|a|·|b|) dynamic
  * program evaluated per candidate pair, but the length difference is an
  * O(1) lower bound on it (each unit of length gap costs at least one
  * edit). On a near-dup verify join most candidate pairs fail the
  * threshold, and a large share of those fail on length alone — the guard
  * short-circuits the DP for exactly those rows (And evaluates left to
  * right in codegen). The rewrite is purely semantics-preserving:
  * length-gap > k  ⇒  distance > k, and both sides agree on NULL inputs
  * (null length ⇒ null guard, null distance ⇒ null comparison).
  *
  * Spark's own `levenshtein(a, b, threshold)` form prunes inside the DP
  * but still enters it; this prunes before. The rule is idempotent: a
  * comparison already guarded by its own length check is left alone.
  *
  * Install via `LevenshteinPrefilter.install(spark)` or `GraftExtensions`.
  */
object LevenshteinPrefilter extends Rule[LogicalPlan] {

  private def lengthGuard(lev: Levenshtein, k: Expression): Expression =
    LessThanOrEqual(
      Abs(Subtract(Length(lev.left), Length(lev.right))),
      k)

  /** Is `cond` (a conjunct tree) already carrying this guard? */
  private def hasGuard(cond: Expression, guard: Expression): Boolean = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other     => Seq(other)
    }
    conjuncts(cond).exists(_.semanticEquals(guard))
  }

  private def guarded(cond: Expression): Expression = cond.transformUp {
    case cmp @ LessThanOrEqual(lev: Levenshtein, k @ Literal(_, IntegerType))
        if lev.threshold.isEmpty && !hasGuard(cond, lengthGuard(lev, k)) =>
      And(lengthGuard(lev, k), cmp)
    case cmp @ LessThan(lev: Levenshtein, k @ Literal(_, IntegerType))
        if lev.threshold.isEmpty && !hasGuard(cond, lengthGuard(lev, k)) =>
      // distance < k  ⇒  gap <= k is still a valid (looser) guard
      And(lengthGuard(lev, k), cmp)
  }

  // Filter AND Join conditions: predicate pushdown (which runs before the
  // experimental batch) routinely moves a post-join levenshtein filter
  // into the join condition — the per-candidate-pair evaluation site
  // where the O(1) guard pays the most
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val rewritten = guarded(cond)
      if (rewritten fastEquals cond) f else f.copy(condition = rewritten)
    case j @ Join(_, _, _, Some(cond), _) =>
      val rewritten = guarded(cond)
      if (rewritten fastEquals cond) j else j.copy(condition = Some(rewritten))
  }

  /** Idempotently add this rule to the session's experimental optimizer
    * extensions. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(this))
      spark.experimental.extraOptimizations = cur :+ this
  }
}
