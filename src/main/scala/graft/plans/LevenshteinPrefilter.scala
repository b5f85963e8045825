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
  * Spark's own `levenshtein(a, b, threshold)` form carries the same
  * pruning inside the expression (banded DP + a length-gap early
  * return) and is the right spelling when the threshold is known at
  * authoring time — t29 uses it. This rule exists for the 2-arg form:
  * predicates like `levenshtein(a, b) <= k` written by layers that
  * don't control the expression (generated SQL, the t18 primitive)
  * get the O(1) guard without a rewrite. The rule is idempotent: a
  * comparison already guarded by its own length check is left alone.
  *
  * Install via `LevenshteinPrefilter.install(spark)` or `GraftExtensions`.
  */
object LevenshteinPrefilter extends Rule[LogicalPlan] {

  private def lengthGuard(lev: Levenshtein, k: Expression): Expression =
    LessThanOrEqual(
      Abs(Subtract(Length(lev.left), Length(lev.right))),
      k)

  /** A bare `levenshtein(a,b) <= k` / `< k` comparison eligible for the
    * guard. (`distance < k  ⇒  gap <= k` is a looser but still sound
    * guard, so both comparators share one guard shape.) */
  private def guardable(e: Expression): Option[(Levenshtein, Expression)] =
    e match {
      case LessThanOrEqual(lev: Levenshtein, k @ Literal(_, IntegerType))
          if lev.threshold.isEmpty => Some((lev, k))
      case LessThan(lev: Levenshtein, k @ Literal(_, IntegerType))
          if lev.threshold.isEmpty => Some((lev, k))
      case _ => None
    }

  /** Already in the rewritten shape `And(lengthGuard, cmp)`? Detected on
    * the comparison's direct parent — NOT on the condition's top-level
    * conjuncts — so the rule converges even when the comparison sits under
    * OR / NOT, where an added guard is invisible to a conjunct scan and a
    * top-level check would re-guard on every optimizer fixpoint iteration. */
  private def alreadyGuarded(e: Expression): Boolean = e match {
    case And(g, cmp) =>
      guardable(cmp).exists { case (lev, k) => g.semanticEquals(lengthGuard(lev, k)) }
    case _ => false
  }

  private def guarded(cond: Expression): Expression = {
    // Conjuncts at the top of the condition: if the user (or a prior pass)
    // already asserts the guard for the whole predicate, adding it again
    // next to the comparison would be redundant work per row.
    def topConjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => topConjuncts(l) ++ topConjuncts(r)
      case other     => Seq(other)
    }
    val top = topConjuncts(cond)
    def rec(e: Expression): Expression =
      if (alreadyGuarded(e)) e
      else guardable(e) match {
        case Some((lev, k)) =>
          val g = lengthGuard(lev, k)
          if (top.exists(_.semanticEquals(g))) e else And(g, e)
        case None => e.mapChildren(rec)
      }
    rec(cond)
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
