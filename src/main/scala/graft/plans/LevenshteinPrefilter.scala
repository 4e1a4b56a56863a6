package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: prefix every `levenshtein(a, b) <= k` (or `< k`)
  * filter conjunct with the classic length lower bound
  * `abs(length(a) - length(b)) <= k` — edit distance can never be
  * smaller than the length difference, so the cheap O(1) guard
  * short-circuits the O(|a|·|b|) dynamic program for every candidate
  * pair whose lengths already rule it out. In a blocked fuzzy-join
  * (the [[graft.SparkEntry]] `link_fuzzy_names` shape) most candidate
  * pairs die at the guard.
  *
  * Null semantics are unchanged: a null operand nulls both the guard
  * and the distance compare, and a filter drops null predicates either
  * way. Fixpoint-safe: a conjunction that already carries the guard
  * (semantically) is left alone, so repeated optimizer passes cannot
  * stack copies.
  *
  * Injection: config-driven via [[GraftExtensions]]
  * (`spark.sql.extensions`) or [[ensureInjected]] for an existing
  * session.
  */
object LevenshteinPrefilter extends Rule[LogicalPlan] with PredicateHelper {

  def ensureInjected(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.experimental.synchronized {
      if (!spark.experimental.extraOptimizations.contains(this)) {
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ this
      }
    }

  /** The guards a predicate earns, minus ones it already carries. */
  private def guardsFor(cond: Expression): Seq[Expression] = {
    val conjuncts = splitConjunctivePredicates(cond)
    conjuncts.flatMap {
      case LessThanOrEqual(lev: Levenshtein, k: Literal) =>
        val g = LessThanOrEqual(Abs(Subtract(Length(lev.left), Length(lev.right))), k)
        if (conjuncts.exists(_.semanticEquals(g))) None else Some(g)
      case LessThan(lev: Levenshtein, k: Literal) =>
        val g = LessThan(Abs(Subtract(Length(lev.left), Length(lev.right))), k)
        if (conjuncts.exists(_.semanticEquals(g))) None else Some(g)
      case _ => None
    }
  }

  // This rule runs in the user-provided batch AFTER predicate pushdown,
  // so the distance predicate may sit in a Filter OR already inside a
  // Join condition — both get the guard.
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val extra = guardsFor(cond)
      if (extra.isEmpty) f else Filter((extra :+ cond).reduce(And), child)
    case j @ Join(_, _, _, Some(cond), _) =>
      val extra = guardsFor(cond)
      if (extra.isEmpty) j
      else j.copy(condition = Some((extra :+ cond).reduce(And)))
  }
}
