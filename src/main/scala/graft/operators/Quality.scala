package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Data-quality constraint checking — the pipeline admission gate: "no
  * null keys, prices non-negative, status in its domain" evaluated
  * BEFORE data merges into the warehouse.
  *
  * All constraints are counted in ONE combinable aggregation pass (a
  * sum of violation flags per check) — one scan however many checks,
  * where a per-check `filter().count()` loop would scan the table N
  * times. A NULL predicate result counts as a violation: a constraint
  * that cannot prove itself true is failed, which is what an admission
  * gate wants (`x > 0` on a null x is a violation, matching the
  * intuition, unlike SQL WHERE semantics that would silently pass it).
  */
object Quality {

  /** One row per check: `(check_name, n_violations, n_rows)`. */
  def constraintViolations(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "need at least one constraint")
    val sums = checks.map { case (name, pred) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"__v_$name")
    } :+ count(lit(1)).as("__n")
    val wide = df.agg(sums.head, sums.tail: _*)
    val stackArgs = checks
      .map { case (name, _) => s"'$name', __v_$name" }
      .mkString(", ")
    wide.select(
      expr(s"stack(${checks.size}, $stackArgs) AS (check_name, n_violations)"),
      col("__n").as("n_rows"))
  }

  /** Admission gate: throw when any constraint is violated, else pass
    * `df` through unchanged (one validation scan; the returned plan is
    * the original — no double read for downstream writes that re-scan).
    */
  def requireConstraints(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    val bad = constraintViolations(df, checks)
      .filter(col("n_violations") > 0)
      .collect()
    require(bad.isEmpty,
      "constraint violations: " +
        bad.map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(", "))
    df
  }
}
