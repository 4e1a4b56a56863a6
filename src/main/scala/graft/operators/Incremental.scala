package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-aggregate maintenance: fold a DELTA of new
  * rows into a previously materialized per-key aggregate WITHOUT
  * rescanning history — the difference between O(delta) and O(100 TB)
  * per refresh cycle.
  *
  * Works for any algebraic aggregate (count/sum/min/max): the delta is
  * aggregated alone (map-side combinable), then ONE full-outer join on
  * the key folds it into the previous state. The history table is
  * touched only through its already-aggregated form, whose cardinality
  * is the key space, not the event count.
  *
  * Sums here are kept in integer units (e.g. cents) chosen by the
  * caller's value expression — a double sum would drift with partition
  * order and make "incremental == recompute" unverifiable bit-for-bit.
  */
object Incremental {

  /** Fold `delta` (raw rows) into `prev` (a materialized aggregate with
    * columns `keys ++ Seq(nCol, sumCol)`). `valueExpr` maps a delta row
    * to the integral value being summed. Returns the refreshed
    * aggregate — equal to re-aggregating history+delta from scratch
    * (IncrementalSpec and the `incr_agg_maintain` oracle prove it).
    */
  def updateCounts(
      prev: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      valueExpr: org.apache.spark.sql.Column,
      nCol: String = "n_events",
      sumCol: String = "sum_units"): DataFrame = {
    val d = delta.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as(s"__d_$nCol"), sum(valueExpr).as(s"__d_$sumCol"))
    prev.join(d, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col(nCol), lit(0L)) + coalesce(col(s"__d_$nCol"), lit(0L))).as(nCol),
        (coalesce(col(sumCol), lit(0L)) + coalesce(col(s"__d_$sumCol"), lit(0L))).as(sumCol)): _*)
  }

  /** Retraction-aware fold: the CDC / right-to-be-forgotten path.
    *
    * `delta` rows carry `opExpr` ∈ {+1 insert, −1 retract}; counts and
    * sums fold with the sign, so a deletion reverses exactly the rows
    * it names — the aggregate is repaired in O(delta), never by
    * rescanning 100 TB of history. Keys whose count AND sum both reach
    * zero are DROPPED from the output (a fully-retracted key
    * disappears, same as a from-scratch recompute that never saw it).
    *
    * Contract (the caller's, as in any retraction stream): every
    * retraction names a row previously inserted. Over-retraction would
    * drive a count negative, and a retraction carrying a wrong value
    * zeroes the count while leaving a nonzero residual sum; both are
    * surfaced, not masked — the mis-paired key stays in the output
    * (count 0, residual sum) so callers can assert `n >= 0 AND (n > 0
    * OR sum = 0)` downstream. Only algebraic aggregates fold
    * this way: min/max are NOT retractable in O(delta) (deleting the
    * minimum needs the runner-up); for those, recompute just the
    * affected keys via a semi-join on the retraction key set —
    * O(affected partitions), the standard hybrid.
    */
  def updateWithRetractions(
      prev: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      valueExpr: org.apache.spark.sql.Column,
      opExpr: org.apache.spark.sql.Column,
      nCol: String = "n_events",
      sumCol: String = "sum_units"): DataFrame = {
    val d = delta.groupBy(keys.map(col): _*)
      .agg(
        sum(opExpr.cast("long")).as(s"__d_$nCol"),
        sum(opExpr.cast("long") * valueExpr).as(s"__d_$sumCol"))
    prev.join(d, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col(nCol), lit(0L)) + coalesce(col(s"__d_$nCol"), lit(0L))).as(nCol),
        (coalesce(col(sumCol), lit(0L)) + coalesce(col(s"__d_$sumCol"), lit(0L))).as(sumCol)): _*)
      .where(col(nCol) =!= 0L || col(sumCol) =!= 0L)
  }
}
