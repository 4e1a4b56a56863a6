package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: attach to each left row the most recent right
  * row with the same key and `right.ts <= left.ts` (inclusive), the
  * standard event-enrichment primitive (trade←quote, purchase←last
  * view, reading←last calibration).
  *
  * Spark has no native as-of operator. The naive formulation — a range
  * join `r.key = l.key AND r.ts <= l.ts` plus a per-left `row_number`
  * — materializes every (left, earlier-right) pair before pruning:
  * O(|L|·|R|) within each key, quadratic in key volume. This
  * implementation is the scale-correct union form instead:
  *
  *   1. union both sides, tagged (right=0, left=1);
  *   2. one shuffle on the key, sort within partitions by
  *      `(ts, side, tie)`;
  *   3. running `last(payload, ignoreNulls)` carries the latest right
  *      payload forward to each left row.
  *
  * Linear in |L|+|R|, ONE shuffle, no pair expansion — a window over
  * the union is exactly what a 1000-executor sort-merge run does well.
  * Skew bound: a single key's rows sort within one task (order is
  * inherently sequential per key); keys are the parallelism unit, as
  * with sessionization.
  *
  * Tie semantics (deterministic): at equal `ts` the right row sorts
  * before the left (side 0 < 1) so equal timestamps match
  * (at-or-before); among equal-`ts` right rows the HIGHEST `tieCol`
  * wins (they sort ascending; `last` takes the final one).
  *
  * The right payload rides in ONE struct so all matched fields come
  * from the SAME right row — per-column `last(ignoreNulls)` could mix
  * rows when payload values are legitimately null.
  */
object AsOf {

  /** @param left       probe side; all its columns pass through
    * @param right      reference side; must contain `keyCols`, `tsCol`,
    *                   `tieCol`, and `payloadCols`
    * @param keyCols    equi-join keys
    * @param tsCol      event-time column name (both sides)
    * @param tieCol     right-side tiebreak among equal timestamps
    *                   (highest wins); must be orderable
    * @param payloadCols right columns to attach (names must not collide
    *                   with left's); emitted null when no match
    * @param matchedTsCol name for the matched right timestamp column
    * @param toleranceMicros max age of a match in microseconds
    *                   (`left.ts - right.ts`); older matches become null
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      tieCol: String,
      payloadCols: Seq[String],
      matchedTsCol: String = "matched_ts",
      toleranceMicros: Option[Long] = None): DataFrame = {
    require(payloadCols.nonEmpty, "asofJoin needs at least one payload column")
    val leftCols = left.columns.toSeq

    val payloadStruct = struct(
      (payloadCols.map(col) :+ col(tsCol).as("__mts")): _*)
    // equi-join semantics: a NULL key never matches. The window would
    // otherwise co-partition null-key rows (Spark groups nulls), so
    // null-key right rows are dropped here — null-key left rows then
    // sit in a partition with no rights and keep a null payload.
    // A NULL right timestamp is likewise dropped: `r.ts <= l.ts` is
    // NULL (never true) in range-join semantics, but nulls-first
    // ordering would sort such a row before every left row and carry
    // its payload to the earliest lefts.
    val rightKeyed = (keyCols.map(c => right.col(c).isNotNull) :+
      right.col(tsCol).isNotNull).reduce(_ && _)
    val r = right.filter(rightKeyed).select(
      keyCols.map(col) ++ Seq(
        col(tsCol).as("__ts"),
        col(tieCol).as("__tie"),
        payloadStruct.as("__p")): _*)
      .withColumn("__side", lit(0))
    val l = left.select(
      keyCols.map(col) ++ Seq(
        col(tsCol).as("__ts"),
        struct(leftCols.map(col): _*).as("__l")): _*)
      .withColumn("__side", lit(1))

    val u = r.withColumn("__l", lit(null).cast(l.schema("__l").dataType))
      .unionByName(l.withColumn("__tie", lit(null).cast(r.schema("__tie").dataType))
        .withColumn("__p", lit(null).cast(r.schema("__p").dataType)))

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = u
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val bounded = toleranceMicros match {
      case Some(tol) => carried.withColumn("__m",
        when(unix_micros(col("__ts")) - unix_micros(col("__m.__mts")) <= tol, col("__m")))
      case None => carried
    }
    bounded.select(
      leftCols.map(c => col(s"__l.$c").as(c)) ++
        payloadCols.map(c => col(s"__m.$c").as(c)) :+
        col("__m.__mts").as(matchedTsCol): _*)
  }
}
