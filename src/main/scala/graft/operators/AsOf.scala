package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins: attach to each left row a single right row with the
  * same key, chosen by temporal direction — the standard
  * event-enrichment primitive (trade←quote, purchase←last view,
  * reading←last calibration):
  *
  *   - [[asofJoin]] (backward): most recent right with `r.ts <= l.ts`;
  *   - [[asofJoinForward]]: earliest right with `r.ts >= l.ts`;
  *   - [[asofJoinNearest]]: whichever of the two is closer in time
  *     (ties prefer backward) — pandas `merge_asof` direction parity.
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
  *      payload forward to each left row (backward; `first` over the
  *      mirrored frame for forward).
  *
  * Linear in |L|+|R|, ONE shuffle, no pair expansion — a window over
  * the union is exactly what a 1000-executor sort-merge run does well.
  * The nearest variant evaluates both directional carries over the
  * same union: one exchange, two within-partition sorts. Skew bound: a
  * single key's rows sort within one task (order is inherently
  * sequential per key); keys are the parallelism unit, as with
  * sessionization.
  *
  * Tie semantics (deterministic): equal timestamps match in both
  * directions (at-or-before / at-or-after); among equal-`ts` right
  * rows the HIGHEST `tieCol` wins.
  *
  * The right payload rides in ONE struct so all matched fields come
  * from the SAME right row — per-column `last(ignoreNulls)` could mix
  * rows when payload values are legitimately null.
  */
object AsOf {

  /** Tagged union of both sides: right rows carry `(__ts, __tie, __p)`,
    * left rows `(__ts, __l)`; `__side` is 0 for right, 1 for left.
    * Equi-join semantics: a NULL key never matches. The window would
    * otherwise co-partition null-key rows (Spark groups nulls), so
    * null-key right rows are dropped here — null-key left rows then
    * sit in a partition with no rights and keep a null payload.
    * A NULL right timestamp is likewise dropped: `r.ts <= l.ts` is
    * NULL (never true) in range-join semantics, but nulls-first
    * ordering would sort such a row before every left row and carry
    * its payload to the earliest lefts.
    */
  private def unioned(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      tieCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val payloadStruct = struct(
      (payloadCols.map(col) :+ col(tsCol).as("__mts")): _*)
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
        struct(left.columns.toSeq.map(col): _*).as("__l")): _*)
      .withColumn("__side", lit(1))
    r.withColumn("__l", lit(null).cast(l.schema("__l").dataType))
      .unionByName(l.withColumn("__tie", lit(null).cast(r.schema("__tie").dataType))
        .withColumn("__p", lit(null).cast(r.schema("__p").dataType)))
  }

  private def selectOut(
      df: DataFrame,
      leftCols: Seq[String],
      payloadCols: Seq[String],
      matchedTsCol: String,
      m: Column): DataFrame = {
    val named = df.withColumn("__m", m)
    named.select(
      leftCols.map(c => col(s"__l.$c").as(c)) ++
        payloadCols.map(c => col(s"__m.$c").as(c)) :+
        col("__m.__mts").as(matchedTsCol): _*)
  }

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
    val u = unioned(left, right, keyCols, tsCol, tieCol, payloadCols)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = u
      .withColumn("__mm", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val m = toleranceMicros match {
      case Some(tol) => when(
        unix_micros(col("__ts")) - unix_micros(col("__mm.__mts")) <= tol, col("__mm"))
      case None => col("__mm")
    }
    selectOut(carried, leftCols, payloadCols, matchedTsCol, m)
  }

  /** Forward as-of join: earliest right row at-or-after each left row.
    * Mirrored frame: left sorts before right at equal `ts` (side desc)
    * so equal timestamps match; rights at equal `ts` sort tie-descending
    * and `first()` takes the highest. `toleranceMicros` bounds
    * `right.ts - left.ts`.
    */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      tieCol: String,
      payloadCols: Seq[String],
      matchedTsCol: String = "matched_ts",
      toleranceMicros: Option[Long] = None): DataFrame = {
    require(payloadCols.nonEmpty, "asofJoinForward needs at least one payload column")
    val leftCols = left.columns.toSeq
    val u = unioned(left, right, keyCols, tsCol, tieCol, payloadCols)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side").desc, col("__tie").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = u
      .withColumn("__mm", first(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val m = toleranceMicros match {
      case Some(tol) => when(
        unix_micros(col("__mm.__mts")) - unix_micros(col("__ts")) <= tol, col("__mm"))
      case None => col("__mm")
    }
    selectOut(carried, leftCols, payloadCols, matchedTsCol, m)
  }

  /** Nearest as-of join: the closer of the backward and forward matches
    * (equal distance prefers backward — pandas `merge_asof
    * direction='nearest'` semantics). Both directional carries run over
    * the SAME tagged union: one shuffle on the key, two
    * within-partition sorts — still no pair expansion.
    * `toleranceMicros` bounds `|right.ts - left.ts|`.
    */
  def asofJoinNearest(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      tieCol: String,
      payloadCols: Seq[String],
      matchedTsCol: String = "matched_ts",
      toleranceMicros: Option[Long] = None): DataFrame = {
    require(payloadCols.nonEmpty, "asofJoinNearest needs at least one payload column")
    val leftCols = left.columns.toSeq
    val u = unioned(left, right, keyCols, tsCol, tieCol, payloadCols)
    val wB = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side").desc, col("__tie").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = u
      .withColumn("__mbRaw", last(col("__p"), ignoreNulls = true).over(wB))
      .withColumn("__mfRaw", first(col("__p"), ignoreNulls = true).over(wF))
      .filter(col("__side") === 1)
    val db = unix_micros(col("__ts")) - unix_micros(col("__mbRaw.__mts"))
    val df = unix_micros(col("__mfRaw.__mts")) - unix_micros(col("__ts"))
    val (mb, mf) = toleranceMicros match {
      case Some(tol) => (when(db <= tol, col("__mbRaw")), when(df <= tol, col("__mfRaw")))
      case None => (col("__mbRaw"), col("__mfRaw"))
    }
    val bounded = carried
      .withColumn("__mb", mb)
      .withColumn("__mf", mf)
    val dbB = unix_micros(col("__ts")) - unix_micros(col("__mb.__mts"))
    val dfB = unix_micros(col("__mf.__mts")) - unix_micros(col("__ts"))
    val m = when(col("__mb").isNull, col("__mf"))
      .when(col("__mf").isNull, col("__mb"))
      .when(dbB <= dfB, col("__mb"))
      .otherwise(col("__mf"))
    selectOut(bounded, leftCols, payloadCols, matchedTsCol, m)
  }

  /** Backward as-of join through the STRATEGY tier
    * ([[graft.plans.BroadcastAsOfJoinExec]]) for the dim-history case:
    * the right side is broadcast once and the fact side probes a
    * per-key time-sorted index with a binary search — no exchange on
    * the fact side at all, where [[asofJoin]]'s window form must
    * shuffle it. Same semantics and tie rules as [[asofJoin]] (proven
    * row-for-row in AsOfExecSpec and by the shared oracle row).
    *
    * Use when |right| is broadcast-sized (dimension versions,
    * calibration histories, per-instrument quote books); keep
    * [[asofJoin]] for big-big. `broadcastRowLimit` enforces that
    * contract mechanically: the right side is counted (one
    * dim-table-sized action, stopping at limit+1 rows) and anything
    * larger falls back to the window form — same semantics, shuffle
    * cost instead of an executor-memory blowup. Pass `Long.MaxValue`
    * to skip the count when the caller already knows the size.
    *
    * Type contract (checked eagerly — the exec reads timestamps via
    * `InternalRow.getLong` and matches keys by binary row equality, so
    * a mismatch would misread silently instead of failing): `tsCol`
    * must be long-backed (TIMESTAMP / TIMESTAMP_NTZ / LONG) and
    * identical on both sides, and each key column's type must match
    * across sides exactly.
    */
  def asofJoinBroadcast(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      tieCol: String,
      payloadCols: Seq[String],
      matchedTsCol: String = "matched_ts",
      forward: Boolean = false,
      broadcastRowLimit: Long = 4000000L): DataFrame = {
    require(payloadCols.nonEmpty, "asofJoinBroadcast needs at least one payload column")
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    def colType(df: DataFrame, name: String) =
      df.schema.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found")).dataType
    val lTsType = colType(left, tsCol)
    val rTsType = colType(right, tsCol)
    require(lTsType == rTsType,
      s"asofJoinBroadcast: $tsCol type mismatch: left=$lTsType right=$rTsType")
    require(Seq(TimestampType, TimestampNTZType, LongType).contains(lTsType),
      s"asofJoinBroadcast: $tsCol must be TIMESTAMP/TIMESTAMP_NTZ/LONG " +
        s"(long-backed — the exec binary-searches raw longs), got $lTsType; " +
        "cast DATE/INT timestamps explicitly or use asofJoin")
    keyCols.foreach { k =>
      val (lt, rt) = (colType(left, k), colType(right, k))
      require(lt == rt,
        s"asofJoinBroadcast: key $k type mismatch: left=$lt right=$rt " +
          "(keys match by binary row equality — cast both sides to one type)")
    }
    require(org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(colType(right, tieCol)),
      s"asofJoinBroadcast: tie column $tieCol type ${colType(right, tieCol)} is not orderable")
    if (broadcastRowLimit < Long.MaxValue &&
        right.limit(math.min(broadcastRowLimit + 1, Int.MaxValue.toLong).toInt)
          .count() > broadcastRowLimit) {
      // documented fallback: same semantics through the window form —
      // pays the fact-side shuffle instead of broadcasting a
      // non-dim-sized right side to every executor
      return if (forward)
        asofJoinForward(left, right, keyCols, tsCol, tieCol, payloadCols, matchedTsCol)
      else asofJoin(left, right, keyCols, tsCol, tieCol, payloadCols, matchedTsCol)
    }
    val spark = left.sparkSession
    // idempotently make the strategy available on this session — the
    // config-driven path is GraftExtensions; this covers ad-hoc
    // sessions. Synchronized: extraStrategies is session-global state
    // and a concurrent check-then-append would race
    spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies.contains(graft.plans.GraftStrategies)) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ graft.plans.GraftStrategies
      }
    }
    val lPlan = left.queryExecution.analyzed
    // both sides may derive from the SAME source (self-as-of): re-alias
    // every right column to fresh exprIds so the node's left/right key
    // references can never collide under DeduplicateRelations
    val rPlan = {
      val analyzed = right.queryExecution.analyzed
      org.apache.spark.sql.catalyst.plans.logical.Project(
        analyzed.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()),
        analyzed)
    }
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val payloadAttrs = payloadCols.map(attr(rPlan, _))
    val payloadOut = payloadAttrs.map(a =>
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        a.name, a.dataType, nullable = true)())
    val rTs = attr(rPlan, tsCol)
    val matchedTs = org.apache.spark.sql.catalyst.expressions.AttributeReference(
      matchedTsCol, rTs.dataType, nullable = true)()
    val node = graft.plans.BroadcastAsOfJoinPlan(
      lPlan, rPlan,
      keyCols.map(attr(lPlan, _)), keyCols.map(attr(rPlan, _)),
      attr(lPlan, tsCol), rTs, attr(rPlan, tieCol),
      payloadAttrs, payloadOut, matchedTs, forward)
    org.apache.spark.sql.GraftDataset.ofRows(spark, node)
  }
}
