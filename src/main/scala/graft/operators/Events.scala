package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-windowed aggregation operators over the events table — the batch
  * analogs of the streaming windows in [[graft.streaming]].
  *
  * Tumbling/sliding use Spark's native `window()` (epoch-aligned, exact
  * bucket arithmetic); sessionization is the gaps-and-islands pattern
  * (lag + cumulative sum), a single shuffle on the session key. Gap
  * comparison uses exact microsecond integers (`unix_micros`) — never
  * second-truncated timestamps — so boundary events land identically in
  * every engine.
  */
object Events {

  /** Maps an event-type column onto the PINNED state list, erroring the
    * job (distributed, inside the one data pass — no extra action) on
    * any observed type outside it. The Markov/pattern operators share
    * their state space with the oracle's static SQL pivot, so an
    * unlisted type must fail loudly: silently filtering it would shrink
    * row totals on the Spark side only (the engines would diverge), and
    * silently passing it through would unbound the driver collect.
    */
  private def pinnedState(c: org.apache.spark.sql.Column,
      states: Seq[String]): org.apache.spark.sql.Column =
    states.tail
      .foldLeft(when(c === states.head, lit(states.head))) {
        (acc, s) => acc.when(c === s, lit(s))
      }
      .otherwise(raise_error(concat(
        lit("event type outside the pinned state list: "), c)))

  /** Tumbling 1-hour windows per event type. */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding 1-hour windows advancing every 30 minutes. */
  def slidingHourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("w_start"), col("n_events"), col("sum_value"))

  /** Sessionization with an inactivity gap, per user. Deterministic
    * ordering on (ts, event_id); session ids are 0-based per user.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapMicros = gapMinutes.toLong * 60L * 1000000L
    val isBreak = when(
      unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser)) > gapMicros, 1
    ).otherwise(0)
    events
      .withColumn("session_id",
        sum(isBreak).over(byUser.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
  }

  /** Sweep-line concurrency: sessionized intervals become ±1 boundary
    * points and the inclusive running sum over the `(ts, delta DESC,
    * user, session)` total order is the number of LIVE sessions at
    * each boundary — the classic interval-overlap shape (peak load,
    * max concurrent users). Closed intervals: a session starting the
    * instant another ends overlaps it, which is exactly the `+1
    * sorts before −1 at equal ts` tiebreak.
    *
    * The running sum routes through [[Stats.rangePrefixSum]] —
    * range-partitioned with per-partition offsets — NOT an
    * unpartitioned `ORDER BY` window, so the sweep stays fully
    * parallel at any scale (boundary table = 2 rows/session).
    * Returns `(ts, delta, cur)`; ties inside one instant yield a
    * deterministic multiset (+1 rows take `c+1..c+p`, −1 rows walk
    * back down), so order-insensitive consumers replay exactly.
    */
  def concurrencySweep(events: DataFrame, gapMinutes: Int = 45): DataFrame = {
    val sess = sessionize(events, gapMinutes)
    val pts = sess.select(col("user_id"), col("session_id"),
        col("session_start").as("ts"), lit(1L).as("delta"))
      .unionByName(sess.select(col("user_id"), col("session_id"),
        col("session_end").as("ts"), lit(-1L).as("delta")))
    Stats.rangePrefixSum(pts,
        Seq(col("ts"), col("delta").desc, col("user_id"), col("session_id")),
        "delta", "cur")
      .select(col("ts"), col("delta"), col("cur"))
  }

  /** Exponentially-weighted trailing average per key, EXACT: the
    * classic EWMA recursion `s_i = (x_i + s_{i-1}) / 2` truncated to a
    * `window`-event tail, computed as the dyadic sum
    * `Σ_{d=0..W-1} lag(x, d) · 2^(W-1-d)` in LONG arithmetic — every
    * weight is a power of two, so the smoothed value is an exact
    * integer numerator over the constant denominator `2^(W-1)` and
    * replays bit-for-bit in any engine. (An untruncated recursion
    * cannot be windowed; the dropped tail's weight is ≤ 2^-W — below
    * one unit for W ≥ 20 at cent scale.)
    *
    * The W lag columns share ONE window definition, so Catalyst
    * evaluates a single per-key ordered pass — same shuffle bound as
    * sessionization (one keyed sort, per-key state = W rows).
    * Overflow bound: `units · 2^W · W` must fit a long — with cent
    * units (< 2^21) and W = 20 that is < 2^46.
    *
    * Output: input keys + ordering columns + `ewma_num` (exact LONG
    * numerator), `ewma` (the one double division).
    */
  def ewmaTrailing(
      events: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      unitsExpr: org.apache.spark.sql.Column,
      window: Int = 20): DataFrame = {
    require(window >= 1 && window <= 40, "window must be in [1, 40]")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col): _*)
    val num = (0 until window).map { d =>
      coalesce(lag(unitsExpr, d).over(w), lit(0L)) * lit(1L << (window - 1 - d))
    }.reduce(_ + _)
    // the weights actually present (ramp-up rows have fewer than W
    // predecessors): a power-of-two partial sum, exact
    val denom = (0 until window).map { d =>
      when(lag(unitsExpr, d).over(w).isNotNull, lit(1L << (window - 1 - d)))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    events.select(
      (keyCol +: orderCols).map(col) :+
        num.as("ewma_num") :+
        (num.cast("double") / denom.cast("double")).as("ewma"): _*)
  }

  /** Hourly gap-fill (resample + fill-forward): one row per user per
    * hour between their first and last event, carrying the latest
    * reading at-or-before each grid point — the time-series
    * regularization step before windowed features or charting.
    *
    * Composition of existing scale shapes: the per-user hour grid is
    * generated map-side from the bounds aggregate (`sequence` +
    * `explode` — no shuffle beyond the bounds groupBy), then ONE
    * [[AsOf.asofJoin]] attaches the carried reading (single keyed
    * shuffle, no pair expansion). Grid points before a user's first
    * event carry nulls.
    */
  def gapFillHourly(events: DataFrame): DataFrame = {
    val bounds = events.groupBy(col("user_id"))
      .agg(min(col("ts")).as("__t0"), max(col("ts")).as("__t1"))
    val grid = bounds.select(col("user_id"),
      explode(sequence(date_trunc("hour", col("__t0")), col("__t1"),
        expr("INTERVAL 1 HOUR"))).as("ts"))
    AsOf.asofJoin(
      grid,
      events.select(col("user_id"), col("ts"),
        col("event_id").as("src_event_id"), col("value").as("carried_value")),
      Seq("user_id"), "ts",
      tieCol = "src_event_id", payloadCols = Seq("src_event_id", "carried_value"))
  }

  /** Per-user running sum over time — window-function shape (no shuffle
    * beyond the partition key).
    */
  def runningSum(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    events.select(
      col("user_id"), col("event_id"), col("ts"),
      round(sum(col("value")).over(w), 2).as("running_value"))
  }

  /** First-order Markov transition counts: how often each event type is
    * immediately followed by each other type within a user's timeline —
    * the sequential-pattern statistic behind next-action prediction,
    * funnel discovery, and bot detection (self-loop-heavy users).
    * `prob_ppm` is the conditional transition frequency
    * P(next | prev) in exact integer parts-per-million.
    *
    * Shape at 100 TB: one shuffle on the user key (the lag window —
    * per-user timelines are the parallelism unit, as for
    * sessionization), then a count shuffle into at most |types|²
    * groups with map-side partials; the row-count denominator rides a
    * window over those tiny groups. Deterministic ordering on
    * (ts, event_id) so simultaneous events transition identically in
    * every engine.
    */
  def transitionCounts(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val counts = events
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    counts.withColumn(
      "prob_ppm", expr("n * 1000000L div sum(n) OVER (PARTITION BY prev_type)"))
  }

  /** Rate-spike detection: hourly event counts per type, compared to
    * the TRAILING `lookbackHours`-hour mean — the pipeline-monitoring
    * alarm ("this feed just tripled") and the DQ twin of
    * [[graft.operators.Quality.categoricalDrift]] on the time axis.
    * A bucket spikes when `n · cnt · spikeDen > sum · spikeNum` (i.e.
    * n > (num/den)·trailing-mean, cross-multiplied — exact integers,
    * no float ratio). Buckets with NO trailing history (the stream's
    * first hours) are flagged 0: no baseline, no alarm.
    *
    * Shape at 100 TB: one combinable (type, hour) count — reduce
    * volume = types × hours, corpus-independent — then a RANGE-frame
    * window over each type's hour series (tiny). The raw stream is
    * touched once.
    */
  def rateSpikes(
      events: DataFrame,
      lookbackHours: Int = 24,
      spikeNum: Long = 3,
      spikeDen: Long = 2): DataFrame = {
    require(lookbackHours >= 1 && spikeNum > 0 && spikeDen > 0)
    val hourly = events
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("epoch_hour"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("epoch_hour"))
      .rangeBetween(-lookbackHours.toLong, -1L)
    hourly.select(
      col("event_type"), col("epoch_hour"), col("n"),
      coalesce(sum(col("n")).over(w), lit(0L)).as("trail_sum"),
      count(col("n")).over(w).as("trail_cnt"))
      .withColumn("is_spike",
        (col("trail_cnt") > 0 &&
          col("n") * col("trail_cnt") * spikeDen > col("trail_sum") * spikeNum)
          .cast("int"))
  }

  /** Ordered funnel: per user, the earliest completion time of each
    * stage, where stage i+1 must occur STRICTLY AFTER the user's
    * earliest stage-i completion — the conversion analysis every event
    * pipeline runs (view → click → purchase), with the ordering
    * constraint that distinguishes a funnel from three independent
    * mins. Unreached stages are null; timestamps pass through
    * untouched, so the result hashes identically cross-engine.
    *
    * Shape at 100 TB: one keyed min-aggregation per stage, each
    * joined on the user key against the (users-sized, not
    * events-sized) previous stage — `stages` keyed shuffles of
    * monotonically shrinking tables, no window over raw events.
    */
  def funnel(
      events: DataFrame,
      stages: Seq[String],
      typeCol: String = "event_type",
      userCol: String = "user_id",
      tsCol: String = "ts",
      maxGapHours: Option[Int] = None): DataFrame = {
    require(stages.size >= 2, "a funnel needs at least 2 stages")
    require(maxGapHours.forall(_ > 0), "maxGapHours must be positive")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as(s"t_${stages.head}"))
    val reached = stages.zipWithIndex.tail.foldLeft(first) {
      case (prev, (stage, i)) =>
        val prevTs = col(s"t_${stages(i - 1)}")
        // optional attribution window: the next stage must land within
        // maxGapHours of the previous stage's first hit — the bounded
        // form product funnels use ("converted within 24h")
        val within = maxGapHours
          .map(h => col("__t") <= prevTs + expr(s"INTERVAL $h HOURS"))
          .getOrElse(lit(true))
        val nxt = events.filter(col(typeCol) === stage)
          .select(col(userCol), col(tsCol).as("__t"))
          .join(prev.select(col(userCol), prevTs), Seq(userCol))
          .where(col("__t") > prevTs && within)
          .groupBy(col(userCol))
          .agg(min(col("__t")).as(s"t_$stage"))
        prev.join(nxt.select(col(userCol), col(s"t_$stage")), Seq(userCol), "left")
    }
    reached
  }

  /** Weekly retention cohorts: users grouped by the ISO week of their
    * FIRST event, counted distinctly in each subsequent week offset
    * (`floor(days since first / 7)`) they were active — the retention
    * matrix growth teams read. All integer arithmetic on non-negative
    * day differences, so the matrix hashes identically cross-engine.
    *
    * Shape at 100 TB: one keyed min per user, one distinct over
    * (user, offset) rows (combinable), one final count — the raw
    * stream is scanned twice, everything after is user-sized.
    */
  def retentionCohorts(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val first = events.groupBy(col(userCol))
      .agg(min(col(tsCol)).as("__first"))
      .select(col(userCol), col("__first"),
        to_date(date_trunc("week", col("__first"))).as("cohort_week"))
    events.select(col(userCol), to_date(col(tsCol)).as("__d"))
      .join(first, Seq(userCol))
      .select(col(userCol), col("cohort_week"),
        expr("datediff(__d, to_date(__first)) div 7").as("week_offset"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Last-touch revenue attribution: each conversion is credited to
    * the user's most recent preceding touch event (ties on the exact
    * timestamp break by event_id, the same total order both engines
    * sort by); conversions with no prior touch credit `direct`.
    *
    * This is the as-of-join pattern expressed as a single per-user
    * ordered window — union the two event classes, carry the last
    * non-null touch forward (`last(..., ignoreNulls)`), keep the
    * conversion rows. One shuffle on user_id, window state is one
    * value per user; revenue folds in exact cents. At 100 TB the
    * per-user partition is a user's event history — thousands of
    * rows, never table-scale.
    */
  /** Rolling 7-day distinct active users (WAU) per calendar day,
    * EXACT and combinable: reduce to distinct (user, day) first, then
    * explode each user-day into the 7 window-end days it supports and
    * count distinct again. No sliding `count_distinct` window (which
    * can't partial-aggregate) and no day-by-day self-join — the
    * expansion factor is the fixed window length, applied AFTER the
    * user-day dedup, so the exploded set is 7·|user-days| regardless
    * of raw event volume. Both distincts are shuffle-partial-able;
    * this is how rolling MAU/WAU stays linear at 100 TB.
    */
  def rollingActiveUsers(events: DataFrame, windowDays: Int = 7): DataFrame =
    rollingActiveFromUserDays(
      events.select(col("user_id"), to_date(col("ts")).as("d")).distinct(),
      windowDays)

  /** [[rollingActiveUsers]] from an already-deduped `(user_id, d)`
    * table — the INCREMENTALLY-MAINTAINABLE form: the user-day set
    * grows append-only (a new event's user-day either exists or
    * anti-joins in), so a maintained warehouse table of user-days
    * turns WAU refresh into O(delta) ingest + this aggregate, never a
    * raw-history rescan.
    */
  def rollingActiveFromUserDays(userDays: DataFrame, windowDays: Int): DataFrame =
    userDays
      .select(col("user_id"),
        explode(expr(s"sequence(d, date_add(d, ${windowDays - 1}))")).as("w_day"))
      .distinct()
      .groupBy("w_day").agg(count(lit(1)).as("wau"))

  /** Day-grain OHLC bars in exact cents WITHOUT a window: open/close
    * ride order-carrying struct min/max — `min(struct(ts, event_id,
    * cents))` picks the lexicographically-first (earliest) event and
    * carries its price along — so the whole bar is ONE combinable
    * aggregate pass with map-side partials (struct min/max is not
    * hash-aggregable, so Spark plans SortAggregate, but partial
    * aggregation before the exchange — the property that matters at
    * scale — is preserved; a per-key ordered window would instead
    * move every raw event through the shuffle).
    */
  def ohlcBars(events: DataFrame, priceType: String = "purchase"): DataFrame =
    events.filter(col("event_type") === priceType)
      .select(to_date(col("ts")).as("d"), col("ts"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy("d")
      .agg(
        min(struct(col("ts"), col("event_id"), col("cents")))
          .getField("cents").as("open_c"),
        max(struct(col("ts"), col("event_id"), col("cents")))
          .getField("cents").as("close_c"),
        max("cents").as("high_c"), min("cents").as("low_c"),
        count(lit(1)).as("n_trades"), sum("cents").as("volume_c"))

  /** Time-weighted average value per user, entirely in integers: each
    * event's value holds until the user's next event (lead), weights
    * are whole seconds (floor), and the TWAP is one terminal integer
    * floor division of exact sums — numerator/denominator are
    * surfaced so downstream can re-weight without re-scanning. The
    * last event per user has no successor and drops out (standard
    * left-Riemann TWAP over the observed span). One shuffle on
    * user_id; per-user partitions are history-sized.
    */
  def timeWeightedAverage(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"),
        unix_micros(col("ts")).as("us"))
      .withColumn("next_us", lead(col("us"), 1).over(w))
      .filter(col("next_us").isNotNull)
      .withColumn("dur_s", expr("(next_us - us) div 1000000"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_spans"),
        sum("dur_s").as("total_s"),
        sum(col("cents") * col("dur_s")).as("wsum_cs"))
      .withColumn("twap_c",
        when(col("total_s") > 0, expr("wsum_cs div total_s")))
  }

  /** Linear (multi-touch) attribution: each conversion's credit
    * splits equally across ALL of the user's strictly-preceding
    * touches, on the ppm grid — `1e6·n_channel div n_total` per
    * conversion, floor division on non-negatives so every engine
    * agrees (the ≤(channels−1) ppm rounding remainder per conversion
    * is documented, not hidden). Touch counts ride per-channel
    * running-sum windows over the same (ts, event_id) total order the
    * last-touch form uses; conversions with no prior touch credit
    * `direct` in full. One shuffle on user_id.
    */
  def linearAttribution(
      events: DataFrame,
      touches: Seq[String],
      conversion: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val base = events
      .filter(col("event_type").isin(touches :+ conversion: _*))
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val counted = touches.foldLeft(base) { (df, t) =>
      // an empty preceding frame sums to NULL, not 0 — a user's very
      // first event would otherwise drop out of every credit branch
      df.withColumn(s"__n_$t",
        coalesce(sum(when(col("event_type") === t, 1L).otherwise(0L)).over(w),
          lit(0L)))
    }
    val tot = touches.map(t => col(s"__n_$t")).reduce(_ + _)
    val conv = counted.filter(col("event_type") === conversion)
      .withColumn("__tot", tot)
    val credits = touches.map { t =>
      sum(when(col("__tot") > 0,
        expr(s"1000000 * __n_$t div __tot")).otherwise(0L)).as(s"__c_$t")
    } :+ sum(when(col("__tot") === 0, 1000000L).otherwise(0L)).as("__c_direct")
    val one = conv.agg(credits.head, credits.tail: _*)
    val stackArgs = (touches.map(t => s"'$t', __c_$t") :+ "'direct', __c_direct")
      .mkString(", ")
    one.select(expr(
      s"stack(${touches.size + 1}, $stackArgs) AS (channel, credit_ppm)"))
  }

  /** Time-decay (half-life) attribution on the DAY grain, exactly:
    * a touch `dd` days before a conversion earns weight 2^(H−1−dd)
    * (half-life = 1 day, horizon H days) — power-of-two weights keep
    * the whole credit ledger on the integer grid, where exp(−λΔt)
    * would drift between engines. Each conversion-day's revenue splits
    * across channels proportionally to their decayed touch weight
    * (floor division; the ≤(channels−1)-cent remainder per conversion
    * is documented, not hidden); conversions with no in-horizon touch
    * credit `direct`. Day grain means same-day touches count
    * regardless of intra-day order — the standard daily marketing
    * model.
    *
    * Scale shape: touches fold to (user, day, channel) counts map-side
    * FIRST; the horizon explode (×H) runs on that bounded aggregate,
    * never on raw events — Σ n·2^(H−1−dd) per (user, conv-day,
    * channel) is then one combinable aggregation, and conversions join
    * by (user, day) equi-keys. No windows, no per-pair expansion of
    * raw history. Int64 headroom: cents·w wraps only past ~2^63/2^H
    * cents on one user-day — documented, not paid for in decimal.
    */
  def decayAttribution(
      events: DataFrame,
      touches: Seq[String],
      conversion: String,
      horizonDays: Int = 14): DataFrame = {
    require(horizonDays >= 1 && horizonDays <= 62)
    val t = events.filter(col("event_type").isin(touches: _*))
      .groupBy(col("user_id"), to_date(col("ts")).as("td"),
        col("event_type").as("ch"))
      .agg(count(lit(1)).as("n"))
    val ex = t
      .select(col("user_id"), col("td"), col("ch"), col("n"),
        explode(sequence(lit(0), lit(horizonDays - 1))).as("i"))
      .select(col("user_id"), expr("date_add(td, i)").as("cd"), col("ch"),
        expr(s"n * shiftleft(CAST(1 AS BIGINT), ${horizonDays - 1} - i)").as("w"))
    val wAgg = ex.groupBy("user_id", "cd")
      .agg(touches.map(c =>
        sum(when(col("ch") === c, col("w")).otherwise(0L)).as(s"__w_$c")).head,
        touches.tail.map(c =>
          sum(when(col("ch") === c, col("w")).otherwise(0L)).as(s"__w_$c")): _*)
    val conv = events.filter(col("event_type") === conversion)
      .groupBy(col("user_id"), to_date(col("ts")).as("cd"))
      .agg(sum(round(col("value") * 100).cast("long")).as("__cents"))
    val wtot = touches.map(c => coalesce(col(s"__w_$c"), lit(0L))).reduce(_ + _)
    val j = conv.join(wAgg, Seq("user_id", "cd"), "left")
      .withColumn("__wtot", wtot)
    val credits = touches.map { c =>
      sum(when(col("__wtot") > 0,
        expr(s"__cents * coalesce(__w_$c, 0) div __wtot")).otherwise(0L))
        .as(s"__c_$c")
    } :+ sum(when(col("__wtot") === 0, col("__cents")).otherwise(0L)).as("__c_direct")
    val one = j.agg(credits.head, credits.tail: _*)
    val stackArgs = (touches.map(c => s"'$c', __c_$c") :+ "'direct', __c_direct")
      .mkString(", ")
    one.select(expr(
      s"stack(${touches.size + 1}, $stackArgs) AS (channel, credit_cents)"))
  }

  def lastTouchAttribution(
      events: DataFrame,
      touches: Seq[String],
      conversion: String): DataFrame = {
    val u = events
      .filter(col("event_type").isin(touches :+ conversion: _*))
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        col("value"),
        when(col("event_type").isin(touches: _*), col("event_type")).as("__touch"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    u.withColumn("channel", last(col("__touch"), ignoreNulls = true).over(w))
      .filter(col("event_type") === conversion)
      .groupBy(coalesce(col("channel"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(round(col("value") * 100).cast("long")).as("revenue_c"))
  }

  /** Linear interpolation of a sparse day-grain series onto the dense
    * daily calendar between its first and last observation — the
    * standard time-series regularization before any fixed-step model
    * (seasonal naive, EWMA, rolling windows all assume a dense grid).
    *
    * Exact integer arithmetic: the interpolated value is
    * `v0 + (v1 − v0)·offset ÷ gap` with the division SIGN-SPLIT
    * (`sign · (|numerator| div gap)`) because Spark's `div` truncates
    * toward zero while DuckDB's `//` floors — on negative slopes the
    * two disagree by one unit unless the operand is made non-negative
    * first. Observed days pass through untouched (`observed = 1`).
    *
    * Scale shape: the input is a DAY-GRAIN aggregate — calendar-bounded
    * (a decade is ~3.7k rows at any scale factor), so the unpartitioned
    * lead() window and the per-segment explode are metadata-scale by
    * construction, same argument as the seasonal-naive series ops.
    */
  def interpolateDaily(series: DataFrame, dayCol: String, valCol: String): DataFrame = {
    val w = Window.orderBy(col("d0"))
    val withNext = series.select(col(dayCol).as("d0"), col(valCol).as("v0"))
      .withColumn("d1", lead(col("d0"), 1).over(w))
      .withColumn("v1", lead(col("v0"), 1).over(w))
    val seg = withNext.where(col("d1").isNotNull)
      .select(col("d0"), col("v0"), col("d1"), col("v1"),
        explode(sequence(col("d0"), date_sub(col("d1"), 1))).as("day"))
    val gap = datediff(col("d1"), col("d0")).cast("long")
    val off = datediff(col("day"), col("d0")).cast("long")
    val num = (col("v1") - col("v0")) * off
    val quot = when(num >= 0, expr("__num div __gap"))
      .otherwise(-expr("(-__num) div __gap"))
    val interpolated = seg
      .withColumn("__num", num).withColumn("__gap", gap)
      .select(col("day"),
        (col("v0") + quot).as(valCol),
        when(col("day") === col("d0"), 1).otherwise(0).as("observed"))
    val last = withNext.where(col("d1").isNull)
      .select(col("d0").as("day"), col("v0").as(valCol), lit(1).as("observed"))
    interpolated.unionByName(last)
  }

  /** Stationary distribution of the first-order event-type Markov
    * chain — "where does a user's session settle" — by `iters` power
    * iterations v ← v·P from the uniform start.
    *
    * Scale shape: ALL data work is [[transitionCounts]]' one keyed
    * window + combinable aggregate; what reaches the driver is the
    * k×k count matrix (k = event-type cardinality — single digits; a
    * metadata-sized collect by construction, same adjudication as PQ
    * codebooks). The iteration itself is k²-flop driver arithmetic.
    *
    * Cross-engine float discipline: P entries are the ONE operation
    * `n_double / rowtotal`, the start vector is `1.0/k` over the
    * PINNED `states` list (config shared verbatim with the oracle —
    * never derived from observed transitions, which could shrink k on
    * a data epoch where a type never transitions), and each
    * iteration's component is a LEFT-TO-RIGHT sum over states in
    * ALPHABETICAL order — the exact expression tree
    * [[graft.OracleSql.markovStationary]] unrolls per iteration, so
    * 20 iterations of doubles are bit-identical in both engines.
    */
  def markovStationary(
      events: DataFrame,
      states: Seq[String],
      iters: Int = 20): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    // the state space is pinned CONFIG shared verbatim with the oracle
    // (the blocklist discipline), NOT derived from observed
    // transitions: a type that never appears inside a transition on
    // some data epoch would otherwise shrink k and shift the uniform
    // start, diverging from the oracle's fixed pivot
    require(states.nonEmpty && states == states.sorted && states.distinct == states,
      "states must be a sorted, duplicate-free pinned list")
    // completeness is ENFORCED, not assumed: every transition endpoint
    // routes through the pinnedState when-chain, whose otherwise-branch
    // raises — an observed type outside the pinned list fails the job
    // instead of silently dropping transition mass the oracle's
    // denominators still count. The collect is thereby bounded by k²
    // regardless of the data's event-type cardinality.
    val counts = transitionCounts(events)
      .select(pinnedState(col("prev_type"), states).as("prev_type"),
        pinnedState(col("next_type"), states).as("next_type"), col("n"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    val rowTot = states.map(s =>
      s -> states.map(t => counts.getOrElse((s, t), 0L)).sum).toMap
    def p(s: String, t: String): Double =
      if (rowTot(s) == 0L) 0.0
      else counts.getOrElse((s, t), 0L).toDouble / rowTot(s).toDouble
    var v = states.map(_ => 1.0 / states.size)
    for (_ <- 0 until iters) {
      v = states.map(t =>
        states.zip(v).map { case (s, vs) => vs * p(s, t) }
          .foldLeft(0.0)(_ + _)) // left-to-right, alphabetical: pinned
    }
    val spark = events.sparkSession
    import spark.implicits._
    states.zip(v).toDF("state", "prob")
  }

  /** Absorption probability of the session chain: for every state, the
    * probability of REACHING `absorbing` (e.g. purchase) within
    * `iters` steps — "how likely does a session starting in an error
    * convert", the funnel question asked of the whole chain rather
    * than one fixed path.
    *
    * Same machinery and float discipline as [[markovStationary]]: the
    * k×k matrix is the only collect, v_absorbing is pinned at 1.0 and
    * every other component folds Σ_r P(s,r)·v_r left-to-right in
    * alphabetical state order — the tree
    * [[graft.OracleSql.markovAbsorption]] unrolls verbatim. Rows with
    * no outgoing transitions absorb nothing (substochastic: v = 0).
    */
  def markovAbsorption(
      events: DataFrame,
      states: Seq[String],
      absorbing: String,
      iters: Int = 20): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    require(states.nonEmpty && states == states.sorted && states.distinct == states,
      "states must be a sorted, duplicate-free pinned list")
    require(states.contains(absorbing), "absorbing state must be in the list")
    // same enforced-completeness collect as [[markovStationary]]
    val counts = transitionCounts(events)
      .select(pinnedState(col("prev_type"), states).as("prev_type"),
        pinnedState(col("next_type"), states).as("next_type"), col("n"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    val rowTot = states.map(s =>
      s -> states.map(t => counts.getOrElse((s, t), 0L)).sum).toMap
    def p(s: String, t: String): Double =
      if (rowTot(s) == 0L) 0.0
      else counts.getOrElse((s, t), 0L).toDouble / rowTot(s).toDouble
    var v = states.map(s => if (s == absorbing) 1.0 else 0.0)
    for (_ <- 0 until iters) {
      v = states.map { s =>
        if (s == absorbing) 1.0
        else states.zip(v).map { case (r, vr) => p(s, r) * vr }
          .foldLeft(0.0)(_ + _)
      }
    }
    val spark = events.sparkSession
    import spark.implicits._
    states.zip(v).toDF("state", "p_absorb")
  }

  /** Expected number of steps a session takes before reaching
    * `absorbing`, truncated at an `iters`-step horizon — the funnel
    * readout that completes [[markovAbsorption]]'s "how likely does it
    * convert" with "and how long does it wander first".
    *
    * Same machinery and float discipline as its siblings: the k×k
    * matrix is the only collect (completeness enforced by the
    * pinnedState chain), v_absorbing is pinned at 0.0 (an absorbed
    * chain takes no more steps) and every other component folds
    * 1 + Σ_r P(s,r)·v_r left-to-right in alphabetical state order —
    * the tree [[graft.OracleSql.markovSteps]] unrolls verbatim.
    * Substochastic convention (as in [[markovAbsorption]]): dead-end
    * rows (no outgoing transitions) settle at exactly 1.0 — the one
    * step the recursion charges before their continuation mass
    * vanishes.
    */
  def markovSteps(
      events: DataFrame,
      states: Seq[String],
      absorbing: String,
      iters: Int = 20): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    require(states.nonEmpty && states == states.sorted && states.distinct == states,
      "states must be a sorted, duplicate-free pinned list")
    require(states.contains(absorbing), "absorbing state must be in the list")
    val counts = transitionCounts(events)
      .select(pinnedState(col("prev_type"), states).as("prev_type"),
        pinnedState(col("next_type"), states).as("next_type"), col("n"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    val rowTot = states.map(s =>
      s -> states.map(t => counts.getOrElse((s, t), 0L)).sum).toMap
    def p(s: String, t: String): Double =
      if (rowTot(s) == 0L) 0.0
      else counts.getOrElse((s, t), 0L).toDouble / rowTot(s).toDouble
    var v = states.map(_ => 0.0)
    for (_ <- 0 until iters) {
      v = states.map { s =>
        if (s == absorbing) 0.0
        else 1.0 + states.zip(v).map { case (r, vr) => p(s, r) * vr }
          .foldLeft(0.0)(_ + _)
      }
    }
    val spark = events.sparkSession
    import spark.implicits._
    states.zip(v).toDF("state", "exp_steps")
  }

  /** Ordered-subsequence support mining (the PrefixSpan question at
    * fixed pattern length): for each pinned (a, b, c) triple, how many
    * users exhibit a-then-b-then-c as a SUBSEQUENCE of their timeline
    * (arbitrary gaps allowed — the regex counter
    * [[eventPatternCounts]] asks about contiguous-window shapes;
    * this asks about existence across the whole history).
    *
    * Existence test without materializing subsequence candidates:
    * a≺b≺c holds for a user iff some b-timestamp lies strictly
    * between the user's FIRST a and LAST c — so per (user, type) the
    * operator needs only (first, last, sorted ts list), and the list
    * is probed with one codegen'd EXISTS lambda. Per-user work is
    * |pinned types| entries, never activity²; candidate triples are
    * CONFIG, so the support aggregation is k-bounded and combinable.
    *
    * Shape at 100 TB: one (user, type) aggregate (per-user lists
    * bounded by that user's own activity — the sessionize contract),
    * one per-user map assembly, one combinable support count joined
    * back onto the pinned triple list (triples nobody supports emit 0,
    * not absence). Timestamps compare as exact microsecond integers.
    */
  def subsequenceSupport(
      events: DataFrame,
      triples: Seq[(String, String, String)]): DataFrame = {
    require(triples.nonEmpty, "need at least one pattern triple")
    val types = triples.flatMap(t => Seq(t._1, t._2, t._3)).distinct
    val perUserType = events
      .where(col("event_type").isin(types: _*))
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        min(unix_micros(col("ts"))).as("first_us"),
        max(unix_micros(col("ts"))).as("last_us"),
        array_sort(collect_list(unix_micros(col("ts")))).as("tsl"))
    val byUser = perUserType
      .groupBy("user_id")
      .agg(map_from_entries(collect_list(struct(
        col("event_type"),
        struct(col("first_us"), col("last_us"), col("tsl"))))).as("m"))
    val tripleLits = array(triples.map { case (a, b, c) =>
      struct(lit(a).as("a"), lit(b).as("b"), lit(c).as("c"))
    }: _*)
    val supported = byUser
      .select(explode(tripleLits).as("t"), col("m"))
      .select(col("t.a").as("a"), col("t.b").as("b"), col("t.c").as("c"),
        element_at(col("m"), col("t.a")).as("ea"),
        element_at(col("m"), col("t.b")).as("eb"),
        element_at(col("m"), col("t.c")).as("ec"))
      .where(col("ea").isNotNull && col("eb").isNotNull && col("ec").isNotNull &&
        exists(col("eb.tsl"),
          x => x > col("ea.first_us") && x < col("ec.last_us")))
      .groupBy("a", "b", "c")
      .agg(count(lit(1)).as("n_support"))
    val spark = events.sparkSession
    import spark.implicits._
    val allTriples = triples.toDF("a", "b", "c")
    val nUsers = events.select(countDistinct(col("user_id")).as("n_users"))
    allTriples
      .join(supported, Seq("a", "b", "c"), "left")
      .crossJoin(broadcast(nUsers))
      .select(col("a"), col("b"), col("c"),
        coalesce(col("n_support"), lit(0L)).as("n_support"),
        col("n_users"),
        expr("coalesce(n_support, 0L) * 1000000L div n_users").as("support_ppm"))
  }

  /** Ordered-subsequence support at ARBITRARY pinned length k — the
    * generalization of [[subsequenceSupport]] past triples (whose
    * first/last-EXISTS trick does not extend): for each pinned pattern
    * (p₁ … p_k), how many users exhibit it as a strictly
    * time-increasing subsequence of their timeline.
    *
    * One greedy left-to-right fold per user decides existence: walking
    * the (ts, event_id)-sorted timeline, state[i] holds the EARLIEST
    * timestamp at which the length-i prefix completes; an event of type
    * p_i with t strictly past state[i−1] sets state[i] on first
    * opportunity. Greedy-earliest is exact for subsequence existence
    * (matching a prefix as early as possible only widens the suffix's
    * choices), so state[k] non-null ⟺ the user supports the pattern —
    * no candidate subsequences are ever materialized.
    *
    * Strict-time semantics: successive pattern positions need strictly
    * increasing TIMESTAMPS (two events sharing a timestamp cannot chain)
    * — the rule both engines replay without consulting tie-break ids.
    *
    * Shape at 100 TB: one (user) aggregate building a timeline bounded
    * by that user's own activity (the sessionize contract, same as
    * [[eventPatternCounts]]), then a per-user O(|timeline|·k) fold —
    * linear per user, patterns are CONFIG — and one combinable support
    * count. Unsupported patterns emit 0, not absence.
    */
  def subsequenceSupportK(
      events: DataFrame,
      patterns: Seq[Seq[String]]): DataFrame = {
    require(patterns.nonEmpty, "need at least one pattern")
    require(patterns.forall(_.size >= 2), "patterns are ordered sequences (length >= 2)")
    val types = patterns.flatten.distinct
    val timelines = events
      .where(col("event_type").isin(types: _*))
      .groupBy("user_id")
      .agg(array_sort(collect_list(struct(
        unix_micros(col("ts")).as("t"),
        col("event_id").as("e"),
        col("event_type").as("y")))).as("tl"))
    val withMatch = patterns.zipWithIndex.foldLeft(timelines) { case (df, (p, i)) =>
      val k = p.size
      val patArr = array(p.map(lit): _*)
      val init = array_repeat(lit(null).cast("long"), k)
      val folded = aggregate(col("tl"), init, (acc, x) =>
        transform(acc, (v, idx) => {
          // prefix i−1's completion time; the idx=0 read is a dummy
          // (valid index 1) that the OR's left side makes irrelevant
          val prev = element_at(acc, when(idx > lit(0), idx).otherwise(lit(1)))
          coalesce(v, when(
            x("y") === element_at(patArr, idx + 1) &&
              (idx === lit(0) || (prev.isNotNull && x("t") > prev)),
            x("t")))
        }))
      df.withColumn(s"__m$i", element_at(folded, k).isNotNull)
    }
    val aggCols = count(lit(1)).as("__nu") +:
      patterns.indices.map(i => sum(col(s"__m$i").cast("long")).as(s"__s$i"))
    val agged = withMatch.agg(aggCols.head, aggCols.tail: _*)
    // total users over the WHOLE table (consistent with
    // subsequenceSupport's denominator), not just users of pinned types
    val nUsers = events.select(countDistinct(col("user_id")).as("n_users"))
    agged.crossJoin(broadcast(nUsers))
      .select(explode(array(patterns.zipWithIndex.map { case (p, i) =>
        struct(lit(p.mkString(">")).as("pattern"),
          coalesce(col(s"__s$i"), lit(0L)).as("n_support"))
      }: _*)).as("r"), col("n_users"))
      .select(col("r.pattern").as("pattern"),
        col("r.n_support").as("n_support"),
        col("n_users"),
        expr("r.n_support * 1000000L div n_users").as("support_ppm"))
  }

  /** [[subsequenceSupportK]] with a MAX-GAP bound: adjacent pattern
    * positions must land within `maxGapUs` microseconds. Greedy-earliest
    * is NOT exact here (a later prefix completion can open a gap window
    * an earlier one already closed), so this runs the exact set-valued
    * DP as k−1 candidate-bounded range joins: Mᵢ = distinct (user, t)
    * of type pᵢ reachable from Mᵢ₋₁ within the gap. Each frontier is
    * deduplicated, so |Mᵢ| ≤ |events of type pᵢ| — work is bounded by
    * the pinned types' row counts, never by path multiplicity (the
    * thing a naive k-way join explodes on).
    *
    * Shape at 100 TB: k−1 keyed joins on user_id (range predicate
    * rides the join filter), each frontier type-filtered at the scan;
    * patterns are CONFIG. Same strict-time chaining and same output
    * shape as [[subsequenceSupportK]].
    */
  def subsequenceSupportGap(
      events: DataFrame,
      patterns: Seq[Seq[String]],
      maxGapUs: Long): DataFrame = {
    require(patterns.nonEmpty, "need at least one pattern")
    require(patterns.forall(_.size >= 2), "patterns are ordered sequences (length >= 2)")
    require(maxGapUs > 0, "gap bound must be positive")
    val types = patterns.flatten.distinct
    val e = events.where(col("event_type").isin(types: _*))
      .select(col("user_id"), col("event_type").as("y"),
        unix_micros(col("ts")).as("t"))
    val spark = events.sparkSession
    import spark.implicits._
    val perPattern = patterns.map { p =>
      val m0 = e.where(col("y") === p.head).select("user_id", "t")
      val last = p.tail.foldLeft(m0) { (m, ty) =>
        val probe = m.select(col("user_id").as("__mu"), col("t").as("__mt"))
        e.where(col("y") === ty)
          .join(probe, col("user_id") === col("__mu") &&
            col("t") > col("__mt") && col("t") - col("__mt") <= maxGapUs)
          .select("user_id", "t").distinct()
      }
      last.agg(countDistinct(col("user_id")).as("n_support"))
        .select(lit(p.mkString(">")).as("pattern"),
          coalesce(col("n_support"), lit(0L)).as("n_support"))
    }.reduce(_ unionByName _)
    val nUsers = events.select(countDistinct(col("user_id")).as("n_users"))
    perPattern.crossJoin(broadcast(nUsers))
      .select(col("pattern"), col("n_support"), col("n_users"),
        expr("n_support * 1000000L div n_users").as("support_ppm"))
  }

  /** MATCH_RECOGNIZE-lite: per-user event-sequence pattern counting by
    * encoding each user's (ts, event_id)-ordered event-type INITIALS
    * as one string and counting non-overlapping regex matches — the
    * "view, at most two detours, then purchase" class of funnel
    * questions that adjacency transitions and time-bounded funnels
    * both miss.
    *
    * Scale shape: one groupBy — the per-user string is bounded by that
    * user's OWN activity (the sessionize contract; a 100 TB corpus is
    * wide in users, not deep per user), and the regex runs codegen'd
    * per group row, not per event. Patterns must stay in the
    * portable-regex subset (literals, char classes, bounded
    * quantifiers) where Java's and RE2's leftmost-greedy scan agree;
    * both engines advance past each match, so overlap semantics pin
    * identically.
    *
    * Symbol aliasing is EXCLUDED by contract, not assumed away: the
    * pinned `states` list must have pairwise-distinct initials (driver
    * require — two types sharing a first character would silently
    * alias into one regex symbol), and any observed type outside the
    * list errors the job inside the data pass (the same pinnedState
    * chain the Markov family uses).
    */
  def eventPatternCounts(
      events: DataFrame,
      patterns: Seq[(String, String)],
      states: Seq[String]): DataFrame = {
    require(patterns.nonEmpty, "need at least one pattern")
    require(states.nonEmpty && states.distinct == states,
      "states must be a duplicate-free pinned list")
    val initials = states.map(_.take(1))
    require(initials.distinct == initials,
      s"pinned event types must have distinct initials (got: ${states.mkString(", ")})" +
        " — two types sharing a first character would alias into one regex symbol")
    val seqd = events
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        array_join(transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"),
            substring(pinnedState(col("event_type"), states.sorted), 1, 1).as("ch")))),
          x => x("ch")), "").as("seq"))
    val withCounts = patterns.foldLeft(seqd) { case (df, (name, pat)) =>
      df.withColumn(name, regexp_count(col("seq"), lit(pat)))
    }
    withCounts.select(col("user_id") +: col("n_events") +:
      patterns.map(p => col(p._1)): _*)
  }
}
