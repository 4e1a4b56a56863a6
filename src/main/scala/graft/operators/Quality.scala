package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.PortableMinHash

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

  /** Adaptive per-group quality gate: keep rows whose `metricCol` is
    * at-or-above their group's `fraction` discrete percentile — "drop
    * the worst quartile of every source" with the cutoff LEARNED per
    * group rather than hard-coded, so heterogeneous sources (a wiki
    * dump vs a web crawl) are each trimmed against their own
    * distribution. The standard adaptive form of corpus quality
    * filtering.
    *
    * `percentile_disc` picks an actual data value (no interpolation
    * arithmetic), so the cutoff — and therefore the kept set — is
    * bit-reproducible on any engine. Cutoffs are one tiny aggregate
    * (|groups| rows) broadcast back onto the table: one shuffle for
    * the percentile sort, a broadcast probe for the gate; the big
    * table is never re-shuffled.
    *
    * @return the kept rows with the group's cutoff appended
    *         (`<metricCol>_cut`).
    */
  def adaptivePercentileGate(
      df: DataFrame,
      metricCol: String,
      groupCol: String,
      fraction: Double): DataFrame = {
    require(fraction > 0.0 && fraction < 1.0, "fraction must be in (0,1)")
    val spark = df.sparkSession
    val v = graft.Views.unique("apg")
    df.createOrReplaceTempView(v)
    val cuts =
      try spark.sql(
        s"SELECT $groupCol, percentile_disc($fraction) WITHIN GROUP (ORDER BY $metricCol) " +
          s"AS ${metricCol}_cut FROM $v GROUP BY $groupCol")
        // percentile_disc picks a data value but Spark types it DOUBLE;
        // the cast back to the metric's type is lossless and keeps the
        // cutoff column dtype-aligned with the metric on every engine
        .withColumn(s"${metricCol}_cut",
          col(s"${metricCol}_cut").cast(df.schema(metricCol).dataType))
      finally spark.catalog.dropTempView(v)
    df.join(broadcast(cuts), Seq(groupCol))
      .filter(col(metricCol) >= col(s"${metricCol}_cut"))
  }

  /** One-pass column profiler — the descriptive twin of
    * [[constraintViolations]]: per profiled column, row count, null
    * count, exact distinct count, and min/max rendered as strings. The
    * "what is in this dataset" report that feeds schema docs, DQ
    * baselines, and drift alert thresholds.
    *
    * Shape: ONE scan computes every null/min/max (all combine
    * map-side), and each exact distinct count runs as its OWN
    * two-level hash aggregation over a single column-pruned scan.
    * Deliberately NOT `countDistinct(a), countDistinct(b), ...` in one
    * aggregate: Spark rewrites multi-distinct through an Expand
    * (input ×(|cols|+1)) keyed by every distinct column at once, which
    * degrades to a keyed SortAggregate over the expanded rows — 3×
    * slower on the gated config, and far worse at scale. Per-column
    * hash distincts read one column each (columnar scans make the
    * extra passes near-free) and never sort. Min/max stringification
    * uses each engine's shortest-roundtrip float printing — identical
    * across engines for plain-notation magnitudes; pin integer,
    * string, or timestamp columns where bit-stable gating matters
    * beyond that range.
    */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val statAggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    } :+ count(lit(1)).as("__n")
    val stats = df.agg(statAggs.head, statAggs.tail: _*)
    val wide = cols.foldLeft(stats) { (acc, c) =>
      // count(col) over the distinct rows = exact non-null distinct
      acc.crossJoin(
        df.select(col(c)).distinct().agg(count(col(c)).as(s"__nd_$c")))
    }
    val stackArgs = cols
      .map(c => s"'$c', __null_$c, __nd_$c, __min_$c, __max_$c")
      .mkString(", ")
    wide.select(
      expr(s"stack(${cols.size}, $stackArgs) AS (col_name, n_null, n_distinct, min_value, max_value)"),
      col("__n").as("n_rows"))
      .select("col_name", "n_rows", "n_null", "n_distinct", "min_value", "max_value")
  }

  /** Two-sample Kolmogorov-Smirnov drift statistic in EXACT integer
    * arithmetic — the numeric twin of [[categoricalDrift]]: how far
    * apart are two snapshots' value distributions, as the maximum
    * empirical-CDF gap. Instead of comparing float CDFs, the gap is
    * cross-multiplied: at each observed value v,
    *
    *   gap(v) = |cumA(v)·nB − cumB(v)·nA|
    *
    * an exact integer (KS statistic = max gap / (nA·nB), left to the
    * consumer). Emits `(n_a, n_b, ks_num, at_value)` with the argmax
    * value (smallest on ties) — deterministic and engine-replayable to
    * the last unit, where a float CDF compare could flip the argmax
    * between engines.
    *
    * Shape at scale: per-side counts are combinable; the merge is a
    * full-outer join on |distinct values| rows; the running sums are a
    * window over that DISTINCT-VALUE table (not the corpus). For
    * genuinely unbounded value cardinality, histogram first
    * ([[Quantiles.gridQuantiles]]'s bucketing) and run the same gap on
    * bucket counts. NULLs are excluded (no order position).
    */
  def numericDriftKs(
      before: DataFrame,
      after: DataFrame,
      valueCol: String): DataFrame = {
    def counted(df: DataFrame, n: String) =
      df.filter(col(valueCol).isNotNull)
        .groupBy(col(valueCol).as("__v")).agg(count(lit(1)).as(n))
    val merged = counted(before, "__ca")
      .join(counted(after, "__cb"), Seq("__v"), "full_outer")
      .select(col("__v"),
        coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = merged.agg(
      sum(col("__ca")).as("__na"), sum(col("__cb")).as("__nb"))
    merged
      .withColumn("__cuma", sum(col("__ca")).over(w))
      .withColumn("__cumb", sum(col("__cb")).over(w))
      .crossJoin(broadcast(totals))
      .select(col("__na"), col("__nb"),
        abs(col("__cuma") * col("__nb") - col("__cumb") * col("__na")).as("__gap"),
        col("__v"))
      .groupBy("__na", "__nb")
      .agg(
        max(col("__gap")).as("ks_num"),
        min_by(col("__v"), struct((-col("__gap")).as("a"), col("__v").as("b")))
          .as("at_value"))
      .select(col("__na").as("n_a"), col("__nb").as("n_b"),
        col("ks_num"), col("at_value"))
  }

  /** [[numericDriftKs]] over FIXED-GRID buckets — the documented remedy
    * for genuinely unbounded value cardinality, now a first-class
    * operator instead of a doc comment: both sides bucket into the same
    * config-pinned integer cells ([[Quantiles.gridQuantiles]]'s
    * clamped floor-division, [[graft.functions.GridQuantileAgg]]'s
    * contract), and the exact-integer CDF gap runs on ≤ `bins` rows
    * regardless of corpus size. The statistic becomes the KS of the
    * BINNED distributions (gap resolution = one cell) — the standard
    * trade for a bounded-state drift monitor; `at_bucket` reports the
    * argmax cell's index.
    */
  def numericDriftKsBinned(
      before: DataFrame,
      after: DataFrame,
      valueCol: String,
      lo: Long,
      width: Long,
      bins: Int): DataFrame = {
    require(width >= 1 && bins >= 2, "need a positive cell width and >= 2 cells")
    def bucketed(df: DataFrame) = df
      .filter(col(valueCol).isNotNull)
      .select(least(greatest(
        expr(s"($valueCol - $lo) div $width"), lit(0L)), lit(bins - 1L)).as("__b"))
    numericDriftKs(bucketed(before), bucketed(after), "__b")
      .withColumnRenamed("at_value", "at_bucket")
  }

  /** Categorical drift report between two snapshots of the same feed:
    * per category, the row count and exact integer ppm share in each
    * snapshot plus the signed share delta. The distribution-shift
    * monitor for ingest pipelines ("did the event-type / source / lang
    * mix move?") — delta thresholds drive alerts, and because every
    * number is an exact integer the report is bit-reproducible (no
    * float divergence between the engine and whatever recomputes it).
    *
    * Categories absent from one side report zero there (full-outer
    * semantics) — a vanished or brand-new category is exactly the
    * drift worth alerting on.
    *
    * Shape at 100 TB: one combinable count per side, a full-outer join
    * on |categories| rows, totals broadcast back. The snapshots are
    * scanned once each and never shuffled (counts partial-aggregate
    * map-side).
    */
  def categoricalDrift(
      before: DataFrame,
      after: DataFrame,
      catCol: String): DataFrame = {
    def counted(df: DataFrame, n: String) =
      df.groupBy(col(catCol)).agg(count(lit(1)).as(n))
    val joined = counted(before, "n_before")
      .join(counted(after, "n_after"), Seq(catCol), "full_outer")
      .select(col(catCol),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"))
    val totals = joined.agg(
      sum(col("n_before")).as("__t_before"),
      sum(col("n_after")).as("__t_after"))
    // nullif guards the all-empty snapshot (ANSI div by zero throws);
    // an absent side then reports share 0 rather than failing the report
    val ppmB = expr("coalesce(n_before * 1000000L div nullif(__t_before, 0L), 0L)")
    val ppmA = expr("coalesce(n_after * 1000000L div nullif(__t_after, 0L), 0L)")
    joined.crossJoin(broadcast(totals))
      .select(col(catCol), col("n_before"), col("n_after"),
        ppmB.as("ppm_before"), ppmA.as("ppm_after"),
        (ppmA - ppmB).as("delta_ppm"))
  }

  /** k-anonymity suppression gate — the privacy-release counterpart of
    * the admission checks above: a row may leave the warehouse only if
    * at least `k` rows share its full quasi-identifier combination
    * (Sweeney's k-anonymity). Rows in smaller groups are SUPPRESSED
    * (dropped), so no released row can be narrowed below a crowd of k
    * by joining the quasi-identifiers against outside data. NULL is
    * treated as a value of its own (null-safe grouping): a null QI
    * still identifies a cohort and must clear the same bar.
    *
    * Returns the released rows with `qi_group_n` (the crowd size)
    * appended — the per-row proof of the property the gate enforces.
    *
    * Shape at scale: group sizes are a combinable count keyed by the
    * QI columns (map-side partials — the 100 TB table contributes
    * |distinct QI| rows to the shuffle, not its row count), then one
    * equi-join back onto the table; AQE broadcasts the count table
    * when the QI space is dim-sized. The alternative single-shuffle
    * window (`count over partition by QI`) moves every full-width row
    * through one shuffle — strictly worse when rows are wide, which
    * warehouse releases are.
    */
  def kAnonymize(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, "k must be >= 1")
    // count-table QI columns are renamed before the join-back: the
    // count plan derives from `df` itself, and unrenamed columns trip
    // Spark's ambiguous-self-join detection. `<=>` (not `=`) so a null
    // QI cohort that cleared the bar is released like any other.
    val sizes = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("qi_group_n"))
      .filter(col("qi_group_n") >= k)
      .select(qiCols.map(c => col(c).as(s"__qi_$c")) :+ col("qi_group_n"): _*)
    val on = qiCols.map(c => col(c) <=> col(s"__qi_$c")).reduce(_ && _)
    df.join(sizes, on)
      .select(df.columns.map(col) :+ col("qi_group_n"): _*)
  }

  /** l-diversity audit: k-anonymity's necessary companion. A cohort
    * can be large (k-anonymous) yet leak the sensitive attribute
    * anyway if everyone in it shares one value — the homogeneity
    * attack. This reports, per quasi-identifier cohort, its size and
    * the number of DISTINCT sensitive values, with the release flag
    * `n_sensitive >= l`.
    *
    * One aggregation with a count-distinct — Spark runs it as the
    * standard two-phase expand (partial distinct per partition, then
    * the merge), still a single keyed shuffle on the QI space. The
    * report is cohort-sized, not row-sized; join it back with
    * [[kAnonymize]]'s count-table pattern to gate an actual release.
    */
  def lDiversityReport(
      df: DataFrame,
      qiCols: Seq[String],
      sensitive: Column,
      l: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 1, "l must be >= 1")
    df.groupBy(qiCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(sensitive).as("n_sensitive"))
      .withColumn("meets_l", col("n_sensitive") >= l)
  }

  /** t-closeness audit — the third rung of the privacy ladder after
    * [[kAnonymize]] and [[lDiversityReport]]: a cohort can be large
    * AND diverse yet still leak by SKEW (90% of one cohort in the top
    * balance band reveals plenty). Per quasi-identifier cohort this
    * reports the 1-D earth-mover's distance between the cohort's
    * ORDERED-sensitive distribution and the global one, in EXACT
    * integers: over the m global sensitive values in order,
    *
    *   emd_num = Σᵢ |cumCohort(i)·N − cumGlobal(i)·n_cohort|
    *
    * with the true EMD = emd_num / (n_cohort·N·(m−1)) left rational.
    * `meets_t` compares against `tPpm` by cross-multiplying in
    * decimal(38,0) — no division, no floats, bit-identical in any
    * engine. The sensitive column must be ORDERED (numeric or a band
    * index — band first for unbounded domains, the
    * [[numericDriftKsBinned]] discipline).
    *
    * Shape at scale: (cohort × value) and (value) counts are
    * combinable; the dense grid is |cohorts|·m rows (metadata-sized —
    * m is a banded domain by contract), and the windows run on that
    * grid, never the corpus.
    */
  /** DIFFERENTIALLY-PRIVATE group release: noisy counts and noisy
    * CLAMPED sums per group under ε-DP, with the Laplace noise
    * DERANDOMIZED — the draw is the inverse-CDF transform of a uniform
    * taken from the top 40 bits of the AVALANCHED md5 digest of (salt,
    * release tag, group value), so the released numbers are a pure
    * function of (inputs, salt): both engines replay them bit-for-bit,
    * a retried release publishes the identical numbers (re-releasing
    * under a FRESH salt is what consumes more budget — the salt IS the
    * privacy accountant's unit), and no RNG state needs distributing.
    *
    * Why md5 and NOT the portable rolling hash: the rolling polynomial
    * is LINEAR in the input bytes, so for equal-length group values the
    * salt contribution cancels in pairwise hash differences — all noise
    * draws would be publicly inter-determined up to one constant, and
    * knowing a single true count would recover every group's noise.
    * The avalanched digest has no such structure (the same reason
    * rendezvous sharding uses md5). PRECONDITION for any privacy: the
    * salt must be kept SECRET (PRF-style derandomization) — an
    * adversary holding the salt can recompute every draw and strip the
    * noise entirely.
    *
    * Mechanism: count has sensitivity 1 → Laplace(1/ε); each row's
    * value contribution is clamped to [0, clampHi] so the sum has
    * sensitivity clampHi → Laplace(clampHi/ε). The two releases
    * compose sequentially (total budget 2ε — halve `epsilon` to meet
    * an overall target). noise = −scale·sign(u)·ln(1−2|u|) with
    * u ∈ (−½, ½); u = 0 is unreachable (the grid point + ½ never hits
    * Mod/2), so sign is total.
    *
    * Scale shape: one combinable count+sum aggregate; the noise is a
    * per-RELEASED-ROW expression (group-count-sized), never per input
    * row — releasing 100 TB of facts costs one aggregation pass.
    */
  def dpLaplaceRelease(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      epsilon: Double,
      clampHi: Long,
      salt: String): DataFrame = {
    require(epsilon > 0 && clampHi > 0)
    val agg = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"),
        sum(least(greatest(col(valueCol), lit(0L)), lit(clampHi))).as("__s"))
    def u(tag: String): Column = {
      // top 40 digest bits ([[graft.functions.md5_u40]]), exact in a
      // double and replayable as the same big-endian hex fold in SQL
      val h40 = graft.functions.md5_u40(
        concat(lit(s"dp:$salt:$tag:"), col(groupCol).cast("string")))
      (h40.cast("double") + lit(0.5)) / lit(PortableMinHash.Mod.toDouble) - lit(0.5)
    }
    def lap(uu: Column, scale: Double): Column =
      -lit(scale) * signum(uu) * log(lit(1.0) - lit(2.0) * abs(uu))
    agg.select(col(groupCol),
      (col("__n").cast("double") + lap(u("n"), 1.0 / epsilon)).as("noisy_n"),
      (col("__s").cast("double") + lap(u("s"), clampHi / epsilon)).as("noisy_sum"))
  }

  def tClosenessReport(
      df: DataFrame,
      qiCols: Seq[String],
      sensitive: Column,
      tPpm: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(tPpm >= 0, "tPpm is a ppm threshold")
    val base = df.select(qiCols.map(col) :+ sensitive.as("__v"): _*)
      .filter(col("__v").isNotNull)
    val cohortVal = base.groupBy(qiCols.map(col) :+ col("__v"): _*)
      .agg(count(lit(1)).as("__cc"))
    val globalVal = base.groupBy(col("__v")).agg(count(lit(1)).as("__gc"))
    val cohorts = cohortVal.groupBy(qiCols.map(col): _*)
      .agg(sum(col("__cc")).as("n_rows"))
    val totals = globalVal.agg(
      sum(col("__gc")).as("__n_total"), count(lit(1)).as("__m"))
    // dense (cohort × value) grid so cumulative sums see every step;
    // null-safe QI match (a null QI cohort audits like any other —
    // the kAnonymize discipline), renamed to dodge self-join ambiguity
    val cv = cohortVal.select(
      qiCols.map(c => col(c).as(s"__q_$c")) :+
        col("__v").as("__v2") :+ col("__cc"): _*)
    val on = qiCols.map(c => col(c) <=> col(s"__q_$c")).reduce(_ && _) &&
      col("__v") === col("__v2")
    val grid = cohorts.crossJoin(globalVal.select(col("__v"), col("__gc")))
      .join(cv, on, "left")
      .na.fill(0L, Seq("__cc"))
    val w = Window.partitionBy(qiCols.map(col): _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("__cumc", sum(col("__cc")).over(w))
      .withColumn("__cumg", sum(col("__gc")).over(w))
      .crossJoin(broadcast(totals))
      .groupBy(qiCols.map(col) :+ col("n_rows") :+
        col("__n_total") :+ col("__m"): _*)
      .agg(sum(abs(col("__cumc") * col("__n_total") -
        col("__cumg") * col("n_rows"))).as("emd_num"))
      .select(qiCols.map(col) :+
        col("n_rows") :+
        col("__n_total").as("n_total") :+
        col("__m").cast("long").as("m_values") :+
        col("emd_num") :+
        (col("emd_num").cast("decimal(38,0)") * lit(1000000L) <=
          lit(tPpm) * col("n_rows").cast("decimal(38,0)") *
            col("__n_total") * (col("__m") - 1)).as("meets_t"): _*)
  }

  /** Row-level quarantine routing — the other half of
    * [[constraintViolations]]: instead of counting failures, emit the
    * FAILING rows with a comma-joined reason list so a pipeline can
    * route them to a quarantine table and admit the rest. One codegen
    * projection per row (`concat_ws` drops the NULLs of passing
    * checks — the same null-skipping contract in any engine), one
    * filter; no shuffle at all. NULL predicate results fail the check,
    * matching the admission-gate semantics of the counting form.
    */
  def quarantine(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "need at least one constraint")
    val reasons = checks.map { case (name, pred) =>
      when(!coalesce(pred, lit(false)), lit(name))
    }
    df.withColumn("fail_reasons", concat_ws(",", reasons: _*))
      .filter(col("fail_reasons") =!= "")
  }

  /** SCD-2 interval audit: flag rows whose validity interval conflicts
    * with the key's previous version in `(valid_from, valid_to NULLS
    * LAST)` order — `overlap` (previous version still open past this
    * row's start), `gap` (coverage hole), `after_open` (any row
    * following an open-ended one: two concurrent "current" versions).
    * Adjacent intervals (`prev.to == from`) and each key's first row
    * are clean and filtered out, so the audit's output size is the
    * DEFECT count, not the history size.
    *
    * A first-row/NULL-to ambiguity hides here: `lag(to)` is NULL both
    * when there is no previous row and when the previous row is open —
    * a lagged literal disambiguates. One shuffle on the key; per-key
    * partitions are version-chain-sized. NULLS LAST is written
    * explicitly on both engines (Spark windows default nulls FIRST,
    * DuckDB defaults nulls LAST — the one-character drift that flips
    * survivors).
    */
  def scd2IntervalAudit(
      history: DataFrame,
      keyCols: Seq[String],
      fromCol: String,
      toCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(fromCol).asc, col(toCol).asc_nulls_last)
    history
      .withColumn("__prev_to", lag(col(toCol), 1).over(w))
      .withColumn("__has_prev", lag(lit(1), 1).over(w))
      .withColumn("status",
        when(col("__has_prev").isNull, lit("ok"))
          .when(col("__prev_to").isNull, lit("after_open"))
          .when(col("__prev_to") > col(fromCol), lit("overlap"))
          .when(col("__prev_to") < col(fromCol), lit("gap"))
          .otherwise(lit("ok")))
      .filter(col("status") =!= "ok")
      .select(keyCols.map(col) ++
        Seq(col(fromCol), col("__prev_to").as("prev_to"), col("status")): _*)
  }
  /** Functional-dependency audit: for a claimed FD `lhs → rhs`, report
    * every LHS value carrying more than one distinct RHS — with the
    * majority RHS (the repair candidate) and the violating row count.
    * The conformance-checking DQ class (schema-on-read reality check:
    * "source determines lang", "zip determines state") that row-level
    * predicate checks cannot express.
    *
    * Shape: one combinable (lhs, rhs) count, then a KEYED window over
    * the distinct-value table (rows = |lhs×rhs| observed, corpus-size
    * independent). Majority tiebreak: highest count, then smallest RHS
    * — deterministic in both engines.
    */
  def fdViolations(df: DataFrame, lhsCol: String, rhsCol: String): DataFrame = {
    val counts = df.filter(col(lhsCol).isNotNull && col(rhsCol).isNotNull)
      .groupBy(col(lhsCol), col(rhsCol)).agg(count(lit(1)).as("n"))
    val byLhs = Window.partitionBy(col(lhsCol))
    val rk = Window.partitionBy(col(lhsCol))
      .orderBy(col("n").desc, col(rhsCol).asc)
    counts
      .withColumn("n_vals", count(lit(1)).over(byLhs))
      .withColumn("total_rows", sum(col("n")).over(byLhs))
      .withColumn("__rk", row_number().over(rk))
      .filter(col("n_vals") > 1 && col("__rk") === 1)
      .select(col(lhsCol), col("n_vals"), col("total_rows"),
        col(rhsCol).as("majority_val"), col("n").as("majority_n"),
        (col("total_rows") - col("n")).as("n_violating"))
  }

  /** SCHEMA-DRIFT report between two snapshots of "the same" table —
    * the contract check a pipeline runs when an upstream feed
    * regenerates: one row per column in EITHER snapshot, with its
    * status (`added` / `dropped` / `type_changed` / `kept`), the
    * declared types, and the exact-integer null rate on the ppm grid
    * (the silent failure mode type checks miss: the column is still
    * there, still a string — and suddenly 40% NULL).
    *
    * Scale shape: one combinable aggregate pass per snapshot (a sum of
    * null flags per column, folded map-side), each collapsing to a
    * SINGLE row unpivoted to column-count rows — so the join of the
    * two sides is metadata-sized no matter how wide or tall the
    * snapshots are. Declared types come off the schema (driver
    * metadata, zero jobs). ppm is floor(nulls·10⁶ / n) in integers.
    */
  def schemaDriftReport(oldDf: DataFrame, newDf: DataFrame): DataFrame = {
    def side(df: DataFrame, sfx: String): DataFrame = {
      val cols = df.columns.toSeq
      // user column names reach col() backtick-quoted and derived names
      // are indexed — no name interpolation into string SQL, so names
      // with dots/spaces/quotes can neither break nor inject anything
      def bq(n: String): Column = col("`" + n.replace("`", "``") + "`")
      val aggs = count(lit(1)).as("__n") +:
        cols.zipWithIndex.map { case (c, i) =>
          sum(when(bq(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$i") }
      val one = df.agg(aggs.head, aggs.tail: _*)
      val rows = cols.zipWithIndex.map { case (c, i) => struct(
        lit(c).as("col_name"),
        lit(df.schema(c).dataType.catalogString).as("tp"),
        col(s"__nulls_$i").as("nulls")) }
      one.select(col("__n"), explode(array(rows: _*)).as("__r"))
        .select(col("__r.col_name").as("col_name"),
          col("__r.tp").as(s"type_$sfx"),
          expr("__r.nulls * 1000000 div __n").as(s"null_ppm_$sfx"))
    }
    side(oldDf, "old").join(side(newDf, "new"), Seq("col_name"), "full_outer")
      .select(col("col_name"),
        when(col("type_old").isNull, lit("added"))
          .when(col("type_new").isNull, lit("dropped"))
          .when(col("type_old") =!= col("type_new"), lit("type_changed"))
          .otherwise(lit("kept")).as("status"),
        col("type_old"), col("type_new"),
        col("null_ppm_old"), col("null_ppm_new"))
  }

  /** Referential-integrity audit: for each declared FK relationship,
    * how many child rows point at a parent that does not exist — the
    * orphan check every warehouse load gate runs before exposing a
    * partition. One row per relationship: total child rows, orphan
    * count, and orphan ppm on the exact integer grid.
    *
    * Shape per relationship: one combinable child count + one
    * LEFT ANTI join against the parent's DISTINCT key set (dim-sized;
    * AQE broadcasts it when it fits) — the child table is never
    * shuffled twice and never collected. Null FKs count as orphans
    * (a null pointer dangles just as hard as a wrong one).
    */
  def referentialAudit(
      rels: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(rels.nonEmpty)
    val reports = rels.map { case (label, child, childKey, parent, parentKey) =>
      val keys = parent.select(col(parentKey).as(childKey)).distinct()
      val orphans = child.select(col(childKey))
        .join(keys, Seq(childKey), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      val total = child.agg(count(lit(1)).as("n_rows"))
      total.crossJoin(orphans)
        .select(lit(label).as("fk"), col("n_rows"), col("n_orphans"),
          expr("1000000 * n_orphans div n_rows").as("orphan_ppm"))
    }
    reports.reduce(_ unionByName _)
  }

  /** COHEN'S KAPPA — chance-corrected agreement between two labelers
    * over the same items (two annotators, two heuristic quality
    * classifiers, a model vs its replacement): raw agreement alone
    * flatters any skewed label distribution ("both say keep 95% of the
    * time" is near-zero information when 95% IS the base rate), so
    * κ = (p_o − p_e)/(1 − p_e) nets out the agreement two independent
    * raters with these marginals would reach by luck. Degenerate
    * p_e = 1 (both raters constant, same label) reads κ = 1 when they
    * agree everywhere and 0 otherwise — by explicit guard, not a
    * 0/0.
    *
    * Determinism: everything is exact integers (agree count, marginal
    * products — on the decimal(38,0) grid, since Σ row·col marginals
    * brushes 2⁶³ at cluster counts) until the final fixed-order double
    * expression. Scale shape: one combinable (a, b) cell aggregate
    * (≤ labels² rows), marginals and the kappa fold computed on that
    * collapsed table. Output one row:
    * (n_items, n_agree, po, pe, kappa, strength).
    */
  def cohensKappa(df: DataFrame, raterACol: String, raterBCol: String): DataFrame = {
    val cells = df.select(col(raterACol).cast("string").as("a"),
      col(raterBCol).cast("string").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
    val margA = cells.groupBy("a").agg(sum("c").as("ra"))
    val margB = cells.groupBy("b").agg(sum("c").as("cb"))
    val peNum = margA.join(margB, col("a") === col("b"))
      .agg(coalesce(sum(col("ra").cast("decimal(38,0)") * col("cb")),
        lit(0).cast("decimal(38,0)")).as("__pe_num"))
    val tots = cells.agg(sum("c").as("n_items"),
      sum(when(col("a") === col("b"), col("c")).otherwise(0L)).as("n_agree"))
    val po = col("n_agree").cast("double") / col("n_items").cast("double")
    val pe = col("__pe_num").cast("double") /
      col("n_items").cast("double") / col("n_items").cast("double")
    val kappa = when(pe === 1.0, when(po === 1.0, lit(1.0)).otherwise(lit(0.0)))
      .otherwise((po - pe) / (lit(1.0) - pe))
    tots.crossJoin(peNum)
      .select(col("n_items"), col("n_agree"), po.as("po"), pe.as("pe"),
        kappa.as("kappa"))
      .withColumn("strength",
        when(col("kappa") < 0.0, "poor")
          .when(col("kappa") < 0.2, "slight")
          .when(col("kappa") < 0.4, "fair")
          .when(col("kappa") < 0.6, "moderate")
          .when(col("kappa") < 0.8, "substantial")
          .otherwise("near_perfect"))
  }

  /** KRIPPENDORFF'S ALPHA (nominal) — [[cohensKappa]]'s general-case
    * sibling: ANY number of raters per unit, raters need not overlap,
    * missing ratings are simply absent rows. The labeling-ops question
    * it answers: "across a pool of annotators who each saw an
    * arbitrary subset of items, is the labeling reliable?" — exactly
    * the multi-vendor / redundant-annotation shape a training-data
    * pipeline has, where kappa's two-fixed-raters contract never holds.
    *
    * Coincidence form over PAIRABLE units (≥ 2 ratings):
    * D_o = Σ_u (m_u² − Σ_c n_uc²)/(m_u − 1) (within-unit disagreeing
    * pairs, pair-normalized), D_e's numerator n_tot² − Σ_c n_c² on the
    * exact decimal(38,0)/HUGEINT grid (marginals over pairable units
    * only), α = 1 − (n_tot − 1)·D_o / (n_tot² − Σ n_c²). All counts
    * exact integers; D_o is the one double sum (per-unit rationals —
    * summation-order ulp sits far below the compare grid). Degenerate
    * single-value data reads α = 1 when D_o = 0 (the kappa guard
    * discipline). Bands are Krippendorff's own: ≥ .800 reliable,
    * ≥ .667 tentative, else unreliable.
    *
    * Scale shape: one (unit, value) combinable aggregate, one
    * unit-keyed fold, marginals on the collapsed value axis — never
    * data-sized after the first groupBy.
    */
  def krippendorffAlpha(df: DataFrame, unitCol: String, valueCol: String): DataFrame = {
    val uc = df.select(col(unitCol).cast("string").as("u"),
      col(valueCol).cast("string").as("v"))
      .where(col("v").isNotNull)
      .groupBy("u", "v").agg(count(lit(1)).as("c"))
    val perU = uc.groupBy("u")
      .agg(sum("c").as("m"), sum(col("c") * col("c")).as("ss"))
      .where(col("m") >= 2)
    val doSum = perU.agg(count(lit(1)).as("n_units"),
      sum((col("m") * col("m") - col("ss")).cast("double") /
        (col("m") - 1).cast("double")).as("d_o"))
    val marg = uc.join(perU.select("u"), Seq("u"), "left_semi")
      .groupBy("v").agg(sum("c").as("nc"))
    val de = marg.agg(sum(col("nc")).as("n_tot"),
      sum(col("nc").cast("decimal(38,0)") * col("nc")).as("__ssq"))
      .select(col("n_tot"),
        (col("n_tot").cast("decimal(38,0)") * col("n_tot") - col("__ssq"))
          .as("__de_num"))
    val alpha = when(col("__de_num") === 0,
        when(col("d_o") === 0.0, lit(1.0)).otherwise(lit(0.0)))
      .otherwise(lit(1.0) -
        (col("n_tot") - 1).cast("double") * col("d_o") /
          col("__de_num").cast("double"))
    doSum.crossJoin(de)
      .select(col("n_units"), col("n_tot"), col("d_o"),
        (col("__de_num").cast("double") / (col("n_tot") - 1).cast("double"))
          .as("d_e"),
        alpha.as("alpha"))
      .withColumn("band",
        when(col("alpha") >= 0.8, "reliable")
          .when(col("alpha") >= 0.667, "tentative")
          .otherwise("unreliable"))
  }

  /** DuckDB replay of [[krippendorffAlpha]] over a CTE `ratings` with
    * columns (u, v) — HUGEINT marginal grid, same fixed double order
    * and bands. */
  def krippendorffAlphaSql(ratingsCte: String): String = {
    val alpha = "(CASE WHEN de_num = 0 THEN (CASE WHEN d_o = 0 THEN 1.0 ELSE 0.0 END) " +
      "ELSE (1.0 - (CAST(n_tot - 1 AS DOUBLE) * d_o) / CAST(de_num AS DOUBLE)) END)"
    s"WITH $ratingsCte, " +
      "uc AS (SELECT u, v, CAST(count(*) AS BIGINT) AS c FROM ratings WHERE v IS NOT NULL GROUP BY 1, 2), " +
      "pu AS (SELECT u, CAST(sum(c) AS BIGINT) AS m, CAST(sum(c * c) AS BIGINT) AS ss FROM uc GROUP BY 1 HAVING sum(c) >= 2), " +
      "dd AS (SELECT CAST(count(*) AS BIGINT) AS n_units, " +
      "sum(CAST(m * m - ss AS DOUBLE) / CAST(m - 1 AS DOUBLE)) AS d_o FROM pu), " +
      "mg AS (SELECT v, CAST(sum(c) AS BIGINT) AS nc FROM uc JOIN pu USING (u) GROUP BY 1), " +
      "dn AS (SELECT n_tot, CAST(n_tot AS HUGEINT) * n_tot - ssq AS de_num FROM " +
      "(SELECT CAST(sum(nc) AS BIGINT) AS n_tot, sum(CAST(nc AS HUGEINT) * nc) AS ssq FROM mg)) " +
      "SELECT n_units, n_tot, d_o, " +
      "CAST(de_num AS DOUBLE) / CAST(n_tot - 1 AS DOUBLE) AS d_e, " +
      s"$alpha AS alpha, " +
      s"CASE WHEN $alpha >= 0.8 THEN 'reliable' WHEN $alpha >= 0.667 THEN 'tentative' " +
      "ELSE 'unreliable' END AS band " +
      "FROM dd CROSS JOIN dn"
  }

  /** DuckDB replay of [[cohensKappa]] over a CTE `pairs` with columns
    * (a, b) — HUGEINT marginal products mirroring the decimal grid,
    * the same fixed double order and strength bands. */
  def cohensKappaSql(pairsCte: String): String = {
    val po = "(CAST(n_agree AS DOUBLE) / CAST(n_items AS DOUBLE))"
    val pe = "(CAST(pe_num AS DOUBLE) / CAST(n_items AS DOUBLE) / CAST(n_items AS DOUBLE))"
    val kappa = s"(CASE WHEN $pe = 1.0 THEN (CASE WHEN $po = 1.0 THEN 1.0 ELSE 0.0 END) " +
      s"ELSE ($po - $pe) / (1.0 - $pe) END)"
    s"WITH $pairsCte, " +
      "cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c FROM pairs GROUP BY 1, 2), " +
      "ma AS (SELECT a, CAST(sum(c) AS BIGINT) AS ra FROM cells GROUP BY 1), " +
      "mb AS (SELECT b, CAST(sum(c) AS BIGINT) AS cb FROM cells GROUP BY 1), " +
      "pn AS (SELECT coalesce(sum(CAST(ra AS HUGEINT) * cb), 0) AS pe_num " +
      "FROM ma JOIN mb ON ma.a = mb.b), " +
      "tt AS (SELECT CAST(sum(c) AS BIGINT) AS n_items, " +
      "CAST(sum(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT) AS n_agree FROM cells) " +
      s"SELECT n_items, n_agree, $po AS po, $pe AS pe, $kappa AS kappa, " +
      s"CASE WHEN $kappa < 0.0 THEN 'poor' WHEN $kappa < 0.2 THEN 'slight' " +
      s"WHEN $kappa < 0.4 THEN 'fair' WHEN $kappa < 0.6 THEN 'moderate' " +
      s"WHEN $kappa < 0.8 THEN 'substantial' ELSE 'near_perfect' END AS strength " +
      "FROM tt CROSS JOIN pn"
  }
}
