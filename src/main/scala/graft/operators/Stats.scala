package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Distributed descriptive statistics with deterministic, engine-
  * portable numerics: per-group ordinary least squares and pairwise
  * Pearson correlation, built from EXACT integer moment sums.
  *
  * Why not `regr_slope`/`corr`: those accumulate doubles in partition
  * order, so the result differs run-to-run and engine-to-engine in the
  * last bits — unverifiable against an oracle and non-reproducible in
  * a pipeline contract. Here the five moments (n, Σx, Σy, Σxy, Σx²,
  * Σy²) are LONG sums of caller-supplied integer units (cents, basis
  * points, whole counts) — order-independent and exact — and only the
  * final closed-form combination runs in double precision, as ONE
  * fixed expression tree evaluated on identical inputs everywhere.
  * Any engine (Spark, DuckDB, a hand calculator) computing the same
  * IEEE expression on the same longs produces the same bits.
  *
  * Scale shape: one combinable `groupBy().agg()` — map-side partial
  * sums, a key-space-sized shuffle, no second pass over the data. The
  * moment-sum trick is what makes regression a one-scan streaming
  * aggregate instead of a fit loop.
  *
  * Numeric caveat (documented, deliberate): the closed forms
  * n·Σxy − Σx·Σy cancel catastrophically when x has tiny relative
  * variance. With unit-scaled inputs (≤ ~2^26 per row) and group sizes
  * ≤ ~2^26 the double mantissa holds the products; determinism is
  * never affected, only absolute accuracy at extreme scales — callers
  * there should pre-center units per group (same API, shifted exprs).
  */
object Stats {

  /** Per-group simple linear regression y = slope·x + intercept.
    *
    * `xUnits` / `yUnits` must be integer-valued LONG expressions
    * (e.g. `round(price * 100).cast("long")`). Output per group:
    * n, slope, intercept, r2, pearson_r — doubles derived from the
    * exact moments via one fixed IEEE expression tree. Groups with
    * zero x-variance are emitted with NULL slope/intercept/r2/r
    * (vertical line: undefined fit, not a crash).
    */
  def groupOls(
      df: DataFrame,
      groupCols: Seq[String],
      xUnits: Column,
      yUnits: Column): DataFrame = {
    val mom = df
      .select(groupCols.map(col) ++ Seq(
        xUnits.as("__x"), yUnits.as("__y")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__y") * col("__y")).as("__syy"))
    // the whole combination in double, from exact longs: both the
    // oracle and this plan evaluate the identical expression tree
    val nD = col("n").cast("double")
    val sx = col("__sx").cast("double"); val sy = col("__sy").cast("double")
    val sxx = col("__sxx").cast("double"); val sxy = col("__sxy").cast("double")
    val syy = col("__syy").cast("double")
    val num = nD * sxy - sx * sy
    val den = nD * sxx - sx * sx
    val deny = nD * syy - sy * sy
    val slope = when(den =!= 0.0, num / den)
    mom.select(
      groupCols.map(col) :+ col("n") :+
        slope.as("slope") :+
        when(den =!= 0.0, (sy - (num / den) * sx) / nD).as("intercept") :+
        when(den =!= 0.0 && deny =!= 0.0, (num * num) / (den * deny)).as("r2") :+
        when(den =!= 0.0 && deny =!= 0.0, num / sqrt(den * deny)).as("pearson_r"): _*)
  }

  /** DuckDB replay of [[groupOls]] — the same moment CTE and the same
    * double expression tree, so the two sides cannot drift.
    */
  def groupOlsSql(
      table: String,
      groupCols: Seq[String],
      xUnitsSql: String,
      yUnitsSql: String): String = {
    val g = groupCols.mkString(", ")
    s"WITH m AS (SELECT $g, count(*) AS n, " +
      s"CAST(sum(__x) AS BIGINT) AS sx, CAST(sum(__y) AS BIGINT) AS sy, " +
      s"CAST(sum(__x * __x) AS BIGINT) AS sxx, CAST(sum(__x * __y) AS BIGINT) AS sxy, " +
      s"CAST(sum(__y * __y) AS BIGINT) AS syy " +
      s"FROM (SELECT $g, $xUnitsSql AS __x, $yUnitsSql AS __y FROM $table) AS src GROUP BY $g), " +
      "d AS (SELECT *, CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd, " +
      "CAST(sxx AS DOUBLE) AS sxxd, CAST(sxy AS DOUBLE) AS sxyd, CAST(syy AS DOUBLE) AS syyd FROM m), " +
      "e AS (SELECT *, nd * sxyd - sxd * syd AS num, nd * sxxd - sxd * sxd AS den, " +
      "nd * syyd - syd * syd AS deny FROM d) " +
      s"SELECT $g, n, " +
      "CASE WHEN den <> 0 THEN num / den END AS slope, " +
      "CASE WHEN den <> 0 THEN (syd - (num / den) * sxd) / nd END AS intercept, " +
      "CASE WHEN den <> 0 AND deny <> 0 THEN (num * num) / (den * deny) END AS r2, " +
      "CASE WHEN den <> 0 AND deny <> 0 THEN num / sqrt(den * deny) END AS pearson_r " +
      "FROM e"
  }

  /** Pairwise Pearson correlation matrix over integer-unit columns,
    * long form: one row per unordered column pair (name_a < name_b).
    *
    * ONE scan computes every Σcᵢ, Σcᵢ², Σcᵢcⱼ moment (k(k+3)/2 long
    * sums, all map-side combinable); the k×k matrix then falls out of
    * a tiny driver-free select over the single aggregated row. This is
    * the profile-a-feature-table-in-one-pass shape — never k² scans.
    */
  def corrMatrix(df: DataFrame, unitCols: Seq[(String, Column)]): DataFrame = {
    require(unitCols.size >= 2, "need at least two columns")
    val named = df.select(unitCols.map { case (n, c) => c.as(s"__$n") }: _*)
    val pairs = for {
      i <- unitCols.indices; j <- (i + 1) until unitCols.size
    } yield (unitCols(i)._1, unitCols(j)._1)
    val aggs =
      Seq(count(lit(1)).as("n")) ++
        unitCols.flatMap { case (n, _) => Seq(
          sum(col(s"__$n")).as(s"s_$n"),
          sum(col(s"__$n") * col(s"__$n")).as(s"ss_$n")) } ++
        pairs.map { case (a, b) =>
          sum(col(s"__$a") * col(s"__$b")).as(s"sp_${a}_$b") }
    val mom = named.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.map { case (a, b) =>
      val nD = col("n").cast("double")
      val sa = col(s"s_$a").cast("double"); val sb = col(s"s_$b").cast("double")
      val ssa = col(s"ss_$a").cast("double"); val ssb = col(s"ss_$b").cast("double")
      val sp = col(s"sp_${a}_$b").cast("double")
      val num = nD * sp - sa * sb
      val da = nD * ssa - sa * sa
      val db = nD * ssb - sb * sb
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        when(da =!= 0.0 && db =!= 0.0, num / sqrt(da * db)).as("pearson_r"))
    }
    mom.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Per-group feature scaling — the ML-preprocessing twin of
    * [[groupOls]]: z-score and min-max-ppm per row, from one pass of
    * exact per-group moments (n, Σx, Σx², min, max) broadcast back
    * onto the rows.
    *
    * The z-score is computed as `(n·x − Σx) / √(n·Σx² − (Σx)²)` — the
    * population z scaled by the constant √n, algebraically equivalent
    * for any downstream use (thresholding, ranking, model input) and,
    * critically, a SINGLE fixed double expression over exact longs, so
    * it replays bit-for-bit. Min-max lands on an exact integer ppm
    * grid. Degenerate groups (zero variance / zero range) emit NULL
    * rather than NaN or a division error.
    *
    * Scale shape: the moment table is group-cardinality-sized and
    * broadcast; the corpus is touched by one combinable aggregate and
    * one map-side join — no window over the data, no second shuffle.
    */
  def standardize(
      df: DataFrame,
      groupCols: Seq[String],
      idCols: Seq[String],
      xUnits: Column): DataFrame = {
    val rows = df.select(
      (groupCols ++ idCols).map(col) :+ xUnits.as("units"): _*)
    val m = rows.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("__n"), sum(col("units")).as("__s"),
        sum(col("units") * col("units")).as("__ss"),
        min(col("units")).as("__mn"), max(col("units")).as("__mx"))
      .select(groupCols.map(c => col(c).as(s"__g_$c")) ++
        Seq(col("__n"), col("__s"), col("__ss"), col("__mn"), col("__mx")): _*)
    val on = groupCols.map(c => col(c) <=> col(s"__g_$c")).reduce(_ && _)
    val nD = col("__n").cast("double")
    val sD = col("__s").cast("double"); val ssD = col("__ss").cast("double")
    val den = nD * ssD - sD * sD
    rows.join(broadcast(m), on)
      .select(
        (groupCols ++ idCols).map(col) :+ col("units") :+
          when(den > 0.0, (nD * col("units").cast("double") - sD) / sqrt(den))
            .as("z_scaled") :+
          when(col("__mx") > col("__mn"),
            expr("(units - __mn) * 1000000 div (__mx - __mn)"))
            .as("minmax_ppm"): _*)
  }

  /** DuckDB replay of [[standardize]]. */
  def standardizeSql(
      table: String,
      groupCols: Seq[String],
      idCols: Seq[String],
      xUnitsSql: String): String = {
    val g = groupCols.mkString(", ")
    val ids = idCols.mkString(", ")
    val outCols = (groupCols ++ idCols).map(c => s"r.$c").mkString(", ")
    s"WITH r AS (SELECT $g, $ids, $xUnitsSql AS units FROM $table), " +
      s"m AS (SELECT $g, count(*) AS n, CAST(sum(units) AS BIGINT) AS s, " +
      "CAST(sum(units * units) AS BIGINT) AS ss, min(units) AS mn, max(units) AS mx " +
      s"FROM r GROUP BY $g) " +
      s"SELECT $outCols, r.units, " +
      "CASE WHEN (CAST(n AS DOUBLE) * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) > 0 " +
      "THEN (CAST(n AS DOUBLE) * CAST(r.units AS DOUBLE) - CAST(s AS DOUBLE)) / " +
      "sqrt(CAST(n AS DOUBLE) * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) END AS z_scaled, " +
      "CASE WHEN mx > mn THEN (r.units - mn) * 1000000 // (mx - mn) END AS minmax_ppm " +
      s"FROM r JOIN m USING ($g)"
  }

  /** DuckDB replay of [[corrMatrix]]: same single-scan moments, same
    * expression tree, UNION ALL of the pair rows.
    */
  def corrMatrixSql(table: String, unitCols: Seq[(String, String)]): String = {
    val sel = unitCols.map { case (n, e) => s"$e AS __$n" }.mkString(", ")
    val pairs = for {
      i <- unitCols.indices; j <- (i + 1) until unitCols.size
    } yield (unitCols(i)._1, unitCols(j)._1)
    val moments =
      Seq("count(*) AS n") ++
        unitCols.flatMap { case (n, _) => Seq(
          s"CAST(sum(__$n) AS BIGINT) AS s_$n",
          s"CAST(sum(__$n * __$n) AS BIGINT) AS ss_$n") } ++
        pairs.map { case (a, b) => s"CAST(sum(__$a * __$b) AS BIGINT) AS sp_${a}_$b" }
    val arms = pairs.map { case (a, b) =>
      s"SELECT '$a' AS col_a, '$b' AS col_b, " +
        s"CASE WHEN (nd * CAST(ss_$a AS DOUBLE) - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE)) <> 0 " +
        s"AND (nd * CAST(ss_$b AS DOUBLE) - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE)) <> 0 " +
        s"THEN (nd * CAST(sp_${a}_$b AS DOUBLE) - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE)) / " +
        s"sqrt((nd * CAST(ss_$a AS DOUBLE) - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE)) * " +
        s"(nd * CAST(ss_$b AS DOUBLE) - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE))) END AS pearson_r FROM m"
    }
    s"WITH m0 AS (SELECT ${moments.mkString(", ")} FROM (SELECT $sel FROM $table) AS src), " +
      "m AS (SELECT *, CAST(n AS DOUBLE) AS nd FROM m0) " +
      arms.mkString(" UNION ALL ")
  }

  /** Chi-squared independence test between two categorical columns,
    * emitted PER CELL rather than as a single statistic: summing the
    * double-typed contributions would reintroduce a cross-engine
    * accumulation order, while per-cell values are each ONE fixed
    * expression tree over exact integer counts — `(O·n − Rt·Ct)² /
    * (Rt·Ct·n)` — deterministic in any IEEE engine. The expected count
    * is surfaced on the ppm grid by integer floor division (all
    * operands positive).
    *
    * Scale shape: ONE full scan (the cell contingency table); both
    * marginals and the grand total fold from the cell table itself,
    * which has |rows|·|cols| rows — category-cardinality scale, so the
    * marginal joins broadcast.
    */
  def chi2Cells(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val cells = df.select(col(rowCol).as("r"), col(colCol).as("c"))
      .groupBy("r", "c").agg(count(lit(1)).as("n_obs"))
    val rt = cells.groupBy("r").agg(sum("n_obs").as("n_row"))
    val ct = cells.groupBy("c").agg(sum("n_obs").as("n_col"))
    val tot = cells.agg(sum("n_obs").as("n_tot"))
    // int64 is NOT enough headroom here: with n_tot ~1.5e11 events at
    // sf1000, n_obs*n_tot reaches ~2e22 and n_row*n_col*n_tot ~1e33 —
    // Spark would wrap silently while DuckDB raises. All products run
    // in decimal(38,0) (HUGEINT in the replay); only the final fixed
    // expression casts to double.
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val num = dec(col("n_obs")) * col("n_tot") - dec(col("n_row")) * col("n_col")
    cells
      .join(broadcast(rt), "r").join(broadcast(ct), "c")
      .crossJoin(broadcast(tot))
      .select(col("r").as(rowCol), col("c").as(colCol),
        col("n_obs"), col("n_row"), col("n_col"), col("n_tot"),
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * n_row * n_col div n_tot AS BIGINT)")
          .as("exp_ppm"),
        (num.cast("double") * num.cast("double") /
          (dec(col("n_row")) * col("n_col") * col("n_tot")).cast("double"))
          .as("contrib"))
  }

  /** DuckDB replay of [[chi2Cells]] — same cell/marginal CTEs, same
    * fixed expression tree.
    */
  def chi2CellsSql(table: String, rowCol: String, colCol: String): String =
    s"WITH cells AS (SELECT $rowCol AS r, $colCol AS c, count(*) AS n_obs FROM $table GROUP BY 1, 2), " +
      "rt AS (SELECT r, CAST(sum(n_obs) AS BIGINT) AS n_row FROM cells GROUP BY 1), " +
      "ct AS (SELECT c, CAST(sum(n_obs) AS BIGINT) AS n_col FROM cells GROUP BY 1), " +
      "tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_tot FROM cells) " +
      s"SELECT cells.r AS $rowCol, cells.c AS $colCol, n_obs, n_row, n_col, n_tot, " +
      "CAST(CAST(1000000 AS HUGEINT) * n_row * n_col // n_tot AS BIGINT) AS exp_ppm, " +
      "CAST(CAST(n_obs AS HUGEINT) * n_tot - CAST(n_row AS HUGEINT) * n_col AS DOUBLE) * " +
      "CAST(CAST(n_obs AS HUGEINT) * n_tot - CAST(n_row AS HUGEINT) * n_col AS DOUBLE) / " +
      "CAST(CAST(n_row AS HUGEINT) * n_col * n_tot AS DOUBLE) AS contrib " +
      "FROM cells JOIN rt USING (r) JOIN ct USING (c) CROSS JOIN tot"

  /** Rolling spike detector over a day-grain series, entirely in
    * integer arithmetic: flag day x when `(x − μ)² > 4σ²` against the
    * trailing-week window, cross-multiplied to `(n·x − S)² >
    * 4·(n·Sxx − S²)` so NO division, sqrt, or float ever runs —
    * bit-exact in any engine, immune to the x̄/σ cancellation that
    * makes naive float z-scores unstable.
    *
    * Scale shape: the day-grain aggregate is |distinct days| rows
    * (bounded by the calendar, NOT by table size — ~3.7k rows for a
    * decade of data at ANY scale factor), so the subsequent
    * unpartitioned ordered window is metadata-scale by construction;
    * the only full-data pass is the combinable daily groupBy. Daily
    * totals fold in exact cents, then floor to whole dollars so the
    * squared terms stay far inside int64 at any realistic daily
    * volume (daily dollars < ~3e9 keeps `(n·x)²` < 6e20 — above
    * int64; in practice daily dollars ~1e7 at sf0.1 gives ~5e15).
    */
  def rollingIntegerZSpikes(orders: DataFrame, window: Int = 7, minWindow: Int = 3): DataFrame = {
    val daily = orders
      .select(to_date(col("o_orderdate")).as("d"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy("d").agg(sum("cents").as("day_cents"))
      .withColumn("x", expr("day_cents div 100"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("d").rowsBetween(-window, -1)
    daily
      .withColumn("n_w", count(lit(1)).over(w))
      .withColumn("s_w", sum("x").over(w))
      .withColumn("sxx_w", sum(col("x") * col("x")).over(w))
      .filter(col("n_w") >= minWindow)
      .withColumn("is_spike",
        (col("n_w") * col("x") - col("s_w")) * (col("n_w") * col("x") - col("s_w")) >
          lit(4) * (col("n_w") * col("sxx_w") - col("s_w") * col("s_w")))
      .select("d", "x", "n_w", "s_w", "sxx_w", "is_spike")
  }

  /** CUSUM change-point scores over a daily series, EXACT: the classic
    * cumulative deviation from the global mean, cleared of division by
    * multiplying through by `n` — `S_t = n·prefix_t − t·total` — so the
    * score is integer-exact and replays bit-for-bit (the argmax over
    * `|S_t|` is the maximum-likelihood single shift point for a mean
    * change). Products run in decimal(38,0) (HUGEINT in the oracle):
    * at 100 TB `n·prefix` passes int64, the ppm/q9 discipline applies.
    *
    * The ordered window runs on the DAILY table — calendar-bounded
    * (one row per day), the documented unpartitioned-window class; the
    * raw scan aggregates map-side first.
    */
  def cusumShift(
      rows: DataFrame,
      dateCol: String,
      valueUnits: Column): DataFrame = {
    val daily = rows.groupBy(col(dateCol).as("d"))
      .agg(sum(valueUnits.cast("long")).as("x"))
    val w = Window.orderBy(col("d"))
    val tot = daily.agg(count(lit(1)).as("n"), sum("x").as("tot"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    daily
      .withColumn("t", row_number().over(w))
      .withColumn("pfx",
        sum("x").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(tot))
      .withColumn("cusum",
        (dec(col("n")) * dec(col("pfx")) - dec(col("t")) * dec(col("tot"))).cast("long"))
      .select(col("d"), col("cusum"))
  }

  /** Poisson(1) bootstrap CDF cut points on the 16^4 md5 grid —
    * `floor(F(k)·65536)` as 4-hex-char literals, hardcoded so BOTH
    * engines compare the identical strings (no runtime exp/factorial
    * drift). Draw < cut(k) ⟺ resample count ≤ k−1… i.e. the when-chain
    * below assigns count k at the first failing cut, count 6 past the
    * last (P ≈ 5.9e-4 tail collapsed onto 6).
    */
  private val poissonCuts = Seq("5e2d", "bc5a", "eb71", "fb23", "ff10", "ffd9")

  /** Poisson bootstrap confidence interval for the per-group mean —
    * the resampling shape a training pipeline uses to error-bar any
    * per-slice metric. Instead of materializing B resampled tables,
    * each row draws an independent Poisson(1) REPLICATION COUNT per
    * replicate b from `md5(salt·b:id)` (Rubin's Poisson bootstrap —
    * the form that needs no global n and distributes embarrassingly):
    * resample mean_b = Σc·x / Σc over exact integer sums, ONE double
    * division per (group, b), then the CI is an ORDER-STATISTIC pick
    * (ceil(α·B), ceil((1−α)·B); integer ceil, no interpolation) — every
    * step replays verbatim in the oracle.
    *
    * Scale shape: the explode is a map-side ×B expansion feeding a
    * combinable (group, b) aggregation — reduce volume is groups×B
    * regardless of corpus size; the rank window runs on B rows per
    * group. Bootstrap cost IS ×B — run it on a documented hash-sample
    * of the population (the caller's filter), not the raw 100 TB.
    */
  def bootstrapMeanCI(
      rows: DataFrame,
      groupCol: String,
      valueUnits: Column,
      idCol: String,
      reps: Int = 200,
      salt: String = "boot"): DataFrame = {
    val base = rows.select(col(groupCol).as("g"),
      valueUnits.cast("long").as("x"), col(idCol).cast("string").as("id"))
    val bs = base.withColumn("b", explode(array((0 until reps).map(lit): _*)))
    val h = md5(concat(lit(salt), col("b").cast("string"), lit(":"), col("id"))
      .cast("binary")).substr(1, 4)
    val cnt = poissonCuts.zipWithIndex
      .foldLeft(when(h < poissonCuts.head, 0L)) { case (acc, (cut, k)) =>
        if (k == 0) acc else acc.when(h < cut, k.toLong)
      }.otherwise(6L)
    val means = bs.withColumn("c", cnt)
      .groupBy(col("g"), col("b"))
      .agg(sum(col("c") * col("x")).as("num"), sum(col("c")).as("den"))
      .where(col("den") > 0)
      .withColumn("mean_b", col("num").cast("double") / col("den").cast("double"))
    val byMean = Window.partitionBy("g").orderBy(col("mean_b"), col("b"))
    means
      .withColumn("rk", row_number().over(byMean))
      .withColumn("nb", count(lit(1)).over(Window.partitionBy("g")))
      .withColumn("lo_rk", expr("(nb * 25 + 999) div 1000"))
      .withColumn("hi_rk", expr("(nb * 975 + 999) div 1000"))
      .filter(col("rk") === col("lo_rk") || col("rk") === col("hi_rk"))
      .groupBy(col("g").as(groupCol))
      .agg(min("mean_b").as("ci_lo"), max("mean_b").as("ci_hi"),
        max("nb").as("n_reps"))
  }

  /** DuckDB replay of [[bootstrapMeanCI]] over the events table. */
  def bootstrapMeanCISql(
      whereClause: String, reps: Int, salt: String): String = {
    val cuts = poissonCuts
    val cntCase = ("CASE WHEN h < '" + cuts.head + "' THEN 0 " +
      cuts.zipWithIndex.drop(1)
        .map { case (c, k) => s"WHEN h < '$c' THEN $k" }.mkString(" ") +
      " ELSE 6 END")
    s"WITH base AS (SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS x, " +
      s"CAST(event_id AS VARCHAR) AS id FROM events $whereClause), " +
      s"bs AS (SELECT g, x, id, b FROM base, generate_series(0, ${reps - 1}) t(b)), " +
      s"cc AS (SELECT g, b, x, $cntCase AS c FROM (SELECT g, x, b, " +
      s"substr(md5('$salt' || CAST(b AS VARCHAR) || ':' || id), 1, 4) AS h FROM bs)), " +
      "m AS (SELECT g, b, CAST(sum(c * x) AS BIGINT) AS num, CAST(sum(c) AS BIGINT) AS den " +
      "FROM cc GROUP BY 1, 2), " +
      "mb AS (SELECT g, b, CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS mean_b FROM m WHERE den > 0), " +
      "r AS (SELECT g, b, mean_b, row_number() OVER (PARTITION BY g ORDER BY mean_b, b) AS rk, " +
      "count(*) OVER (PARTITION BY g) AS nb FROM mb) " +
      "SELECT g AS event_type, min(mean_b) AS ci_lo, max(mean_b) AS ci_hi, " +
      "CAST(max(nb) AS BIGINT) AS n_reps FROM r " +
      "WHERE rk = (nb * 25 + 999) // 1000 OR rk = (nb * 975 + 999) // 1000 GROUP BY 1"
  }

  /** Scalable global prefix sum: range-partition on the order key,
    * running-sum each partition independently, then shift every
    * partition by the exclusive sum of the partitions before it
    * (driver-side fold over ONE row per partition). The
    * [[Sampling.interleaveOrder]] discipline applied to sums instead
    * of ranks: an `ORDER BY` window with no PARTITION BY funnels the
    * whole table through one reducer — this shape never does. Range
    * boundaries vary run to run, but concatenating internally-sorted
    * ranges of a total order reproduces the one global order, so the
    * inclusive prefix is a pure function of the data.
    *
    * `orderCols` must be a TOTAL order (include a tiebreaker key) and
    * `valueCol` must already sit in the row (pre-aggregate first).
    */
  def rangePrefixSum(
      df: DataFrame,
      orderCols: Seq[Column],
      valueCol: String,
      outCol: String): DataFrame =
    rangePrefixFold(df, orderCols, valueCol, outCol, 0L, _ + _, exclusive = false)

  /** The general monoid form of [[rangePrefixSum]]: any associative
    * `op` with identity `zero` (sum, max, min, gcd, …) folds the same
    * way — per-partition folds are shifted by the fold of all prior
    * partitions' totals, which is exactly the associativity the range
    * partitioning exploits. `exclusive = true` emits the fold of
    * strictly-preceding rows (what dominance tests like skylines
    * need); `false` includes the current row.
    */
  def rangePrefixFold(
      df: DataFrame,
      orderCols: Seq[Column],
      valueCol: String,
      outCol: String,
      zero: Long,
      op: (Long, Long) => Long,
      exclusive: Boolean): DataFrame = {
    val spark = df.sparkSession
    val ordered = Caches.persisted(
      df.repartitionByRange(orderCols: _*).sortWithinPartitions(orderCols: _*))
    val valIdx = ordered.schema.fieldIndex(valueCol)
    val perPart = ordered.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = zero
        it.foreach(r => s = op(s, r.getLong(valIdx)))
        Iterator.single(pid -> s)
      }.collect().sortBy(_._1)
    val offsets = new Array[Long](perPart.length + 1)
    offsets(0) = zero
    perPart.foreach { case (pid, s) => offsets(pid + 1) = s }
    for (i <- 1 until offsets.length) offsets(i) = op(offsets(i - 1), offsets(i))
    val bOff = spark.sparkContext.broadcast(offsets)
    val outSchema = ordered.schema.add(
      org.apache.spark.sql.types.StructField(
        outCol, org.apache.spark.sql.types.LongType, nullable = false))
    val rows = ordered.rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = bOff.value(pid)
      it.map { r =>
        val before = run
        run = op(run, r.getLong(valIdx))
        org.apache.spark.sql.Row.fromSeq(
          r.toSeq :+ (if (exclusive) before else run))
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Per-group cumulative count over a distinct-value table — the
    * prefix under every rank: adds `__cum` = Σ `__n` over values ≤ this
    * row's value within its group. TWO-LEVEL, never a single-reducer
    * window: values bucket by position in the global [lo, hi] span
    * (4096 buckets; bucketing affects only parallelism — the prefix
    * algebra is exact for ANY monotone bucketing, so the output is
    * bucketing-independent), in-bucket prefixes run as parallel
    * (group, bucket)-partitioned windows, and bucket offsets ride a
    * ≤4096-rows-per-group window. A near-unique value domain (price
    * cents over a 100 TB corpus) ranks at full cluster width.
    */
  private def cumCounts(
      cnt: DataFrame,
      groupCols: Seq[String],
      valCol: String): DataFrame = {
    val bounds = cnt.agg(min(col(valCol)).as("__lo"), max(col(valCol)).as("__hi"))
    // floor((v-lo)·4096/span) is monotone in v (IEEE × and ÷ by a
    // positive constant preserve order), so equal values share a bucket
    val span = (col("__hi") - col("__lo") + lit(1L)).cast("double")
    val bucketed = cnt.crossJoin(broadcast(bounds))
      .withColumn("__bkt",
        when(col("__hi") === col("__lo"), 0L)
          .otherwise(floor((col(valCol) - col("__lo")).cast("double") *
            lit(4096.0) / span).cast("long")))
      .drop("__lo", "__hi")
    val inBucket = Window
      .partitionBy((groupCols :+ "__bkt").map(col): _*).orderBy(col(valCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offW = (if (groupCols.isEmpty) Window.orderBy(col("__bkt"))
                else Window.partitionBy(groupCols.map(col): _*).orderBy(col("__bkt")))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bTot = bucketed.groupBy((groupCols :+ "__bkt").map(col): _*)
      .agg(sum("__n").as("__bt"))
      .withColumn("__off", coalesce(sum("__bt").over(offW), lit(0L)))
      .drop("__bt")
    bucketed
      .withColumn("__cumb", sum("__n").over(inBucket))
      .join(bTot, groupCols :+ "__bkt")
      .withColumn("__cum", col("__off") + col("__cumb"))
      .drop("__bkt", "__cumb", "__off")
  }

  /** Doubled average ranks (2·rank, always an integer) for a value
    * column, per group — the shared machinery under [[spearman]] and
    * [[mannWhitneyU]]. Tied values get the tie group's AVERAGE rank;
    * doubling keeps it on the integer grid (2r = 2·cum − n + 1).
    * Scale shape: map-side combinable counts + the [[cumCounts]]
    * two-level prefix; ranks join back by (group, value).
    */
  private def rank2Table(
      rows: DataFrame,
      groupCols: Seq[String],
      valCol: String,
      outCol: String): DataFrame = {
    val cnt = rows.groupBy((groupCols :+ valCol).map(col): _*)
      .agg(count(lit(1)).as("__n"))
    cumCounts(cnt, groupCols, valCol)
      .select((groupCols :+ valCol).map(col) :+
        (lit(2L) * col("__cum") - col("__n") + lit(1L)).as(outCol): _*)
  }

  /** Spearman rank correlation per group — the monotone-association
    * readout quality pipelines want when Pearson's linearity
    * assumption doesn't hold (heavy-tailed spend, score-vs-length).
    * Ties take average ranks (the standard ρ with ties); the doubled
    * ranks stay integers, so ρ is Pearson's closed form over EXACT
    * decimal(38,0) rank moments — the [[groupOls]] cross-engine
    * discipline, immune to int64 overflow at any corpus size (rank
    * products reach 4n² per row).
    *
    * Scale shape: two distinct-value rank tables (map-side combinable
    * counts + a two-level bucketed prefix each), two equi-joins back,
    * one combinable moment aggregation. No single-reducer window
    * anywhere — near-unique value domains rank in parallel.
    */
  def spearman(
      df: DataFrame,
      groupCols: Seq[String],
      xUnits: Column,
      yUnits: Column): DataFrame = {
    val rows = df.select(groupCols.map(col) ++ Seq(
      xUnits.cast("long").as("__x"), yUnits.cast("long").as("__y")): _*)
    val rx = rank2Table(rows, groupCols, "__x", "__rx")
    val ry = rank2Table(rows, groupCols, "__y", "__ry")
    val ranked = rows
      .join(rx, groupCols :+ "__x")
      .join(ry, groupCols :+ "__y")
    def dec(c: Column) = c.cast("decimal(38,0)")
    val m = ranked.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(dec(col("__rx"))).as("__sx"),
        sum(dec(col("__ry"))).as("__sy"),
        sum(dec(col("__rx")) * dec(col("__rx"))).as("__sxx"),
        sum(dec(col("__rx")) * dec(col("__ry"))).as("__sxy"),
        sum(dec(col("__ry")) * dec(col("__ry"))).as("__syy"))
    val nD = col("n").cast("double")
    val sx = col("__sx").cast("double"); val sy = col("__sy").cast("double")
    val sxx = col("__sxx").cast("double"); val sxy = col("__sxy").cast("double")
    val syy = col("__syy").cast("double")
    val num = nD * sxy - sx * sy
    val den = nD * sxx - sx * sx
    val deny = nD * syy - sy * sy
    m.select(groupCols.map(col) :+ col("n") :+
      when(den =!= 0.0 && deny =!= 0.0, num / sqrt(den * deny)).as("rho"): _*)
  }

  /** DuckDB replay of [[spearman]] — same distinct-value rank CTEs,
    * same HUGEINT moments, same double expression tree.
    */
  def spearmanSql(
      table: String,
      groupCols: Seq[String],
      xUnitsSql: String,
      yUnitsSql: String): String = {
    val g = groupCols.mkString(", ")
    val gc = if (groupCols.isEmpty) "" else s"$g, "
    val part = if (groupCols.isEmpty) "" else s"PARTITION BY $g "
    def rankCte(v: String, out: String) =
      s"(SELECT $gc$v, 2 * sum(n) OVER (${part}ORDER BY $v ROWS UNBOUNDED PRECEDING) - n + 1 AS $out " +
        s"FROM (SELECT $gc$v, count(*) AS n FROM r GROUP BY ALL) c)"
    val joinKeys = (groupCols :+ "__x").mkString(", ")
    val joinKeysY = (groupCols :+ "__y").mkString(", ")
    s"WITH r AS (SELECT $gc$xUnitsSql AS __x, $yUnitsSql AS __y FROM $table), " +
      s"rx AS ${rankCte("__x", "rx2")}, ry AS ${rankCte("__y", "ry2")}, " +
      s"j AS (SELECT ${if (groupCols.isEmpty) "" else groupCols.map(c => s"r.$c").mkString(", ") + ", "}rx.rx2, ry.ry2 " +
      s"FROM r JOIN rx USING ($joinKeys) JOIN ry USING ($joinKeysY)), " +
      s"m AS (SELECT ${gc}count(*) AS n, " +
      "CAST(sum(CAST(rx2 AS HUGEINT)) AS HUGEINT) AS sx, CAST(sum(CAST(ry2 AS HUGEINT)) AS HUGEINT) AS sy, " +
      "CAST(sum(CAST(rx2 AS HUGEINT) * CAST(rx2 AS HUGEINT)) AS HUGEINT) AS sxx, " +
      "CAST(sum(CAST(rx2 AS HUGEINT) * CAST(ry2 AS HUGEINT)) AS HUGEINT) AS sxy, " +
      "CAST(sum(CAST(ry2 AS HUGEINT) * CAST(ry2 AS HUGEINT)) AS HUGEINT) AS syy " +
      s"FROM j GROUP BY ALL), " +
      "e AS (SELECT *, CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd, " +
      "CAST(sxx AS DOUBLE) AS sxxd, CAST(sxy AS DOUBLE) AS sxyd, CAST(syy AS DOUBLE) AS syyd FROM m) " +
      s"SELECT ${gc}n, CASE WHEN nd * sxxd - sxd * sxd <> 0 AND nd * syyd - syd * syd <> 0 " +
      "THEN (nd * sxyd - sxd * syd) / sqrt((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)) END AS rho " +
      "FROM e"
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) — the nonparametric two-sample
    * test an experimentation stack reaches for when spend/latency is
    * too heavy-tailed for the z-test: does sample A stochastically
    * dominate sample B? Average ranks over the COMBINED sample (ties
    * handled), the tie-corrected normal approximation for z. U and the
    * tie term stay on the exact decimal grid (n1·(n1+1) and Σ(t³−t)
    * overflow int64 at corpus scale); z is one fixed double expression
    * over those exact sums, identical in both engines.
    *
    * Scale shape: one combinable (value → n, n_a) count table, a
    * two-level bucketed prefix for the combined ranks, one global fold.
    * Output: one row (n1, n2, u — sample A's U statistic — and z).
    */
  def mannWhitneyU(
      df: DataFrame,
      valueUnits: Column,
      isA: Column): DataFrame = {
    val rows = df.select(valueUnits.cast("long").as("__v"),
      when(isA, 1L).otherwise(0L).as("__a"))
    val cnt = rows.groupBy("__v")
      .agg(count(lit(1)).as("__n"), sum("__a").as("__na"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    // cumulative count over distinct values via the two-level bucketed
    // prefix (same reasoning as rank2Table: the value domain can be
    // corpus-sized, so no single-reducer ORDER BY window)
    val ranked = cumCounts(cnt, Nil, "__v")
      .withColumn("__r2", lit(2L) * col("__cum") - col("__n") + lit(1L))
    val m = ranked.agg(
      sum("__n").as("n"),
      sum("__na").as("n1"),
      sum(dec(col("__na")) * dec(col("__r2"))).as("__r2a"),
      sum(dec(col("__n")) * dec(col("__n")) * dec(col("__n")) - dec(col("__n")))
        .as("__tie"))
    // 2·U1 = Σ(2r over A) − n1·(n1+1); σ²(U1) tie-corrected:
    // n1·n2/12 · ((n+1) − T/(n·(n−1))); z = (2U1 − n1·n2) / (2σ)
    val n1d = col("n1").cast("double")
    val n2d = (col("n") - col("n1")).cast("double")
    val nd = col("n").cast("double")
    val u2 = col("__r2a").cast("double") - n1d * (n1d + 1.0)
    val tie = col("__tie").cast("double")
    val sig2 = n1d * n2d / 12.0 * ((nd + 1.0) - tie / (nd * (nd - 1.0)))
    m.select(col("n1"), (col("n") - col("n1")).as("n2"),
      (u2 / 2.0).as("u"),
      when(col("n1") > 0 && col("n") > col("n1") && col("n") > 1 && sig2 > 0.0,
        (u2 - n1d * n2d) / (lit(2.0) * sqrt(sig2))).as("z"))
  }

  /** DuckDB replay of [[mannWhitneyU]]. */
  def mannWhitneyUSql(
      table: String,
      valueUnitsSql: String,
      isASql: String,
      whereClause: String = ""): String =
    s"WITH r AS (SELECT $valueUnitsSql AS v, CASE WHEN $isASql THEN 1 ELSE 0 END AS a " +
      s"FROM $table $whereClause), " +
      "c AS (SELECT v, count(*) AS n, CAST(sum(a) AS BIGINT) AS na FROM r GROUP BY 1), " +
      "w AS (SELECT v, n, na, 2 * sum(n) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - n + 1 AS r2 FROM c), " +
      "m AS (SELECT CAST(sum(n) AS BIGINT) AS n, CAST(sum(na) AS BIGINT) AS n1, " +
      "CAST(sum(CAST(na AS HUGEINT) * CAST(r2 AS HUGEINT)) AS HUGEINT) AS r2a, " +
      "CAST(sum(CAST(n AS HUGEINT) * CAST(n AS HUGEINT) * CAST(n AS HUGEINT) - CAST(n AS HUGEINT)) AS HUGEINT) AS tie FROM w), " +
      "e AS (SELECT n, n1, n - n1 AS n2, CAST(n AS DOUBLE) AS nd, CAST(n1 AS DOUBLE) AS n1d, " +
      "CAST(n - n1 AS DOUBLE) AS n2d, CAST(r2a AS DOUBLE) AS r2ad, CAST(tie AS DOUBLE) AS tied FROM m), " +
      "f AS (SELECT *, r2ad - n1d * (n1d + 1.0) AS u2, " +
      "n1d * n2d / 12.0 * ((nd + 1.0) - tied / (nd * (nd - 1.0))) AS sig2 FROM e) " +
      "SELECT n1, n2, u2 / 2.0 AS u, " +
      "CASE WHEN n1 > 0 AND n > n1 AND n > 1 AND sig2 > 0.0 " +
      "THEN (u2 - n1d * n2d) / (2.0 * sqrt(sig2)) END AS z FROM f"

  /** Exact ROC AUC from integer scores — the probability a random
    * positive outscores a random negative, ties at half credit: AUC =
    * U⁺/(n⁺·n⁻), i.e. [[mannWhitneyU]] renormalized (the textbook
    * identity), so the average-rank tie handling and the two-level
    * bucketed rank prefix carry over unchanged. One exact-integer
    * pipeline ending in ONE double division — no threshold sweep, no
    * trapezoid sum, no curve materialization.
    */
  def aucFromScores(
      df: DataFrame,
      scoreUnits: Column,
      isPos: Column): DataFrame =
    mannWhitneyU(df, scoreUnits, isPos)
      .select(col("n1").as("n_pos"), col("n2").as("n_neg"),
        when(col("n1") > 0 && col("n2") > 0,
          col("u") / (col("n1").cast("double") * col("n2").cast("double")))
          .as("auc"))

  /** DuckDB replay of [[aucFromScores]] over a `scores` relation the
    * caller provides as a CTE (columns per `scoreSql` / `isPosSql`).
    */
  def aucFromScoresSql(
      scoresTable: String,
      scoreSql: String,
      isPosSql: String): String =
    s"SELECT n1 AS n_pos, n2 AS n_neg, " +
      "CASE WHEN n1 > 0 AND n2 > 0 THEN u / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) END AS auc " +
      s"FROM (${mannWhitneyUSql(scoresTable, scoreSql, isPosSql)}) mw"

  /** Welch's unequal-variance t-test — the parametric sibling of
    * [[mannWhitneyU]] (same two-sample question, assumes means are
    * meaningful): t and the Welch–Satterthwaite degrees of freedom
    * from per-arm exact moments (n, Σx, Σx²) on the decimal(38,0)
    * grid, combined in ONE fixed double expression tree replayed by
    * the oracle. One combinable scan — conditional sums split the
    * arms, no second pass, no per-arm shuffle.
    */
  def welchT(
      df: DataFrame,
      valueUnits: Column,
      isA: Column): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val rows = df.select(valueUnits.cast("long").as("__x"),
      when(isA, 1L).otherwise(0L).as("__a"))
    val m = rows.agg(
      sum("__a").as("n1"),
      sum(lit(1L) - col("__a")).as("n2"),
      sum(dec(col("__a") * col("__x"))).as("__s1"),
      sum(dec((lit(1L) - col("__a")) * col("__x"))).as("__s2"),
      sum(dec(col("__a")) * dec(col("__x")) * dec(col("__x"))).as("__ss1"),
      sum(dec(lit(1L) - col("__a")) * dec(col("__x")) * dec(col("__x"))).as("__ss2"))
    val n1 = col("n1").cast("double"); val n2 = col("n2").cast("double")
    val s1 = col("__s1").cast("double"); val s2 = col("__s2").cast("double")
    val ss1 = col("__ss1").cast("double"); val ss2 = col("__ss2").cast("double")
    val m1 = s1 / n1; val m2 = s2 / n2
    val v1 = (ss1 - s1 * s1 / n1) / (n1 - 1.0)
    val v2 = (ss2 - s2 * s2 / n2) / (n2 - 1.0)
    val se2 = v1 / n1 + v2 / n2
    val dfW = se2 * se2 /
      ((v1 / n1) * (v1 / n1) / (n1 - 1.0) + (v2 / n2) * (v2 / n2) / (n2 - 1.0))
    val ok = col("n1") > 1 && col("n2") > 1
    m.select(col("n1"), col("n2"),
      when(ok, (m1 - m2)).as("mean_diff"),
      when(ok && se2 > 0.0, (m1 - m2) / sqrt(se2)).as("t"),
      when(ok && se2 > 0.0, dfW).as("df_welch"))
  }

  /** DuckDB replay of [[welchT]]. */
  def welchTSql(
      table: String,
      valueUnitsSql: String,
      isASql: String,
      whereClause: String = ""): String =
    s"WITH r AS (SELECT $valueUnitsSql AS x, CASE WHEN $isASql THEN 1 ELSE 0 END AS a " +
      s"FROM $table $whereClause), " +
      "m AS (SELECT CAST(sum(a) AS BIGINT) AS n1, CAST(sum(1 - a) AS BIGINT) AS n2, " +
      "CAST(sum(CAST(a * x AS HUGEINT)) AS HUGEINT) AS s1, " +
      "CAST(sum(CAST((1 - a) * x AS HUGEINT)) AS HUGEINT) AS s2, " +
      "CAST(sum(CAST(a AS HUGEINT) * CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT) AS ss1, " +
      "CAST(sum(CAST(1 - a AS HUGEINT) * CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT) AS ss2 FROM r), " +
      "e AS (SELECT n1, n2, CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d, " +
      "CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d, " +
      "CAST(ss1 AS DOUBLE) AS ss1d, CAST(ss2 AS DOUBLE) AS ss2d FROM m), " +
      "f AS (SELECT *, s1d / n1d AS m1, s2d / n2d AS m2, " +
      "(ss1d - s1d * s1d / n1d) / (n1d - 1.0) AS v1, " +
      "(ss2d - s2d * s2d / n2d) / (n2d - 1.0) AS v2 FROM e), " +
      "g AS (SELECT *, v1 / n1d + v2 / n2d AS se2 FROM f) " +
      "SELECT n1, n2, CASE WHEN n1 > 1 AND n2 > 1 THEN m1 - m2 END AS mean_diff, " +
      "CASE WHEN n1 > 1 AND n2 > 1 AND se2 > 0.0 THEN (m1 - m2) / sqrt(se2) END AS t, " +
      "CASE WHEN n1 > 1 AND n2 > 1 AND se2 > 0.0 THEN se2 * se2 / " +
      "((v1 / n1d) * (v1 / n1d) / (n1d - 1.0) + (v2 / n2d) * (v2 / n2d) / (n2d - 1.0)) END AS df_welch " +
      "FROM g"

  /** Autocorrelation function of a daily integer series at lags
    * 1..maxLag — the seasonality detector behind "is this metric
    * weekly-periodic?" (a spike at lag 7 is the canonical signature).
    * Per lag, Pearson's r over the aligned pairs (x_t, x_{t+lag}) via
    * the exact-decimal moment discipline; alignment is an EQUI-join on
    * shifted dates (d + lag = d'), never a self-cross.
    *
    * Scale shape: the raw scan folds to the calendar-bounded daily
    * table map-side; the lag explode is ×maxLag on that bounded table;
    * moments aggregate combinably per lag. Nothing here grows with
    * corpus size.
    */
  def acf(
      rows: DataFrame,
      dateCol: String,
      valueUnits: Column,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1)
    val daily = rows.groupBy(to_date(col(dateCol)).as("d"))
      .agg(sum(valueUnits.cast("long")).as("x"))
    val a = daily
      .withColumn("lag_d", explode(array((1 to maxLag).map(i => lit(i)): _*)))
      .select(col("lag_d"), col("d"), col("x").as("__xa"))
    val b = daily.select(col("d").as("__d2"), col("x").as("__xb"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val pairs = a.join(b, expr("__d2 = date_add(d, lag_d)"))
    val m = pairs.groupBy("lag_d")
      .agg(count(lit(1)).as("n_pairs"),
        sum(dec(col("__xa"))).as("__sx"),
        sum(dec(col("__xb"))).as("__sy"),
        sum(dec(col("__xa")) * dec(col("__xa"))).as("__sxx"),
        sum(dec(col("__xa")) * dec(col("__xb"))).as("__sxy"),
        sum(dec(col("__xb")) * dec(col("__xb"))).as("__syy"))
    val nD = col("n_pairs").cast("double")
    val sx = col("__sx").cast("double"); val sy = col("__sy").cast("double")
    val sxx = col("__sxx").cast("double"); val sxy = col("__sxy").cast("double")
    val syy = col("__syy").cast("double")
    val num = nD * sxy - sx * sy
    val den = nD * sxx - sx * sx
    val deny = nD * syy - sy * sy
    m.select(col("lag_d"), col("n_pairs"),
      when(den =!= 0.0 && deny =!= 0.0, num / sqrt(den * deny)).as("r"))
  }

  /** DuckDB replay of [[acf]] over the orders table. */
  def acfSql(table: String, valueUnitsSql: String, maxLag: Int): String =
    s"WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d, " +
      s"CAST(sum($valueUnitsSql) AS BIGINT) AS x FROM $table GROUP BY 1), " +
      s"lags AS (SELECT CAST(unnest(generate_series(1, $maxLag)) AS INT) AS lag_d), " +
      "p AS (SELECT l.lag_d, a.x AS xa, b.x AS xb FROM lags l " +
      "CROSS JOIN daily a JOIN daily b ON b.d = a.d + l.lag_d), " +
      "m AS (SELECT lag_d, count(*) AS n_pairs, " +
      "CAST(sum(CAST(xa AS HUGEINT)) AS HUGEINT) AS sx, CAST(sum(CAST(xb AS HUGEINT)) AS HUGEINT) AS sy, " +
      "CAST(sum(CAST(xa AS HUGEINT) * CAST(xa AS HUGEINT)) AS HUGEINT) AS sxx, " +
      "CAST(sum(CAST(xa AS HUGEINT) * CAST(xb AS HUGEINT)) AS HUGEINT) AS sxy, " +
      "CAST(sum(CAST(xb AS HUGEINT) * CAST(xb AS HUGEINT)) AS HUGEINT) AS syy " +
      "FROM p GROUP BY 1), " +
      "e AS (SELECT lag_d, n_pairs, CAST(n_pairs AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd, " +
      "CAST(sy AS DOUBLE) AS syd, CAST(sxx AS DOUBLE) AS sxxd, CAST(sxy AS DOUBLE) AS sxyd, " +
      "CAST(syy AS DOUBLE) AS syyd FROM m) " +
      "SELECT lag_d, n_pairs, CASE WHEN nd * sxxd - sxd * sxd <> 0 AND nd * syyd - syd * syd <> 0 " +
      "THEN (nd * sxyd - sxd * syd) / sqrt((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)) END AS r " +
      "FROM e"

  /** Rolling Pearson correlation between two integer daily series over
    * a trailing window — "are these metrics moving together RIGHT NOW"
    * (revenue vs traffic decoupling is an incident signal). The five
    * joint moments ride ONE shared window over the calendar-bounded
    * joined daily table (the documented unpartitioned-window class);
    * r per day is the fixed double tree over exact window sums.
    * Days present in only one series are dropped (inner join) — a gap
    * is a data-quality event, not a zero.
    */
  def rollingCorrDaily(
      rowsA: DataFrame,
      dateA: String,
      unitsA: Column,
      rowsB: DataFrame,
      dateB: String,
      unitsB: Column,
      windowDays: Int = 28): DataFrame = {
    require(windowDays >= 2)
    val a = rowsA.groupBy(to_date(col(dateA)).as("d"))
      .agg(sum(unitsA.cast("long")).as("xa"))
    val b = rowsB.groupBy(to_date(col(dateB)).as("d"))
      .agg(sum(unitsB.cast("long")).as("xb"))
    val j = a.join(b, "d")
    val w = Window.orderBy(col("d"))
      .rowsBetween(-(windowDays - 1), Window.currentRow)
    val m = j.select(col("d"),
      count(lit(1)).over(w).as("n_w"),
      sum("xa").over(w).as("sa"), sum("xb").over(w).as("sb"),
      sum(col("xa") * col("xa")).over(w).as("saa"),
      sum(col("xa") * col("xb")).over(w).as("sab"),
      sum(col("xb") * col("xb")).over(w).as("sbb"))
    val nD = col("n_w").cast("double")
    val sa = col("sa").cast("double"); val sb = col("sb").cast("double")
    val saa = col("saa").cast("double"); val sab = col("sab").cast("double")
    val sbb = col("sbb").cast("double")
    val num = nD * sab - sa * sb
    val da = nD * saa - sa * sa
    val db = nD * sbb - sb * sb
    m.select(col("d"), col("n_w"),
      when(col("n_w") >= 2 && da =!= 0.0 && db =!= 0.0,
        num / sqrt(da * db)).as("r"))
  }

  /** DuckDB replay of [[rollingCorrDaily]] over two event-type slices
    * of the events table.
    */
  def rollingCorrDailySql(
      typeA: String, typeB: String, windowDays: Int): String =
    s"WITH a AS (SELECT CAST(ts AS DATE) AS d, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS xa " +
      s"FROM events WHERE event_type = '$typeA' GROUP BY 1), " +
      s"b AS (SELECT CAST(ts AS DATE) AS d, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS xb " +
      s"FROM events WHERE event_type = '$typeB' GROUP BY 1), " +
      "j AS (SELECT a.d, a.xa, b.xb FROM a JOIN b ON a.d = b.d), " +
      "m AS (SELECT d, CAST(count(*) OVER w AS BIGINT) AS n_w, " +
      "CAST(sum(xa) OVER w AS BIGINT) AS sa, CAST(sum(xb) OVER w AS BIGINT) AS sb, " +
      "CAST(sum(xa * xa) OVER w AS BIGINT) AS saa, CAST(sum(xa * xb) OVER w AS BIGINT) AS sab, " +
      "CAST(sum(xb * xb) OVER w AS BIGINT) AS sbb FROM j " +
      s"WINDOW w AS (ORDER BY d ROWS BETWEEN ${windowDays - 1} PRECEDING AND CURRENT ROW)), " +
      "e AS (SELECT d, n_w, CAST(n_w AS DOUBLE) AS nd, CAST(sa AS DOUBLE) AS sad, " +
      "CAST(sb AS DOUBLE) AS sbd, CAST(saa AS DOUBLE) AS saad, CAST(sab AS DOUBLE) AS sabd, " +
      "CAST(sbb AS DOUBLE) AS sbbd FROM m) " +
      "SELECT d, n_w, CASE WHEN n_w >= 2 AND nd * saad - sad * sad <> 0 AND nd * sbbd - sbd * sbd <> 0 " +
      "THEN (nd * sabd - sad * sbd) / sqrt((nd * saad - sad * sad) * (nd * sbbd - sbd * sbd)) END AS r " +
      "FROM e"

  /** Cross-correlation between two daily series at signed lags
    * −maxLag..maxLag: r(ℓ) correlates A(t) with B(t+ℓ), so a peak at
    * POSITIVE ℓ reads "A leads B by ℓ days" — the lead/lag detector
    * behind "views today predict purchases in N days". Same exact-
    * decimal moment discipline and shifted-date equi-join as [[acf]]
    * (which is the special case A = B, ℓ ≥ 1).
    */
  def xcorrDaily(
      rowsA: DataFrame,
      dateA: String,
      unitsA: Column,
      rowsB: DataFrame,
      dateB: String,
      unitsB: Column,
      maxLag: Int): DataFrame = {
    require(maxLag >= 0)
    val a = rowsA.groupBy(to_date(col(dateA)).as("d"))
      .agg(sum(unitsA.cast("long")).as("xa"))
    val b = rowsB.groupBy(to_date(col(dateB)).as("d"))
      .agg(sum(unitsB.cast("long")).as("xb"))
    val lagged = a
      .withColumn("lag_d", explode(array((-maxLag to maxLag).map(i => lit(i)): _*)))
      .select(col("lag_d"), col("d"), col("xa"))
    val bb = b.select(col("d").as("__d2"), col("xb"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val pairs = lagged.join(bb, expr("__d2 = date_add(d, lag_d)"))
    val m = pairs.groupBy("lag_d")
      .agg(count(lit(1)).as("n_pairs"),
        sum(dec(col("xa"))).as("__sx"), sum(dec(col("xb"))).as("__sy"),
        sum(dec(col("xa")) * dec(col("xa"))).as("__sxx"),
        sum(dec(col("xa")) * dec(col("xb"))).as("__sxy"),
        sum(dec(col("xb")) * dec(col("xb"))).as("__syy"))
    val nD = col("n_pairs").cast("double")
    val sx = col("__sx").cast("double"); val sy = col("__sy").cast("double")
    val sxx = col("__sxx").cast("double"); val sxy = col("__sxy").cast("double")
    val syy = col("__syy").cast("double")
    val num = nD * sxy - sx * sy
    val den = nD * sxx - sx * sx
    val deny = nD * syy - sy * sy
    m.select(col("lag_d"), col("n_pairs"),
      when(den =!= 0.0 && deny =!= 0.0, num / sqrt(den * deny)).as("r"))
  }

  /** DuckDB replay of [[xcorrDaily]] over two event-type slices. */
  def xcorrDailySql(typeA: String, typeB: String, maxLag: Int): String =
    s"WITH a AS (SELECT CAST(ts AS DATE) AS d, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS xa " +
      s"FROM events WHERE event_type = '$typeA' GROUP BY 1), " +
      s"b AS (SELECT CAST(ts AS DATE) AS d, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS xb " +
      s"FROM events WHERE event_type = '$typeB' GROUP BY 1), " +
      s"lags AS (SELECT CAST(unnest(generate_series(-$maxLag, $maxLag)) AS INT) AS lag_d), " +
      "p AS (SELECT l.lag_d, a.xa, b.xb FROM lags l " +
      "CROSS JOIN a JOIN b ON b.d = a.d + l.lag_d), " +
      "m AS (SELECT lag_d, count(*) AS n_pairs, " +
      "CAST(sum(CAST(xa AS HUGEINT)) AS HUGEINT) AS sx, CAST(sum(CAST(xb AS HUGEINT)) AS HUGEINT) AS sy, " +
      "CAST(sum(CAST(xa AS HUGEINT) * CAST(xa AS HUGEINT)) AS HUGEINT) AS sxx, " +
      "CAST(sum(CAST(xa AS HUGEINT) * CAST(xb AS HUGEINT)) AS HUGEINT) AS sxy, " +
      "CAST(sum(CAST(xb AS HUGEINT) * CAST(xb AS HUGEINT)) AS HUGEINT) AS syy " +
      "FROM p GROUP BY 1), " +
      "e AS (SELECT lag_d, n_pairs, CAST(n_pairs AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd, " +
      "CAST(sy AS DOUBLE) AS syd, CAST(sxx AS DOUBLE) AS sxxd, CAST(sxy AS DOUBLE) AS sxyd, " +
      "CAST(syy AS DOUBLE) AS syyd FROM m) " +
      "SELECT lag_d, n_pairs, CASE WHEN nd * sxxd - sxd * sxd <> 0 AND nd * syyd - syd * syd <> 0 " +
      "THEN (nd * sxyd - sxd * syd) / sqrt((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)) END AS r " +
      "FROM e"

  /** Decision-stump split finding: for every candidate threshold `t`
    * over an integer feature, the exact class counts of the induced
    * partition (feature ≤ t vs > t) and an integer Gini-purity score —
    * the inner loop of decision-tree training and of "which feature
    * value separates good from bad documents" data-curation triage.
    *
    * Scale shape: ONE combinable groupBy collapses the corpus to one
    * row per distinct feature value (the only data-sized pass), then
    * prefix sums over that value table give every threshold's left
    * counts in a single ordered window. The window is unpartitioned
    * but runs on the VALUE table — bounded by feature cardinality
    * (≤ a few thousand for binned features), never by row count; at
    * 100 TB the heavy lifting stays in the map-side-combined first
    * aggregation. Totals ride in via one broadcast scalar row.
    *
    * Purity is Σ_side ⌊10⁶·(pos² + neg²) / n⌋ (maximize ⇔ minimize
    * weighted Gini impurity up to the pinned floor-division grid) —
    * numerators in DECIMAL(38,0) per the ppm discipline (int64 wraps
    * once n > ~3·10⁶). The quotient is bounded by 10⁶·n (a pure side
    * contributes 10⁶·n_side), so the BIGINT cast stays lossless while
    * n < ~9·10¹² — do NOT stack another 10⁶ factor on it. Splits with
    * an empty side (the max value) are excluded.
    * Output: split_v, n_left, pos_left, n_right, pos_right,
    * purity_ppm — all BIGINT, hash-exact cross-engine.
    */
  def bestSplits(df: DataFrame, featureUnits: Column, positive: Column): DataFrame = {
    val byV = df
      .select(featureUnits.cast("long").as("split_v"),
        when(positive, 1L).otherwise(0L).as("__pos"))
      .groupBy("split_v")
      .agg(count(lit(1)).as("__n_v"), sum(col("__pos")).as("__pos_v"))
    val w = Window.orderBy("split_v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = byV.agg(sum("__n_v").as("__n_tot"), sum("__pos_v").as("__pos_tot"))
    byV
      .withColumn("n_left", sum("__n_v").over(w))
      .withColumn("pos_left", sum("__pos_v").over(w))
      .crossJoin(broadcast(totals))
      .withColumn("n_right", col("__n_tot") - col("n_left"))
      .withColumn("pos_right", col("__pos_tot") - col("pos_left"))
      .filter(col("n_right") > 0)
      .withColumn("purity_ppm", expr(
        "CAST(CAST(1000000 AS DECIMAL(38,0)) * (CAST(pos_left AS DECIMAL(38,0))*pos_left + CAST(n_left-pos_left AS DECIMAL(38,0))*(n_left-pos_left)) div n_left " +
          "+ CAST(1000000 AS DECIMAL(38,0)) * (CAST(pos_right AS DECIMAL(38,0))*pos_right + CAST(n_right-pos_right AS DECIMAL(38,0))*(n_right-pos_right)) div n_right AS BIGINT)"))
      .select("split_v", "n_left", "pos_left", "n_right", "pos_right", "purity_ppm")
  }

  /** DuckDB replay of [[bestSplits]]. `featureSql`/`positiveSql` must
    * mirror the Spark expressions textually. */
  def bestSplitsSql(table: String, featureSql: String, positiveSql: String): String =
    s"WITH byv AS (SELECT CAST($featureSql AS BIGINT) AS split_v, " +
      s"count(*) AS n_v, CAST(sum(CASE WHEN $positiveSql THEN 1 ELSE 0 END) AS BIGINT) AS pos_v " +
      s"FROM $table GROUP BY 1), " +
      "pre AS (SELECT split_v, " +
      "CAST(sum(n_v) OVER (ORDER BY split_v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_left, " +
      "CAST(sum(pos_v) OVER (ORDER BY split_v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pos_left, " +
      "CAST((SELECT sum(n_v) FROM byv) AS BIGINT) AS n_tot, " +
      "CAST((SELECT sum(pos_v) FROM byv) AS BIGINT) AS pos_tot FROM byv) " +
      "SELECT split_v, n_left, pos_left, n_tot - n_left AS n_right, pos_tot - pos_left AS pos_right, " +
      "CAST(1000000::HUGEINT * (pos_left::HUGEINT*pos_left + (n_left-pos_left)::HUGEINT*(n_left-pos_left)) // n_left " +
      "+ 1000000::HUGEINT * ((pos_tot-pos_left)::HUGEINT*(pos_tot-pos_left) + ((n_tot-n_left)-(pos_tot-pos_left))::HUGEINT*((n_tot-n_left)-(pos_tot-pos_left))) // (n_tot - n_left) AS BIGINT) AS purity_ppm " +
      "FROM pre WHERE n_tot - n_left > 0"

  /** Feature selection by stump sweep: [[bestSplits]] generalized to
    * many candidate features at once, returning each feature's single
    * best threshold — "which column separates the classes best", the
    * ranking that drives both tree building and curation-feature
    * triage. Features are stacked with one `explode` over a literal
    * struct array (rows × features, map-side, no join), collapsed to
    * one row per (feature, value) by the only data-sized aggregation,
    * then swept with PARTITIONED prefix windows — per-feature
    * cardinality bounds every sort. Ties on purity resolve to the
    * smallest threshold.
    */
  def bestSplitRank(
      df: DataFrame,
      features: Seq[(String, Column)],
      positive: Column): DataFrame = {
    require(features.nonEmpty, "need at least one feature")
    val stacked = df
      .select(explode(array(features.map { case (n, c) =>
          struct(lit(n).as("feature"), c.cast("long").as("v")) }: _*)).as("fv"),
        when(positive, 1L).otherwise(0L).as("__pos"))
      .select(col("fv.feature").as("feature"), col("fv.v").as("split_v"),
        col("__pos"))
    val byV = stacked.groupBy("feature", "split_v")
      .agg(count(lit(1)).as("__n_v"), sum("__pos").as("__pos_v"))
    val w = Window.partitionBy("feature").orderBy("split_v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = byV.groupBy("feature")
      .agg(sum("__n_v").as("__n_tot"), sum("__pos_v").as("__pos_tot"))
    val wBest = Window.partitionBy("feature")
      .orderBy(col("purity_ppm").desc, col("split_v"))
    byV
      .withColumn("n_left", sum("__n_v").over(w))
      .withColumn("pos_left", sum("__pos_v").over(w))
      .join(broadcast(totals), "feature")
      .withColumn("n_right", col("__n_tot") - col("n_left"))
      .withColumn("pos_right", col("__pos_tot") - col("pos_left"))
      .filter(col("n_right") > 0)
      .withColumn("purity_ppm", expr(
        "CAST(CAST(1000000 AS DECIMAL(38,0)) * (CAST(pos_left AS DECIMAL(38,0))*pos_left + CAST(n_left-pos_left AS DECIMAL(38,0))*(n_left-pos_left)) div n_left " +
          "+ CAST(1000000 AS DECIMAL(38,0)) * (CAST(pos_right AS DECIMAL(38,0))*pos_right + CAST(n_right-pos_right AS DECIMAL(38,0))*(n_right-pos_right)) div n_right AS BIGINT)"))
      .withColumn("__rk", row_number().over(wBest))
      .filter(col("__rk") === 1)
      .select(col("feature"), col("split_v").as("best_split_v"),
        col("n_left"), col("pos_left"), col("n_right"), col("pos_right"),
        col("purity_ppm"))
  }

  /** DuckDB replay of [[bestSplitRank]]: the stack is a UNION ALL over
    * the feature expressions. */
  def bestSplitRankSql(
      table: String,
      features: Seq[(String, String)],
      positiveSql: String): String = {
    val stack = features.map { case (n, f) =>
      s"SELECT '$n' AS feature, CAST($f AS BIGINT) AS split_v, " +
        s"CASE WHEN $positiveSql THEN 1 ELSE 0 END AS pos FROM $table"
    }.mkString(" UNION ALL ")
    s"WITH stacked AS ($stack), " +
      "byv AS (SELECT feature, split_v, count(*) AS n_v, CAST(sum(pos) AS BIGINT) AS pos_v " +
      "FROM stacked GROUP BY 1, 2), " +
      "pre AS (SELECT feature, split_v, " +
      "CAST(sum(n_v) OVER (PARTITION BY feature ORDER BY split_v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_left, " +
      "CAST(sum(pos_v) OVER (PARTITION BY feature ORDER BY split_v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pos_left FROM byv), " +
      "tot AS (SELECT feature, CAST(sum(n_v) AS BIGINT) AS n_tot, CAST(sum(pos_v) AS BIGINT) AS pos_tot FROM byv GROUP BY 1), " +
      "sc AS (SELECT pre.feature, split_v, n_left, pos_left, " +
      "n_tot - n_left AS n_right, pos_tot - pos_left AS pos_right, " +
      "CAST(1000000::HUGEINT * (pos_left::HUGEINT*pos_left + (n_left-pos_left)::HUGEINT*(n_left-pos_left)) // n_left " +
      "+ 1000000::HUGEINT * ((pos_tot-pos_left)::HUGEINT*(pos_tot-pos_left) + ((n_tot-n_left)-(pos_tot-pos_left))::HUGEINT*((n_tot-n_left)-(pos_tot-pos_left))) // (n_tot - n_left) AS BIGINT) AS purity_ppm " +
      "FROM pre JOIN tot ON pre.feature = tot.feature WHERE n_tot - n_left > 0) " +
      "SELECT feature, split_v AS best_split_v, n_left, pos_left, n_right, pos_right, purity_ppm " +
      "FROM (SELECT *, row_number() OVER (PARTITION BY feature ORDER BY purity_ppm DESC, split_v) AS rk FROM sc) " +
      "WHERE rk = 1"
  }

  /** Kendall rank correlation INGREDIENTS over an integer series with
    * strictly-increasing x (a daily aggregate): concordant /
    * discordant / y-tied pair counts in exact integers, leaving
    * tau-b = (C − D) / √((n₀−ties)·n₀) rational to the consumer — the
    * monotone-trend test that, unlike Pearson on values or Spearman on
    * ranks, needs no division or sqrt inside the engine, so both
    * engines agree to the last unit. With x strictly increasing a pair
    * is concordant iff the later day's y is larger.
    *
    * Scale judgment: the same calendar²-bounded pair table as
    * [[theilSen]] — the corpus collapses to the daily series FIRST,
    * so 365 days cost 66k pairs whether the days held 10⁶ or 10¹²
    * rows; one combinable aggregate over the pairs.
    */
  def kendallTau(series: DataFrame): DataFrame = {
    val a = series.select(col("x").as("xa"), col("y").as("ya"))
    val b = series.select(col("x").as("xb"), col("y").as("yb"))
    val n = series.agg(count(lit(1)).as("n_days"))
    a.join(b, col("xa") < col("xb"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("ya") < col("yb"), 1L).otherwise(0L)).as("concordant"),
        sum(when(col("ya") > col("yb"), 1L).otherwise(0L)).as("discordant"),
        sum(when(col("ya") === col("yb"), 1L).otherwise(0L)).as("ties_y"))
      .crossJoin(broadcast(n))
      .select(col("n_days"), col("n_pairs"),
        col("concordant"), col("discordant"), col("ties_y"))
  }

  /** Theil–Sen robust trend: the median of all pairwise slopes of an
    * integer series (x strictly increasing, y in integer units) —
    * the estimator that shrugs off the outliers least-squares chases.
    *
    * Scale judgment: the pair table is |series|², so this runs on a
    * series the corpus has ALREADY been collapsed to (a daily
    * aggregate: 365 days → 66k pairs regardless of whether the day
    * tables held 10⁶ or 10¹² rows) — the unpartitioned sort is
    * calendar²-bounded, the documented discipline for
    * `seq_seasonal_naive`-class operators. At unbounded series
    * lengths, production Theil–Sen samples pairs; same frame, one
    * extra hash filter.
    *
    * Determinism: pairs order by the IEEE double dy/dx (one fixed
    * operation on exact longs — identical bits in any engine), ties
    * by (dy, dx); the LOWER median (row (n+1) div 2) is the pinned
    * selection. The reported slope is exact: the median pair's
    * (med_dy, med_dx) plus sign(dy)·(10⁶·|dy| div dx) — the sign
    * split keeps floor-vs-truncate engine divergence out of negative
    * slopes.
    */
  def theilSen(series: DataFrame): DataFrame = {
    val a = series.select(col("x").cast("long").as("xi"), col("y").cast("long").as("yi"))
    val b = series.select(col("x").cast("long").as("xj"), col("y").cast("long").as("yj"))
    val pairs = a.crossJoin(b).filter(col("xi") < col("xj"))
      .select((col("yj") - col("yi")).as("dy"), (col("xj") - col("xi")).as("dx"))
      .withColumn("slope", col("dy").cast("double") / col("dx").cast("double"))
    val w = Window.orderBy(col("slope"), col("dy"), col("dx"))
    pairs
      .withColumn("rn", row_number().over(w))
      .withColumn("n_pairs", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .filter(col("rn") === expr("(n_pairs + 1) div 2"))
      .select(col("n_pairs"), col("dy").as("med_dy"), col("dx").as("med_dx"),
        // ppm numerator in DECIMAL(38,0): 10⁶·|dy| wraps int64 beyond
        // |dy| ≈ 9.2e12 (plausible for cents-scale daily sums) — the
        // same moment discipline as bestSplits; oracle mirrors with
        // HUGEINT
        expr("CAST(sign(dy) AS BIGINT) * CAST(" +
          "CAST(1000000 AS DECIMAL(38,0)) * abs(CAST(dy AS DECIMAL(38,0)))" +
          " div CAST(dx AS DECIMAL(38,0)) AS BIGINT)").as("slope_ppm"))
  }

  /** DuckDB replay of [[theilSen]] over a series CTE named `series`
    * with columns (x, y). */
  def theilSenSql(seriesCte: String): String =
    s"WITH $seriesCte, " +
      "p AS (SELECT b.y - a.y AS dy, b.x - a.x AS dx, " +
      "CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) AS slope " +
      "FROM series a JOIN series b ON a.x < b.x), " +
      "r AS (SELECT dy, dx, " +
      "CAST(row_number() OVER (ORDER BY slope, dy, dx) AS BIGINT) AS rn, " +
      "CAST(count(*) OVER () AS BIGINT) AS n_pairs FROM p) " +
      "SELECT n_pairs, dy AS med_dy, dx AS med_dx, " +
      "CAST(CASE WHEN dy < 0 THEN -1 WHEN dy > 0 THEN 1 ELSE 0 END * ((1000000::HUGEINT * abs(dy::HUGEINT)) // dx) AS BIGINT) AS slope_ppm " +
      "FROM r WHERE rn = (n_pairs + 1) // 2"

  /** KAPLAN–MEIER survival curves with right-censoring — the
    * churn/retention estimator a subscription or engagement pipeline
    * reads: subjects contribute (duration, observed) where observed = 1
    * is an event (churn) and 0 a censored subject (still active at the
    * observation horizon — dropping them, the naive mistake, biases
    * survival down). Per group and event time t:
    * S(t) = Π_{s ≤ t} (1 − d(s)/n(s)) with d = events at s and n = the
    * at-risk count (everyone with duration ≥ s).
    *
    * Scale shape: one (group, t) count aggregate (combinable), then
    * KEYED windows over the collapsed time axis — rows ≤ groups ×
    * distinct durations, corpus-size independent. Determinism: n and d
    * are exact integers; the product is exp of a RUNNING ordered sum of
    * ln terms — running window sums accumulate in frame order in both
    * engines, so the doubles replay on the 6-sig-fig grid. A time where
    * everyone at risk dies is handled EXPLICITLY (survival exactly 0
    * from then on): Spark's log(0) yields NULL where other engines give
    * −∞, so the total-death step must never reach the ln at all.
    */
  def kaplanMeier(df: DataFrame, groupCol: String, durationCol: String,
      observedCol: String): DataFrame = {
    val per = df.groupBy(col(groupCol), col(durationCol).cast("long").as("t"))
      .agg(sum(when(col(observedCol) === 1, 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("__all"))
    val byT = Window.partitionBy(col(groupCol)).orderBy(col("t"))
    val tot = Window.partitionBy(col(groupCol))
    per
      .withColumn("n_risk",
        sum(col("__all")).over(tot) -
          coalesce(sum(col("__all")).over(
            byT.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__ln",
        when(col("d") > 0 && col("d") < col("n_risk"),
          log(lit(1.0) - col("d").cast("double") / col("n_risk").cast("double")))
          .otherwise(lit(0.0)))
      .withColumn("__dead", max(when(col("d") >= col("n_risk"), 1).otherwise(0)).over(byT))
      .withColumn("survival",
        when(col("__dead") === 1, lit(0.0)).otherwise(exp(sum(col("__ln")).over(byT))))
      .where(col("d") > 0)
      .select(col(groupCol), col("t"), col("n_risk"),
        col("d").as("n_events"), col("survival"))
  }

  /** UCB1 BANDIT ALLOCATION REPORT — the adaptive-experimentation
    * dashboard row: given the pull history (one row per pull with its
    * arm and an integral reward), compute each arm's mean reward and
    * UCB1/LCB1 confidence bounds (±√(2·ln N / n_a)), flag arms a
    * successive-elimination policy retires (UCB below the best arm's
    * LCB — their intervals have separated), and mark the arm the NEXT
    * pull goes to (max UCB, ties on the smaller arm id — optimism in
    * the face of uncertainty: underexplored arms get inflated bounds).
    * Deterministic end to end: exact integer (n, Σreward) per arm, the
    * bound formula evaluated in one fixed order, argmax by
    * (ucb desc, arm) — both engines replay it exactly; no randomness
    * anywhere (UCB is the derandomized bandit).
    *
    * Scale shape: ONE combinable per-arm aggregate over the pull log,
    * then windows over the arm axis (rows = arms, metadata-sized).
    */
  def ucbAllocation(df: DataFrame, armCol: String, rewardCol: String): DataFrame =
    ucbFromCounters(df.groupBy(col(armCol).cast("long").as("arm"))
      .agg(count(lit(1)).as("n"),
        sum(col(rewardCol).cast("long")).as("__s")))

  /** [[ucbAllocation]] over PRE-AGGREGATED per-arm counters
    * (arm, n, __s) — the entry point for streaming state, where the
    * pull history lives as stamped additive counters rather than a
    * pull log. */
  def ucbFromCounters(arms: DataFrame): DataFrame = {
    val all = Window.partitionBy(lit(1))
    val byUcb = Window.orderBy(col("ucb").desc, col("arm"))
    arms
      .withColumn("n_total", sum(col("n")).over(all))
      .withColumn("mean_reward", col("__s").cast("double") / col("n").cast("double"))
      .withColumn("__rad",
        sqrt(lit(2.0) * log(col("n_total").cast("double")) / col("n").cast("double")))
      .withColumn("ucb", col("mean_reward") + col("__rad"))
      .withColumn("lcb", col("mean_reward") - col("__rad"))
      .withColumn("__best_lcb", max(col("lcb")).over(all))
      .withColumn("eliminated", col("ucb") < col("__best_lcb"))
      .withColumn("next_pull", row_number().over(byUcb) === 1)
      .select(col("arm"), col("n"), col("n_total"), col("mean_reward"),
        col("ucb"), col("lcb"), col("eliminated"), col("next_pull"))
  }

  /** DuckDB replay of [[ucbAllocation]] over a CTE `pulls` with
    * columns (arm, reward). */
  def ucbAllocationSql(pullsCte: String): String = {
    val rad = "sqrt(2.0 * ln(CAST(n_total AS DOUBLE)) / CAST(n AS DOUBLE))"
    val mean = "(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
    s"WITH $pullsCte, " +
      "ar AS (SELECT arm, CAST(count(*) AS BIGINT) AS n, CAST(sum(reward) AS BIGINT) AS s FROM pulls GROUP BY 1), " +
      "tt AS (SELECT *, CAST(sum(n) OVER () AS BIGINT) AS n_total FROM ar), " +
      s"bb AS (SELECT arm, n, n_total, $mean AS mean_reward, " +
      s"$mean + $rad AS ucb, $mean - $rad AS lcb FROM tt) " +
      "SELECT arm, n, n_total, mean_reward, ucb, lcb, " +
      "ucb < max(lcb) OVER () AS eliminated, " +
      "row_number() OVER (ORDER BY ucb DESC, arm) = 1 AS next_pull FROM bb"
  }

  /** Two-sided normal p-value from a z-score via the Abramowitz–Stegun
    * 26.2.17 tail polynomial (|ε| < 7.5·10⁻⁸) — elementary ops only
    * (abs, exp, one Horner chain), so both engines evaluate the
    * IDENTICAL formula; neither Spark SQL nor the textual-mirror
    * oracle discipline has erf. Fixed evaluation order throughout;
    * [[twoSidedPSql]] is the character-level mirror.
    */
  def twoSidedP(z: Column): Column = {
    val az = abs(z)
    val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val poly = t * (lit(0.319381530) + t * (lit(-0.356563782) +
      t * (lit(1.781477937) + t * (lit(-1.821255978) + t * lit(1.330274429)))))
    val pdf = exp(lit(-0.5) * az * az) / lit(2.5066282746310002)
    least(lit(1.0), lit(2.0) * pdf * poly)
  }

  /** DuckDB mirror of [[twoSidedP]] over a z expression. */
  def twoSidedPSql(z: String): String = {
    val az = s"abs($z)"
    val t = s"(1.0 / (1.0 + 0.2316419 * $az))"
    val poly = s"($t * (0.319381530 + $t * (-0.356563782 + " +
      s"$t * (1.781477937 + $t * (-1.821255978 + $t * 1.330274429)))))"
    val pdf = s"(exp(-0.5 * $az * $az) / 2.5066282746310002)"
    s"least(1.0, 2.0 * $pdf * $poly)"
  }

  /** BENJAMINI–HOCHBERG step-up FDR control over a battery of
    * hypothesis p-values — what an experimentation platform runs over
    * its per-metric tests before anyone reads them: naive per-metric
    * α = 5% on m metrics false-alarms at ~1 − 0.95^m, Bonferroni
    * over-corrects; BH bounds the expected FALSE-DISCOVERY RATE at q.
    * Step-up rule: sort p ascending (ties broken on the key — total
    * order both engines share), find the largest rank k with
    * p_(k) ≤ (k/m)·q (compared cross-multiplied: p·m ≤ k·q, no
    * division), reject EVERY hypothesis at rank ≤ k. The adjusted
    * p-value is the running minimum of m·p/rank from the bottom,
    * clamped to 1 — `p_adj ≤ q ⟺ rejected` (spec-pinned).
    *
    * Scale shape: the battery is metadata-sized (one row per metric),
    * so the global ordered windows are bounded by the metric count —
    * never data-sized; the heavy work happened upstream producing the
    * p-values. All input columns ride through.
    */
  def fdrBh(pv: DataFrame, keyCol: String, pCol: String, qPpm: Long): DataFrame = {
    require(qPpm > 0 && qPpm < 1000000L, "fdrBh: q must be in (0, 1) as ppm")
    val q = qPpm.toDouble / 1000000.0
    val byP = Window.orderBy(col(pCol), col(keyCol))
    val all = Window.partitionBy(lit(1))
    val tailMin = Window.orderBy(col(pCol), col(keyCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    pv.withColumn("rank", row_number().over(byP).cast("long"))
      .withColumn("m", count(lit(1)).over(all))
      .withColumn("__ok",
        col(pCol) * col("m").cast("double") <= col("rank").cast("double") * lit(q))
      .withColumn("__kstar",
        coalesce(max(when(col("__ok"), col("rank"))).over(all), lit(0L)))
      .withColumn("p_adj",
        least(lit(1.0), min(col(pCol) * col("m").cast("double") /
          col("rank").cast("double")).over(tailMin)))
      .withColumn("rejected", col("rank") <= col("__kstar"))
      .drop("__ok", "__kstar")
  }

  /** DuckDB replay of [[fdrBh]] over a CTE `pv` carrying (`keyCol`,
    * `p`) plus the pass-through columns listed in `carry`. */
  def fdrBhSql(pvCte: String, keyCol: String, carry: Seq[String], qPpm: Long): String = {
    val q = qPpm.toDouble / 1000000.0
    val cols = ((keyCol +: carry) :+ "p").mkString(", ")
    s"WITH $pvCte, " +
      s"rk AS (SELECT $cols, CAST(row_number() OVER (ORDER BY p, $keyCol) AS BIGINT) AS rank, " +
      "CAST(count(*) OVER () AS BIGINT) AS m FROM pv), " +
      s"ks AS (SELECT coalesce(max(CASE WHEN p * CAST(m AS DOUBLE) <= CAST(rank AS DOUBLE) * $q THEN rank END), 0) AS kstar FROM rk) " +
      s"SELECT $cols, rank, m, " +
      s"least(1.0, min(p * CAST(m AS DOUBLE) / CAST(rank AS DOUBLE)) OVER (ORDER BY p, $keyCol ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS p_adj, " +
      "rank <= (SELECT kstar FROM ks) AS rejected FROM rk"
  }

  /** COMPETING-RISKS CUMULATIVE INCIDENCE (Aalen–Johansen) — "what
    * fraction of the cohort will have churned FOR REASON k by day t",
    * when multiple absorbing outcomes compete (cancelled vs upgraded
    * away, bounced vs converted): 1 − KM per cause OVERSTATES every
    * cause (it treats competitors as censoring), while the
    * Aalen–Johansen estimator allocates each day's all-cause survival
    * mass to the cause that actually claimed it:
    *
    *   CIF_k(t) = Σ_{tᵢ ≤ t} S(tᵢ⁻) · d_k(tᵢ)/n(tᵢ)
    *
    * with S the ALL-CAUSE Kaplan–Meier and d_k the cause-k deaths.
    * By construction Σ_k CIF_k(t) = 1 − S(t) exactly (spec-pinned) —
    * the accounting identity the naive per-cause KM breaks. Cause 0 is
    * censoring; any positive integer labels a cause.
    *
    * Scale shape: identical to [[kaplanMeier]] — one combinable
    * (group, time[, cause]) aggregate, suffix-summed risk sets, and
    * per-(group, cause) running windows over the collapsed axis; rows
    * ≤ groups × causes × distinct times. Deterministic: the same
    * ln/exp running-product machinery as the KM (total-death step
    * handled by the dead flag), one fixed multiplication order,
    * replayed textually by the oracle.
    *
    * @return one row per (group, cause, event time with d_k > 0):
    *         (g, cause, t, n_risk, d_cause, cif)
    */
  def cumulativeIncidence(df: DataFrame, groupCol: String,
      durationCol: String, causeCol: String): DataFrame = {
    val subj = df.select(col(groupCol).as("g"),
      col(durationCol).cast("long").as("t"),
      col(causeCol).cast("long").as("cause"))
    val perT = subj.groupBy("g", "t")
      .agg(count(lit(1)).as("__all"),
        sum(when(col("cause") =!= 0, 1L).otherwise(0L)).as("d"))
    val byT = Window.partitionBy(col("g")).orderBy(col("t"))
    val before = byT.rowsBetween(Window.unboundedPreceding, -1)
    val tot = Window.partitionBy(col("g"))
    val ax = perT
      .withColumn("n_risk",
        sum(col("__all")).over(tot) -
          coalesce(sum(col("__all")).over(before), lit(0L)))
      .withColumn("__ln",
        when(col("d") > 0 && col("d") < col("n_risk"),
          log(lit(1.0) - col("d").cast("double") / col("n_risk").cast("double")))
          .otherwise(lit(0.0)))
      .withColumn("__dead", when(col("d") >= col("n_risk"), 1).otherwise(0))
      // all-cause survival JUST BEFORE t: the running product up to the
      // previous collapsed row (1.0 at the first row); exactly 0 once
      // any earlier step killed the whole risk set
      .withColumn("__s_prev",
        when(coalesce(max(col("__dead")).over(before), lit(0)) === 1, lit(0.0))
          .otherwise(exp(coalesce(sum(col("__ln")).over(before), lit(0.0)))))
    val perC = subj.where(col("cause") =!= 0)
      .groupBy("g", "t", "cause").agg(count(lit(1)).as("d_cause"))
    val wCause = Window.partitionBy(col("g"), col("cause")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perC.join(ax.select("g", "t", "n_risk", "__s_prev"), Seq("g", "t"))
      .withColumn("__inc",
        col("__s_prev") * (col("d_cause").cast("double") / col("n_risk").cast("double")))
      .withColumn("cif", sum(col("__inc")).over(wCause))
      .select(col("g"), col("cause"), col("t"), col("n_risk"),
        col("d_cause"), col("cif"))
  }

  /** DuckDB replay of [[cumulativeIncidence]] over a subjects CTE
    * named `subjects` with columns (g, t, cause). */
  def cumulativeIncidenceSql(subjectsCte: String): String =
    s"WITH $subjectsCte, " +
      "pt AS (SELECT g, t, CAST(count(*) AS BIGINT) AS call, " +
      "CAST(sum(CASE WHEN cause <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS d FROM subjects GROUP BY 1, 2), " +
      "ax AS (SELECT g, t, d, " +
      "sum(call) OVER (PARTITION BY g) - coalesce(sum(call) OVER (PARTITION BY g ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk FROM pt), " +
      "lx AS (SELECT *, CASE WHEN d > 0 AND d < n_risk THEN ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)) ELSE 0.0 END AS lns, " +
      "CASE WHEN d >= n_risk THEN 1 ELSE 0 END AS dead FROM ax), " +
      "sp AS (SELECT *, CASE WHEN coalesce(max(dead) OVER (PARTITION BY g ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) = 1 THEN 0.0 " +
      "ELSE exp(coalesce(sum(lns) OVER (PARTITION BY g ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)) END AS s_prev FROM lx), " +
      "pc AS (SELECT g, t, cause, CAST(count(*) AS BIGINT) AS d_cause FROM subjects WHERE cause <> 0 GROUP BY 1, 2, 3), " +
      "inc AS (SELECT pc.g, pc.cause, pc.t, sp.n_risk, pc.d_cause, " +
      "sp.s_prev * (CAST(pc.d_cause AS DOUBLE) / CAST(sp.n_risk AS DOUBLE)) AS i " +
      "FROM pc JOIN sp ON sp.g = pc.g AND sp.t = pc.t) " +
      "SELECT g, cause, t, CAST(n_risk AS BIGINT) AS n_risk, d_cause, " +
      "sum(i) OVER (PARTITION BY g, cause ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cif " +
      "FROM inc"

  /** DIFFERENCE-IN-DIFFERENCES — the quasi-experimental estimator for
    * rollouts WITHOUT randomization (a feature shipped to one cohort, a
    * policy change at a date): the treatment effect is the treated
    * cohort's pre→post change minus the control cohort's, which nets
    * out both the level difference between cohorts and the common time
    * trend (the two confounders a naive post-only or pre-post compare
    * eats). Input: one row per unit×period with arm ∈ {'a','b'}
    * (a = control, b = treated — validated loudly, the
    * [[msprtTwoProportion]] discipline), post ∈ {0,1} and an INTEGRAL
    * metric. Output: the four cell sizes and means,
    * `did = (m_b1 − m_b0) − (m_a1 − m_a0)`, its large-sample
    * SE = √(Σ s²_cell/n_cell), Wald z and the 5% flag.
    *
    * Determinism: each cell folds to exact integer (n, Σx, Σx²) on the
    * decimal(38,0) grid (Σx² of cent-scale metrics overflows a long at
    * cluster row counts) in ONE combinable aggregate; means and
    * variances convert to doubles once, in a fixed textual order both
    * engines share. Scale shape: one pass, four output cells, nothing
    * driver-side but the arm-label probe.
    */
  def diffInDiff(df: DataFrame, armCol: String, postCol: String,
      valueCol: String): DataFrame = {
    val arms = df.select(col(armCol).cast("string").as("arm"))
      .where(col("arm").isNotNull).distinct().limit(3)
      .collect().map(_.getString(0)).toSet
    // BOTH arms must be present: a single-arm input has no control (or
    // no treated) trend to difference against, and the four-cell pivot
    // would emit NULL did/se/z silently — the loud-precondition
    // contract, not a quiet NULL row
    require(arms == Set("a", "b"),
      s"diffInDiff: $armCol values must be exactly 'a' (control) / 'b' (treated), " +
        s"both present (got ${arms.toSeq.sorted.mkString(", ")})")
    val cells = df.select(col(armCol).cast("string").as("arm"),
      col(postCol).cast("int").as("post"),
      col(valueCol).cast("decimal(38,0)").as("x"))
      .groupBy("arm", "post")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum(col("x") * col("x")).as("s2"))
    def cell(arm: String, post: Int, c: String): Column =
      max(when(col("arm") === arm && col("post") === post, col(c)))
    val wide = cells.agg(
      cell("a", 0, "n").as("n_a0"), cell("a", 1, "n").as("n_a1"),
      cell("b", 0, "n").as("n_b0"), cell("b", 1, "n").as("n_b1"),
      cell("a", 0, "s").as("__sa0"), cell("a", 1, "s").as("__sa1"),
      cell("b", 0, "s").as("__sb0"), cell("b", 1, "s").as("__sb1"),
      cell("a", 0, "s2").as("__qa0"), cell("a", 1, "s2").as("__qa1"),
      cell("b", 0, "s2").as("__qb0"), cell("b", 1, "s2").as("__qb1"))
      // every one of the four (arm, post) cells must exist with n ≥ 2:
      // an empty cell reads NULL through the pivot (silent NULL output)
      // and an n = 1 cell divides by zero in the unbiased variance —
      // both fail LOUDLY in-plan instead (rides the same job, no extra
      // pass). The guard rides BEFORE any arithmetic consumes the cells.
      .where(Seq("n_a0", "n_a1", "n_b0", "n_b1").map { c =>
        when(col(c).isNull || col(c) < 2L,
          raise_error(concat(
            lit(s"diffInDiff: cell $c is "),
            when(col(c).isNull, lit("EMPTY")).otherwise(
              concat(lit("n="), col(c).cast("string"))),
            lit(" — all four (arm, post) cells need n >= 2 for the " +
              "pre/post trend difference and its variance"))))
          .otherwise(lit(true))
      }.reduce(_ && _))
    def mean(s: String, n: String): Column =
      col(s).cast("double") / col(n).cast("double")
    // unbiased cell variance from exact sums: (n·Σx² − (Σx)²) exact on
    // the decimal grid, ONE double conversion, then /(n(n−1))
    def v(s: String, q: String, n: String): Column =
      (col(n).cast("decimal(38,0)") * col(q) - col(s) * col(s)).cast("double") /
        (col(n) * (col(n) - 1L)).cast("double")
    val did = (mean("__sb1", "n_b1") - mean("__sb0", "n_b0")) -
      (mean("__sa1", "n_a1") - mean("__sa0", "n_a0"))
    val se2 = v("__sa0", "__qa0", "n_a0") / col("n_a0").cast("double") +
      v("__sa1", "__qa1", "n_a1") / col("n_a1").cast("double") +
      v("__sb0", "__qb0", "n_b0") / col("n_b0").cast("double") +
      v("__sb1", "__qb1", "n_b1") / col("n_b1").cast("double")
    wide.select(
      col("n_a0"), col("n_a1"), col("n_b0"), col("n_b1"),
      mean("__sa0", "n_a0").as("mean_a_pre"), mean("__sa1", "n_a1").as("mean_a_post"),
      mean("__sb0", "n_b0").as("mean_b_pre"), mean("__sb1", "n_b1").as("mean_b_post"),
      did.as("did"), sqrt(se2).as("se"), (did / sqrt(se2)).as("z"))
      .withColumn("significant_5pct", abs(col("z")) > 1.96)
  }

  /** DuckDB replay of [[diffInDiff]] over a CTE `obs` with columns
    * (arm, post, x) — exact HUGEINT cell sums mirroring the
    * decimal(38,0) grid, the same fixed double conversion order. */
  def diffInDiffSql(obsCte: String): String = {
    def mean(s: String, n: String) = s"(CAST($s AS DOUBLE) / CAST($n AS DOUBLE))"
    def v(s: String, q: String, n: String) =
      s"(CAST(CAST($n AS HUGEINT) * $q - $s * $s AS DOUBLE) / CAST($n * ($n - 1) AS DOUBLE))"
    val did = s"((${mean("sb1", "n_b1")} - ${mean("sb0", "n_b0")}) - " +
      s"(${mean("sa1", "n_a1")} - ${mean("sa0", "n_a0")}))"
    val se2 = s"(${v("sa0", "qa0", "n_a0")} / CAST(n_a0 AS DOUBLE) + " +
      s"${v("sa1", "qa1", "n_a1")} / CAST(n_a1 AS DOUBLE) + " +
      s"${v("sb0", "qb0", "n_b0")} / CAST(n_b0 AS DOUBLE) + " +
      s"${v("sb1", "qb1", "n_b1")} / CAST(n_b1 AS DOUBLE))"
    s"WITH $obsCte, " +
      "cells AS (SELECT arm, post, CAST(count(*) AS BIGINT) AS n, " +
      "sum(CAST(x AS HUGEINT)) AS s, sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS s2 " +
      "FROM obs GROUP BY 1, 2), " +
      "w AS (SELECT " +
      "max(CASE WHEN arm = 'a' AND post = 0 THEN n END) AS n_a0, " +
      "max(CASE WHEN arm = 'a' AND post = 1 THEN n END) AS n_a1, " +
      "max(CASE WHEN arm = 'b' AND post = 0 THEN n END) AS n_b0, " +
      "max(CASE WHEN arm = 'b' AND post = 1 THEN n END) AS n_b1, " +
      "max(CASE WHEN arm = 'a' AND post = 0 THEN s END) AS sa0, " +
      "max(CASE WHEN arm = 'a' AND post = 1 THEN s END) AS sa1, " +
      "max(CASE WHEN arm = 'b' AND post = 0 THEN s END) AS sb0, " +
      "max(CASE WHEN arm = 'b' AND post = 1 THEN s END) AS sb1, " +
      "max(CASE WHEN arm = 'a' AND post = 0 THEN s2 END) AS qa0, " +
      "max(CASE WHEN arm = 'a' AND post = 1 THEN s2 END) AS qa1, " +
      "max(CASE WHEN arm = 'b' AND post = 0 THEN s2 END) AS qb0, " +
      "max(CASE WHEN arm = 'b' AND post = 1 THEN s2 END) AS qb1 FROM cells) " +
      s"SELECT n_a0, n_a1, n_b0, n_b1, " +
      s"${mean("sa0", "n_a0")} AS mean_a_pre, ${mean("sa1", "n_a1")} AS mean_a_post, " +
      s"${mean("sb0", "n_b0")} AS mean_b_pre, ${mean("sb1", "n_b1")} AS mean_b_post, " +
      s"$did AS did, sqrt($se2) AS se, ($did / sqrt($se2)) AS z, " +
      s"abs($did / sqrt($se2)) > 1.96 AS significant_5pct FROM w"
  }

  /** SPLIT-CONFORMAL PREDICTION — the distribution-free uncertainty
    * band every model-scoring pipeline needs before acting on
    * predictions: given a CALIBRATION slice of (actual, predicted)
    * pairs the model never trained on, q̂ is the
    * ⌈(n_cal+1)(1−α)⌉-th smallest absolute residual, and
    * [ŷ − q̂, ŷ + q̂] covers a fresh exchangeable point with
    * probability ≥ 1−α — no assumption on the model or the error
    * distribution. The report measures that promise on a held-out TEST
    * slice: (alpha_pct, n_cal, n_test, q_hat, n_covered, coverage_ppm,
    * target_ppm).
    *
    * Exact-integer discipline: actual and predicted must be integral
    * (counts, cents — the [[poissonBootstrapCi]] contract), so q̂ is an
    * exact long picked by integer rank and both engines replay the
    * whole report bit-for-bit.
    *
    * Scale shape: residuals collapse to a (value, count) table in one
    * combinable aggregate; the rank walk is one ordered window over
    * the COLLAPSED value axis (≤ distinct residual magnitudes — the
    * quantile-by-rank pattern); coverage is one more combinable
    * aggregate over the test slice with q̂ broadcast. The only
    * driver-side value is n_cal (one count), needed to fail loudly
    * when the calibration set is too small for the requested α.
    */
  def conformalCoverage(cal: DataFrame, test: DataFrame,
      yCol: String, yhatCol: String, alphaPct: Int = 10): DataFrame = {
    require(alphaPct >= 1 && alphaPct <= 50, "alphaPct in [1, 50]")
    val integral = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
    for (df <- Seq(cal, test); c <- Seq(yCol, yhatCol))
      require(integral.contains(df.schema(c).dataType),
        s"conformalCoverage: $c must be integral (got ${df.schema(c).dataType.simpleString})")
    val nCal = cal.count()
    val k = ((nCal + 1L) * (100L - alphaPct) + 99L) / 100L // ceil((n+1)(1-α))
    require(k <= nCal,
      s"conformalCoverage: calibration set too small — rank $k of $nCal at alpha=$alphaPct%")
    val r = abs(col(yCol).cast("long") - col(yhatCol).cast("long"))
    val byVal = cal.select(r.as("__r")).groupBy("__r").agg(count(lit(1)).as("__c"))
    val w = Window.orderBy(col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val qhat = byVal.withColumn("__cum", sum(col("__c")).over(w))
      .where(col("__cum") >= k)
      .agg(min(col("__r")).as("q_hat"))
    test.select(r.as("__rt")).crossJoin(broadcast(qhat))
      .groupBy("q_hat")
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("__rt") <= col("q_hat"), 1L).otherwise(0L)).as("n_covered"))
      .select(lit(alphaPct).as("alpha_pct"), lit(nCal).as("n_cal"),
        col("n_test"), col("q_hat"), col("n_covered"),
        expr("n_covered * 1000000L div n_test").as("coverage_ppm"),
        lit((100L - alphaPct) * 10000L).as("target_ppm"))
  }

  /** MONDRIAN (group-conditional) split conformal — [[conformalCoverage]]
    * with a per-group residual quantile: marginal coverage averages
    * over segments, so a model that is tight on the majority segment
    * and wild on a minority can pass marginally while failing every
    * minority user; per-group q̂ restores the ≥ 1−α promise WITHIN each
    * group (the form production scoring actually needs). Groups whose
    * calibration slice is too small for the rank (k > n_cal) report
    * `cal_sufficient = false` with NULL q̂/coverage instead of a silent
    * garbage band — deterministic, replayable, and visibly actionable.
    *
    * Scale shape: one combinable (group, residual) aggregate, the rank
    * walk as a keyed window over that collapsed axis, one more
    * combinable test-side aggregate joined on the group — no
    * driver-side state at all (the global form's n_cal count moves
    * into a partition window here).
    */
  def conformalCoverageByGroup(cal: DataFrame, test: DataFrame,
      groupCol: String, yCol: String, yhatCol: String,
      alphaPct: Int = 10): DataFrame = {
    require(alphaPct >= 1 && alphaPct <= 50, "alphaPct in [1, 50]")
    val integral = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
    for (df <- Seq(cal, test); c <- Seq(yCol, yhatCol))
      require(integral.contains(df.schema(c).dataType),
        s"conformalCoverageByGroup: $c must be integral " +
          s"(got ${df.schema(c).dataType.simpleString})")
    val r = abs(col(yCol).cast("long") - col(yhatCol).cast("long"))
    val perVal = cal.select(col(groupCol).as("g"), r.as("__r"))
      .groupBy("g", "__r").agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(col("g")).orderBy(col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col("g"))
    val qg = perVal
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wTot))
      .withColumn("__k",
        expr(s"((__n + 1L) * ${100L - alphaPct} + 99L) div 100L"))
      .groupBy("g")
      .agg(max(col("__n")).as("n_cal"), max(col("__k")).as("__k"),
        min(when(col("__cum") >= col("__k"), col("__r"))).as("q_hat"))
    test.select(col(groupCol).as("g"), r.as("__rt"))
      .join(qg, Seq("g"))
      .groupBy("g", "n_cal", "q_hat")
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("__rt") <= col("q_hat"), 1L).otherwise(0L)).as("__cov"))
      .select(col("g").as(groupCol), lit(alphaPct).as("alpha_pct"),
        col("n_cal"), col("n_test"), col("q_hat"),
        when(col("q_hat").isNotNull, col("__cov")).as("n_covered"),
        when(col("q_hat").isNotNull,
          expr("__cov * 1000000L div n_test")).as("coverage_ppm"),
        col("q_hat").isNotNull.as("cal_sufficient"))
  }

  /** DuckDB replay of [[conformalCoverageByGroup]] over CTEs `cal` and
    * `tst`, each with columns (g, y, yhat). */
  def conformalCoverageByGroupSql(ctes: String, groupAlias: String,
      alphaPct: Int = 10): String =
    s"WITH $ctes, " +
      "calr AS (SELECT g, abs(CAST(y AS BIGINT) - CAST(yhat AS BIGINT)) AS r FROM cal), " +
      "bv AS (SELECT g, r, CAST(count(*) AS BIGINT) AS c FROM calr GROUP BY 1, 2), " +
      "cm AS (SELECT g, r, sum(c) OVER (PARTITION BY g ORDER BY r ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, " +
      "sum(c) OVER (PARTITION BY g) AS n FROM bv), " +
      s"qg AS (SELECT g, CAST(max(n) AS BIGINT) AS n_cal, " +
      s"CAST(min(CASE WHEN cum >= ((n + 1) * ${100L - alphaPct} + 99) // 100 THEN r END) AS BIGINT) AS q_hat " +
      "FROM cm GROUP BY 1), " +
      "ter AS (SELECT g, abs(CAST(y AS BIGINT) - CAST(yhat AS BIGINT)) AS rt FROM tst) " +
      s"SELECT ter.g AS $groupAlias, CAST($alphaPct AS INT) AS alpha_pct, qg.n_cal, " +
      "CAST(count(*) AS BIGINT) AS n_test, qg.q_hat, " +
      "CASE WHEN qg.q_hat IS NOT NULL THEN CAST(sum(CASE WHEN rt <= qg.q_hat THEN 1 ELSE 0 END) AS BIGINT) END AS n_covered, " +
      "CASE WHEN qg.q_hat IS NOT NULL THEN CAST(sum(CASE WHEN rt <= qg.q_hat THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) END AS coverage_ppm, " +
      "qg.q_hat IS NOT NULL AS cal_sufficient " +
      "FROM ter JOIN qg ON qg.g = ter.g GROUP BY 1, 2, 3, 5"

  /** DuckDB replay of [[conformalCoverage]] over CTEs `cal` and `tst`,
    * each with integral columns (y, yhat). */
  def conformalCoverageSql(ctes: String, alphaPct: Int = 10): String =
    s"WITH $ctes, " +
      "calr AS (SELECT abs(CAST(y AS BIGINT) - CAST(yhat AS BIGINT)) AS r FROM cal), " +
      "nc AS (SELECT CAST(count(*) AS BIGINT) AS n FROM calr), " +
      s"kk AS (SELECT ((n + 1) * ${100L - alphaPct} + 99) // 100 AS k FROM nc), " +
      "bv AS (SELECT r, CAST(count(*) AS BIGINT) AS c FROM calr GROUP BY 1), " +
      "cm AS (SELECT r, sum(c) OVER (ORDER BY r ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM bv), " +
      "q AS (SELECT CAST(min(r) AS BIGINT) AS q_hat FROM cm CROSS JOIN kk WHERE cum >= kk.k), " +
      "ter AS (SELECT abs(CAST(y AS BIGINT) - CAST(yhat AS BIGINT)) AS rt FROM tst) " +
      s"SELECT CAST($alphaPct AS INT) AS alpha_pct, " +
      "(SELECT n FROM nc) AS n_cal, CAST(count(*) AS BIGINT) AS n_test, " +
      "(SELECT q_hat FROM q) AS q_hat, " +
      "CAST(sum(CASE WHEN rt <= (SELECT q_hat FROM q) THEN 1 ELSE 0 END) AS BIGINT) AS n_covered, " +
      "CAST(sum(CASE WHEN rt <= (SELECT q_hat FROM q) THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS coverage_ppm, " +
      s"CAST(${(100L - alphaPct) * 10000L} AS BIGINT) AS target_ppm FROM ter"

  /** RESTRICTED MEAN SURVIVAL TIME — the area under the Kaplan–Meier
    * curve up to `horizon` τ, per cohort: "expected days retained out
    * of the first τ", the survival effect measure that stays defined
    * when medians don't exist and hazards aren't proportional (the
    * readout regulators ask for when the Cox PH assumption is in
    * doubt). The step integral over the collapsed KM table:
    *
    *   RMST = min(t₁, τ)·1  +  Σ_{tᵢ ≤ τ} S(tᵢ)·(min(tᵢ₊₁, τ) − tᵢ)
    *
    * with tᵢ the event times and S the [[kaplanMeier]] survival. A
    * cohort whose first event lies past τ reads exactly τ (no one
    * churned inside the window).
    *
    * Scale shape: everything after [[kaplanMeier]]'s one combinable
    * aggregate is a lead() window plus one per-group sum over the
    * collapsed (group, event time) axis — ≤ groups × distinct
    * durations rows, the same calendar-bounded argument as the rest of
    * the survival family. Output: one row per cohort
    * (g, horizon, n_times, rmst).
    */
  def restrictedMeanSurvival(df: DataFrame, groupCol: String,
      durationCol: String, observedCol: String, horizon: Long): DataFrame = {
    require(horizon > 0, "restrictedMeanSurvival: horizon must be positive")
    val km = kaplanMeier(df, groupCol, durationCol, observedCol)
    val byT = Window.partitionBy(col(groupCol)).orderBy(col("t"))
    val seg = km.withColumn("__tn", lead(col("t"), 1).over(byT))
    // output rows SEED from the distinct input cohorts, not from the KM
    // table: a fully-censored cohort (zero events) has no `d > 0` rows,
    // so deriving groups from km would silently OMIT it — the
    // documented semantics say it reads exactly rmst = τ (no one
    // churned inside the window), n_times = 0. The event-free head
    // defaults its first-event time to the horizon.
    val groups = df.select(col(groupCol)).where(col(groupCol).isNotNull).distinct()
    val head = groups.join(
        km.groupBy(col(groupCol)).agg(min(col("t")).as("__t1")),
        Seq(groupCol), "left")
      .select(col(groupCol),
        least(coalesce(col("__t1"), lit(horizon)).cast("double"),
          lit(horizon.toDouble)).as("__head"))
    val body = seg.where(col("t") <= horizon)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_times"),
        sum(col("survival") *
          (least(coalesce(col("__tn"), lit(horizon)), lit(horizon)).cast("double") -
            col("t").cast("double"))).as("__body"))
    head.join(body, Seq(groupCol), "left")
      .select(col(groupCol), lit(horizon).as("horizon"),
        coalesce(col("n_times"), lit(0L)).as("n_times"),
        (col("__head") + coalesce(col("__body"), lit(0.0))).as("rmst"))
  }

  /** DuckDB replay of [[restrictedMeanSurvival]] over a subjects CTE
    * named `subjects` with columns (g, t, observed) — the
    * [[kaplanMeierSql]] chain as a nested CTE, then the same lead()
    * segments and head term.
    */
  def restrictedMeanSurvivalSql(subjectsCte: String, horizon: Long): String =
    // the subjects chain rides at the OUTER level too: the km CTE's
    // copy is nested inside its own WITH (invisible out here), and the
    // cohort seed below needs the raw subjects (event-free cohorts have
    // no km rows and must read head = horizon), mirroring the Spark side
    s"WITH $subjectsCte, km AS (${kaplanMeierSql(subjectsCte)}), " +
      "sg AS (SELECT g, t, survival, lead(t) OVER (PARTITION BY g ORDER BY t) AS tn FROM km), " +
      s"hd AS (SELECT g, LEAST(CAST(coalesce(t1, $horizon) AS DOUBLE), $horizon.0) AS head " +
      "FROM (SELECT DISTINCT g FROM subjects WHERE g IS NOT NULL) gs " +
      "LEFT JOIN (SELECT g, min(t) AS t1 FROM km GROUP BY 1) k USING (g)), " +
      s"bd AS (SELECT g, CAST(count(*) AS BIGINT) AS n_times, " +
      s"sum(survival * (CAST(LEAST(coalesce(tn, $horizon), $horizon) AS DOUBLE) - CAST(t AS DOUBLE))) AS body " +
      s"FROM sg WHERE t <= $horizon GROUP BY 1) " +
      s"SELECT hd.g, CAST($horizon AS BIGINT) AS horizon, " +
      "CAST(coalesce(bd.n_times, 0) AS BIGINT) AS n_times, " +
      "hd.head + coalesce(bd.body, 0.0) AS rmst " +
      "FROM hd LEFT JOIN bd USING (g)"

  /** [[kaplanMeier]] with GREENWOOD 95% confidence intervals — what a
    * real survival readout needs next to the curve (is the week-4
    * retention difference between cohorts outside each other's bands,
    * or noise?): Var(S(t)) ≈ S(t)² · Σ_{s ≤ t} d/(n·(n−d)), one more
    * RUNNING windowed sum over the same collapsed (group, time) axis,
    * then ci = S ± 1.96·SE clamped to [0, 1] (the plain Greenwood
    * band; the clamp is what every plotting library does with it).
    * Determinism: the Greenwood terms are one fixed double expression
    * over exact integer (d, n); the running sum accumulates in frame
    * order in both engines; the total-death step (d = n) never reaches
    * the 1/(n−d) pole — survival is exactly 0 there and its variance
    * contribution is defined as 0, both engines by the same explicit
    * guard. Same scale shape as the curve: rows ≤ groups × distinct
    * durations after one combinable aggregate.
    */
  def kaplanMeierGreenwood(df: DataFrame, groupCol: String, durationCol: String,
      observedCol: String): DataFrame = {
    val per = df.groupBy(col(groupCol), col(durationCol).cast("long").as("t"))
      .agg(sum(when(col(observedCol) === 1, 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("__all"))
    val byT = Window.partitionBy(col(groupCol)).orderBy(col("t"))
    val tot = Window.partitionBy(col(groupCol))
    per
      .withColumn("n_risk",
        sum(col("__all")).over(tot) -
          coalesce(sum(col("__all")).over(
            byT.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__ln",
        when(col("d") > 0 && col("d") < col("n_risk"),
          log(lit(1.0) - col("d").cast("double") / col("n_risk").cast("double")))
          .otherwise(lit(0.0)))
      .withColumn("__gw",
        when(col("d") > 0 && col("d") < col("n_risk"),
          col("d").cast("double") /
            (col("n_risk").cast("double") * (col("n_risk") - col("d")).cast("double")))
          .otherwise(lit(0.0)))
      .withColumn("__dead", max(when(col("d") >= col("n_risk"), 1).otherwise(0)).over(byT))
      .withColumn("survival",
        when(col("__dead") === 1, lit(0.0)).otherwise(exp(sum(col("__ln")).over(byT))))
      .withColumn("se",
        when(col("__dead") === 1, lit(0.0))
          .otherwise(col("survival") * sqrt(sum(col("__gw")).over(byT))))
      .where(col("d") > 0)
      .select(col(groupCol), col("t"), col("n_risk"), col("d").as("n_events"),
        col("survival"), col("se"),
        greatest(lit(0.0), col("survival") - lit(1.96) * col("se")).as("ci_lo"),
        least(lit(1.0), col("survival") + lit(1.96) * col("se")).as("ci_hi"))
  }

  /** DuckDB replay of [[kaplanMeierGreenwood]] over a subjects CTE
    * named `subjects` with columns (g, t, observed). */
  def kaplanMeierGreenwoodSql(subjectsCte: String): String =
    s"WITH $subjectsCte, " +
      "per AS (SELECT g, t, CAST(sum(CASE WHEN observed = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d, " +
      "CAST(count(*) AS BIGINT) AS alln FROM subjects GROUP BY 1, 2), " +
      "st AS (SELECT g, t, d, " +
      "CAST(sum(alln) OVER (PARTITION BY g) AS BIGINT) - " +
      "CAST(coalesce(sum(alln) OVER (PARTITION BY g ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk FROM per), " +
      "lt AS (SELECT g, t, d, n_risk, " +
      "CASE WHEN d > 0 AND d < n_risk THEN ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)) ELSE 0.0 END AS lnterm, " +
      "CASE WHEN d > 0 AND d < n_risk THEN CAST(d AS DOUBLE) / (CAST(n_risk AS DOUBLE) * CAST(n_risk - d AS DOUBLE)) ELSE 0.0 END AS gwterm FROM st), " +
      "sv AS (SELECT g, t, d, n_risk, " +
      "CASE WHEN max(CASE WHEN d >= n_risk THEN 1 ELSE 0 END) OVER w1 = 1 THEN 0.0 " +
      "ELSE exp(sum(lnterm) OVER w1) END AS survival, " +
      "CASE WHEN max(CASE WHEN d >= n_risk THEN 1 ELSE 0 END) OVER w1 = 1 THEN 0.0 " +
      "ELSE exp(sum(lnterm) OVER w1) * sqrt(sum(gwterm) OVER w1) END AS se FROM lt " +
      "WINDOW w1 AS (PARTITION BY g ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) " +
      "SELECT g, t, n_risk, d AS n_events, survival, se, " +
      "greatest(0.0, survival - 1.96 * se) AS ci_lo, " +
      "least(1.0, survival + 1.96 * se) AS ci_hi FROM sv WHERE d > 0"

  /** DERANDOMIZED POISSON BOOTSTRAP confidence interval for a per-group
    * mean — the distribution-free CI a metrics readout wants when the
    * per-subject metric is skewed (revenue, session length) and the
    * normal approximation is a lie. Each of `bReps` replicas gives
    * every subject a Poisson(1) weight drawn by inverse-CDF from the
    * avalanched md5 uniform of (salt, replica, subject) — the
    * distributed-friendly bootstrap (no resampling shuffle, no RNG
    * state; E[weight] = 1 reproduces the sample) AND a pure function of
    * (data, salt): retries publish identical intervals, both engines
    * replay them exactly. The CI is the empirical [2.5%, 97.5%] band of
    * the replica means (integer ranks over the B sorted means,
    * replica-id tie-break).
    *
    * Scale shape: one explode to B× rows feeding an immediately
    * combinable (group, replica) aggregate — the working set after the
    * map side is groups × B rows; the ranking window runs on that
    * metadata-sized table. Weighted sums are exact longs (weights ≤ 8:
    * the Poisson(1) tail past 8 is < 1e-8 and the inverse-CDF clamps
    * there); only the final mean divides in doubles.
    */
  def poissonBootstrapCi(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      valueCol: String,
      bReps: Int = 64,
      salt: String = "boot"): DataFrame = {
    require(bReps >= 8 && bReps <= 512)
    // the exact-long weighted sums are the determinism contract, so the
    // metric must arrive in integer units (counts, cents, ms): a double
    // here would be silently floor-truncated by the long cast — loud
    // precondition instead (callers with fractional metrics pre-scale,
    // the way the gate converts dollars to cents)
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
        .contains(df.schema(valueCol).dataType),
      s"poissonBootstrapCi: $valueCol must be an integral type " +
        s"(got ${df.schema(valueCol).dataType.simpleString}); " +
        "pre-convert fractional metrics to integer units (e.g. cents)")
    val loRank = math.max(1, math.ceil(0.025 * bReps).toInt)
    val hiRank = math.min(bReps, math.floor(0.975 * bReps).toInt + 1)
    // cumulative Poisson(1) thresholds P(W <= k), k = 0..7; clamp at 8
    val thresholds = Seq(0.36787944117144233, 0.7357588823428847,
      0.9196986029286058, 0.9810118431238462, 0.9963401531726563,
      0.9994058151824183, 0.9999167588507119, 0.9999897508033253)
    def pois(u: Column): Column =
      thresholds.zipWithIndex.foldRight(lit(8L): Column) {
        case ((th, i), acc) => when(u < th, lit(i.toLong)).otherwise(acc)
      }
    val base = df.select(col(groupCol).as("g"),
      col(idCol).cast("string").as("id"), col(valueCol).cast("long").as("x"))
    val point = base.groupBy("g").agg(count(lit(1)).as("n"),
      (sum("x").cast("double") / count(lit(1)).cast("double")).as("mean"))
    val reps = base
      .withColumn("b", explode(sequence(lit(1), lit(bReps))))
      .withColumn("u",
        (graft.functions.md5_u40(concat(lit(s"boot:$salt:"),
          col("b").cast("string"), lit(":"), col("id"))).cast("double") + lit(0.5)) /
          lit(graft.functions.PortableMinHash.Mod.toDouble))
      .withColumn("w", pois(col("u")))
      .groupBy("g", "b")
      .agg(sum(col("w") * col("x")).as("sx"), sum(col("w")).as("sw"))
      .withColumn("m", when(col("sw") > 0,
        col("sx").cast("double") / col("sw").cast("double")))
    val rk = Window.partitionBy(col("g")).orderBy(col("m").asc_nulls_last, col("b"))
    val ranked = reps.withColumn("rk", row_number().over(rk))
    point
      .join(ranked.where(col("rk") === loRank).select(col("g"), col("m").as("ci_lo")), "g")
      .join(ranked.where(col("rk") === hiRank).select(col("g"), col("m").as("ci_hi")), "g")
      .select(col("g").as(groupCol), col("n"), col("mean"), col("ci_lo"), col("ci_hi"))
  }

  /** DuckDB replay of [[poissonBootstrapCi]] over a base CTE named
    * `base` with columns (g, id VARCHAR, x BIGINT). */
  def poissonBootstrapCiSql(baseCte: String, bReps: Int = 64,
      salt: String = "boot", groupAlias: String = "g"): String = {
    val loRank = math.max(1, math.ceil(0.025 * bReps).toInt)
    val hiRank = math.min(bReps, math.floor(0.975 * bReps).toInt + 1)
    val thresholds = Seq(0.36787944117144233, 0.7357588823428847,
      0.9196986029286058, 0.9810118431238462, 0.9963401531726563,
      0.9994058151824183, 0.9999167588507119, 0.9999897508033253)
    val caseChain = thresholds.zipWithIndex
      .map { case (th, i) => s"WHEN u < $th THEN CAST($i AS BIGINT)" }
      .mkString("CASE ", " ", " ELSE CAST(8 AS BIGINT) END")
    val h = (1 to 10).map(i =>
      s"(CAST(position(substr(h10, $i, 1) IN '0123456789abcdef') AS BIGINT) - 1) * ${1L << (4 * (10 - i))}")
      .mkString("(", " + ", ")")
    val mod = graft.functions.PortableMinHash.Mod
    s"WITH $baseCte, " +
      "pt AS (SELECT g, CAST(count(*) AS BIGINT) AS n, " +
      "CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean FROM base GROUP BY 1), " +
      s"ex AS (SELECT g, id, x, unnest(generate_series(1, $bReps)) AS b FROM base), " +
      s"hh AS (SELECT g, b, x, md5('boot:$salt:' || CAST(b AS VARCHAR) || ':' || id) AS h10 FROM ex), " +
      s"uu AS (SELECT g, b, x, (($h)::DOUBLE + 0.5) / $mod.0 AS u FROM hh), " +
      s"ww AS (SELECT g, b, x, $caseChain AS w FROM uu), " +
      "rp AS (SELECT g, b, CAST(sum(w * x) AS BIGINT) AS sx, CAST(sum(w) AS BIGINT) AS sw FROM ww GROUP BY 1, 2), " +
      "mm AS (SELECT g, b, CASE WHEN sw > 0 THEN CAST(sx AS DOUBLE) / CAST(sw AS DOUBLE) END AS m FROM rp), " +
      "rk AS (SELECT g, m, row_number() OVER (PARTITION BY g ORDER BY m ASC NULLS LAST, b) AS rk FROM mm) " +
      s"SELECT pt.g AS $groupAlias, pt.n, pt.mean, lo.m AS ci_lo, hi.m AS ci_hi FROM pt " +
      s"JOIN rk lo ON lo.g = pt.g AND lo.rk = $loRank " +
      s"JOIN rk hi ON hi.g = pt.g AND hi.rk = $hiRank"
  }

  /** ALWAYS-VALID sequential test (mixture SPRT) for a two-proportion
    * experiment — the fix for the PEEKING problem: a fixed-horizon
    * z-test read daily inflates false positives far past α, while the
    * mSPRT's always-valid p-value may be read (and acted on) at EVERY
    * day with the α guarantee intact. Per reporting day, with
    * cumulative (n_a, c_a, n_b, c_b):
    *
    *   θ̂ = ĉ_b/n_b − ĉ_a/n_a,  V = p̄(1−p̄)(1/n_a + 1/n_b)
    *   1/Λ = sqrt((V+τ²)/V) · exp(−θ̂²τ²/(2V(V+τ²)))
    *   p_n = min(1, min_{s ≤ n} 1/Λ_s)        (running min, never rises)
    *
    * τ² is the mixture prior's scale (≈ the square of the effect size
    * the test is tuned to detect fastest). Days where either arm is
    * empty or p̄ ∈ {0, 1} carry no evidence (1/Λ = 1 by the explicit
    * guard — no 0-division). Input: one row per SUBJECT (arm, join
    * day, conversion day or NULL).
    *
    * Scale shape: subjects collapse FIRST to per-(arm, day) join/conv
    * increments (one combinable aggregate); zero-mass probe rows give
    * both arms a row at every axis day (the log-rank suffix-sum
    * trick); cumulative counts are keyed windows and the statistic is
    * a per-row closed form — every table after the first aggregate is
    * ≤ 2 × |distinct days|. The final running min is a global window
    * over the day axis (metadata-sized by construction) and min is
    * order-free, so the doubles replay exactly.
    */
  def msprtTwoProportion(
      subjects: DataFrame,
      armCol: String,
      joinDayCol: String,
      convDayCol: String,
      tau2: Double = 1e-4,
      alpha: Double = 0.05): DataFrame = {
    // the probe rows and the wide pivot are written against arm labels
    // "a"/"b" — any other labeling ("control"/"treatment", 0/1) would
    // silently pivot to n_a = n_b = 0 and a permanently insignificant
    // p = 1. Loud precondition instead: one metadata-sized probe
    // (distinct-limit-3, the moveSubtree pattern) over the arm column.
    val arms = subjects.select(col(armCol).cast("string").as("arm"))
      .where(col("arm").isNotNull).distinct().limit(3)
      .collect().map(_.getString(0)).toSet
    require(arms.nonEmpty && arms.subsetOf(Set("a", "b")),
      s"msprtTwoProportion: $armCol values must be exactly 'a'/'b' " +
        s"(got ${arms.toSeq.sorted.mkString(", ")}); relabel arms upstream")
    val joins = subjects
      .groupBy(col(armCol).as("arm"), col(joinDayCol).as("day"))
      .agg(count(lit(1)).as("nj"))
      .select(col("arm"), col("day"), col("nj"), lit(0L).as("nc"))
    val convs = subjects.where(col(convDayCol).isNotNull)
      .groupBy(col(armCol).as("arm"), col(convDayCol).as("day"))
      .agg(count(lit(1)).as("nc"))
      .select(col("arm"), col("day"), lit(0L).as("nj"), col("nc"))
    val probes = joins.select("day").union(convs.select("day")).distinct()
      .select(explode(array(lit("a"), lit("b"))).as("arm"), col("day"),
        lit(0L).as("nj"), lit(0L).as("nc"))
    val byDay = Window.partitionBy(col("arm")).orderBy(col("day"))
    val cum = joins.unionByName(convs).unionByName(probes)
      .groupBy("arm", "day").agg(sum("nj").as("nj"), sum("nc").as("nc"))
      .withColumn("n", sum(col("nj")).over(byDay))
      .withColumn("c", sum(col("nc")).over(byDay))
    val wide = cum.groupBy("day").agg(
      sum(when(col("arm") === "a", col("n")).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === "a", col("c")).otherwise(0L)).as("c_a"),
      sum(when(col("arm") === "b", col("n")).otherwise(0L)).as("n_b"),
      sum(when(col("arm") === "b", col("c")).otherwise(0L)).as("c_b"))
    val pbar = (col("c_a") + col("c_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val v = pbar * (lit(1.0) - pbar) *
      (lit(1.0) / col("n_a").cast("double") + lit(1.0) / col("n_b").cast("double"))
    val theta = col("c_b").cast("double") / col("n_b").cast("double") -
      col("c_a").cast("double") / col("n_a").cast("double")
    val stat = wide
      .withColumn("__v",
        when(col("n_a") > 0 && col("n_b") > 0, v).otherwise(lit(0.0)))
      .withColumn("__th",
        when(col("n_a") > 0 && col("n_b") > 0, theta).otherwise(lit(0.0)))
      .withColumn("inv_lambda",
        when(col("__v") > 0,
          sqrt((col("__v") + lit(tau2)) / col("__v")) *
            exp(-(col("__th") * col("__th")) * lit(tau2) /
              (lit(2.0) * col("__v") * (col("__v") + lit(tau2)))))
          .otherwise(lit(1.0)))
    stat
      .withColumn("p_always_valid",
        least(lit(1.0), min(col("inv_lambda")).over(
          Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      .withColumn("significant", col("p_always_valid") <= alpha)
      .select("day", "n_a", "c_a", "n_b", "c_b", "inv_lambda",
        "p_always_valid", "significant")
  }

  /** DuckDB replay of [[msprtTwoProportion]] over a subjects CTE named
    * `subjects` with columns (arm, join_d, conv_d). */
  def msprtTwoProportionSql(subjectsCte: String, tau2: Double = 1e-4,
      alpha: Double = 0.05): String =
    s"WITH $subjectsCte, " +
      "jn AS (SELECT arm, join_d AS day, CAST(count(*) AS BIGINT) AS nj, CAST(0 AS BIGINT) AS nc FROM subjects GROUP BY 1, 2), " +
      "cv AS (SELECT arm, conv_d AS day, CAST(0 AS BIGINT) AS nj, CAST(count(*) AS BIGINT) AS nc FROM subjects WHERE conv_d IS NOT NULL GROUP BY 1, 2), " +
      "pr AS (SELECT gg.arm, dd.day, CAST(0 AS BIGINT) AS nj, CAST(0 AS BIGINT) AS nc FROM " +
      "(SELECT day FROM jn UNION SELECT day FROM cv) dd CROSS JOIN (SELECT 'a' AS arm UNION ALL SELECT 'b') gg), " +
      "cum AS (SELECT arm, day, " +
      "CAST(sum(sum(nj)) OVER (PARTITION BY arm ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n, " +
      "CAST(sum(sum(nc)) OVER (PARTITION BY arm ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c " +
      "FROM (SELECT * FROM jn UNION ALL SELECT * FROM cv UNION ALL SELECT * FROM pr) GROUP BY arm, day), " +
      "wide AS (SELECT day, " +
      "CAST(sum(CASE WHEN arm = 'a' THEN n ELSE 0 END) AS BIGINT) AS n_a, " +
      "CAST(sum(CASE WHEN arm = 'a' THEN c ELSE 0 END) AS BIGINT) AS c_a, " +
      "CAST(sum(CASE WHEN arm = 'b' THEN n ELSE 0 END) AS BIGINT) AS n_b, " +
      "CAST(sum(CASE WHEN arm = 'b' THEN c ELSE 0 END) AS BIGINT) AS c_b FROM cum GROUP BY 1), " +
      "st AS (SELECT *, " +
      "CASE WHEN n_a > 0 AND n_b > 0 THEN " +
      "(CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) * (1.0 - CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) * " +
      "(1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)) ELSE 0.0 END AS v, " +
      "CASE WHEN n_a > 0 AND n_b > 0 THEN CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE) - CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE) ELSE 0.0 END AS th FROM wide), " +
      s"lam AS (SELECT *, CASE WHEN v > 0 THEN sqrt((v + $tau2) / v) * exp(-(th * th) * $tau2 / (2.0 * v * (v + $tau2))) ELSE 1.0 END AS inv_lambda FROM st), " +
      "pv AS (SELECT *, least(1.0, min(inv_lambda) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS p_always_valid FROM lam) " +
      s"SELECT day, n_a, c_a, n_b, c_b, inv_lambda, p_always_valid, p_always_valid <= $alpha AS significant FROM pv"

  /** NELSON–AALEN cumulative hazard — the survival family's third
    * readout (with [[kaplanMeier]] and [[logRankTest]]): H(t) =
    * Σ_{s ≤ t} d(s)/n(s) estimates the cumulative event INTENSITY,
    * the quantity hazard-ratio thinking and competing-risk work start
    * from (KM answers "what fraction survives", NA answers "how much
    * hazard has accumulated" — additive, so it decomposes by cause).
    * Variance (Poisson-type) Var(H) = Σ d/n², se = sqrt of the running
    * sum, both on the same collapsed (group, time) axis. Unlike the KM
    * product, the total-death step needs NO special casing — d = n
    * contributes exactly 1.0, no pole, no log.
    *
    * Scale shape: identical to [[kaplanMeier]] — one combinable
    * (group, time) count aggregate, keyed windows over the collapsed
    * axis, rows ≤ groups × distinct durations. Determinism: d and n
    * are exact integers; the hazard terms are one fixed double
    * expression accumulated by running window sums in frame order,
    * replayed identically by the oracle.
    */
  def nelsonAalen(df: DataFrame, groupCol: String, durationCol: String,
      observedCol: String): DataFrame = {
    val per = df.groupBy(col(groupCol), col(durationCol).cast("long").as("t"))
      .agg(sum(when(col(observedCol) === 1, 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("__all"))
    val byT = Window.partitionBy(col(groupCol)).orderBy(col("t"))
    val tot = Window.partitionBy(col(groupCol))
    per
      .withColumn("n_risk",
        sum(col("__all")).over(tot) -
          coalesce(sum(col("__all")).over(
            byT.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("cum_hazard",
        sum(col("d").cast("double") / col("n_risk").cast("double")).over(byT))
      .withColumn("se",
        sqrt(sum(col("d").cast("double") /
          (col("n_risk").cast("double") * col("n_risk").cast("double"))).over(byT)))
      .where(col("d") > 0)
      .select(col(groupCol), col("t"), col("n_risk"),
        col("d").as("n_events"), col("cum_hazard"), col("se"))
  }

  /** DuckDB replay of [[nelsonAalen]] over a subjects CTE named
    * `subjects` with columns (g, t, observed). */
  def nelsonAalenSql(subjectsCte: String): String =
    s"WITH $subjectsCte, " +
      "per AS (SELECT g, t, CAST(sum(CASE WHEN observed = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d, " +
      "CAST(count(*) AS BIGINT) AS alln FROM subjects GROUP BY 1, 2), " +
      "st AS (SELECT g, t, d, " +
      "CAST(sum(alln) OVER (PARTITION BY g) AS BIGINT) - " +
      "CAST(coalesce(sum(alln) OVER (PARTITION BY g ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk FROM per), " +
      "cm AS (SELECT g, t, d, n_risk, " +
      "sum(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)) OVER w1 AS cum_hazard, " +
      "sqrt(sum(CAST(d AS DOUBLE) / (CAST(n_risk AS DOUBLE) * CAST(n_risk AS DOUBLE))) OVER w1) AS se FROM st " +
      "WINDOW w1 AS (PARTITION BY g ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) " +
      "SELECT g, t, n_risk, d AS n_events, cum_hazard, se FROM cm WHERE d > 0"

  /** LOG-RANK test — "are these two survival curves the same?", the
    * hypothesis-test companion of [[kaplanMeier]] (does cohort A churn
    * faster than cohort B, beyond what censoring explains). At each
    * pooled event time, group 1's observed deaths are compared with the
    * expectation under the null (deaths allocated proportionally to the
    * at-risk split); the standardized squared total is χ²(1). Group
    * labels are {0, 1}.
    *
    * Scale shape: identical to the curve itself — subjects collapse
    * FIRST to (group × time) counts (one combinable aggregate), and the
    * at-risk table derives from a per-group SUFFIX sum over that
    * collapsed axis: probe rows (one per group × pooled death time,
    * zero mass) union into the counts, and a RANGE window over t DESC
    * reads n_g(tt) = Σ_{t ≥ tt} c(g, t) at each probe — the range
    * frame makes a count row tied at t == tt land inside the frame. No
    * subjects × times non-equi join anywhere: every table after the
    * first aggregate is ≤ |groups| × |distinct durations| rows and all
    * joins are keyed. All counts exact integers; the double combination
    * is written in one fixed operation order the oracle mirrors.
    */
  def logRankTest(df: DataFrame, groupCol: String, durationCol: String,
      observedCol: String): DataFrame = {
    val subj = df.select(col(groupCol).cast("long").as("g"),
      col(durationCol).cast("long").as("t"), col(observedCol).cast("int").as("obs"))
    val per = subj.groupBy("g", "t")
      .agg(count(lit(1)).as("c"),
        sum(when(col("obs") === 1, 1L).otherwise(0L)).as("d"))
    val times = per.groupBy("t").agg(sum("d").as("dt")).where(col("dt") > 0)
    val probes = times.select(explode(array(lit(0L), lit(1L))).as("g"),
      col("t"), lit(0L).as("c"), lit(1).as("is_probe"))
    val suffix = Window.partitionBy(col("g")).orderBy(col("t").desc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val riskWide = per.select(col("g"), col("t"), col("c"), lit(0).as("is_probe"))
      .unionByName(probes)
      .withColumn("n_g", sum(col("c")).over(suffix))
      .where(col("is_probe") === 1)
      .groupBy(col("t"))
      .agg(sum("n_g").as("n"),
        sum(when(col("g") === 1, col("n_g")).otherwise(0L)).as("n1"))
    val d1 = per.where(col("g") === 1).select(col("t"), col("d").as("d1"))
    val rows = times
      .join(riskWide, "t")
      .join(d1, Seq("t"), "left")
      .select(col("t").as("tt"), col("dt"), col("n"), col("n1"),
        coalesce(col("d1"), lit(0L)).as("d1"))
      .where(col("n") > 1)
    val p = col("n1").cast("double") / col("n").cast("double")
    rows.agg(count(lit(1)).as("n_times"),
        sum(col("d1")).as("obs1"),
        sum(col("dt").cast("double") * p).as("exp1"),
        sum(col("dt").cast("double") * p * (lit(1.0) - p) *
          (col("n") - col("dt")).cast("double") /
          (col("n") - 1).cast("double")).as("var1"))
      .select(col("n_times"), col("obs1"), col("exp1"), col("var1"),
        ((col("obs1").cast("double") - col("exp1")) *
          (col("obs1").cast("double") - col("exp1")) / col("var1")).as("chi2"))
      .withColumn("significant_5pct", col("chi2") > 3.841)
  }

  /** COX PROPORTIONAL HAZARDS for a binary treatment covariate, Breslow
    * tie handling — the EFFECT-SIZE companion of [[logRankTest]]
    * (which only answers "different?"): the hazard ratio e^β between
    * cohort 1 and cohort 0, with its standard error and Wald z. With
    * x ∈ {0,1} the Breslow partial-likelihood derivatives collapse to
    * risk-set counts: per pooled event time with d_t total events, d1_t
    * cohort-1 events and (n0_t, n1_t) at risk,
    *
    *   p_t(β) = n1·e^β / (n0 + n1·e^β)
    *   U(β) = Σ_t [d1_t − d_t·p_t]          (score)
    *   I(β) = Σ_t d_t·(p_t − p_t²)          (information)
    *
    * solved by `iters` Newton steps β ← β + U/I from β = 0. `score0` /
    * `info0` (U and I at β = 0) ride along — U(0) is EXACTLY the
    * log-rank's observed−expected and I(0) its variance without the
    * hypergeometric (n−d)/(n−1) correction (equal when no two events
    * tie), the classical score-test identity StatsSpec pins.
    *
    * Scale shape: the risk table is the SAME collapsed-axis suffix-sum
    * construction as [[logRankTest]] (probe rows + one RANGE window —
    * no subjects×times join); it is then collected ONCE — bounded by
    * |distinct event times|, the calendar-bounded axis every survival
    * op here reduces to — and the Newton iterations run driver-side on
    * those exact-integer counts (the emb_top_eigvec pattern: corpus
    * work once, p-sized iteration on the driver). All double sums are
    * ascending-time reduceLeft folds, textually mirrored by the
    * oracle's ORDER BY tt list_reduce, so the replay is bit-exact up to
    * transcendental ulp (absorbed by the compare grid). Monotone
    * likelihood (perfect separation) does not diverge — the fixed
    * iteration count bounds β; degenerate risk sets (one cohort absent
    * from every event time) fail loudly.
    */
  def coxPhBinary(df: DataFrame, groupCol: String, durationCol: String,
      observedCol: String, iters: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val subj = df.select(col(groupCol).cast("long").as("g"),
      col(durationCol).cast("long").as("t"), col(observedCol).cast("int").as("obs"))
    // the covariate must be BINARY 0/1: any other group value inflates
    // the pooled per-time deaths `dt` (the `times` aggregate sums ALL
    // groups) while contributing nothing to n0/n1/d1 — a silently
    // biased beta. The metadata-sized distinct-limit-3 probe (the
    // msprt/diffInDiff discipline) fails loudly instead.
    val gvals = subj.select("g").where(col("g").isNotNull)
      .distinct().limit(3).collect().map(_.getLong(0)).toSet
    require(gvals.nonEmpty && gvals.subsetOf(Set(0L, 1L)),
      s"coxPhBinary: $groupCol must be binary 0/1 " +
        s"(got ${gvals.toSeq.sorted.mkString(", ")})")
    val per = subj.groupBy("g", "t")
      .agg(count(lit(1)).as("c"),
        sum(when(col("obs") === 1, 1L).otherwise(0L)).as("d"))
    val times = per.groupBy("t").agg(sum("d").as("dt")).where(col("dt") > 0)
    val probes = times.select(
      explode(array(lit(0L), lit(1L))).as("g"),
      col("t"), lit(0L).as("c"), lit(1).as("is_probe"))
    val suffix = Window.partitionBy(col("g")).orderBy(col("t").desc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = per.select(col("g"), col("t"), col("c"), lit(0).as("is_probe"))
      .unionByName(probes)
      .withColumn("n_g", sum(col("c")).over(suffix))
      .where(col("is_probe") === 1)
    val riskWide = risk.groupBy("t").agg(
      sum(when(col("g") === 0, col("n_g")).otherwise(0L)).as("n0"),
      sum(when(col("g") === 1, col("n_g")).otherwise(0L)).as("n1"))
    val d1 = per.where(col("g") === 1).select(col("t"), col("d").as("d1"))
    // the collapsed risk table: |distinct event times| rows of exact
    // longs — collected ascending for the driver-side Newton folds
    val rows = times.join(riskWide, "t")
      .join(d1, Seq("t"), "left")
      .select(col("t"), col("dt"), col("n0"), col("n1"),
        coalesce(col("d1"), lit(0L)).as("d1"))
      .orderBy("t")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    require(rows.nonEmpty, "coxPhBinary: no uncensored events")
    def scoreInfo(beta: Double): (Double, Double) = {
      val eb = math.exp(beta)
      val terms = rows.map { case (dt, n0, n1, d1v) =>
        val p = n1.toDouble * eb / (n0.toDouble + n1.toDouble * eb)
        (d1v.toDouble - dt.toDouble * p, dt.toDouble * (p - p * p))
      }
      (terms.map(_._1).reduceLeft(_ + _), terms.map(_._2).reduceLeft(_ + _))
    }
    val (score0, info0) = scoreInfo(0.0)
    require(info0 > 0,
      "coxPhBinary: degenerate risk sets — one cohort is absent from every event time")
    var beta = 0.0
    var degenerate = false
    for (_ <- 0 until iters) {
      val (u, i) = scoreInfo(beta)
      // separation guard: under (near-)perfect separation the monotone
      // likelihood makes the Newton step u/i explode (a lone event
      // from a 1-in-N cohort steps by ~N on the FIRST iteration, so
      // exp(beta) overflows and every later p is Inf/Inf = NaN despite
      // the fixed iteration count). Two guards, both flagged: skip any
      // step whose score/information is non-finite or non-positive,
      // and clamp beta to ±30 (exp(±30) comfortably finite, a hazard
      // ratio beyond e^30 has no subject-matter meaning). On regular
      // data neither binds, so the oracle's unguarded replay stays
      // bit-identical and reads the flag FALSE from the same data.
      if (java.lang.Double.isFinite(u) && java.lang.Double.isFinite(i) && i > 0) {
        val step = beta + u / i
        if (step > 30.0 || step < -30.0) degenerate = true
        beta = math.max(-30.0, math.min(30.0, step))
      } else degenerate = true
    }
    val iFinal = scoreInfo(beta)._2
    val iOk = java.lang.Double.isFinite(iFinal) && iFinal > 0
    // separated: any guard fired, or the final information is unusable —
    // beta is still finite (clamped), se/z are NaN only when the
    // variance itself is undefined, and significance is never claimed
    val separated = degenerate || !iOk
    val se = if (iOk) 1.0 / math.sqrt(iFinal) else Double.NaN
    val z = if (iOk) beta / se else Double.NaN
    spark.createDataFrame(Seq(
      (rows.length.toLong, score0, info0, beta, math.exp(beta), se, z,
        !separated && math.abs(z) > 1.96, separated)))
      .toDF("n_times", "score0", "info0", "beta", "hazard_ratio", "se", "z",
        "significant_5pct", "separated")
  }

  /** DuckDB replay of [[coxPhBinary]] over a subjects CTE named
    * `subjects` with columns (g, t, observed) — the same collapsed
    * suffix-sum risk table, then `iters` unrolled Newton CTEs whose
    * score/information sums are ascending-time list_reduce folds
    * (first-element-seeded left fold ≡ the Scala reduceLeft).
    */
  def coxPhBinarySql(subjectsCte: String, iters: Int = 8): String = {
    def pOf(beta: String): String =
      s"(CAST(n1 AS DOUBLE) * exp($beta) / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE) * exp($beta)))"
    def uFold(beta: String): String =
      s"list_reduce(list(CAST(d1 AS DOUBLE) - CAST(dt AS DOUBLE) * ${pOf(beta)} ORDER BY tt), (a, b) -> a + b)"
    def iFold(beta: String): String =
      s"list_reduce(list(CAST(dt AS DOUBLE) * (${pOf(beta)} - ${pOf(beta)} * ${pOf(beta)}) ORDER BY tt), (a, b) -> a + b)"
    val steps = (1 to iters).map { k =>
      s"b$k AS MATERIALIZED (SELECT any_value(beta) + ${uFold("beta")} / ${iFold("beta")} AS beta " +
        s"FROM (SELECT r.*, b.beta FROM r CROSS JOIN b${k - 1} b) x)"
    }.mkString(", ")
    s"WITH $subjectsCte, " +
      "per AS (SELECT g, t, CAST(count(*) AS BIGINT) AS c, CAST(sum(CASE WHEN observed = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d FROM subjects GROUP BY 1, 2), " +
      "tm AS (SELECT t, CAST(sum(d) AS BIGINT) AS dt FROM per GROUP BY 1 HAVING sum(d) > 0), " +
      "ms AS (SELECT g, t, c, 0 AS is_probe FROM per " +
      "UNION ALL SELECT gg.g, tm.t, CAST(0 AS BIGINT), 1 FROM tm CROSS JOIN (SELECT CAST(0 AS BIGINT) AS g UNION ALL SELECT CAST(1 AS BIGINT)) gg), " +
      "ar AS (SELECT g, t, is_probe, CAST(sum(c) OVER (PARTITION BY g ORDER BY t DESC RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_g FROM ms), " +
      "rw AS (SELECT t, CAST(sum(CASE WHEN g = 0 THEN n_g ELSE 0 END) AS BIGINT) AS n0, " +
      "CAST(sum(CASE WHEN g = 1 THEN n_g ELSE 0 END) AS BIGINT) AS n1 FROM ar WHERE is_probe = 1 GROUP BY 1), " +
      "r AS MATERIALIZED (SELECT tm.t AS tt, tm.dt, rw.n0, rw.n1, CAST(coalesce(dd.d, 0) AS BIGINT) AS d1 " +
      "FROM tm JOIN rw ON rw.t = tm.t LEFT JOIN per dd ON dd.t = tm.t AND dd.g = 1), " +
      "b0 AS (SELECT 0.0 AS beta), " +
      s"z0 AS (SELECT ${uFold("beta")} AS score0, ${iFold("beta")} AS info0 " +
      "FROM (SELECT r.*, b.beta FROM r CROSS JOIN b0 b) x), " +
      s"$steps, " +
      s"zf AS (SELECT ${iFold("beta")} AS i_final FROM (SELECT r.*, b.beta FROM r CROSS JOIN b$iters b) x) " +
      "SELECT (SELECT CAST(count(*) AS BIGINT) FROM r) AS n_times, z0.score0, z0.info0, " +
      s"b$iters.beta, exp(b$iters.beta) AS hazard_ratio, " +
      "1.0 / sqrt(zf.i_final) AS se, " +
      s"b$iters.beta / (1.0 / sqrt(zf.i_final)) AS z, " +
      // the separation guard replays as a data-derived flag: on regular
      // inputs i_final is finite-positive and the flag is FALSE both
      // sides; the Spark-side step clamp never binds on such data
      s"(isfinite(zf.i_final) AND zf.i_final > 0 AND abs(b$iters.beta / (1.0 / sqrt(zf.i_final))) > 1.96) AS significant_5pct, " +
      s"NOT (isfinite(zf.i_final) AND zf.i_final > 0) AS separated " +
      s"FROM z0 CROSS JOIN b$iters CROSS JOIN zf"
  }

  /** PROPORTIONAL-HAZARDS ASSUMPTION CHECK (Schoenfeld-style score
    * residual trend) — the diagnostic every [[coxPhBinary]] readout
    * should ship with: Cox's hazard ratio is a single number ONLY if
    * the effect is constant over time; a cohort whose hazard advantage
    * fades (early-churn burst, then parity) fits a misleading average.
    * The check: fit β̂ exactly as [[coxPhBinary]] does, compute the
    * per-event-time aggregated Schoenfeld/score residual
    * r(t) = d₁(t) − dt·p(t, β̂) (observed minus expected cohort-1
    * deaths), and correlate it with the event-time RANK: under PH the
    * residuals are centered noise with no time trend; a systematic
    * drift reads |z| = |corr|·√(n−1) > 1.96. Driver arithmetic is
    * fixed-order folds over the ascending-time collapsed table
    * (means, then centered cross/self products), textually mirrored by
    * the oracle.
    *
    * Output one row:
    * (n_times, beta, trend_corr, z, ph_violation).
    */
  def coxPhAssumptionCheck(df: DataFrame, groupCol: String,
      durationCol: String, observedCol: String, iters: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val subj = df.select(col(groupCol).cast("long").as("g"),
      col(durationCol).cast("long").as("t"), col(observedCol).cast("int").as("obs"))
    val gvals = subj.select("g").where(col("g").isNotNull)
      .distinct().limit(3).collect().map(_.getLong(0)).toSet
    require(gvals.nonEmpty && gvals.subsetOf(Set(0L, 1L)),
      s"coxPhAssumptionCheck: $groupCol must be binary 0/1 " +
        s"(got ${gvals.toSeq.sorted.mkString(", ")})")
    val per = subj.groupBy("g", "t")
      .agg(count(lit(1)).as("c"),
        sum(when(col("obs") === 1, 1L).otherwise(0L)).as("d"))
    val times = per.groupBy("t").agg(sum("d").as("dt")).where(col("dt") > 0)
    val probes = times.select(
      explode(array(lit(0L), lit(1L))).as("g"),
      col("t"), lit(0L).as("c"), lit(1).as("is_probe"))
    val suffix = Window.partitionBy(col("g")).orderBy(col("t").desc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = per.select(col("g"), col("t"), col("c"), lit(0).as("is_probe"))
      .unionByName(probes)
      .withColumn("n_g", sum(col("c")).over(suffix))
      .where(col("is_probe") === 1)
    val riskWide = risk.groupBy("t").agg(
      sum(when(col("g") === 0, col("n_g")).otherwise(0L)).as("n0"),
      sum(when(col("g") === 1, col("n_g")).otherwise(0L)).as("n1"))
    val d1 = per.where(col("g") === 1).select(col("t"), col("d").as("d1"))
    val rows = times.join(riskWide, "t")
      .join(d1, Seq("t"), "left")
      .select(col("t"), col("dt"), col("n0"), col("n1"),
        coalesce(col("d1"), lit(0L)).as("d1"))
      .orderBy("t")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    require(rows.nonEmpty, "coxPhAssumptionCheck: no uncensored events")
    def scoreInfo(beta: Double): (Double, Double) = {
      val eb = math.exp(beta)
      val terms = rows.map { case (dt, n0, n1, d1v) =>
        val p = n1.toDouble * eb / (n0.toDouble + n1.toDouble * eb)
        (d1v.toDouble - dt.toDouble * p, dt.toDouble * (p - p * p))
      }
      (terms.map(_._1).reduceLeft(_ + _), terms.map(_._2).reduceLeft(_ + _))
    }
    require(scoreInfo(0.0)._2 > 0,
      "coxPhAssumptionCheck: degenerate risk sets")
    var beta = 0.0
    for (_ <- 0 until iters) {
      val (u, i) = scoreInfo(beta)
      if (java.lang.Double.isFinite(u) && java.lang.Double.isFinite(i) && i > 0)
        beta = math.max(-30.0, math.min(30.0, beta + u / i))
    }
    val eb = math.exp(beta)
    val res = rows.map { case (dt, n0, n1, d1v) =>
      val p = n1.toDouble * eb / (n0.toDouble + n1.toDouble * eb)
      d1v.toDouble - dt.toDouble * p
    }
    val n = rows.length
    val xs = (1 to n).map(_.toDouble)
    val mx = xs.reduceLeft(_ + _) / n
    val my = res.reduceLeft(_ + _) / n
    val cov = xs.zip(res).map { case (x, y) => (x - mx) * (y - my) }.reduceLeft(_ + _)
    val vx = xs.map(x => (x - mx) * (x - mx)).reduceLeft(_ + _)
    val vy = res.map(y => (y - my) * (y - my)).reduceLeft(_ + _)
    val corr = if (vx * vy == 0.0) 0.0 else cov / math.sqrt(vx * vy)
    val z = corr * math.sqrt((n - 1).toDouble)
    spark.createDataFrame(Seq(
      (n.toLong, beta, corr, z, math.abs(z) > 1.96)))
      .toDF("n_times", "beta", "trend_corr", "z", "ph_violation")
  }

  /** DuckDB replay of [[coxPhAssumptionCheck]] over a subjects CTE
    * named `subjects` with columns (g, t, observed): the
    * [[coxPhBinarySql]] risk-table + Newton chain, then the residual
    * trend with the same ordered folds. */
  def coxPhAssumptionCheckSql(subjectsCte: String, iters: Int = 8): String = {
    def pOf(beta: String): String =
      s"(CAST(n1 AS DOUBLE) * exp($beta) / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE) * exp($beta)))"
    def uFold(beta: String): String =
      s"list_reduce(list(CAST(d1 AS DOUBLE) - CAST(dt AS DOUBLE) * ${pOf(beta)} ORDER BY tt), (a, b) -> a + b)"
    def iFold(beta: String): String =
      s"list_reduce(list(CAST(dt AS DOUBLE) * (${pOf(beta)} - ${pOf(beta)} * ${pOf(beta)}) ORDER BY tt), (a, b) -> a + b)"
    val steps = (1 to iters).map { k =>
      s"b$k AS MATERIALIZED (SELECT any_value(beta) + ${uFold("beta")} / ${iFold("beta")} AS beta " +
        s"FROM (SELECT r.*, b.beta FROM r CROSS JOIN b${k - 1} b) x)"
    }.mkString(", ")
    s"WITH $subjectsCte, " +
      "per AS (SELECT g, t, CAST(count(*) AS BIGINT) AS c, CAST(sum(CASE WHEN observed = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d FROM subjects GROUP BY 1, 2), " +
      "tm AS (SELECT t, CAST(sum(d) AS BIGINT) AS dt FROM per GROUP BY 1 HAVING sum(d) > 0), " +
      "ms AS (SELECT g, t, c, 0 AS is_probe FROM per " +
      "UNION ALL SELECT gg.g, tm.t, CAST(0 AS BIGINT), 1 FROM tm CROSS JOIN (SELECT CAST(0 AS BIGINT) AS g UNION ALL SELECT CAST(1 AS BIGINT)) gg), " +
      "ar AS (SELECT g, t, is_probe, CAST(sum(c) OVER (PARTITION BY g ORDER BY t DESC RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_g FROM ms), " +
      "rw AS (SELECT t, CAST(sum(CASE WHEN g = 0 THEN n_g ELSE 0 END) AS BIGINT) AS n0, " +
      "CAST(sum(CASE WHEN g = 1 THEN n_g ELSE 0 END) AS BIGINT) AS n1 FROM ar WHERE is_probe = 1 GROUP BY 1), " +
      "r AS MATERIALIZED (SELECT tm.t AS tt, tm.dt, rw.n0, rw.n1, CAST(coalesce(dd.d, 0) AS BIGINT) AS d1 " +
      "FROM tm JOIN rw ON rw.t = tm.t LEFT JOIN per dd ON dd.t = tm.t AND dd.g = 1), " +
      "b0 AS (SELECT 0.0 AS beta), " +
      s"$steps, " +
      // residuals at the fitted beta, ranked by event time; the rank
      // is cast through DOUBLE exactly like the Scala xs
      s"rr AS MATERIALIZED (SELECT CAST(row_number() OVER (ORDER BY tt) AS DOUBLE) AS x, tt, " +
      s"(CAST(d1 AS DOUBLE) - CAST(dt AS DOUBLE) * ${pOf(s"(SELECT beta FROM b$iters)")}) AS y " +
      "FROM r), " +
      "mm AS (SELECT list_reduce(list(x ORDER BY tt), (a, b) -> a + b) / (SELECT count(*) FROM rr) AS mx, " +
      "list_reduce(list(y ORDER BY tt), (a, b) -> a + b) / (SELECT count(*) FROM rr) AS my FROM rr), " +
      "cc AS (SELECT list_reduce(list((x - mx) * (y - my) ORDER BY tt), (a, b) -> a + b) AS cov, " +
      "list_reduce(list((x - mx) * (x - mx) ORDER BY tt), (a, b) -> a + b) AS vx, " +
      "list_reduce(list((y - my) * (y - my) ORDER BY tt), (a, b) -> a + b) AS vy " +
      "FROM (SELECT rr.*, mm.mx, mm.my FROM rr CROSS JOIN mm) q) " +
      "SELECT (SELECT CAST(count(*) AS BIGINT) FROM r) AS n_times, " +
      s"(SELECT beta FROM b$iters) AS beta, " +
      "(CASE WHEN vx * vy = 0.0 THEN 0.0 ELSE cov / sqrt(vx * vy) END) AS trend_corr, " +
      "(CASE WHEN vx * vy = 0.0 THEN 0.0 ELSE cov / sqrt(vx * vy) END) * sqrt(CAST((SELECT count(*) FROM r) - 1 AS DOUBLE)) AS z, " +
      "abs((CASE WHEN vx * vy = 0.0 THEN 0.0 ELSE cov / sqrt(vx * vy) END) * sqrt(CAST((SELECT count(*) FROM r) - 1 AS DOUBLE))) > 1.96 AS ph_violation " +
      "FROM cc"
  }

  /** STRATIFIED Cox proportional hazards (Breslow ties, binary
    * covariate) — the standard answer when a nuisance factor (region,
    * platform, acquisition channel) violates proportional hazards:
    * each stratum keeps its OWN baseline hazard (risk sets never cross
    * strata), while the covariate effect β is shared and estimated
    * from the pooled partial likelihood. Confounding by stratum
    * composition nets out exactly — a stratum where everyone churns
    * fast contributes only its WITHIN-stratum cohort contrast.
    *
    * Same collapsed architecture as [[coxPhBinary]] with the stratum
    * riding every key: the risk table is (stratum × event time) rows
    * of exact suffix-summed counts, and the driver Newton folds
    * score/information over (stratum asc, time asc) — textually
    * mirrored by the oracle's ORDER BY (st, tt) list_reduce. Strata
    * where a cohort is absent contribute zero information (p = 0 or 1
    * exactly) rather than failing: only the POOLED information must be
    * positive. Separation guards and the `separated` flag are
    * [[coxPhBinary]]'s.
    */
  def coxPhStrat(df: DataFrame, groupCol: String, strataCol: String,
      durationCol: String, observedCol: String, iters: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val subj = df.select(col(groupCol).cast("long").as("g"),
      col(strataCol).cast("long").as("st"),
      col(durationCol).cast("long").as("t"), col(observedCol).cast("int").as("obs"))
    val gvals = subj.select("g").where(col("g").isNotNull)
      .distinct().limit(3).collect().map(_.getLong(0)).toSet
    require(gvals.nonEmpty && gvals.subsetOf(Set(0L, 1L)),
      s"coxPhStrat: $groupCol must be binary 0/1 " +
        s"(got ${gvals.toSeq.sorted.mkString(", ")})")
    val per = subj.groupBy("st", "g", "t")
      .agg(count(lit(1)).as("c"),
        sum(when(col("obs") === 1, 1L).otherwise(0L)).as("d"))
    val times = per.groupBy("st", "t").agg(sum("d").as("dt")).where(col("dt") > 0)
    val probes = times.select(col("st"),
      explode(array(lit(0L), lit(1L))).as("g"),
      col("t"), lit(0L).as("c"), lit(1).as("is_probe"))
    val suffix = Window.partitionBy(col("st"), col("g")).orderBy(col("t").desc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = per.select(col("st"), col("g"), col("t"), col("c"), lit(0).as("is_probe"))
      .unionByName(probes)
      .withColumn("n_g", sum(col("c")).over(suffix))
      .where(col("is_probe") === 1)
    val riskWide = risk.groupBy("st", "t").agg(
      sum(when(col("g") === 0, col("n_g")).otherwise(0L)).as("n0"),
      sum(when(col("g") === 1, col("n_g")).otherwise(0L)).as("n1"))
    val d1 = per.where(col("g") === 1)
      .select(col("st"), col("t"), col("d").as("d1"))
    val rows = times.join(riskWide, Seq("st", "t"))
      .join(d1, Seq("st", "t"), "left")
      .select(col("st"), col("t"), col("dt"), col("n0"), col("n1"),
        coalesce(col("d1"), lit(0L)).as("d1"))
      .orderBy("st", "t")
      .collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    require(rows.nonEmpty, "coxPhStrat: no uncensored events")
    def scoreInfo(beta: Double): (Double, Double) = {
      val eb = math.exp(beta)
      val terms = rows.map { case (dt, n0, n1, d1v) =>
        val p = n1.toDouble * eb / (n0.toDouble + n1.toDouble * eb)
        (d1v.toDouble - dt.toDouble * p, dt.toDouble * (p - p * p))
      }
      (terms.map(_._1).reduceLeft(_ + _), terms.map(_._2).reduceLeft(_ + _))
    }
    val (score0, info0) = scoreInfo(0.0)
    require(info0 > 0,
      "coxPhStrat: degenerate risk sets — no stratum carries both cohorts at any event time")
    var beta = 0.0
    var degenerate = false
    for (_ <- 0 until iters) {
      val (u, i) = scoreInfo(beta)
      if (java.lang.Double.isFinite(u) && java.lang.Double.isFinite(i) && i > 0) {
        val step = beta + u / i
        if (step > 30.0 || step < -30.0) degenerate = true
        beta = math.max(-30.0, math.min(30.0, step))
      } else degenerate = true
    }
    val iFinal = scoreInfo(beta)._2
    val iOk = java.lang.Double.isFinite(iFinal) && iFinal > 0
    val separated = degenerate || !iOk
    val se = if (iOk) 1.0 / math.sqrt(iFinal) else Double.NaN
    val z = if (iOk) beta / se else Double.NaN
    val nStrata = subj.select("st").distinct().count()
    spark.createDataFrame(Seq(
      (nStrata, rows.length.toLong, score0, info0, beta, math.exp(beta), se, z,
        !separated && math.abs(z) > 1.96, separated)))
      .toDF("n_strata", "n_rows", "score0", "info0", "beta", "hazard_ratio",
        "se", "z", "significant_5pct", "separated")
  }

  /** DuckDB replay of [[coxPhStrat]] over a subjects CTE named
    * `subjects` with columns (g, st, t, observed) — [[coxPhBinarySql]]
    * with the stratum riding every key and the folds ordered
    * (st, tt). */
  def coxPhStratSql(subjectsCte: String, iters: Int = 8): String = {
    def pOf(beta: String): String =
      s"(CAST(n1 AS DOUBLE) * exp($beta) / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE) * exp($beta)))"
    def uFold(beta: String): String =
      s"list_reduce(list(CAST(d1 AS DOUBLE) - CAST(dt AS DOUBLE) * ${pOf(beta)} ORDER BY st, tt), (a, b) -> a + b)"
    def iFold(beta: String): String =
      s"list_reduce(list(CAST(dt AS DOUBLE) * (${pOf(beta)} - ${pOf(beta)} * ${pOf(beta)}) ORDER BY st, tt), (a, b) -> a + b)"
    val steps = (1 to iters).map { k =>
      s"b$k AS MATERIALIZED (SELECT any_value(beta) + ${uFold("beta")} / ${iFold("beta")} AS beta " +
        s"FROM (SELECT r.*, b.beta FROM r CROSS JOIN b${k - 1} b) x)"
    }.mkString(", ")
    s"WITH $subjectsCte, " +
      "per AS (SELECT st, g, t, CAST(count(*) AS BIGINT) AS c, CAST(sum(CASE WHEN observed = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d FROM subjects GROUP BY 1, 2, 3), " +
      "tm AS (SELECT st, t, CAST(sum(d) AS BIGINT) AS dt FROM per GROUP BY 1, 2 HAVING sum(d) > 0), " +
      "ms AS (SELECT st, g, t, c, 0 AS is_probe FROM per " +
      "UNION ALL SELECT tm.st, gg.g, tm.t, CAST(0 AS BIGINT), 1 FROM tm CROSS JOIN (SELECT CAST(0 AS BIGINT) AS g UNION ALL SELECT CAST(1 AS BIGINT)) gg), " +
      "ar AS (SELECT st, g, t, is_probe, CAST(sum(c) OVER (PARTITION BY st, g ORDER BY t DESC RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_g FROM ms), " +
      "rw AS (SELECT st, t, CAST(sum(CASE WHEN g = 0 THEN n_g ELSE 0 END) AS BIGINT) AS n0, " +
      "CAST(sum(CASE WHEN g = 1 THEN n_g ELSE 0 END) AS BIGINT) AS n1 FROM ar WHERE is_probe = 1 GROUP BY 1, 2), " +
      "r AS MATERIALIZED (SELECT tm.st, tm.t AS tt, tm.dt, rw.n0, rw.n1, CAST(coalesce(dd.d, 0) AS BIGINT) AS d1 " +
      "FROM tm JOIN rw ON rw.st = tm.st AND rw.t = tm.t " +
      "LEFT JOIN per dd ON dd.st = tm.st AND dd.t = tm.t AND dd.g = 1), " +
      "b0 AS (SELECT 0.0 AS beta), " +
      s"z0 AS (SELECT ${uFold("beta")} AS score0, ${iFold("beta")} AS info0 " +
      "FROM (SELECT r.*, b.beta FROM r CROSS JOIN b0 b) x), " +
      s"$steps, " +
      s"zf AS (SELECT ${iFold("beta")} AS i_final FROM (SELECT r.*, b.beta FROM r CROSS JOIN b$iters b) x) " +
      "SELECT (SELECT CAST(count(DISTINCT st) AS BIGINT) FROM subjects) AS n_strata, " +
      "(SELECT CAST(count(*) AS BIGINT) FROM r) AS n_rows, z0.score0, z0.info0, " +
      s"b$iters.beta, exp(b$iters.beta) AS hazard_ratio, " +
      "1.0 / sqrt(zf.i_final) AS se, " +
      s"b$iters.beta / (1.0 / sqrt(zf.i_final)) AS z, " +
      s"(isfinite(zf.i_final) AND zf.i_final > 0 AND abs(b$iters.beta / (1.0 / sqrt(zf.i_final))) > 1.96) AS significant_5pct, " +
      s"NOT (isfinite(zf.i_final) AND zf.i_final > 0) AS separated " +
      s"FROM z0 CROSS JOIN b$iters CROSS JOIN zf"
  }

  /** MULTI-COVARIATE Cox proportional hazards (Breslow ties), K BINARY
    * covariates — "which of these K cohort memberships carries the
    * churn hazard, net of the others?": the natural next step from
    * [[coxPhBinary]], same collapsed risk-table architecture
    * generalized over covariate PATTERNS. With binary covariates the
    * hazard term exp(βᵀx) takes at most 2^p distinct values, so the
    * risk table collapses to (event time × observed pattern) rows —
    * suffix-summed at-risk counts per pattern, exact integer death
    * counts — and the p-dimensional Newton runs driver-side on that
    * bounded table (the emb_top_eigvec pattern: corpus work in one
    * combinable pass, p-sized iteration on the driver). p ≤ 8 pinned
    * loudly (≤ 256 patterns × |distinct event times| collected rows;
    * the calendar-bounded axis argument of the whole survival family).
    *
    * Per event time t (patterns ascending, left-associated folds —
    * textually mirrored by the oracle's ORDER BY list_reduce):
    * S0 = Σ_g n_g·exp(βᵀx_g), S1_j, S2_jk the weighted moments;
    * U_j = Σ_t [dx_j(t) − dt·S1_j/S0];
    * I_jk = Σ_t dt·(S2_jk/S0 − (S1_j/S0)(S1_k/S0)). The p×p solve is
    * deterministic NO-PIVOT Gaussian elimination (the Fisher
    * information is symmetric positive-definite on non-degenerate
    * data, so natural-order elimination never needs a pivot) with
    * ascending back-substitution — every double op in a fixed order
    * both engines replay. se_j = √((I⁻¹)_jj) via the same elimination
    * against unit vectors. [[coxPhBinary]]'s separation guards apply
    * per coordinate (step skip on non-finite/non-PD, ±30 clamp,
    * `separated` flag). A p = 1 call reduces bit-for-bit to
    * [[coxPhBinary]]'s β (spec-pinned).
    *
    * @return one row per covariate:
    *         (cov, n_times, beta, hazard_ratio, se, z,
    *         significant_5pct, separated)
    */
  def coxPhMulti(df: DataFrame, covCols: Seq[String], durationCol: String,
      observedCol: String, iters: Int = 8): DataFrame = {
    val p = covCols.size
    require(p >= 1 && p <= 8,
      s"coxPhMulti: 1..8 binary covariates (got $p) — the collapsed risk table " +
        "is (event times x 2^p patterns); beyond 8 collapse covariates first")
    val spark = df.sparkSession
    val subj = df.select(
      covCols.zipWithIndex.map { case (c, j) => col(c).cast("long").as(s"__x$j") } ++
        Seq(col(durationCol).cast("long").as("t"),
          col(observedCol).cast("int").as("obs")): _*)
    // one metadata-sized probe validates EVERY covariate binary 0/1
    // (the coxPhBinary discipline, batched): any other value silently
    // skews the pattern moments
    val badVals = subj.select(explode(array(covCols.indices.map(j =>
        struct(lit(covCols(j)).as("c"), col(s"__x$j").as("v"))): _*)).as("e"))
      .select(col("e.c"), col("e.v")).where(col("e.v").isNotNull)
      .distinct().limit(3 * p)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .filterNot(cv => cv._2 == 0L || cv._2 == 1L)
    require(badVals.isEmpty,
      s"coxPhMulti: covariates must be binary 0/1 (got ${badVals.take(4).mkString(", ")})")
    val pattern = covCols.indices.map(j => col(s"__x$j") * (1L << j)).reduce(_ + _)
    val per = subj.withColumn("pattern", pattern)
      .groupBy("pattern", "t")
      .agg(count(lit(1)).as("c"),
        sum(when(col("obs") === 1, 1L).otherwise(0L)).as("d"))
    val times = per.groupBy("t").agg(sum("d").as("dt")).where(col("dt") > 0)
    val pats = per.select("pattern").distinct()
      .collect().map(_.getLong(0)).sorted // <= 2^p, bounded by the require
    val probes = times.select(
      explode(array(pats.map(lit(_)): _*)).as("pattern"),
      col("t"), lit(0L).as("c"), lit(1).as("is_probe"))
    val suffix = Window.partitionBy(col("pattern")).orderBy(col("t").desc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = per.select(col("pattern"), col("t"), col("c"), lit(0).as("is_probe"))
      .unionByName(probes)
      .withColumn("n_g", sum(col("c")).over(suffix))
      .where(col("is_probe") === 1)
      .select(col("pattern"), col("t"), col("n_g"))
    // the collapsed risk table: (event time x observed pattern) exact
    // longs, collected ascending (t, pattern) for the driver folds
    val rows = times.join(risk, "t")
      .join(per.select(col("pattern"), col("t"), col("d")), Seq("t", "pattern"), "left")
      .select(col("t"), col("dt"), col("pattern"), col("n_g"),
        coalesce(col("d"), lit(0L)).as("d"))
      .orderBy("t", "pattern")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    require(rows.nonEmpty, "coxPhMulti: no uncensored events")
    val byT: Seq[(Long, Seq[(Long, Long, Long)])] = rows
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rs) =>
        (rs.head._2, rs.sortBy(_._3).map(r => (r._3, r._4, r._5)).toSeq)
      }
    def bit(g: Long, j: Int): Double = ((g >> j) & 1L).toDouble
    def scoreInfo(beta: Array[Double]): (Array[Double], Array[Array[Double]]) = {
      val u = Array.fill(p)(0.0)
      val im = Array.fill(p, p)(0.0)
      byT.foreach { case (dt, gs) =>
        var s0 = 0.0
        val s1 = Array.fill(p)(0.0)
        val s2 = Array.fill(p, p)(0.0)
        val dx = Array.fill(p)(0L)
        gs.foreach { case (g, n, d) =>
          var xdot = 0.0
          var j = 0
          while (j < p) { xdot += beta(j) * bit(g, j); j += 1 }
          val w = n.toDouble * math.exp(xdot)
          s0 += w
          j = 0
          while (j < p) {
            s1(j) += w * bit(g, j)
            var k = 0
            while (k < p) { s2(j)(k) += w * bit(g, j) * bit(g, k); k += 1 }
            dx(j) += d * ((g >> j) & 1L)
            j += 1
          }
        }
        var j = 0
        while (j < p) {
          u(j) += dx(j).toDouble - dt.toDouble * s1(j) / s0
          var k = 0
          while (k < p) {
            im(j)(k) += dt.toDouble * (s2(j)(k) / s0 - (s1(j) / s0) * (s1(k) / s0))
            k += 1
          }
          j += 1
        }
      }
      (u, im)
    }
    // deterministic NO-PIVOT Gaussian elimination + ascending back-sub
    // — the fixed-order solve both engines replay (SPD information)
    def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
      val m = a.map(_.clone()); val y = b.clone()
      for (k <- 0 until p; i <- k + 1 until p) {
        val f = m(i)(k) / m(k)(k)
        for (j <- k until p) m(i)(j) -= f * m(k)(j)
        y(i) -= f * y(k)
      }
      val x = Array.fill(p)(0.0)
      for (i <- p - 1 to 0 by -1) {
        var acc = y(i)
        for (j <- i + 1 until p) acc -= m(i)(j) * x(j)
        x(i) = acc / m(i)(i)
      }
      x
    }
    val (_, info0) = scoreInfo(Array.fill(p)(0.0))
    require((0 until p).forall(j => info0(j)(j) > 0),
      "coxPhMulti: degenerate risk sets — a covariate never varies at any event time")
    val beta = Array.fill(p)(0.0)
    var degenerate = false
    for (_ <- 0 until iters) {
      val (u, im) = scoreInfo(beta)
      val finite = u.forall(java.lang.Double.isFinite) &&
        im.forall(_.forall(java.lang.Double.isFinite)) &&
        (0 until p).forall(j => im(j)(j) > 0)
      if (finite) {
        val delta = solve(im, u)
        if (delta.forall(java.lang.Double.isFinite)) {
          var j = 0
          while (j < p) {
            val step = beta(j) + delta(j)
            if (step > 30.0 || step < -30.0) degenerate = true
            beta(j) = math.max(-30.0, math.min(30.0, step))
            j += 1
          }
        } else degenerate = true
      } else degenerate = true
    }
    val (_, iFin) = scoreInfo(beta)
    val ses = (0 until p).map { j =>
      val e = Array.fill(p)(0.0); e(j) = 1.0
      val inv = try solve(iFin, e)(j) catch { case _: Throwable => Double.NaN }
      if (java.lang.Double.isFinite(inv) && inv > 0) math.sqrt(inv) else Double.NaN
    }
    val separated = degenerate || ses.exists(s => !java.lang.Double.isFinite(s))
    val nTimes = byT.size.toLong
    spark.createDataFrame(covCols.indices.map { j =>
      val se = ses(j)
      val z = if (java.lang.Double.isFinite(se)) beta(j) / se else Double.NaN
      (covCols(j), nTimes, beta(j), math.exp(beta(j)), se, z,
        !separated && math.abs(z) > 1.96, separated)
    })
      .toDF("cov", "n_times", "beta", "hazard_ratio", "se", "z",
        "significant_5pct", "separated")
  }

  /** DuckDB replay of [[coxPhMulti]] for p = 2 over a subjects CTE
    * named `subjects` with columns (x1, x2, t, observed) — the
    * (time × pattern) suffix-sum risk table, `iters` unrolled Newton
    * CTEs whose per-time moments and per-covariate folds are
    * ascending-ordered list_reduce (first-element-seeded ≡ the Scala
    * 0.0-seeded fold), and the 2×2 no-pivot elimination written
    * op-for-op (f = i12/i11, Schur s = i22 − f·i12).
    */
  def coxPhMultiSql(subjectsCte: String, cov1: String, cov2: String,
      iters: Int = 8): String = {
    def fold(expr: String, ord: String): String =
      s"list_reduce(list($expr ORDER BY $ord), (a, b) -> a + b)"
    val xdot = "(0.0 + b1 * CAST(x1 AS DOUBLE) + b2 * CAST(x2 AS DOUBLE))"
    val w = s"(CAST(n AS DOUBLE) * exp($xdot))"
    def st(k: Int): String =
      s"st$k AS (SELECT tt, dt, " +
        s"${fold(w, "pattern")} AS s0, " +
        s"${fold(s"$w * CAST(x1 AS DOUBLE)", "pattern")} AS s1_1, " +
        s"${fold(s"$w * CAST(x2 AS DOUBLE)", "pattern")} AS s1_2, " +
        s"${fold(s"$w * CAST(x1 AS DOUBLE) * CAST(x1 AS DOUBLE)", "pattern")} AS s2_11, " +
        s"${fold(s"$w * CAST(x1 AS DOUBLE) * CAST(x2 AS DOUBLE)", "pattern")} AS s2_12, " +
        s"${fold(s"$w * CAST(x2 AS DOUBLE) * CAST(x2 AS DOUBLE)", "pattern")} AS s2_22, " +
        "CAST(sum(d * x1) AS BIGINT) AS dx1, CAST(sum(d * x2) AS BIGINT) AS dx2 " +
        s"FROM (SELECT r.*, b.b1, b.b2 FROM r CROSS JOIN b${k - 1} b) x GROUP BY tt, dt)"
    def uk(k: Int): String =
      s"uk$k AS (SELECT " +
        s"${fold("CAST(dx1 AS DOUBLE) - CAST(dt AS DOUBLE) * s1_1 / s0", "tt")} AS u1, " +
        s"${fold("CAST(dx2 AS DOUBLE) - CAST(dt AS DOUBLE) * s1_2 / s0", "tt")} AS u2, " +
        s"${fold("CAST(dt AS DOUBLE) * (s2_11 / s0 - (s1_1 / s0) * (s1_1 / s0))", "tt")} AS i11, " +
        s"${fold("CAST(dt AS DOUBLE) * (s2_12 / s0 - (s1_1 / s0) * (s1_2 / s0))", "tt")} AS i12, " +
        s"${fold("CAST(dt AS DOUBLE) * (s2_22 / s0 - (s1_2 / s0) * (s1_2 / s0))", "tt")} AS i22 " +
        s"FROM st$k)"
    def bk(k: Int): String =
      s"fk$k AS (SELECT *, (i12 / i11) AS f FROM uk$k), " +
        s"dk$k AS (SELECT *, ((u2 - f * u1) / (i22 - f * i12)) AS d2 FROM fk$k), " +
        s"b$k AS MATERIALIZED (SELECT b.b1 + ((u1 - i12 * d2) / i11) AS b1, " +
        s"b.b2 + d2 AS b2 FROM dk$k CROSS JOIN b${k - 1} b)"
    val steps = (1 to iters).map(k => s"${st(k)}, ${uk(k)}, ${bk(k)}").mkString(", ")
    s"WITH $subjectsCte, " +
      "sub AS (SELECT CAST(x1 AS BIGINT) AS x1, CAST(x2 AS BIGINT) AS x2, t, observed, " +
      "CAST(x1 AS BIGINT) + CAST(x2 AS BIGINT) * 2 AS pattern FROM subjects), " +
      "per AS (SELECT pattern, t, CAST(count(*) AS BIGINT) AS c, " +
      "CAST(sum(CASE WHEN observed = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d FROM sub GROUP BY 1, 2), " +
      "tm AS (SELECT t, CAST(sum(d) AS BIGINT) AS dt FROM per GROUP BY 1 HAVING sum(d) > 0), " +
      "pt AS (SELECT DISTINCT pattern FROM per), " +
      "ms AS (SELECT pattern, t, c, 0 AS is_probe FROM per " +
      "UNION ALL SELECT pt.pattern, tm.t, CAST(0 AS BIGINT), 1 FROM tm CROSS JOIN pt), " +
      "ar AS (SELECT pattern, t, is_probe, CAST(sum(c) OVER (PARTITION BY pattern ORDER BY t DESC RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_g FROM ms), " +
      "r AS MATERIALIZED (SELECT tm.t AS tt, tm.dt, az.pattern, " +
      "CAST(az.pattern % 2 AS BIGINT) AS x1, CAST(az.pattern // 2 AS BIGINT) AS x2, " +
      "az.n_g AS n, CAST(coalesce(dd.d, 0) AS BIGINT) AS d " +
      "FROM tm JOIN (SELECT * FROM ar WHERE is_probe = 1) az ON az.t = tm.t " +
      "LEFT JOIN per dd ON dd.t = tm.t AND dd.pattern = az.pattern), " +
      "b0 AS (SELECT 0.0 AS b1, 0.0 AS b2), " +
      s"$steps, " +
      s"${st(iters + 1).replace(s"st${iters + 1} AS", "zst AS").replace(s"b$iters b", s"b$iters b")}, " +
      s"${uk(iters + 1).replace(s"uk${iters + 1} AS", "zuk AS").replace(s"FROM st${iters + 1}", "FROM zst")}, " +
      "zf AS (SELECT *, (i12 / i11) AS f, (i22 - (i12 / i11) * i12) AS s FROM zuk), " +
      "se AS (SELECT sqrt((1.0 - i12 * ((0.0 - f) / s)) / i11) AS se1, " +
      "sqrt(1.0 / s) AS se2 FROM zf), " +
      s"fin AS (SELECT b.b1, b.b2, se.se1, se.se2, " +
      "(SELECT CAST(count(*) AS BIGINT) FROM tm) AS n_times, " +
      "NOT (isfinite(se.se1) AND se.se1 > 0 AND isfinite(se.se2) AND se.se2 > 0) AS sep " +
      s"FROM b$iters b CROSS JOIN se) " +
      s"SELECT '$cov1' AS cov, n_times, b1 AS beta, exp(b1) AS hazard_ratio, " +
      "se1 AS se, b1 / se1 AS z, " +
      "(NOT sep AND abs(b1 / se1) > 1.96) AS significant_5pct, sep AS separated FROM fin " +
      s"UNION ALL SELECT '$cov2', n_times, b2, exp(b2), se2, b2 / se2, " +
      "(NOT sep AND abs(b2 / se2) > 1.96), sep FROM fin"
  }

  /** K-SAMPLE log-rank — "do any of these k survival curves differ?",
    * the omnibus companion of the two-sample [[logRankTest]] (k plan
    * tiers, k regions, k cohorts). Per pooled event time each group's
    * observed deaths are compared with the proportional-allocation
    * expectation; the statistic is the CONSERVATIVE textbook form
    * X² = Σ_g (O_g − E_g)²/E_g on χ²(k−1) (the diagonal approximation
    * of the full covariance quadratic — never anti-conservative by
    * more than the standard references allow, and the form that stays
    * a pure per-group fold). Group labels are {0, …, k−1}.
    *
    * Scale shape: the same collapsed-axis suffix-sum construction as
    * the two-sample test — probe rows for ALL k groups, one RANGE
    * window, every post-aggregate table ≤ k × |distinct times|.
    * Output: one row per group (g, observed, expected, chi2_contrib)
    * with the global (chi2, dof, significant_5pct) alongside.
    */
  def logRankTestK(df: DataFrame, groupCol: String, durationCol: String,
      observedCol: String, numGroups: Int,
      critValue: Option[Double] = None): DataFrame = {
    // pinned chi-square 5% critical values for dof 1..8; beyond that the
    // caller must supply the critical value for its dof explicitly
    val critTable = Map(1 -> 3.841, 2 -> 5.991, 3 -> 7.815, 4 -> 9.488,
      5 -> 11.070, 6 -> 12.592, 7 -> 14.067, 8 -> 15.507)
    require(numGroups >= 2 && numGroups <= 64)
    require(critValue.isDefined || critTable.contains(numGroups - 1),
      s"no pinned chi-square critical value for dof ${numGroups - 1} " +
        "(table covers 1..8): pass critValue explicitly")
    val crit = (dof: Int) => critValue.getOrElse(critTable(dof))
    val subj = df.select(col(groupCol).cast("long").as("g"),
      col(durationCol).cast("long").as("t"), col(observedCol).cast("int").as("obs"))
    val per = subj.groupBy("g", "t")
      .agg(count(lit(1)).as("c"),
        sum(when(col("obs") === 1, 1L).otherwise(0L)).as("d"))
    val times = per.groupBy("t").agg(sum("d").as("dt")).where(col("dt") > 0)
    val probes = times.select(
      explode(array((0 until numGroups).map(i => lit(i.toLong)): _*)).as("g"),
      col("t"), lit(0L).as("c"), lit(1).as("is_probe"))
    val suffix = Window.partitionBy(col("g")).orderBy(col("t").desc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = per.select(col("g"), col("t"), col("c"), lit(0).as("is_probe"))
      .unionByName(probes)
      .withColumn("n_g", sum(col("c")).over(suffix))
      .where(col("is_probe") === 1)
      .select(col("g"), col("t").as("tt"), col("n_g"))
    val nTot = risk.groupBy("tt").agg(sum("n_g").as("n")).where(col("n") > 1)
    val terms = risk
      .join(times.select(col("t").as("tt"), col("dt")), "tt")
      .join(nTot, "tt")
    val eg = terms.groupBy("g")
      .agg(sum(col("dt").cast("double") * col("n_g").cast("double") /
        col("n").cast("double")).as("expected"))
    val og = per.join(times.select(col("t")).join(
        nTot.select(col("tt").as("t")), "t"), "t")
      .groupBy("g").agg(sum("d").as("observed"))
    val rows = eg.join(og, Seq("g"), "left")
      .select(col("g"), coalesce(col("observed"), lit(0L)).as("observed"),
        col("expected"))
      .withColumn("chi2_contrib",
        when(col("expected") > 0,
          (col("observed").cast("double") - col("expected")) *
            (col("observed").cast("double") - col("expected")) / col("expected"))
          .otherwise(lit(0.0)))
    val tot = rows.agg(sum(col("chi2_contrib")).as("chi2"))
    rows.crossJoin(broadcast(tot))
      .select(col("g"), col("observed"), col("expected"), col("chi2_contrib"),
        col("chi2"), lit(numGroups - 1).as("dof"),
        (col("chi2") > crit(numGroups - 1)).as("significant_5pct"))
  }

  /** DuckDB replay of [[logRankTestK]] over a subjects CTE named
    * `subjects` with columns (g, t, observed). */
  def logRankTestKSql(subjectsCte: String, numGroups: Int): String = {
    val crit = Map(1 -> 3.841, 2 -> 5.991, 3 -> 7.815, 4 -> 9.488,
      5 -> 11.070, 6 -> 12.592, 7 -> 14.067, 8 -> 15.507)(numGroups - 1)
    val groupsUnion = (0 until numGroups)
      .map(i => s"SELECT CAST($i AS BIGINT) AS g").mkString(" UNION ALL ")
    s"WITH $subjectsCte, " +
      "per AS (SELECT g, t, CAST(count(*) AS BIGINT) AS c, CAST(sum(CASE WHEN observed = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d FROM subjects GROUP BY 1, 2), " +
      "tm AS (SELECT t, CAST(sum(d) AS BIGINT) AS dt FROM per GROUP BY 1 HAVING sum(d) > 0), " +
      s"ms AS (SELECT g, t, c, 0 AS is_probe FROM per UNION ALL SELECT gg.g, tm.t, CAST(0 AS BIGINT), 1 FROM tm CROSS JOIN ($groupsUnion) gg), " +
      "ar AS (SELECT g, t, is_probe, CAST(sum(c) OVER (PARTITION BY g ORDER BY t DESC RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_g FROM ms), " +
      "rk AS (SELECT g, t AS tt, n_g FROM ar WHERE is_probe = 1), " +
      "nn AS (SELECT tt, CAST(sum(n_g) AS BIGINT) AS n FROM rk GROUP BY 1 HAVING sum(n_g) > 1), " +
      "tr AS (SELECT r.g, r.tt, r.n_g, tm.dt, nn.n FROM rk r JOIN tm ON tm.t = r.tt JOIN nn ON nn.tt = r.tt), " +
      "eg AS (SELECT g, sum(CAST(dt AS DOUBLE) * CAST(n_g AS DOUBLE) / CAST(n AS DOUBLE)) AS expected FROM tr GROUP BY 1), " +
      "og AS (SELECT p.g, CAST(sum(p.d) AS BIGINT) AS observed FROM per p " +
      "JOIN nn ON nn.tt = p.t GROUP BY 1), " +
      "rws AS (SELECT eg.g, CAST(coalesce(og.observed, 0) AS BIGINT) AS observed, eg.expected, " +
      "CASE WHEN eg.expected > 0 THEN (CAST(coalesce(og.observed, 0) AS DOUBLE) - eg.expected) * (CAST(coalesce(og.observed, 0) AS DOUBLE) - eg.expected) / eg.expected ELSE 0.0 END AS chi2_contrib " +
      "FROM eg LEFT JOIN og ON og.g = eg.g), " +
      "tt2 AS (SELECT sum(chi2_contrib) AS chi2 FROM rws) " +
      s"SELECT rws.g, rws.observed, rws.expected, rws.chi2_contrib, tt2.chi2, CAST(${numGroups - 1} AS INT) AS dof, " +
      s"tt2.chi2 > $crit AS significant_5pct FROM rws CROSS JOIN tt2"
  }

  /** DuckDB replay of [[logRankTest]] over a subjects CTE named
    * `subjects` with columns (g, t, observed). */
  def logRankSql(subjectsCte: String): String =
    s"WITH $subjectsCte, " +
      "per AS (SELECT g, t, CAST(count(*) AS BIGINT) AS c, CAST(sum(CASE WHEN observed = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d FROM subjects GROUP BY 1, 2), " +
      "tm AS (SELECT t, CAST(sum(d) AS BIGINT) AS dt FROM per GROUP BY 1 HAVING sum(d) > 0), " +
      "ms AS (SELECT g, t, c, 0 AS is_probe FROM per " +
      "UNION ALL SELECT gg.g, tm.t, CAST(0 AS BIGINT), 1 FROM tm CROSS JOIN (SELECT CAST(0 AS BIGINT) AS g UNION ALL SELECT CAST(1 AS BIGINT)) gg), " +
      "ar AS (SELECT g, t, is_probe, CAST(sum(c) OVER (PARTITION BY g ORDER BY t DESC RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_g FROM ms), " +
      "rw AS (SELECT t, CAST(sum(n_g) AS BIGINT) AS n, CAST(sum(CASE WHEN g = 1 THEN n_g ELSE 0 END) AS BIGINT) AS n1 FROM ar WHERE is_probe = 1 GROUP BY 1), " +
      "r AS (SELECT tm.t AS tt, tm.dt, rw.n, rw.n1, CAST(coalesce(dd.d, 0) AS BIGINT) AS d1 " +
      "FROM tm JOIN rw ON rw.t = tm.t " +
      "LEFT JOIN per dd ON dd.t = tm.t AND dd.g = 1 WHERE rw.n > 1), " +
      "ag AS (SELECT CAST(count(*) AS BIGINT) AS n_times, CAST(sum(d1) AS BIGINT) AS obs1, " +
      "sum(CAST(dt AS DOUBLE) * (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))) AS exp1, " +
      "sum(CAST(dt AS DOUBLE) * (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE)) * (1.0 - CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE)) * " +
      "CAST(n - dt AS DOUBLE) / CAST(n - 1 AS DOUBLE)) AS var1 FROM r) " +
      "SELECT n_times, obs1, exp1, var1, " +
      "(CAST(obs1 AS DOUBLE) - exp1) * (CAST(obs1 AS DOUBLE) - exp1) / var1 AS chi2, " +
      "(CAST(obs1 AS DOUBLE) - exp1) * (CAST(obs1 AS DOUBLE) - exp1) / var1 > 3.841 AS significant_5pct FROM ag"

  /** DuckDB replay of [[kaplanMeier]] over a subjects CTE named
    * `subjects` with columns (g, t, observed). */
  def kaplanMeierSql(subjectsCte: String): String =
    s"WITH $subjectsCte, " +
      "per AS (SELECT g, t, CAST(sum(CASE WHEN observed = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d, " +
      "CAST(count(*) AS BIGINT) AS alln FROM subjects GROUP BY 1, 2), " +
      "st AS (SELECT g, t, d, " +
      "CAST(sum(alln) OVER (PARTITION BY g) AS BIGINT) - " +
      "CAST(coalesce(sum(alln) OVER (PARTITION BY g ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk FROM per), " +
      "lt AS (SELECT g, t, d, n_risk, CASE WHEN d > 0 AND d < n_risk THEN ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)) ELSE 0.0 END AS lnterm FROM st), " +
      "sv AS (SELECT g, t, d, n_risk, CASE WHEN max(CASE WHEN d >= n_risk THEN 1 ELSE 0 END) OVER (PARTITION BY g ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1 THEN 0.0 " +
      "ELSE exp(sum(lnterm) OVER (PARTITION BY g ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) END AS survival FROM lt) " +
      "SELECT g, t, n_risk, d AS n_events, survival FROM sv WHERE d > 0"

  /** DuckDB replay of [[rollingIntegerZSpikes]]. */
  def rollingIntegerZSpikesSql(table: String, window: Int = 7, minWindow: Int = 3): String =
    s"WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d, " +
      s"CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS day_cents FROM $table GROUP BY 1), " +
      "w AS (SELECT d, day_cents // 100 AS x, " +
      "CAST(count(*) OVER win AS BIGINT) AS n_w, " +
      "CAST(sum(day_cents // 100) OVER win AS BIGINT) AS s_w, " +
      "CAST(sum((day_cents // 100) * (day_cents // 100)) OVER win AS BIGINT) AS sxx_w " +
      s"FROM daily WINDOW win AS (ORDER BY d ROWS BETWEEN $window PRECEDING AND 1 PRECEDING)) " +
      "SELECT d, x, n_w, s_w, sxx_w, " +
      "(n_w * x - s_w) * (n_w * x - s_w) > 4 * (n_w * sxx_w - s_w * s_w) AS is_spike " +
      s"FROM w WHERE n_w >= $minWindow"
}
