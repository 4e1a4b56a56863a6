package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Affinity, Events, Stats}

/** Round-5 batch: market-basket lift, chi-squared cells, integer
  * rolling spikes, last-touch attribution, compaction planning.
  */
class AffinitySpec extends AnyFunSuite with SparkTest {

  test("pairLift: counts, support cut, ppm lift, line-dedup") {
    val s = spark; import s.implicits._
    // o1 carries a DUPLICATE (o1, p1) line: basket membership must
    // dedup before pair expansion or (1,2) would double-count
    val li = Seq(
      (1L, 1L), (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L),
      (4L, 3L)
    ).toDF("l_orderkey", "l_partkey")
    val out = Affinity.pairLift(li, minSupport = 2).collect()
    assert(out.length == 1, "only (1,2) reaches support 2; (1,3)/(2,3) are cut")
    val r = out.head
    assert(r.getLong(r.fieldIndex("pk_a")) == 1L && r.getLong(r.fieldIndex("pk_b")) == 2L)
    assert(r.getLong(r.fieldIndex("n_co")) == 3L)
    assert(r.getLong(r.fieldIndex("n_a")) == 3L && r.getLong(r.fieldIndex("n_b")) == 3L)
    assert(r.getLong(r.fieldIndex("n_baskets")) == 4L)
    // 1e6 * 3 * 4 / (3 * 3) = 1333333.33 -> floor 1333333
    assert(r.getLong(r.fieldIndex("lift_ppm")) == 1333333L)
  }

  test("chi2Cells: 2x2 with known exact contributions") {
    val s = spark; import s.implicits._
    val rows =
      Seq.fill(20)(("r1", "c1")) ++ Seq.fill(10)(("r1", "c2")) ++
        Seq.fill(10)(("r2", "c1")) ++ Seq.fill(20)(("r2", "c2"))
    val df = rows.toDF("o_orderpriority", "o_orderstatus")
    val out = Stats.chi2Cells(df, "o_orderpriority", "o_orderstatus")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.size == 4)
    val c11 = out(("r1", "c1"))
    assert(c11.getLong(c11.fieldIndex("n_obs")) == 20L)
    assert(c11.getLong(c11.fieldIndex("n_row")) == 30L)
    assert(c11.getLong(c11.fieldIndex("n_col")) == 30L)
    assert(c11.getLong(c11.fieldIndex("n_tot")) == 60L)
    // expected = 30*30/60 = 15 -> 15e6 ppm exactly
    assert(c11.getLong(c11.fieldIndex("exp_ppm")) == 15000000L)
    // (O*n - Rt*Ct)^2 / (Rt*Ct*n) = 300^2 / 54000, the exact double
    assert(c11.getDouble(c11.fieldIndex("contrib")) == 90000.0 / 54000.0)
    // independence never holds here: every cell contributes equally
    assert(out.values.forall(r =>
      r.getDouble(r.fieldIndex("contrib")) == 90000.0 / 54000.0))
  }

  test("rollingIntegerZSpikes: flat series never spikes, planted jump does") {
    val s = spark; import s.implicits._
    val flat = (1 to 10).map(i => (f"2024-01-$i%02d 00:00:00", 100.56))
    val spike = Seq(("2024-01-11 00:00:00", 1000.0))
    val orders = (flat ++ spike).toDF("ds", "o_totalprice")
      .select(to_timestamp(col("ds")).as("o_orderdate"), col("o_totalprice"))
    val out = Stats.rollingIntegerZSpikes(orders)
      .collect().map(r => r.getDate(0).toString -> r).toMap
    // warm-up: days 1-3 have n_w < 3 and are dropped
    assert(!out.contains("2024-01-01") && !out.contains("2024-01-03"))
    assert(out.contains("2024-01-04"))
    // dollars floor: 100.56 -> 10056 cents -> 100 dollars
    assert(out("2024-01-04").getLong(1) == 100L)
    // zero-variance window, x == mean: strict > keeps it quiet
    assert((4 to 10).forall(i => !out(f"2024-01-$i%02d").getBoolean(5)))
    assert(out("2024-01-11").getBoolean(5), "10x jump flags against a flat week")
  }

  test("lastTouchAttribution: channel credit, direct fallback, same-ts tie") {
    val s = spark; import s.implicits._
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      // user 1: view, click, then two purchases -> both credit click
      (1L, ts(1), 1L, "view", 0.0), (1L, ts(2), 2L, "click", 0.0),
      (1L, ts(3), 3L, "purchase", 10.50), (1L, ts(4), 4L, "purchase", 2.25),
      // user 2: purchase with no prior touch -> direct
      (2L, ts(1), 5L, "purchase", 5.00),
      // user 3: view and purchase at the SAME ts; event_id orders the
      // view first so it gets credit
      (3L, ts(5), 6L, "view", 0.0), (3L, ts(5), 7L, "purchase", 1.00),
      // noise type is excluded entirely
      (1L, ts(1), 8L, "error", 99.0)
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = Events.lastTouchAttribution(ev, Seq("view", "click"), "purchase")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(
      "click" -> ((2L, 1275L)), // 10.50 + 2.25 in cents
      "direct" -> ((1L, 500L)),
      "view" -> ((1L, 100L))))
  }

  test("rollingActiveUsers: exact sliding distinct from user-days") {
    val s = spark; import s.implicits._
    val ts = (d: Int, h: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    val ev = Seq(
      (1L, ts(1, 1)), (1L, ts(1, 9)), // same user-day twice: dedups
      (1L, ts(2, 1)), (2L, ts(1, 1))
    ).toDF("user_id", "ts")
    val out = Events.rollingActiveUsers(ev, windowDays = 2)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // day1: u1+u2 active on day1 -> 2; day2: u1(day1,day2)+u2(day1) -> 2
    // day3: only u1's day2 activity still in window -> 1
    assert(out == Map("2024-01-01" -> 2L, "2024-01-02" -> 2L, "2024-01-03" -> 1L))
  }

  test("ohlcBars: open/close ride struct order, same-ts tie by event_id") {
    val s = spark; import s.implicits._
    val t = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      (t(5), 1L, "purchase", 3.00), // opens (earliest ts)
      (t(9), 2L, "purchase", 9.00), // high
      (t(9), 3L, "purchase", 1.00), // low; same ts as id2, larger id -> closes
      (t(7), 4L, "view", 99.0) // wrong type: excluded
    ).toDF("ts", "event_id", "event_type", "value")
      .withColumn("d", to_date(col("ts")))
    val r = Events.ohlcBars(ev).collect().head
    assert(r.getLong(r.fieldIndex("open_c")) == 300L)
    assert(r.getLong(r.fieldIndex("close_c")) == 100L)
    assert(r.getLong(r.fieldIndex("high_c")) == 900L)
    assert(r.getLong(r.fieldIndex("low_c")) == 100L)
    assert(r.getLong(r.fieldIndex("n_trades")) == 3L)
    assert(r.getLong(r.fieldIndex("volume_c")) == 1300L)
  }

  test("timeWeightedAverage: integer second weights, floor division") {
    val s = spark; import s.implicits._
    val ev = Seq(
      (1L, java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z")), 1L, "view", 100.0),
      (1L, java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:10Z")), 2L, "view", 200.0),
      (1L, java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:30Z")), 3L, "view", 0.0),
      (2L, java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z")), 4L, "view", 5.0)
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = Events.timeWeightedAverage(ev)
      .collect().map(r => r.getLong(0) -> r).toMap
    val u1 = out(1L)
    assert(u1.getLong(u1.fieldIndex("n_spans")) == 2L)
    assert(u1.getLong(u1.fieldIndex("total_s")) == 30L)
    // 10000c*10s + 20000c*20s = 500000; 500000/30 floors to 16666
    assert(u1.getLong(u1.fieldIndex("wsum_cs")) == 500000L)
    assert(u1.getLong(u1.fieldIndex("twap_c")) == 16666L)
    assert(!out.contains(2L), "single-event user has no span")
  }

  test("scd2IntervalAudit: overlap, gap, after_open; adjacency is clean") {
    val s = spark; import s.implicits._
    val t = (d: String) => java.sql.Timestamp.valueOf(s"$d 00:00:00")
    val hist = Seq(
      // key 1: clean adjacent chain, then open row LAST -> no defect
      (1L, t("2023-01-01"), Option(t("2023-06-01"))),
      (1L, t("2023-06-01"), Option(t("2024-01-01"))),
      (1L, t("2024-01-01"), None),
      // key 2: overlap (second starts before first ends)
      (2L, t("2023-01-01"), Option(t("2023-09-01"))),
      (2L, t("2023-06-01"), Option(t("2024-01-01"))),
      // key 3: gap
      (3L, t("2023-01-01"), Option(t("2023-03-01"))),
      (3L, t("2023-06-01"), Option(t("2024-01-01"))),
      // key 4: version AFTER an open-ended one
      (4L, t("2023-01-01"), None),
      (4L, t("2023-06-01"), Option(t("2024-01-01")))
    ).toDF("k", "valid_from", "valid_to")
    val out = graft.operators.Quality
      .scd2IntervalAudit(hist, Seq("k"), "valid_from", "valid_to")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out == Map(2L -> "overlap", 3L -> "gap", 4L -> "after_open"))
  }

  test("quarantine: failing rows route with joined reasons, clean rows never appear") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, Option(10.0), "O"), // clean
      (2L, Option(-5.0), "F"), // price fails
      (3L, Option(7.0), "X"), // status fails
      (4L, Option(-1.0), "X"), // both fail -> two reasons joined
      (5L, None: Option[Double], "O"), // NULL cannot prove >= 0 -> fails
      (6L, Option(Double.NaN), "O") // Spark orders NaN ABOVE all numbers:
      // NaN >= 0 is TRUE, so it passes — guard with isnan() if NaN must fail
    ).toDF("k", "price", "status")
    val out = graft.operators.Quality.quarantine(df, Seq(
      "price_ok" -> (col("price") >= 0),
      "status_ok" -> col("status").isin("O", "F", "P")))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out == Map(
      2L -> "price_ok",
      3L -> "status_ok",
      4L -> "price_ok,status_ok",
      5L -> "price_ok"))
  }

  test("randomized response: debiased estimate formula and determinism") {
    val q = SparkEntry.queries("dp_randomized_response")(spark, "/root/testdata/sf0.001")
    val rows = q.collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("a", "b"))
    rows.values.foreach { r =>
      val n = r.getLong(r.fieldIndex("n"))
      val noisy = r.getLong(r.fieldIndex("noisy_yes"))
      val est = r.getLong(r.fieldIndex("est_x2"))
      assert(noisy >= 0 && noisy <= n)
      assert(est == 4 * noisy - n, "debias identity must hold exactly")
    }
    // coins are a pure hash function: a second run is bit-identical
    val again = SparkEntry.queries("dp_randomized_response")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getLong(r.fieldIndex("noisy_yes"))).toMap
    rows.foreach { case (arm, r) =>
      assert(again(arm) == r.getLong(r.fieldIndex("noisy_yes")))
    }
  }

  test("linearAttribution: equal ppm split, direct on cold conversions, floor remainder") {
    val s = spark; import s.implicits._
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      // user 1: view, view, click then purchase -> 2/3 view, 1/3 click
      (1L, ts(1), 1L, "view", 0.0), (1L, ts(2), 2L, "view", 0.0),
      (1L, ts(3), 3L, "click", 0.0), (1L, ts(4), 4L, "purchase", 1.0),
      // user 2: cold purchase as the user's FIRST event (empty frame)
      (2L, ts(1), 5L, "purchase", 1.0),
      // user 3: a purchase then another purchase — preceding rows
      // exist but none are touches: still direct
      (3L, ts(1), 6L, "purchase", 1.0), (3L, ts(2), 7L, "purchase", 1.0)
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = Events.linearAttribution(ev, Seq("view", "click"), "purchase")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 1e6*2 div 3 = 666666 (floor), 1e6*1 div 3 = 333333: the 1 ppm
    // remainder is the documented floor loss
    assert(out == Map(
      "view" -> 666666L,
      "click" -> 333333L,
      "direct" -> 3000000L))
  }

  test("incr_wau_maintain: seed+delta fold is bit-identical to the full recompute") {
    val sf = "/root/testdata/sf0.001"
    val folded = SparkEntry.queries("incr_wau_maintain")(spark, sf)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val full = SparkEntry.queries("events_wau")(spark, sf)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(folded == full, "the incremental fold must reproduce the recompute exactly")
  }

  test("graph_components: both endpoints of every edge share a component") {
    val sf = "/root/testdata/sf0.001"
    val s = spark
    val li = graft.sources.Tables.table(s, sf, "lineitem")
    val pairs = graft.operators.Affinity.pairLift(li, 2)
      .select(col("pk_a"), col("pk_b"))
    val labels = SparkEntry.queries("graph_components")(s, sf)
    val la = labels.select(col("part_id").as("pk_a"), col("component_id").as("ca"))
    val lb = labels.select(col("part_id").as("pk_b"), col("component_id").as("cb"))
    val bad = pairs.join(la, "pk_a").join(lb, "pk_b")
      .where(col("ca") =!= col("cb")).count()
    assert(bad == 0, s"$bad edges straddle components")
  }

  test("ab_cuped: adjusted means satisfy the CUPED identity; theta shared") {
    val rows = SparkEntry.queries("ab_cuped")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("a", "b"))
    val n = rows.values.map(r => r.getLong(r.fieldIndex("n_a"))).sum
    val sx = rows.values.map(r => r.getLong(r.fieldIndex("sx_a"))).sum
    val thetaA = rows("a").getDouble(rows("a").fieldIndex("theta"))
    assert(thetaA == rows("b").getDouble(rows("b").fieldIndex("theta")),
      "theta is a global estimate, identical on both arm rows")
    rows.values.foreach { r =>
      val na = r.getLong(r.fieldIndex("n_a")).toDouble
      val meanRaw = r.getDouble(r.fieldIndex("mean_raw"))
      val meanAdj = r.getDouble(r.fieldIndex("mean_adj"))
      val expect = meanRaw - thetaA *
        (r.getLong(r.fieldIndex("sx_a")) / na - sx.toDouble / n)
      assert(math.abs(meanAdj - expect) < 1e-9,
        s"CUPED identity violated: $meanAdj vs $expect")
    }
  }

  test("compactionPlan: exclusive prefix-sum binning in key order") {
    val s = spark; import s.implicits._
    val files = Seq(("a", 100L), ("b", 200L), ("c", 300L), ("d", 400L))
      .toDF("f", "bytes")
    val out = graft.sources.Layout.compactionPlan(files, Seq("f"), "bytes", 300L)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(
      "a" -> ((0L, 0L)), "b" -> ((100L, 0L)),
      "c" -> ((300L, 1L)), "d" -> ((600L, 2L))))
  }
}
