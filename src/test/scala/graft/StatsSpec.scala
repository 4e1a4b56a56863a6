package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Stats

class StatsSpec extends AnyFunSuite with SparkTest {

  test("groupOls recovers an exact linear law (slope 3, intercept 7, r2 1)") {
    val s = spark; import s.implicits._
    val pts = Seq(
      ("a", 1L, 10L), ("a", 2L, 13L), ("a", 3L, 16L), ("a", 4L, 19L),
      ("b", 5L, 2L), ("b", 5L, 9L), ("b", 5L, 4L) // zero x-variance
    ).toDF("g", "x", "y")
    val out = Stats.groupOls(pts, Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) == 4L)
    assert(a.getDouble(2) == 3.0, "slope exact: small ints cancel exactly")
    assert(a.getDouble(3) == 7.0)
    assert(a.getDouble(4) == 1.0)
    assert(a.getDouble(5) == 1.0)
    val b = out("b")
    assert(b.isNullAt(2) && b.isNullAt(3) && b.isNullAt(4) && b.isNullAt(5),
      "vertical line: fit undefined, emitted as NULLs")
  }

  test("bestSplits: exact stump sweep, perfect separator wins") {
    val s = spark; import s.implicits._
    // v=1: 3 pos; v=2: 2 neg; v=3: 1 pos 1 neg — t=1 separates best
    val df = Seq((1L, true), (1L, true), (1L, true), (2L, false), (2L, false),
      (3L, true), (3L, false)).toDF("v", "y")
    val out = Stats.bestSplits(df, col("v"), col("y"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out.keySet == Set(1L, 2L), "max value has an empty right side: excluded")
    assert(out(1L) == ((3L, 3L, 4L, 1L, 5500000L)),
      "left pure: 1e6*9/3; right (1,3): 1e6*(1+9)/4")
    assert(out(2L) == ((5L, 3L, 2L, 1L, 3600000L)),
      "1e6*13 div 5 + 1e6*2 div 2")
    assert(out.maxBy(_._2._5)._1 == 1L, "the perfect separator scores highest")
  }

  test("bestSplitRank: the separating feature wins; noise feature ranked by its true best") {
    val s = spark; import s.implicits._
    // f1 separates perfectly at 1; f2 is constant (no valid split at all)
    val df = Seq((1L, 9L, true), (1L, 9L, true), (2L, 9L, false), (2L, 9L, false))
      .toDF("f1", "f2", "y")
    val out = Stats.bestSplitRank(df,
        Seq("f1" -> col("f1"), "f2" -> col("f2")), col("y"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(6)))).toMap
    assert(out("f1") == ((1L, 4000000L)), "perfect split: 1e6*4/2 + 1e6*4/2")
    assert(!out.contains("f2"), "single-valued feature has no two-sided split")
  }

  test("theilSen: outlier-immune median slope, exact rational output") {
    val s = spark; import s.implicits._
    // y = 2x with one wild outlier — OLS would chase it, the median won't
    val ser = Seq((0L, 0L), (1L, 2L), (2L, 4L), (3L, 6L), (4L, 100L)).toDF("x", "y")
    val r = Stats.theilSen(ser).collect().head
    assert(r.getLong(0) == 10L, "C(5,2) pairs")
    assert(r.getLong(1) == 4L && r.getLong(2) == 2L,
      "lower median among the slope-2 ties, (dy,dx) tie-break")
    assert(r.getLong(3) == 2000000L)
    // negative slope: the sign split must avoid floor-vs-truncate drift
    val neg = Seq((0L, 0L), (1L, -3L), (2L, -6L)).toDF("x", "y")
    val rn = Stats.theilSen(neg).collect().head
    assert(rn.getLong(3) == -3000000L)
  }

  test("corrMatrix: perfect, inverse, and self-consistent correlations") {
    val s = spark; import s.implicits._
    val df = Seq((1L, 2L, -1L), (2L, 4L, -2L), (3L, 6L, -3L), (5L, 10L, -5L))
      .toDF("a", "b", "c")
    val out = Stats.corrMatrix(df, Seq(
        "a" -> col("a"), "b" -> col("b"), "c" -> col("c")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out.size == 3, "3 unordered pairs from 3 columns")
    assert(out(("a", "b")) == 1.0, "b = 2a is exactly correlated")
    assert(out(("a", "c")) == -1.0, "c = -a is exactly anti-correlated")
    assert(out(("b", "c")) == -1.0)
  }

  test("corrMatrix is one job over one aggregate (no per-pair scans)") {
    val s = spark; import s.implicits._
    val df = Seq((1L, 2L, 3L, 4L)).toDF("a", "b", "c", "d")
    val plan = Stats.corrMatrix(df, Seq(
        "a" -> col("a"), "b" -> col("b"), "c" -> col("c"), "d" -> col("d")))
      .queryExecution.optimizedPlan.toString
    val scans = "LocalRelation|LogicalRDD".r.findAllIn(plan).size
    assert(scans <= 1, s"expected a single input scan, plan:\n$plan")
  }


  test("standardize: hand-computed z and minmax grid; degenerate group -> NULLs") {
    val s = spark; import s.implicits._
    val df = Seq(("a", 1L, 2L), ("a", 2L, 4L), ("a", 3L, 6L),
      ("b", 4L, 5L), ("b", 5L, 5L)).toDF("g", "id", "x")
    val out = Stats.standardize(df, Seq("g"), Seq("id"), col("x"))
      .collect().map(r => r.getLong(1) ->
        ((if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    // group a: n=3, S=12, SS=56 -> den=24
    val d = math.sqrt(24.0)
    assert(out(1L) == ((Some((3.0 * 2.0 - 12.0) / d), Some(0L))))
    assert(out(2L) == ((Some((3.0 * 4.0 - 12.0) / d), Some(500000L))))
    assert(out(3L) == ((Some((3.0 * 6.0 - 12.0) / d), Some(1000000L))))
    assert(out(4L) == ((None, None)), "zero variance and zero range -> NULLs")
    assert(out(5L) == ((None, None)))
  }

  test("groupOls matches its own SQL replay on random-ish integer data") {
    val s = spark; import s.implicits._
    // deterministic pseudo-data: the point is Spark-vs-Spark SQL replay
    // of the identical expression tree (the DuckDB oracle runs the same
    // text in the driver gate)
    val df = (1 to 500).map { i =>
      val x = (i * 7919) % 83
      val y = 11L * x + ((i * 104729) % 13) - 6
      (if (i % 2 == 0) "even" else "odd", x.toLong, y)
    }.toDF("g", "x", "y")
    df.createOrReplaceTempView("stats_spec_t")
    val viaSql = s.sql(Stats.groupOlsSql("stats_spec_t", Seq("g"), "x", "y"))
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val viaOp = Stats.groupOls(df, Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(viaSql == viaOp, "operator and SQL replay must agree bit-for-bit")
    s.catalog.dropTempView("stats_spec_t")
  }

  test("rangePrefixSum matches the single-window prefix across many partitions") {
    val s = spark; import s.implicits._
    // 1000 keys, deliberately unsorted input; values vary so partition
    // offsets actually matter
    val df = (1 to 1000).map(i => ((i * 7919) % 1009, ((i * 104729) % 97 + 1).toLong))
      .toDF("k", "v")
    val got = Stats.rangePrefixSum(df, Seq(col("v").desc, col("k").asc), "v", "cum")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expRows = df.collect().map(r => (r.getInt(0), r.getLong(1)))
      .sortBy { case (k, v) => (-v, k) }
    var run = 0L
    expRows.foreach { case (k, v) =>
      run += v
      assert(got((k, v)) == run, s"prefix diverges at ($k,$v)")
    }
    graft.operators.Caches.release()
  }

  test("rangePrefixFold: exclusive max monoid matches a sequential fold") {
    val s = spark; import s.implicits._
    val df = (1 to 500).map(i => ((i * 7919) % 503, ((i * 104729) % 89).toLong))
      .toDF("k", "v")
    val got = Stats.rangePrefixFold(df, Seq(col("k").asc, col("v").asc), "v",
      "mb", Long.MinValue, math.max, exclusive = true)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    var run = Long.MinValue
    df.collect().map(r => (r.getInt(0), r.getLong(1))).sorted.foreach { case (k, v) =>
      assert(got((k, v)) == run, s"exclusive max diverges at ($k,$v)")
      run = math.max(run, v)
    }
    graft.operators.Caches.release()
  }

  test("rfmScores: quintile thresholds score a known ladder") {
    val s = spark; import s.implicits._
    // 10 customers, strictly increasing recency/frequency/monetary:
    // customer i places i orders on day i of Jan 2024, each $i
    val orders = (1 to 10).flatMap { i =>
      (1 to i).map(j => (i.toLong,
        java.sql.Timestamp.valueOf(f"2024-01-$i%02d 00:00:00"), i * 1.0))
    }.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val out = graft.operators.Segmentation
      .rfmScores(orders, to_timestamp(lit("2024-02-01 00:00:00")))
      .collect().map(r => r.getLong(0) -> r).toMap
    val c10 = out(10L)
    assert(c10.getInt(c10.fieldIndex("r_days")) == 22)
    assert(c10.getLong(c10.fieldIndex("f_orders")) == 10L)
    assert(c10.getLong(c10.fieldIndex("m_cents")) == 10000L)
    // most recent + most frequent + highest spend = 555
    assert(c10.getString(c10.fieldIndex("segment")) == "555")
    // oldest single $1 order = 111
    assert(out(1L).getString(out(1L).fieldIndex("segment")) == "111")
    // scores are monotone along the ladder in every dimension
    val segs = (1 to 10).map(i => out(i.toLong))
    assert(segs.map(r => r.getInt(r.fieldIndex("f_score"))).sliding(2)
      .forall(p => p.head <= p.last), "frequency scores must be monotone")
  }
  test("cusumShift scores the mean-shift point exactly (n*prefix - t*total)") {
    val s = spark; import s.implicits._
    // 10,10,10 then 20,20 — shift after day 3; day 1 split into two rows
    val rows = Seq(
      ("2024-01-01", 4L), ("2024-01-01", 6L), ("2024-01-02", 10L),
      ("2024-01-03", 10L), ("2024-01-04", 20L), ("2024-01-05", 20L)
    ).toDF("d0", "v").withColumn("d0", to_date($"d0"))
    val got = graft.operators.Stats.cusumShift(rows, "d0", $"v").collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // n=5, total=70: S_t = 5*prefix_t - 70*t
    assert(got == Map(
      "2024-01-01" -> -20L, "2024-01-02" -> -40L, "2024-01-03" -> -60L,
      "2024-01-04" -> -30L, "2024-01-05" -> 0L))
    assert(got.minBy(kv => (-math.abs(kv._2), kv._1))._1 == "2024-01-03",
      "argmax |S| is the day BEFORE the level change")
  }

  test("bootstrapMeanCI: constant group degenerates to a point; CI bounded by data range") {
    val s = spark; import s.implicits._
    val rows = (1 to 120).map(i =>
      ("const", 42L, i.toLong)) ++ (1 to 120).map(i =>
      ("mixed", if (i % 3 == 0) 100L else 10L, (1000 + i).toLong))
    val df = rows.toDF("grp", "x", "id")
    val out = graft.operators.Stats.bootstrapMeanCI(
      df, "grp", $"x", "id", reps = 64, salt = "t").collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    val (cLo, cHi, cN) = out("const")
    assert(cLo == 42.0 && cHi == 42.0, "resampling constants is still constant")
    assert(cN == 64L)
    val (mLo, mHi, _) = out("mixed")
    assert(mLo <= mHi && mLo >= 10.0 && mHi <= 100.0,
      "CI must sit inside the data range")
    val trueMean = rows.filter(_._1 == "mixed").map(_._2).sum.toDouble / 120
    assert(mLo < trueMean && trueMean < mHi,
      "95% CI from 120 rows should bracket the true mean")
  }

  test("spearman: monotone nonlinear = 1, reversal = -1, ties use average ranks") {
    val s = spark; import s.implicits._
    // y = x^3 is perfectly monotone (rho 1) but not linear (pearson < 1)
    val mono = Seq(("m", 1L, 1L), ("m", 2L, 8L), ("m", 3L, 27L), ("m", 10L, 1000L),
      ("r", 1L, 9L), ("r", 2L, 7L), ("r", 3L, 5L), ("r", 4L, 1L))
      .toDF("g", "x", "y")
    val out = Stats.spearman(mono, Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("m") == 1.0, "monotone: rank sequences identical")
    assert(out("r") == -1.0, "reversal: rank sequences opposite")
    // tied block: x=(1,2,2,3) y=(10,20,20,40) — tied middle gets avg
    // rank on both sides, still a perfect rank match
    val tied = Seq(("t", 1L, 10L), ("t", 2L, 20L), ("t", 2L, 20L), ("t", 3L, 40L))
      .toDF("g", "x", "y")
    val rho = Stats.spearman(tied, Seq("g"), col("x"), col("y"))
      .collect().head.getDouble(2)
    assert(rho == 1.0, s"average-rank ties preserve the perfect match, got $rho")
    // constant x: zero rank variance -> NULL, not a crash
    val const = Seq(("c", 5L, 1L), ("c", 5L, 2L)).toDF("g", "x", "y")
    assert(Stats.spearman(const, Seq("g"), col("x"), col("y"))
      .collect().head.isNullAt(2))
  }

  test("mannWhitneyU: hand-computed U with and without ties") {
    val s = spark; import s.implicits._
    // complete separation: A = {1,2,3} all below B = {4,5,6} -> U = 0
    val sep = Seq((1L, true), (2L, true), (3L, true),
      (4L, false), (5L, false), (6L, false)).toDF("v", "a")
    val r1 = Stats.mannWhitneyU(sep, col("v"), col("a")).collect().head
    assert(r1.getLong(0) == 3L && r1.getLong(1) == 3L)
    assert(r1.getDouble(2) == 0.0, "no A beats any B: U = 0")
    assert(r1.getDouble(3) < -1.9, "z strongly negative under separation")
    // tie across the groups: A={1,2}, B={2,3} -> R1 = 1 + 2.5, U = 0.5
    val tied = Seq((1L, true), (2L, true), (2L, false), (3L, false)).toDF("v", "a")
    val r2 = Stats.mannWhitneyU(tied, col("v"), col("a")).collect().head
    assert(r2.getDouble(2) == 0.5, s"tied rank averages: U = 0.5, got ${r2.getDouble(2)}")
  }

  test("aucFromScores: separation = 1, tie takes half credit") {
    val s = spark; import s.implicits._
    val perfect = Seq((10L, true), (9L, true), (2L, false), (1L, false))
      .toDF("score", "pos")
    val p = Stats.aucFromScores(perfect, col("score"), col("pos"))
      .collect().head
    assert(p.getLong(0) == 2L && p.getLong(1) == 2L && p.getDouble(2) == 1.0)
    // pos {3,2}, neg {2,1}: pairs (3>2)=1, (3>1)=1, (2=2)=0.5, (2>1)=1
    // -> 3.5/4
    val tied = Seq((3L, true), (2L, true), (2L, false), (1L, false))
      .toDF("score", "pos")
    val t = Stats.aucFromScores(tied, col("score"), col("pos"))
      .collect().head
    assert(t.getDouble(2) == 0.875, s"tie at half credit: got ${t.getDouble(2)}")
  }

  test("welchT: hand-computed t and Satterthwaite df") {
    val s = spark; import s.implicits._
    // A = {1,2,3}: mean 2, var 1; B = {4,6}: mean 5, var 2
    // se2 = 1/3 + 1 = 4/3; t = -3/sqrt(4/3); df = (4/3)^2/(1/18 + 1)
    val df = Seq((1L, true), (2L, true), (3L, true), (4L, false), (6L, false))
      .toDF("v", "a")
    val r = Stats.welchT(df, col("v"), col("a")).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == -3.0, "mean diff exact")
    assert(math.abs(r.getDouble(3) - (-3.0 / math.sqrt(4.0 / 3.0))) < 1e-12)
    assert(math.abs(r.getDouble(4) - (16.0 / 9.0) / (1.0 / 18.0 + 1.0)) < 1e-12)
    // degenerate arm (n=1): NULLs, not NaN
    val degen = Seq((1L, true), (4L, false), (6L, false)).toDF("v", "a")
    val r2 = Stats.welchT(degen, col("v"), col("a")).collect().head
    assert(r2.isNullAt(3) && r2.isNullAt(4))
  }

  test("rollingCorrDaily: proportional series pins r=1, inverted pins -1") {
    val s = spark; import s.implicits._
    val base = java.time.LocalDate.parse("2024-04-01")
    def series(f: Int => Long) = (0 until 12).map(i =>
      (java.sql.Date.valueOf(base.plusDays(i.toLong)), f(i)))
    val a = series(i => (i % 5 + 1).toLong).toDF("d", "x")
    val bUp = series(i => 2L * (i % 5 + 1)).toDF("d", "x")
    val bDn = series(i => 100L - (i % 5 + 1)).toDF("d", "x")
    def run(b: org.apache.spark.sql.DataFrame) =
      Stats.rollingCorrDaily(a, "d", col("x"), b, "d", col("x"), windowDays = 4)
        .collect().map(r => (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(run(bUp).drop(1).forall(_.contains(1.0)),
      "b = 2a: every window from n_w=2 on is exactly +1")
    assert(run(bDn).drop(1).forall(_.contains(-1.0)))
    // first day: single-point window -> zero variance -> NULL
    assert(run(bUp).head.isEmpty)
  }

  test("xcorrDaily: a one-day shift peaks at lag +1") {
    val s = spark; import s.implicits._
    val base = java.time.LocalDate.parse("2024-04-01")
    // A alternates 1,5; B is A delayed by one day: B(t) = A(t-1),
    // so A(t) = B(t+1) -> perfect r at lag +1, inverted at lag 0
    val a = (0 until 20).map(i =>
      (java.sql.Date.valueOf(base.plusDays(i.toLong)),
        if (i % 2 == 0) 1L else 5L)).toDF("d", "x")
    val b = (0 until 20).map(i =>
      (java.sql.Date.valueOf(base.plusDays(i.toLong)),
        if ((i + 1) % 2 == 0) 1L else 5L)).toDF("d", "x")
    val out = Stats.xcorrDaily(a, "d", col("x"), b, "d", col("x"), maxLag = 2)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(out(1) == 1.0, "B lags A by one day: perfect correlation at +1")
    assert(out(0) == -1.0 && out(-1) == 1.0 && out(2) == -1.0)
  }

  test("acf: period-2 alternating series has r(2) = 1 and r(1) = -1") {
    val s = spark; import s.implicits._
    val base = java.time.LocalDate.parse("2024-03-01")
    val days = (0 until 20).map(i =>
      (java.sql.Date.valueOf(base.plusDays(i.toLong)),
        if (i % 2 == 0) 1L else 5L))
    val df = days.toDF("d", "x")
    val out = Stats.acf(df, "d", col("x"), maxLag = 3)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1)._2 == -1.0, "lag 1 flips the phase: exact -1")
    assert(out(2)._2 == 1.0, "lag 2 realigns: exact +1")
    assert(out(1)._1 == 19L && out(2)._1 == 18L, "pair counts shrink by lag")
  }

  test("kaplanMeier: hand-computed product-limit curve; censoring holds subjects at risk") {
    val s = spark; import s.implicits._
    // group A: durations (2,obs)x2, (2,cens), (4,obs), (5,cens)
    //   t=2: n=5, d=2 -> S=0.6;  t=4: n=2, d=1 -> S=0.3
    //   (the censored-at-2 subject counts AT RISK at 2, then leaves)
    // group B: everyone dies at 3: S drops to exactly 0
    val subj = Seq(
      ("A", 2L, 1), ("A", 2L, 1), ("A", 2L, 0), ("A", 4L, 1), ("A", 5L, 0),
      ("B", 3L, 1), ("B", 3L, 1)).toDF("g", "t", "observed")
    val out = Stats.kaplanMeier(subj, "g", "t", "observed")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(("A", 2L))._1 == 5L && out(("A", 2L))._2 == 2L)
    assert(math.abs(out(("A", 2L))._3 - 0.6) < 1e-12)
    assert(out(("A", 4L)) == ((2L, 1L, out(("A", 4L))._3)))
    assert(math.abs(out(("A", 4L))._3 - 0.3) < 1e-12)
    assert(out(("B", 3L)) == ((2L, 2L, 0.0)), "total death lands exactly at 0")
    // dropping the censored rows instead (the naive mistake) would
    // report S(2)=1-2/4=0.5 — censoring must RAISE survival
    assert(out(("A", 2L))._3 > 0.5)
  }

  test("kaplanMeierGreenwood: hand-computed bands, clamps, total-death zero variance") {
    val s = spark; import s.implicits._
    // A: 5 subjects, deaths at t=2 (2 of 5) and t=4 (1 of 3), 2 censored
    //   S(2)=0.6, se=0.6*sqrt(2/(5*3)); S(4)=0.4, se=0.4*sqrt(2/15+1/(3*2))
    // B: everyone dies at t=1 -> S=0 with ZERO variance (no 1/(n-d) pole)
    val df = Seq(("A", 2L, 1), ("A", 2L, 1), ("A", 4L, 1), ("A", 5L, 0), ("A", 6L, 0),
      ("B", 1L, 1), ("B", 1L, 1)).toDF("g", "t", "observed")
    val out = Stats.kaplanMeierGreenwood(df, "g", "t", "observed").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    val (s2, se2, lo2, hi2) = out(("A", 2L))
    assert(math.abs(s2 - 0.6) < 1e-12)
    assert(math.abs(se2 - 0.6 * math.sqrt(2.0 / 15.0)) < 1e-12)
    assert(math.abs(lo2 - (s2 - 1.96 * se2)) < 1e-12)
    assert(hi2 == 1.0, s"upper band must clamp to 1, got $hi2")
    val (s4, se4, lo4, hi4) = out(("A", 4L))
    assert(math.abs(s4 - 0.4) < 1e-9)
    assert(math.abs(se4 - 0.4 * math.sqrt(0.3)) < 1e-9)
    assert(lo4 == 0.0, s"lower band must clamp to 0, got $lo4")
    assert(math.abs(hi4 - (s4 + 1.96 * se4)) < 1e-12)
    assert(out(("B", 1L)) == ((0.0, 0.0, 0.0, 0.0)),
      "total death: survival exactly 0 with zero variance")
  }

  test("poissonBootstrapCi: deterministic per salt, band brackets the mean, skew widens the upper tail") {
    val s = spark; import s.implicits._
    import graft.operators.Stats
    // skewed metric: 190 subjects at 100, 10 whales at 10000
    val df = ((1 to 190).map(i => ("x", i.toLong, 100L)) ++
      (191 to 200).map(i => ("x", i.toLong, 10000L))).toDF("g", "id", "v")
    def run(salt: String) = Stats.poissonBootstrapCi(df, "g", "id", "v", 64, salt)
      .head()
    val r1 = run("s1")
    assert(run("s1") == r1, "a retried release publishes the identical interval")
    assert(run("s2") != r1, "a fresh salt draws fresh replicas")
    val (n, mean, lo, hi) = (r1.getLong(1), r1.getDouble(2), r1.getDouble(3), r1.getDouble(4))
    assert(n == 200L && math.abs(mean - 595.0) < 1e-9)
    assert(lo < mean && mean < hi, s"band [$lo, $hi] must bracket $mean")
    // whales dominate the variance: the band is wide relative to the
    // mean (a normal CI would be ~same width; the point is the bracket
    // holds under resampling of 10 extreme points)
    assert(hi - lo > 100.0, s"skewed metric must produce a wide band, got [$lo, $hi]")
  }

  test("nelsonAalen: hand-computed cumulative hazard; total death has no pole") {
    val s = spark; import s.implicits._
    // A: deaths 2-of-5 at t=2 and 1-of-3 at t=4 -> H(2)=0.4, H(4)=0.4+1/3
    //    Var(2)=2/25, Var(4)=2/25+1/9
    // B: everyone dies at t=1 -> H=1 exactly (d=n is a plain term here)
    val df = Seq(("A", 2L, 1), ("A", 2L, 1), ("A", 4L, 1), ("A", 5L, 0), ("A", 6L, 0),
      ("B", 1L, 1), ("B", 1L, 1)).toDF("g", "t", "observed")
    val out = Stats.nelsonAalen(df, "g", "t", "observed").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getDouble(4), r.getDouble(5)))).toMap
    assert(math.abs(out(("A", 2L))._1 - 0.4) < 1e-12)
    assert(math.abs(out(("A", 2L))._2 - math.sqrt(2.0 / 25.0)) < 1e-12)
    assert(math.abs(out(("A", 4L))._1 - (0.4 + 1.0 / 3.0)) < 1e-12)
    assert(math.abs(out(("A", 4L))._2 - math.sqrt(2.0 / 25.0 + 1.0 / 9.0)) < 1e-12)
    assert(out(("B", 1L)) == ((1.0, math.sqrt(0.5))),
      "total death: H = d/n = 1 with Var = d/n^2 — no special casing needed")
  }

  test("msprtTwoProportion: null stays insignificant under daily peeking; a real lift triggers; p never rises") {
    val s = spark; import s.implicits._
    import java.sql.Date
    def d(i: Int) = Date.valueOf(f"2024-01-${i}%02d")
    // null effect: both arms convert identically, watched for 20 days
    val nul = (1 to 20).flatMap(day => (1 to 50).flatMap(u => Seq(
      ("a", d(day), if (u <= 10) d(day) else null),
      ("b", d(day), if (u <= 10) d(day) else null)))).toDF("arm", "join_d", "conv_d")
    val rn = Stats.msprtTwoProportion(nul, "arm", "join_d", "conv_d").collect()
      .map(r => r.getDate(0) -> ((r.getDouble(6), r.getBoolean(7)))).sortBy(_._1.getTime)
    assert(rn.forall(!_._2._2), "a null experiment peeked daily must never flag")
    assert(rn.map(_._2._1).sliding(2).forall(p => p(1) <= p(0) + 1e-15),
      "the always-valid p-value never rises")
    // real lift: arm b converts at 40% vs a at 10% — flags within the run
    val lift = (1 to 20).flatMap(day => (1 to 50).flatMap(u => Seq(
      ("a", d(day), if (u <= 5) d(day) else null),
      ("b", d(day), if (u <= 20) d(day) else null)))).toDF("arm", "join_d", "conv_d")
    val rl = Stats.msprtTwoProportion(lift, "arm", "join_d", "conv_d").collect()
      .map(r => r.getDate(0) -> r.getBoolean(7)).sortBy(_._1.getTime)
    assert(rl.last._2, "a 30-point lift must reach significance within 20 days")
  }

  test("loud preconditions: msprt arm labels, bootstrap integral metric, logRankTestK critical value") {
    val s = spark; import s.implicits._
    import java.sql.Date
    // any arm labeling other than 'a'/'b' would silently pivot to
    // n_a = n_b = 0 and a permanently insignificant p = 1 — must throw
    val relabeled = Seq(("control", Date.valueOf("2024-01-01"), null: Date),
      ("treatment", Date.valueOf("2024-01-01"), null: Date))
      .toDF("arm", "join_d", "conv_d")
    val e1 = intercept[IllegalArgumentException] {
      Stats.msprtTwoProportion(relabeled, "arm", "join_d", "conv_d")
    }
    assert(e1.getMessage.contains("'a'/'b'"))
    // a double metric would be floor-truncated by the exact-long sums —
    // must throw, pointing at the integer-units contract
    val dollars = Seq(("x", 1L, 9.99), ("x", 2L, 0.01)).toDF("g", "id", "v")
    val e2 = intercept[IllegalArgumentException] {
      Stats.poissonBootstrapCi(dollars, "g", "id", "v")
    }
    assert(e2.getMessage.contains("integral"))
    // dof 9 has no pinned critical value: throws without critValue,
    // runs with one (and uses it for the significance flag)
    val ten = (0L to 9L).flatMap(g => Seq((g, 2L, 1), (g, 5L, 0)))
      .toDF("g", "t", "observed")
    val e3 = intercept[IllegalArgumentException] {
      Stats.logRankTestK(ten, "g", "t", "observed", numGroups = 10)
    }
    assert(e3.getMessage.contains("critValue"))
    val ok = Stats.logRankTestK(ten, "g", "t", "observed", numGroups = 10,
      critValue = Some(16.919)).collect()
    assert(ok.length == 10 && ok.forall(_.getInt(5) == 9))
  }

  test("logRankTestK: exact zero for mirrored cohorts; hand-computed 7.5 for one divergent cohort") {
    val s = spark; import s.implicits._
    // three identical cohorts: O_g == E_g at every time -> chi2 == 0.0
    val same = (0L to 2L).flatMap(g => Seq((g, 2L, 1), (g, 3L, 1), (g, 5L, 0)))
      .toDF("g", "t", "observed")
    val r0 = Stats.logRankTestK(same, "g", "t", "observed", numGroups = 3).collect()
    assert(r0.length == 3)
    assert(r0.forall(_.getDouble(4) == 0.0), "mirrored cohorts must score exactly 0")
    assert(r0.forall(!_.getBoolean(6)))
    // cohorts 0,1 die at t=5; cohort 2 dies at t=1:
    //   E = (20/3, 20/3, 5/3), O = (5, 5, 5) -> chi2 = 7.5 on dof 2
    val div = ((0L to 1L).flatMap(g => (1 to 5).map(_ => (g, 5L, 1))) ++
      (1 to 5).map(_ => (2L, 1L, 1))).toDF("g", "t", "observed")
    val r1 = Stats.logRankTestK(div, "g", "t", "observed", numGroups = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(4), r.getBoolean(6)))).toMap
    assert(math.abs(r1(2L)._2 - 5.0 / 3.0) < 1e-9)
    assert(math.abs(r1(0L)._3 - 7.5) < 1e-9, s"chi2: ${r1(0L)._3}")
    assert(r1(0L)._4, "7.5 on dof 2 must flag at 5%")
  }

  test("diffInDiff: hand-computed effect nets out level and trend; wrong arm labels loud") {
    val s = spark; import s.implicits._
    // a-pre {10,20} -> 15, a-post {20,30} -> 25 (common trend +10)
    // b-pre {100,110} -> 105, b-post {140,150} -> 145 (change +40)
    // did = 40 - 10 = 30; every cell var = 50, se² = 4*(50/2) = 100
    val df = Seq(("a", 0, 10L), ("a", 0, 20L), ("a", 1, 20L), ("a", 1, 30L),
      ("b", 0, 100L), ("b", 0, 110L), ("b", 1, 140L), ("b", 1, 150L))
      .toDF("arm", "post", "cents")
    val r = Stats.diffInDiff(df, "arm", "post", "cents").head()
    assert((0 to 3).forall(i => r.getLong(i) == 2L))
    assert(r.getDouble(4) == 15.0 && r.getDouble(5) == 25.0)
    assert(r.getDouble(6) == 105.0 && r.getDouble(7) == 145.0)
    assert(math.abs(r.getDouble(8) - 30.0) < 1e-12, s"did: ${r.getDouble(8)}")
    assert(math.abs(r.getDouble(9) - 10.0) < 1e-12, s"se: ${r.getDouble(9)}")
    assert(math.abs(r.getDouble(10) - 3.0) < 1e-12 && r.getBoolean(11))
    // a pure common trend with no treatment effect reads did = 0
    val nul = Seq(("a", 0, 10L), ("a", 0, 20L), ("a", 1, 30L), ("a", 1, 40L),
      ("b", 0, 50L), ("b", 0, 60L), ("b", 1, 70L), ("b", 1, 80L))
      .toDF("arm", "post", "cents")
    assert(Stats.diffInDiff(nul, "arm", "post", "cents").head().getDouble(8) == 0.0)
    // any other arm labeling fails loudly (the msprt discipline)
    val bad = Seq(("control", 0, 1L), ("treated", 1, 2L)).toDF("arm", "post", "cents")
    val e = intercept[IllegalArgumentException] {
      Stats.diffInDiff(bad, "arm", "post", "cents")
    }
    assert(e.getMessage.contains("'a'"))
    // a single-arm input passes the subset check but has no control
    // trend to difference against — loud, never a silent NULL row
    val oneArm = Seq(("a", 0, 1L), ("a", 0, 2L), ("a", 1, 3L), ("a", 1, 4L))
      .toDF("arm", "post", "cents")
    val e1 = intercept[IllegalArgumentException] {
      Stats.diffInDiff(oneArm, "arm", "post", "cents")
    }
    assert(e1.getMessage.contains("both present"))
    // a missing (arm, post) cell raises IN-PLAN (exception surfaces
    // wrapped in the Spark job failure — walk the cause chain), and an
    // n = 1 cell (division by zero in the unbiased variance) likewise
    def rootMsg(t: Throwable): String = {
      var c: Throwable = t
      while (c.getCause != null) c = c.getCause
      Option(c.getMessage).getOrElse("")
    }
    val noCell = Seq(("a", 0, 1L), ("a", 0, 2L), ("a", 1, 3L), ("a", 1, 4L),
      ("b", 0, 5L), ("b", 0, 6L)).toDF("arm", "post", "cents") // no b-post
    val e2 = intercept[Throwable] {
      Stats.diffInDiff(noCell, "arm", "post", "cents").collect()
    }
    assert(rootMsg(e2).contains("n_b1") && rootMsg(e2).contains("EMPTY"), rootMsg(e2))
    val thinCell = Seq(("a", 0, 1L), ("a", 0, 2L), ("a", 1, 3L), ("a", 1, 4L),
      ("b", 0, 5L), ("b", 0, 6L), ("b", 1, 7L)).toDF("arm", "post", "cents")
    val e3 = intercept[Throwable] {
      Stats.diffInDiff(thinCell, "arm", "post", "cents").collect()
    }
    assert(rootMsg(e3).contains("n=1"), rootMsg(e3))
  }

  test("conformalCoverage: hand-ranked quantile, exact coverage count, loud on tiny calibration and fractional metrics") {
    val s = spark; import s.implicits._
    // calibration residuals 1..10 (yhat = 0): at alpha = 20%,
    // k = ceil(11 * 0.8) = 9 -> q_hat = 9
    val cal = (1L to 10L).map(v => (v, 0L)).toDF("y", "yhat")
    val test = Seq((3L, 0L), (9L, 0L), (10L, 0L), (12L, 0L)).toDF("y", "yhat")
    val r = Stats.conformalCoverage(cal, test, "y", "yhat", alphaPct = 20).head()
    assert(r.getInt(0) == 20 && r.getLong(1) == 10L && r.getLong(2) == 4L)
    assert(r.getLong(3) == 9L, s"q_hat: ${r.getLong(3)}")
    assert(r.getLong(4) == 2L && r.getLong(5) == 500000L) // 3,9 in; 10,12 out
    assert(r.getLong(6) == 800000L)
    // duplicate residuals rank correctly (value at rank k is unique
    // regardless of tie order): residuals {1,1,1,5}, alpha 50 ->
    // k = ceil(5 * .5) = 3 -> q_hat = 1
    val dup = Seq((1L, 0L), (1L, 0L), (1L, 0L), (5L, 0L)).toDF("y", "yhat")
    assert(Stats.conformalCoverage(dup, test, "y", "yhat", alphaPct = 50)
      .head().getLong(3) == 1L)
    // too-small calibration for the rank: loud
    val tiny = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("y", "yhat")
    val e = intercept[IllegalArgumentException] {
      Stats.conformalCoverage(tiny, test, "y", "yhat", alphaPct = 10)
    }
    assert(e.getMessage.contains("too small"))
    // fractional metrics rejected (the exact-grid contract)
    val dbl = Seq((1.5, 0.0)).toDF("y", "yhat")
    intercept[IllegalArgumentException] {
      Stats.conformalCoverage(dbl, dbl, "y", "yhat")
    }
  }

  test("conformalCoverageByGroup: per-group quantiles, insufficient calibration reads NULL not garbage") {
    val s = spark; import s.implicits._
    // group A residuals 1..10, group B residuals 10x larger, group C
    // has only 3 calibration rows (insufficient at alpha=20: k=4>3)
    val cal = ((1L to 10L).map(v => ("A", v, 0L)) ++
      (1L to 10L).map(v => ("B", v * 10L, 0L)) ++
      Seq(("C", 1L, 0L), ("C", 2L, 0L), ("C", 3L, 0L))).toDF("g", "y", "yhat")
    val test = Seq(("A", 9L, 0L), ("A", 12L, 0L),
      ("B", 90L, 0L), ("B", 120L, 0L), ("C", 1L, 0L)).toDF("g", "y", "yhat")
    val out = Stats.conformalCoverageByGroup(cal, test, "g", "y", "yhat", alphaPct = 20)
      .collect().map(r => r.getString(0) -> r).toMap
    // per-group bands: A's k = ceil(11*.8) = 9 -> q=9; B scales by 10
    assert(out("A").getLong(4) == 9L && out("B").getLong(4) == 90L)
    assert(out("A").getLong(5) == 1L && out("A").getLong(6) == 500000L)
    assert(out("B").getLong(5) == 1L)
    assert(out("A").getBoolean(7) && out("B").getBoolean(7))
    // insufficient group: NULL band, flagged — never a garbage quantile
    assert(out("C").isNullAt(4) && out("C").isNullAt(5) && out("C").isNullAt(6))
    assert(!out("C").getBoolean(7))
  }

  test("restrictedMeanSurvival: hand-computed step areas, horizon clamps, no-event-in-window cohort reads tau") {
    val s = spark; import s.implicits._
    // cohort A: 4 subjects, deaths 2-of-4 at t=2 (S=0.5) and 1-of-2 at
    // t=4 (S=0.25), one censored at 5
    //   tau=6: 2·1 + 0.5·(4−2) + 0.25·(6−4) = 3.5
    //   tau=3: 2·1 + 0.5·(3−2)             = 2.5   (t=4 outside)
    // cohort B: first (only) event at t=9 > tau -> rmst = tau exactly
    val df = Seq(("A", 2L, 1), ("A", 2L, 1), ("A", 4L, 1), ("A", 5L, 0),
      ("B", 9L, 1), ("B", 9L, 0)).toDF("g", "t", "observed")
    def run(tau: Long): Map[String, (Long, Double)] =
      Stats.restrictedMeanSurvival(df, "g", "t", "observed", tau).collect()
        .map(r => r.getString(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    val r6 = run(6L)
    assert(math.abs(r6("A")._2 - 3.5) < 1e-12, s"A@6: ${r6("A")}")
    assert(r6("A")._1 == 2L)
    assert(r6("B")._2 == 6.0 && r6("B")._1 == 0L,
      "a cohort with no event inside the window retains the full horizon")
    val r3 = run(3L)
    assert(math.abs(r3("A")._2 - 2.5) < 1e-12, s"A@3: ${r3("A")}")
    // the horizon column rides along for the oracle's schema
    assert(Stats.restrictedMeanSurvival(df, "g", "t", "observed", 6L)
      .head().getLong(1) == 6L)
    // a FULLY-CENSORED cohort has zero KM rows (the d > 0 filter) but
    // must still read rmst = tau with n_times = 0 — deriving cohorts
    // from the KM table would silently omit it from the output
    val withC = df.union(Seq(("C", 3L, 0), ("C", 7L, 0)).toDF("g", "t", "observed"))
    val rc = Stats.restrictedMeanSurvival(withC, "g", "t", "observed", 6L).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(rc.keySet == Set("A", "B", "C"), s"cohorts: ${rc.keySet}")
    assert(rc("C") == ((0L, 6.0)), "an event-free cohort reads exactly tau")
    assert(math.abs(rc("A")._2 - 3.5) < 1e-12, "existing cohorts unchanged")
  }

  test("coxPhBinary: score-test identity with log-rank, independent bisection root, mirrored null") {
    val s = spark; import s.implicits._
    // no-ties fixture (every event time unique): cohort 1 dies early,
    // cohort 0 late, some censoring — a real positive hazard ratio
    val df = (Seq((1L, 1L, 1), (1L, 2L, 1), (1L, 4L, 1), (1L, 9L, 0),
      (0L, 3L, 1), (0L, 6L, 1), (0L, 8L, 1), (0L, 10L, 0), (0L, 11L, 0)))
      .toDF("g", "t", "observed")
    val r = Stats.coxPhBinary(df, "g", "t", "observed").head()
    val (nT, score0, info0, beta) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    // score-test identity: U(0) == log-rank's observed − expected; and
    // with NO tied event times I(0) == the log-rank variance exactly
    // ((n−d)/(n−1) == 1 when every d == 1)
    val lr = Stats.logRankTest(df, "g", "t", "observed").head()
    assert(nT == lr.getLong(0))
    assert(math.abs(score0 - (lr.getLong(1).toDouble - lr.getDouble(2))) < 1e-12,
      s"U(0)=$score0 must equal O−E=${lr.getLong(1) - lr.getDouble(2)}")
    assert(math.abs(info0 - lr.getDouble(3)) < 1e-12,
      s"I(0)=$info0 must equal the untied log-rank variance ${lr.getDouble(3)}")
    // independent root: bisect U(β) = 0 from a from-scratch risk table
    // (hand-built, no shared code) and compare the Newton solution
    // risk sets by time: events at t ∈ {1,2,3,4,6,8}
    val risk = Seq( // (t, n0, n1, d1)
      (1L, 5L, 4L, 1L), (2L, 5L, 3L, 1L), (3L, 5L, 2L, 0L),
      (4L, 4L, 2L, 1L), (6L, 4L, 1L, 0L), (8L, 3L, 1L, 0L))
    def u(b: Double): Double = risk.map { case (_, n0, n1, d1) =>
      d1.toDouble - n1 * math.exp(b) / (n0 + n1 * math.exp(b))
    }.sum
    var (lo, hi) = (-5.0, 5.0)
    for (_ <- 0 until 60) { val mid = (lo + hi) / 2
      if (u(mid) > 0) lo = mid else hi = mid }
    val ref = (lo + hi) / 2
    assert(math.abs(beta - ref) < 1e-8, s"Newton beta=$beta vs bisection $ref")
    assert(r.getDouble(4) > 1.0, "cohort 1 dying earlier must read HR > 1")
    // mirrored cohorts: beta exactly 0, HR exactly 1, insignificant
    val same = (0L to 1L).flatMap(g => Seq((g, 2L, 1), (g, 5L, 1), (g, 7L, 0)))
      .toDF("g", "t", "observed")
    val r0 = Stats.coxPhBinary(same, "g", "t", "observed").head()
    assert(r0.getDouble(3) == 0.0 && r0.getDouble(4) == 1.0 && !r0.getBoolean(7))
    assert(!r0.getBoolean(8), "regular data never reads separated")
    assert(!r.getBoolean(8))
  }

  test("ucbAllocation: separated arms eliminate, underexplored arm gets the next pull") {
    val s = spark; import s.implicits._
    // A: 100 pulls, 90 wins; B: 100 pulls, 5 wins; C: 2 pulls, 1 win.
    // N = 202: A/B radius = sqrt(2 ln202/100) ~ .326, so B's UCB
    // (.376) sits below A's LCB (.574) -> eliminated; C's tiny n
    // inflates its UCB past everyone -> next pull explores C
    val pulls = ((1 to 100).map(i => (0L, if (i <= 90) 1L else 0L)) ++
      (1 to 100).map(i => (1L, if (i <= 5) 1L else 0L)) ++
      Seq((2L, 1L), (2L, 0L))).toDF("arm", "reward")
    val r = Stats.ucbAllocation(pulls, "arm", "reward")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(0L).getDouble(3) == 0.9 && r(1L).getDouble(3) == 0.05 &&
      r(2L).getDouble(3) == 0.5)
    assert(r.values.forall(x => x.getLong(2) == 202L))
    assert(!r(0L).getBoolean(6) && r(1L).getBoolean(6) && !r(2L).getBoolean(6),
      "only the separated loser retires")
    assert(r(2L).getBoolean(7) && !r(0L).getBoolean(7) && !r(1L).getBoolean(7),
      "optimism sends the next pull to the underexplored arm")
    r.values.foreach { x =>
      assert(x.getDouble(4) > x.getDouble(3) && x.getDouble(3) > x.getDouble(5),
        "ucb > mean > lcb")
    }
  }

  test("coxPhAssumptionCheck: beta matches the fit, mirrored cohorts read zero trend, crossing hazards flag") {
    val s = spark; import s.implicits._
    // beta comes from the identical Newton chain
    val df1 = Seq((1L, 1L, 1), (1L, 2L, 1), (1L, 4L, 1), (1L, 9L, 0),
      (0L, 3L, 1), (0L, 6L, 1), (0L, 8L, 1), (0L, 10L, 0), (0L, 11L, 0))
      .toDF("g", "t", "observed")
    val chk = Stats.coxPhAssumptionCheck(df1, "g", "t", "observed").head()
    val fit = Stats.coxPhBinary(df1, "g", "t", "observed").head()
    assert(chk.getDouble(1) == fit.getDouble(3), "same beta as the fit")
    // mirrored cohorts: every residual is exactly 0 -> corr 0 (via the
    // vy = 0 guard), never a 0/0, no violation
    val same = (0L to 1L).flatMap(g =>
      Seq((g, 2L, 1), (g, 5L, 1), (g, 8L, 1), (g, 9L, 0))).toDF("g", "t", "observed")
    val r0 = Stats.coxPhAssumptionCheck(same, "g", "t", "observed").head()
    assert(r0.getDouble(2) == 0.0 && r0.getDouble(3) == 0.0 && !r0.getBoolean(4))
    // CROSSING hazards — the PH violation the check exists for: the
    // cohort-1 hazard is concentrated early, cohort-0's late, with
    // both cohorts under observation throughout (late censoring keeps
    // risk sets mixed). A single hazard ratio is the wrong model and
    // the residual trend must flag it.
    val cross = ((1 to 12).map(i => (1L, ((i - 1) % 6 + 1).toLong, 1)) ++
      (1 to 12).map(i => (0L, ((i - 1) % 6 + 11).toLong, 1)) ++
      (1 to 6).map(i => (1L, 20L, 0)) ++ (1 to 6).map(i => (0L, 20L, 0)))
      .toDF("g", "t", "observed")
    val rc = Stats.coxPhAssumptionCheck(cross, "g", "t", "observed").head()
    assert(rc.getBoolean(4),
      s"crossing hazards must flag: corr ${rc.getDouble(2)}, z ${rc.getDouble(3)}")
  }

  test("fdrBh: step-up semantics on a hand battery, p_adj <-> rejection, normal tail accurate") {
    val s = spark; import s.implicits._
    // classic step-up case at q = 0.25, m = 4: p = .01, .20, .21, .90.
    // rank-2's own threshold is 2/4*.25 = .125 < .20 (fails), but
    // rank-3 passes (.21 <= 3/4*.25 = .1875? no — .21 > .1875). So
    // k* = 1: only the first rejects. Second battery: .01, .10, .18,
    // .90 — rank 3: .18 <= .1875 passes, so ranks 1..3 ALL reject
    // including rank 2 whose own threshold failed (.10 <= .125 passes
    // anyway; use .13: fails its own .125 but rejected via step-up)
    val b2 = Seq(("m1", 0.01), ("m2", 0.13), ("m3", 0.18), ("m4", 0.90))
      .toDF("metric", "p")
    val r2 = Stats.fdrBh(b2, "metric", "p", qPpm = 250000L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(r2("m1").getBoolean(5) && r2("m2").getBoolean(5) && r2("m3").getBoolean(5),
      "step-up must reject every rank <= k*, including mid ranks over their own bar")
    assert(!r2("m4").getBoolean(5))
    // p_adj <= q exactly characterizes rejection
    r2.values.foreach { r =>
      assert((r.getDouble(4) <= 0.25) == r.getBoolean(5),
        s"p_adj ${r.getDouble(4)} vs rejected ${r.getBoolean(5)}")
    }
    // adjusted p is the bottom-up running min of m*p/rank clamped to 1
    assert(math.abs(r2("m1").getDouble(4) - 0.04) < 1e-12)
    assert(math.abs(r2("m3").getDouble(4) - 0.24) < 1e-12)
    assert(r2("m4").getDouble(4) == 0.90 * 4 / 4)
    // the k*=1 battery: only the smallest p survives
    val b1 = Seq(("m1", 0.01), ("m2", 0.20), ("m3", 0.21), ("m4", 0.90))
      .toDF("metric", "p")
    val r1 = Stats.fdrBh(b1, "metric", "p", qPpm = 250000L)
      .collect().map(r => r.getString(0) -> r.getBoolean(5)).toMap
    assert(r1 == Map("m1" -> true, "m2" -> false, "m3" -> false, "m4" -> false))
    // the A&S normal tail: two-sided p at the canonical z values
    val zs = Seq(0.0, 1.6449, 1.96, 2.5758).toDF("z")
      .select(Stats.twoSidedP(col("z")).as("p")).collect().map(_.getDouble(0))
    assert(math.abs(zs(0) - 1.0) < 1e-6)
    assert(math.abs(zs(1) - 0.10) < 1e-4)
    assert(math.abs(zs(2) - 0.05) < 1e-4)
    assert(math.abs(zs(3) - 0.01) < 1e-4)
  }

  test("cumulativeIncidence: hand-computed increments, the sum identity with KM, censoring handled") {
    val s = spark; import s.implicits._
    // 10 subjects, one group: t=1 two cause-1 deaths (n=10, S(1-)=1,
    // inc = 2/10); t=2 one cause-2 death + one censored (n=8,
    // S(2-)=0.8, inc2 = 0.8/8 = 0.1); t=3 one cause-1 death (n=6,
    // S(3-)=0.8*(7/8)=0.7, inc = 0.7/6); rest censored at t=4
    val df = (Seq((1L, 1L), (1L, 1L), (2L, 2L), (2L, 0L), (3L, 1L)) ++
      Seq.fill(5)((4L, 0L))).map { case (t, c) => ("all", t, c) }
      .toDF("g", "t", "cause")
    val out = Stats.cumulativeIncidence(df, "g", "t", "cause")
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> ((r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out((1L, 1L)) == ((10L, 2L, 0.2)))
    assert(math.abs(out((2L, 2L))._3 - 0.1) < 1e-12)
    val cif1at3 = out((1L, 3L))._3
    assert(math.abs(cif1at3 - (0.2 + 0.7 / 6.0)) < 1e-12, s"cif1@3: $cif1at3")
    assert(out((1L, 3L))._1 == 6L)
    // the accounting identity: at the last event time,
    // sum_k CIF_k == 1 - S (all-cause KM on observed = cause != 0)
    val km = Stats.kaplanMeier(
      df.withColumn("observed", when(col("cause") =!= 0, 1).otherwise(0)),
      "g", "t", "observed").orderBy(col("t").desc).head()
    val sLast = km.getDouble(4)
    val cifSum = cif1at3 + out((2L, 2L))._3
    assert(math.abs(cifSum - (1.0 - sLast)) < 1e-12,
      s"sum CIF $cifSum must equal 1 - S $sLast")
    // naive 1-KM per cause OVERSTATES: treat cause-2 as censoring and
    // cause-1 as the only event — its 1-KM at t=3 exceeds CIF_1(3)
    val naive = Stats.kaplanMeier(
      df.withColumn("observed", when(col("cause") === 1, 1).otherwise(0)),
      "g", "t", "observed").orderBy(col("t").desc).head().getDouble(4)
    assert(1.0 - naive > cif1at3 + 1e-9,
      s"naive 1-KM ${1.0 - naive} must overstate CIF $cif1at3")
  }

  test("coxPhStrat: one stratum reduces to coxPhBinary, stratification nets out a confounding stratum") {
    val s = spark; import s.implicits._
    // single stratum: bit-for-bit the unstratified fit (same collapsed
    // table, same fold order)
    val df1 = Seq((1L, 1L, 1), (1L, 2L, 1), (1L, 4L, 1), (1L, 9L, 0),
      (0L, 3L, 1), (0L, 6L, 1), (0L, 8L, 1), (0L, 10L, 0), (0L, 11L, 0))
      .toDF("g", "t", "observed").withColumn("st", lit(0L))
    val bin = Stats.coxPhBinary(df1, "g", "t", "observed").head()
    val str = Stats.coxPhStrat(df1, "g", "st", "t", "observed").head()
    assert(str.getDouble(4) == bin.getDouble(3), "one-stratum beta == binary beta")
    assert(str.getDouble(2) == bin.getDouble(1) && str.getDouble(3) == bin.getDouble(2),
      "score0/info0 identical")
    // CONFOUNDED design: stratum 1 churns fast, stratum 0 slow, and
    // cohort 1 is overrepresented in the fast stratum — but WITHIN
    // each stratum the two cohorts' curves are identical (events at
    // the same times). The pooled unstratified fit reads a spurious
    // positive beta; the stratified fit must read exactly 0 (every
    // within-stratum term has observed == expected).
    def cohortRows(st: Long, base: Long, n: Int) =
      (0 until n).flatMap(i => Seq((0L, st, base + i % 3, 1), (1L, st, base + i % 3, 1)))
    val within = (cohortRows(1L, 1L, 12) ++ cohortRows(0L, 20L, 12) ++
      // imbalance: extra cohort-1 subjects in the FAST stratum and
      // extra cohort-0 in the slow one, each mirrored pair-wise inside
      // its stratum so within-stratum symmetry still holds
      (0 until 8).flatMap(i => Seq((1L, 1L, 1L + i % 3, 1), (0L, 1L, 1L + i % 3, 1))) ++
      (0 until 8).flatMap(i => Seq((0L, 0L, 20L + i % 3, 1), (1L, 0L, 20L + i % 3, 1))))
      .toDF("g", "st", "t", "observed")
    val strat = Stats.coxPhStrat(within, "g", "st", "t", "observed").head()
    assert(strat.getDouble(4) == 0.0,
      s"mirrored-within-strata design must fit beta = 0, got ${strat.getDouble(4)}")
    assert(!strat.getBoolean(9))
    // a TRULY confounded pooled design (cohort 1 concentrated in the
    // fast stratum, no mirroring) reads spurious beta > 0 unstratified
    // while the stratified fit stays at 0 within mirrored strata —
    // demonstrate with asymmetric counts
    val conf = ((0 until 20).flatMap(i => Seq((1L, 1L, 1L + i % 3, 1))) ++
      (0 until 4).flatMap(i => Seq((0L, 1L, 1L + i % 3, 1))) ++
      (0 until 4).flatMap(i => Seq((1L, 0L, 20L + i % 3, 1))) ++
      (0 until 20).flatMap(i => Seq((0L, 0L, 20L + i % 3, 1))))
      .toDF("g", "st", "t", "observed")
    val pooled = Stats.coxPhBinary(conf, "g", "t", "observed").head().getDouble(3)
    val adj = Stats.coxPhStrat(conf, "g", "st", "t", "observed").head().getDouble(4)
    assert(pooled > 0.5, s"pooled fit must read the confounded signal, got $pooled")
    assert(math.abs(adj) < math.abs(pooled) / 4,
      s"stratified fit must collapse the confounded beta: pooled $pooled vs adjusted $adj")
  }

  test("coxPhMulti: p=1 reduces to coxPhBinary's beta, score vanishes at the fit, order-invariant, guards loud") {
    val s = spark; import s.implicits._
    // the coxPhBinary fixture: the p=1 multi fit must reproduce its
    // beta BIT-FOR-BIT (same collapsed table, same fold order, and the
    // 1x1 elimination is exactly u/i)
    val df1 = Seq((1L, 1L, 1), (1L, 2L, 1), (1L, 4L, 1), (1L, 9L, 0),
      (0L, 3L, 1), (0L, 6L, 1), (0L, 8L, 1), (0L, 10L, 0), (0L, 11L, 0))
      .toDF("g", "t", "observed")
    val bin = Stats.coxPhBinary(df1, "g", "t", "observed").head()
    val mono = Stats.coxPhMulti(df1, Seq("g"), "t", "observed").head()
    assert(mono.getDouble(2) == bin.getDouble(3),
      s"p=1 beta ${mono.getDouble(2)} must equal binary ${bin.getDouble(3)} exactly")
    assert(math.abs(mono.getDouble(4) - bin.getDouble(5)) < 1e-12, "se agrees (sqrt path ulp)")
    // two-covariate fit: x1 drives the hazard, x2 is a shifted cohort
    // label — at the fitted beta the SCORE must vanish (Newton
    // converged on both coordinates), the defining estimator property
    val rnd = new scala.util.Random(31)
    val rows2 = (0 until 120).map { i =>
      val x1 = i % 2L; val x2 = (i % 3 == 0).compareTo(false).toLong
      // cohort x1=1 churns systematically earlier
      val t = 5L + (i % 7) + (1L - x1) * 6L + (rnd.nextInt(3))
      (x1, x2, t, if (i % 5 == 0) 0 else 1)
    }
    val df2 = rows2.toDF("x1", "x2", "t", "observed")
    val fit = Stats.coxPhMulti(df2, Seq("x1", "x2"), "t", "observed")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(fit("x1").getDouble(2) > 0.0, "earlier-churning cohort reads beta1 > 0")
    assert(!fit("x1").getBoolean(7) && !fit("x2").getBoolean(7), "regular data: not separated")
    // score-vanishing check via an independent hand fold over the
    // collapsed risk table (rebuilt from scratch here)
    val b = Array(fit("x1").getDouble(2), fit("x2").getDouble(2))
    val subj = rows2.map { case (x1, x2, t, obs) => (x1 + 2 * x2, t, obs) }
    val times = subj.filter(_._3 == 1).map(_._2).distinct.sorted
    val u = Array(0.0, 0.0)
    times.foreach { t =>
      val atRisk = subj.filter(_._2 >= t)
      val deaths = subj.filter(r => r._2 == t && r._3 == 1)
      val s0 = atRisk.map(r => math.exp(b(0) * (r._1 & 1) + b(1) * ((r._1 >> 1) & 1))).sum
      for (j <- 0 until 2) {
        val s1 = atRisk.map(r => math.exp(b(0) * (r._1 & 1) + b(1) * ((r._1 >> 1) & 1)) *
          ((r._1 >> j) & 1)).sum
        u(j) += deaths.map(r => ((r._1 >> j) & 1).toDouble).sum - deaths.size * s1 / s0
      }
    }
    assert(math.abs(u(0)) < 1e-8 && math.abs(u(1)) < 1e-8,
      s"score at the fit must vanish: U=${u.mkString(",")}")
    // covariate order is irrelevant up to fold-order ulp (swapping
    // covariates re-encodes the patterns, so the per-time fold visits
    // them in a different order)
    val swapped = Stats.coxPhMulti(df2, Seq("x2", "x1"), "t", "observed")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(swapped("x1") - fit("x1").getDouble(2)) < 1e-12 &&
      math.abs(swapped("x2") - fit("x2").getDouble(2)) < 1e-12)
    // guards: non-binary covariate loud; constant covariate (singular
    // information) loud; p bound loud
    val tri = Seq((2L, 0L, 3L, 1), (0L, 1L, 4L, 1)).toDF("x1", "x2", "t", "observed")
    assert(intercept[IllegalArgumentException] {
      Stats.coxPhMulti(tri, Seq("x1", "x2"), "t", "observed")
    }.getMessage.contains("binary"))
    val const = Seq((1L, 0L, 3L, 1), (1L, 1L, 4L, 1), (1L, 0L, 5L, 1))
      .toDF("x1", "x2", "t", "observed")
    assert(intercept[IllegalArgumentException] {
      Stats.coxPhMulti(const, Seq("x1", "x2"), "t", "observed")
    }.getMessage.contains("degenerate"))
    assert(intercept[IllegalArgumentException] {
      Stats.coxPhMulti(df2, (1 to 9).map(_ => "x1"), "t", "observed")
    }.getMessage.contains("1..8"))
  }

  test("coxPhBinary: non-binary covariate loud, perfect separation finite and flagged") {
    val s = spark; import s.implicits._
    // a third group value would inflate pooled deaths dt while adding
    // nothing to n0/n1/d1 — silently biased beta; rejected loudly
    val tri = Seq((0L, 1L, 1), (1L, 2L, 1), (2L, 3L, 1)).toDF("g", "t", "observed")
    val e = intercept[IllegalArgumentException] {
      Stats.coxPhBinary(tri, "g", "t", "observed")
    }
    assert(e.getMessage.contains("binary"))
    // NEAR-PERFECT SEPARATION: one event from a 1-in-101 cohort — the
    // first Newton step is u/i ≈ 1/p ≈ 101, which unguarded sends beta
    // past 100 (and past exp overflow for larger cohorts, NaN-ing every
    // later iteration). The guarded solver must return a FINITE beta at
    // the ±30 clamp, finite artifacts, the separated flag, and never
    // claim significance.
    val sep = (Seq((1L, 1L, 1)) ++ (1 to 100).map(i => (0L, 10L + i, 0)))
      .toDF("g", "t", "observed")
    val rs = Stats.coxPhBinary(sep, "g", "t", "observed").head()
    assert(java.lang.Double.isFinite(rs.getDouble(3)),
      s"separated beta must stay finite: ${rs.getDouble(3)}")
    assert(rs.getDouble(3) == 30.0, "beta parks at the clamp under separation")
    assert(java.lang.Double.isFinite(rs.getDouble(4)), "HR finite under the clamp")
    assert(rs.getBoolean(8), "separation must be flagged")
    assert(!rs.getBoolean(7), "flagged results never claim significance")
  }

  test("logRankTest: zero for mirrored cohorts, significant for a clean split") {
    val s = spark; import s.implicits._
    // mirrored cohorts: every term's observed equals expected -> chi2 0
    val same = (Seq(0L, 1L).flatMap(g => Seq((g, 2L, 1), (g, 3L, 1), (g, 5L, 0))))
      .toDF("g", "t", "observed")
    val r0 = Stats.logRankTest(same, "g", "t", "observed").head()
    assert(r0.getDouble(4) == 0.0, s"mirrored cohorts: chi2 ${r0.getDouble(4)}")
    assert(!r0.getBoolean(5))
    // clean split: cohort 1 all dies at t=1, cohort 0 censored at t=10
    //   one event time: n=10, n1=5, d=5, d1=5 -> exp1 2.5,
    //   var 5*.5*.5*(10-5)/9 = 25/36, chi2 = 6.25/(25/36) = 9.0 exactly
    val split = ((1 to 5).map(_ => (1L, 1L, 1)) ++ (1 to 5).map(_ => (0L, 10L, 0)))
      .toDF("g", "t", "observed")
    val r1 = Stats.logRankTest(split, "g", "t", "observed").head()
    assert(r1.getLong(0) == 1L && r1.getLong(1) == 5L)
    assert(math.abs(r1.getDouble(2) - 2.5) < 1e-12)
    assert(math.abs(r1.getDouble(4) - 9.0) < 1e-9, s"chi2 ${r1.getDouble(4)}")
    assert(r1.getBoolean(5), "a clean split must flag significant")
  }
}
