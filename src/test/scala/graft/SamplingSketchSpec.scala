package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.KmvAgg
import graft.operators.Sampling

class SamplingSketchSpec extends AnyFunSuite with SparkTest {

  private val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  private def keys(n: Int) = {
    val s = spark; import s.implicits._
    (0 until n).map(_.toLong).toDF("id")
  }

  // ------------------------------------------------------------- hash split

  test("thresholds land on the documented 65536-grid hex cuts") {
    assert(Sampling.thresholds(fr) == Seq("train" -> "cccd", "val" -> "e666"))
  }

  test("thresholds clamp a near-1.0 cumulative cut to the 4-char grid max") {
    // 0.999999 * 65536 rounds to 65536 -> "10000" would break the
    // fixed-width lexicographic compare and collapse the train split
    val cuts = Sampling.thresholds(Seq("train" -> 0.999999, "test" -> 0.000001))
    assert(cuts == Seq("train" -> "ffff"))
    assert(Sampling.rateHex(0.999999).contains("ffff"))
  }

  test("hashSplit labels every row with exactly one known split") {
    val out = Sampling.hashSplit(keys(1000), "id", "s1", fr)
    assert(out.filter(!col("split").isin("train", "val", "test")).isEmpty)
    assert(out.count() == 1000)
  }

  test("hashSplit fractions are near the requested ones") {
    val counts = Sampling.hashSplit(keys(2000), "id", "s1", fr)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") - 1600L) < 100,
      s"train=${counts("train")} expected ~1600")
    assert(math.abs(counts.getOrElse("val", 0L) - 200L) < 60)
    assert(math.abs(counts.getOrElse("test", 0L) - 200L) < 60)
  }

  test("temporalSplit labels train/embargo/test with exact microsecond boundaries") {
    val s = spark; import s.implicits._
    val cutoff = java.time.Instant.parse("2024-01-22T00:00:00Z")
    val rows = Seq(
      (1L, "2024-01-19 23:59:59.999999"), // last train microsecond
      (2L, "2024-01-20 00:00:00"),        // first embargo microsecond
      (3L, "2024-01-21 23:59:59.999999"), // last embargo microsecond
      (4L, "2024-01-22 00:00:00"),        // first test microsecond
      (5L, "2024-01-01 00:00:00")
    ).toDF("event_id", "ts").withColumn("ts", to_timestamp($"ts"))
    val got = Sampling.temporalSplit(rows, "ts", cutoff, java.time.Duration.ofDays(2))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == Map(1L -> "train", 2L -> "embargo", 3L -> "embargo",
      4L -> "test", 5L -> "train"))
    // zero embargo collapses the buffer: strict before/after split
    val z = Sampling.temporalSplit(rows, "ts", cutoff, java.time.Duration.ZERO)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(z.values.toSet == Set("train", "test") && z(4L) == "test" && z(3L) == "train")
  }

  test("hashSplit is stable across runs and partitionings") {
    def labels(parts: Int) =
      Sampling.hashSplit(keys(500).repartition(parts), "id", "s1", fr)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(labels(1) == labels(7))
  }

  test("different salts give decorrelated splits of the same keys") {
    val a = Sampling.hashSplit(keys(500), "id", "expA", fr)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.hashSplit(keys(500), "id", "expB", fr)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val moved = (0 until 500).count(i => a(i.toLong) != b(i.toLong))
    assert(moved > 100, s"only $moved keys moved between salts")
  }


  test("weightedTopK: exact-k without replacement, salt-deterministic, weight-monotone inclusion") {
    val s = spark; import s.implicits._
    // weights 1..200: heavier rows should win far more often
    val df = (1 to 200).map(i => (i.toLong, i.toLong)).toDF("id", "w")
    val a = Sampling.weightedTopK(df, "id", "w", "s1", 40).collect()
    // exactly k rows, all distinct (without replacement), ranked 1..k
    assert(a.length == 40 && a.map(_.getLong(0)).distinct.length == 40)
    assert(a.map(_.getInt(3)).sorted.toSeq == (1 to 40))
    // deterministic per salt, different under another salt
    val a2 = Sampling.weightedTopK(df, "id", "w", "s1", 40).collect()
    assert(a.map(_.getLong(0)).toSeq == a2.map(_.getLong(0)).toSeq)
    val b = Sampling.weightedTopK(df, "id", "w", "s2", 40).collect()
    assert(a.map(_.getLong(0)).toSet != b.map(_.getLong(0)).toSet)
    // inclusion is weight-monotone in aggregate: across 30 salts the
    // heaviest quartile appears far more often than the lightest
    // (deterministic given the salt list — no flakiness)
    val counts = scala.collection.mutable.Map[Long, Int]().withDefaultValue(0)
    (0 until 30).foreach { i =>
      Sampling.weightedTopK(df, "id", "w", s"ms$i", 40).collect()
        .foreach(r => counts(r.getLong(0)) += 1)
    }
    val heavy = (151L to 200L).map(counts).sum
    val light = (1L to 50L).map(counts).sum
    assert(heavy > light * 3, s"heavy quartile $heavy vs light $light")
    // non-positive weights never qualify
    val withZero = df.union(Seq((9999L, 0L), (9998L, -5L)).toDF("id", "w"))
    val c = Sampling.weightedTopK(withZero, "id", "w", "s1", 200).collect()
    assert(!c.map(_.getLong(0)).toSet.exists(id => id == 9999L || id == 9998L))
  }

  test("splitLeakageAudit: cluster-safe leaks zero pairs, naive split leaks some") {
    val s = spark; import s.implicits._
    val docs = (1L to 2000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = (1L to 100L).map(i => (i, i + 1000L)).toDF("id_a", "id_b")
    val out = graft.operators.Sampling.splitLeakageAudit(
        docs, pairs, "doc_id", "lk", Seq("train" -> 0.8, "val" -> 0.2))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("cluster_safe") == ((0L, 100L)),
      "both ends of a pair share a component, so zero cross pairs by construction")
    assert(out("hash_by_doc")._1 >= 1L && out("hash_by_doc")._2 == 100L,
      "independent per-doc hashing must strand some pairs across the boundary")
  }

  test("clusterSafeSplit: clusters move as one unit, singletons match hashSplit") {
    val s = spark; import s.implicits._
    val df = (0 until 60).map(_.toLong).toDF("doc_id")
    // clusters {0,1,2} (chained) and {10,11}; everything else unpaired
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("id_a", "id_b")
    val split = Sampling.clusterSafeSplit(df, pairs, "doc_id", "exp1", fr)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(split.size == 60)
    assert(split(0L) == split(1L) && split(1L) == split(2L))
    assert(split(10L) == split(11L))
    val plain = Sampling.hashSplit(df, "doc_id", "exp1", fr)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val singletons = (0L until 60L).filterNot(Set(0L, 1L, 2L, 10L, 11L))
    assert(singletons.forall(k => split(k) == plain(k)))
    // the cluster's assignment is its min-id's hashSplit draw
    assert(split(1L) == plain(0L) && split(11L) == plain(10L))
  }

  test("classBalance: every class downsampled to the minority count, survivor set partition-invariant") {
    val s = spark; import s.implicits._
    val df = ((1L to 100L).map(i => (i, "big")) ++
      (101L to 110L).map(i => (i, "mid")) ++
      (111L to 113L).map(i => (i, "rare"))).toDF("id", "cls")
    val out = Sampling.classBalance(df, "id", "cls", "bal")
    val perClass = out.groupBy("cls").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perClass == Map("big" -> 3L, "mid" -> 3L, "rare" -> 3L),
      s"every class must land on the minority count: $perClass")
    // the rare class survives whole (its own rank fills the quota)
    assert(out.where(col("cls") === "rare").count() == 3L)
    // determinism: the survivor set is a pure function of salt+corpus,
    // not of partitioning
    val ids = out.select("id").collect().map(_.getLong(0)).toSet
    val reshuffled = Sampling.classBalance(df.repartition(13), "id", "cls", "bal")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids == reshuffled)
    // a different salt draws a different (same-sized) survivor set
    val other = Sampling.classBalance(df, "id", "cls", "bal2")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(other.size == ids.size && other != ids)
  }

  test("weightedKeep keeps w>=wMax always, drops w<=0, and tracks w/wMax in between") {
    val s = spark; import s.implicits._
    val df = (0 until 2000).map(i => (i.toLong, (i % 5) match {
      case 0 => 0L      // always dropped
      case 1 => 1000L   // >= wMax: always kept
      case _ => 300L    // p = 0.5
    })).toDF("id", "w")
    val kept = Sampling.weightedKeep(df, "id", "w", "wk", 600L)
      .groupBy("w").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!kept.contains(0L))
    assert(kept(1000L) == 400L)
    assert(math.abs(kept(300L) - 600L) < 80, s"p=0.5 of 1200 rows, got ${kept(300L)}")
  }

  test("weightedKeep nests: raising a weight only ever adds rows (same salt)") {
    val s = spark; import s.implicits._
    def keptIds(w: Long): Set[Long] = {
      val df = (0 until 500).map(i => (i.toLong, w)).toDF("id", "w")
      Sampling.weightedKeep(df, "id", "w", "wk", 600L)
        .collect().map(_.getLong(0)).toSet
    }
    val lo = keptIds(150L)
    val hi = keptIds(450L)
    assert(lo.subsetOf(hi), "the grid threshold is monotone in the weight")
    assert(hi.size > lo.size)
  }

  test("hllRegisters: bounded rows, valid ranges, duplicate-insensitive") {
    val s = spark; import s.implicits._
    val df = (0 until 5000).map(i => ("g", i.toLong % 1000)).toDF("grp", "k")
    val regs = graft.operators.Sketches.hllRegisters(df, "grp", "k", 64)
      .collect().map(r => (r.getLong(1), r.getInt(2)))
    assert(regs.length <= 64)
    assert(regs.forall { case (reg, rho) => reg >= 0 && reg < 64 && rho >= 1 && rho <= 27 })
    // 5x-duplicated keys give the SAME sketch as the distinct keys
    val uniq = graft.operators.Sketches.hllRegisters(
      (0 until 1000).map(i => ("g", i.toLong)).toDF("grp", "k"), "grp", "k", 64)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSet
    assert(regs.toSet == uniq)
  }

  test("hllRegisters: union-merge by elementwise max equals rebuild; estimate in band") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    val a = (0 until 3000).map(i => ("g", i.toLong)).toDF("grp", "k")
    val b = (2000 until 6000).map(i => ("g", i.toLong)).toDF("grp", "k") // overlap 2000-2999
    val merged = graft.operators.Sketches.hllRegisters(a, "grp", "k")
      .unionAll(graft.operators.Sketches.hllRegisters(b, "grp", "k"))
      .groupBy("grp", "reg").agg(max("max_rho").as("max_rho"))
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSet
    val rebuilt = graft.operators.Sketches.hllRegisters(a.unionAll(b), "grp", "k")
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSet
    assert(merged == rebuilt)
    // driver-side harmonic-mean estimate on the union (6000 true
    // distinct): alpha_64 * m^2 / sum(2^-rho), empty registers rho=0
    val byReg = rebuilt.toMap
    val m = 64
    val z = (0 until m).map(r => math.pow(2.0, -byReg.getOrElse(r.toLong, 0).toDouble)).sum
    val est = 0.709 * m * m / z
    assert(est > 6000 * 0.6 && est < 6000 * 1.4, s"estimate $est vs 6000")
  }

  test("hllRollingDistinct: window state equals a sketch rebuilt on the trailing slice") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    // 10 days, churn: day d sees keys [100*d, 100*d + 300)
    val ev = (0 until 10).flatMap { day =>
      (0 until 300).map(i => (f"2024-02-${day + 1}%02d", (100 * day + i).toLong))
    }.toDF("ds", "k").withColumn("d", to_date($"ds"))
    val out = graft.operators.Sketches
      .hllRollingDistinct(ev, $"d", "k", m = 64, windowDays = 3)
      .collect().map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.size == 10)
    // day 8 (index 7): window = days 6..8 -> keys [500, 1000): rebuild
    // the sketch directly on that slice; S must match bit-for-bit
    val slice = ev.where($"d" >= to_date(lit("2024-02-06")) && $"d" <= to_date(lit("2024-02-08")))
    val regs = graft.operators.Sketches.hllRegisters(
        slice.withColumn("g", lit("g")), "g", "k", 64)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    val sWant = (0 until 64).map(r => 1L << (27 - regs.getOrElse(r.toLong, 0))).sum
    assert(out("2024-02-08")._2 == sWant, "rolling merge == rebuild on the slice")
    assert(out("2024-02-08")._1 == regs.size.toLong)
    // estimates within the m=64 error band of the true windowed counts
    val est8 = out("2024-02-08")._3
    assert(est8 > 500 * 0.6 && est8 < 500 * 1.4, s"estimate $est8 vs 500")
  }

  test("heavy hitters: exact counts when capacity exceeds the distinct count") {
    val s = spark; import s.implicits._
    val words = (0 until 300).map(i => s"w${i % 7}") // 7 distinct terms
    val hh = udaf(new graft.functions.HeavyHittersAgg(64),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[String]())
    val out = words.toDF("w").repartition(8) // force partial merges
      .agg(hh(col("w")).as("hist"))
      .select(explode(col("hist"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(out == exact)
  }

  test("heavy hitters: MG bound holds under eviction and heavy term survives") {
    val agg = new graft.functions.HeavyHittersAgg(4)
    // 600 of 'hot' + 40 distinct noise terms x 10 = n = 1000
    val stream = new scala.util.Random(42).shuffle(
      (Seq.fill(600)("hot") ++ (0 until 40).flatMap(i => Seq.fill(10)(s"n$i")))
        .toList)
    val summary = stream.foldLeft(agg.zero)(agg.reduce)
    assert(summary.size <= 4)
    // true 600 > n/(cap+1) = 200 -> guaranteed tracked, count within bound
    assert(summary.contains("hot"))
    assert(summary("hot") <= 600L && summary("hot") >= 600L - 200L)
    assert(summary.values.forall(_ > 0))
  }

  test("heavy hitters: merging summaries preserves the bound") {
    val agg = new graft.functions.HeavyHittersAgg(4)
    val a = (Seq.fill(300)("hot") ++ (0 until 20).flatMap(i => Seq.fill(10)(s"a$i")))
      .foldLeft(agg.zero)(agg.reduce)
    val b = (Seq.fill(300)("hot") ++ (0 until 20).flatMap(i => Seq.fill(10)(s"b$i")))
      .foldLeft(agg.zero)(agg.reduce)
    val m = agg.merge(a, b)
    assert(m.size <= 4)
    // n = 1000 total, true(hot) = 600 > n/5 -> survives the merge cut
    assert(m.contains("hot"))
    assert(m("hot") <= 600L && m("hot") >= 600L - 200L)
  }

  test("packByBudget: bounded overflow, deterministic bins, per-group sequences") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("a", 1L, 3000L), ("a", 2L, 3000L), ("a", 3L, 3000L), ("a", 4L, 500L),
      ("b", 1L, 9000L), ("b", 2L, 100L)).toDF("src", "id", "w")
    val out = Sampling.packByBudget(df, "src", "id", "w", budget = 5000L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(3)).toMap
    // prefix sums (a): 0, 3000, 6000, 9000 -> bins 0, 0, 1, 1
    assert(out == Map(
      ("a", 1L) -> 0, ("a", 2L) -> 0, ("a", 3L) -> 1, ("a", 4L) -> 1,
      ("b", 1L) -> 0, ("b", 2L) -> 1))
    // invariance under partitioning
    val out8 = Sampling.packByBudget(df.repartition(8), "src", "id", "w", 5000L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(3)).toMap
    assert(out8 == out)
    // bin loads never exceed budget + one row's weight
    val loads = Sampling.packByBudget(df, "src", "id", "w", 5000L)
      .groupBy("src", "bin").agg(sum("w").as("load")).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    val maxW = Map("a" -> 3000L, "b" -> 9000L)
    loads.foreach { case (src, load) =>
      assert(load <= 5000L + maxW(src), s"overflow beyond one row at $src: $load")
    }
  }

  test("hashSplit rejects fractions that do not sum to 1") {
    intercept[IllegalArgumentException] {
      Sampling.thresholds(Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("null keys land deterministically: last split kept, stratified row dropped") {
    val s = spark; import s.implicits._
    val df = Seq(Some(1L), None).toDF("id")
    val splits = Sampling.hashSplit(df, "id", "s1", fr)
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getString(1)).toMap
    assert(splits(-1L) == "test") // null hash -> when-chain falls to last split
    val kept = Sampling.stratifiedKeep(df.withColumn("src", lit("x")),
      "id", "src", "s1", Seq.empty, defaultRate = 0.999)
      .collect().map(r => r.isNullAt(0))
    assert(!kept.contains(true)) // null hash -> filter drops in both engines
  }

  // ------------------------------------------------------------- stratified

  test("stratifiedKeep applies per-stratum rates, rate>=1 keeps everything") {
    val s = spark; import s.implicits._
    val df = (0 until 900).map(i => (i.toLong, s"src${i % 3}")).toDF("id", "src")
    val kept = Sampling.stratifiedKeep(df, "id", "src", "m1",
      Seq("src0" -> 1.0, "src1" -> 0.1), defaultRate = 0.5)
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("src0") == 300L) // rate 1.0: every row
    assert(kept("src1") < 90L, s"src1=${kept("src1")} expected ~30")
    assert(math.abs(kept("src2") - 150L) < 50, s"src2=${kept("src2")} expected ~150")
  }

  test("stratifiedKeep rate changes nest under one salt (lower rate => subset)") {
    val s = spark; import s.implicits._
    val df = (0 until 500).map(i => (i.toLong, "x")).toDF("id", "src")
    def ids(rate: Double) =
      Sampling.stratifiedKeep(df, "id", "src", "m1", Seq("x" -> rate), 0.0)
        .collect().map(_.getLong(0)).toSet
    val wide = ids(0.6)
    val narrow = ids(0.2)
    assert(narrow.subsetOf(wide), "lowering the rate must keep a subset")
    assert(narrow.nonEmpty && wide.size > narrow.size)
  }

  // ----------------------------------------------------- temperature mix

  test("isqrt is exact on squares, near-squares and past-2^52 longs") {
    val s = spark; import s.implicits._
    val ns = Seq(0L, 1L, 2L, 3L, 4L, 15L, 16L, 17L, 999999L, 1000000L,
      (1L << 52) - 1, 1L << 52, (1L << 52) + 1,
      3037000499L * 3037000499L, // largest long square
      3037000499L * 3037000499L - 1, Long.MaxValue)
    val got = ns.toDF("n").select(col("n"), Sampling.isqrt(col("n")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    got.foreach { case (n, sq) =>
      assert(sq * sq <= n, s"isqrt($n)=$sq overshoots")
      // (s+1)^2 may overflow for the top of the range; compare via division
      assert(sq + 1 > n / (sq + 1), s"isqrt($n)=$sq undershoots")
    }
  }

  test("temperatureAllocation: alpha=1 proportional, alpha=0 uniform, sum==budget") {
    val s = spark; import s.implicits._
    val df = ((0 until 800).map(i => (i.toLong, "web")) ++
      (800 until 950).map(i => (i.toLong, "books")) ++
      (950 until 1000).map(i => (i.toLong, "code"))).toDF("id", "src")
    def alloc(alpha: Double, budget: Long) =
      Sampling.temperatureAllocation(df, "src", budget, alpha)
        .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val prop = alloc(1.0, 100)
    assert(prop.values.sum == 100L)
    assert(prop == Map("web" -> 80L, "books" -> 15L, "code" -> 5L))
    val unif = alloc(0.0, 99)
    assert(unif.values.sum == 99L)
    assert(unif.values.forall(v => v == 33L))
  }

  test("temperatureAllocation alpha=0.5 sits between uniform and proportional") {
    val s = spark; import s.implicits._
    val df = ((0 until 900).map(i => (i.toLong, "head")) ++
      (900 until 1000).map(i => (i.toLong, "tail"))).toDF("id", "src")
    val sq = Sampling.temperatureAllocation(df, "src", 100, 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(sq.values.sum == 100L)
    // proportional would give tail 10; uniform 50; sqrt lands between
    // (w = isqrt(900)=30 vs isqrt(100)=10 -> 75/25)
    assert(sq("tail") == 25L && sq("head") == 75L)
  }

  test("temperatureAllocation caps at group size and reports the shortfall") {
    val s = spark; import s.implicits._
    val df = ((0 until 4).map(i => (i.toLong, "tiny")) ++
      (4 until 1000).map(i => (i.toLong, "big"))).toDF("id", "src")
    val rows = Sampling.temperatureAllocation(df, "src", 500, 0.0)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    // uniform wants 250 each; tiny only has 4 rows
    assert(rows("tiny") == ((4L, 4L)))
    assert(rows("big")._2 == 250L) // cap is visible, not silently rebalanced
  }

  test("temperatureSample realizes the allocation exactly and deterministically") {
    val s = spark; import s.implicits._
    val df = ((0 until 800).map(i => (i.toLong, "web")) ++
      (800 until 950).map(i => (i.toLong, "books")) ++
      (950 until 1000).map(i => (i.toLong, "code"))).toDF("id", "src")
    val alloc = Sampling.temperatureAllocation(df, "src", 100, 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    def sample(parts: Int) =
      Sampling.temperatureSample(df.repartition(parts), "id", "src", "t1", 100, 0.5)
        .select("id", "src")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val a = sample(1)
    assert(a == sample(13)) // partitioning-independent
    val perGroup = a.groupBy(_._2).map { case (g, rows) => g -> rows.size.toLong }
    assert(perGroup == alloc.filter(_._2 > 0))
    // a larger budget only adds rows per group, never re-rolls
    val bigger = Sampling.temperatureSample(df, "id", "src", "t1", 200, 0.5)
      .select("id", "src")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a.subsetOf(bigger))
  }

  test("capPerGroup keeps at most cap rows per group, all of smaller groups") {
    val s = spark; import s.implicits._
    val df = ((0 until 100).map(i => (i.toLong, "big")) ++
      (100 until 103).map(i => (i.toLong, "small"))).toDF("id", "g")
    val kept = Sampling.capPerGroup(df, "id", "g", "c1", 10)
      .groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept == Map("big" -> 10L, "small" -> 3L))
  }

  test("capPerGroup retained set is stable and grows monotonically") {
    val s = spark; import s.implicits._
    def ids(df: org.apache.spark.sql.DataFrame, parts: Int) =
      Sampling.capPerGroup(df.repartition(parts), "id", "g", "c1", 10)
        .collect().map(_.getLong(0)).toSet
    val old = (0 until 50).map(i => (i.toLong, "g")).toDF("id", "g")
    val grown = (0 until 100).map(i => (i.toLong, "g")).toDF("id", "g")
    assert(ids(old, 1) == ids(old, 7)) // partitioning-independent
    val keptOld = ids(old, 1)
    val keptGrown = ids(grown, 1)
    // an old row kept after growth must have been kept before growth —
    // newcomers can displace, never resurrect
    assert((keptGrown & (0L until 50L).toSet).subsetOf(keptOld))
  }

  // ------------------------------------------------------------- KMV sketch

  test("KmvAgg buffer is a sorted distinct set capped at k") {
    val agg = new KmvAgg(4)
    val buf = Seq(9L, 3L, 7L, 3L, 1L, 8L, 2L, 2L).foldLeft(agg.zero)(agg.reduce)
    assert(buf == List(1L, 2L, 3L, 7L))
    val merged = agg.merge(buf, List(0L, 7L, 100L))
    assert(merged == List(0L, 1L, 2L, 3L))
  }

  test("KMV estimate is exact below capacity") {
    assert(KmvAgg.estimate(8, List(5L, 10L, 900L)) == 3L)
    assert(KmvAgg.estimate(8, Nil) == 0L)
  }

  test("KMV estimate at capacity is the floor-division order-statistic formula") {
    // k=4, h_k = 2^30: est = 3 * 2^32 / 2^30 = 12
    assert(KmvAgg.estimate(4, List(1L, 2L, 3L, 1073741824L)) == 12L)
  }

  test("KMV estimates distinct counts within the sketch error band") {
    val s = spark; import s.implicits._
    val k = 64
    val n = 1000
    val rows = (0 until 5000).map(i => s"user-${i % n}").toDF("u")
    val h32 = graft.functions.mixed_hash32(col("u"))
    val kmv = udaf(new KmvAgg(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Long]())
    val buf = rows.repartition(8).select(h32.as("h"))
      .agg(kmv(col("h")).as("mins"))
      .collect().head.getSeq[Long](0).toList
    assert(buf.size == k)
    val est = KmvAgg.estimate(k, buf)
    // relative error concentrates near 1/sqrt(k-2) ~ 13%; allow 3 sigma
    assert(est > n * 0.6 && est < n * 1.4, s"estimate $est for true $n")
  }

  test("KMV sketch is insensitive to duplication and partitioning") {
    val s = spark; import s.implicits._
    val kmv = udaf(new KmvAgg(16),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Long]())
    def sketch(dup: Int, parts: Int): List[Long] = {
      val rows = (0 until 100).flatMap(i => Seq.fill(dup)(s"k$i")).toDF("u")
      rows.repartition(parts)
        .select(graft.functions.mixed_hash32(col("u")).as("h"))
        .agg(kmv(col("h")).as("mins"))
        .collect().head.getSeq[Long](0).toList
    }
    assert(sketch(1, 1) == sketch(3, 11))
  }

  test("CountMin: never undercounts, exact when collision-free, partition-invariant") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    val rows = (Seq.fill(40)("a") ++ Seq.fill(15)("b") ++ Seq.fill(3)("c") ++
      Seq("d", "e", "f", "g", "h")).map(Tuple1(_))
    val trueCounts = rows.groupBy(_._1).map { case (k, g) => k -> g.size.toLong }
    def estimates(depth: Int, width: Int, parts: Int): Map[String, Long] = {
      val cm = udaf(new graft.functions.CountMinAgg(depth, width),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]())
      val df = rows.toDF("k").repartition(parts)
      val sk = df.select(
        graft.functions.CountMinAgg.positions(col("k"), depth, width).as("p"))
        .agg(cm(col("p")).as("sk"))
      df.distinct().crossJoin(sk)
        .select(col("k"),
          graft.functions.CountMinAgg.estimate(col("sk"), col("k"), depth, width))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    // tight width forces collisions: estimates may inflate, never deflate
    val tight = estimates(2, 4, 1)
    trueCounts.foreach { case (k, n) =>
      assert(tight(k) >= n, s"undercount for $k: ${tight(k)} < $n")
    }
    // generous width: exact, and identical under any partitioning
    val wide = estimates(3, 1024, 1)
    assert(wide == trueCounts)
    assert(estimates(3, 1024, 7) == wide)
  }

  test("cmJoinSizeEstimate: never undercounts, exact when collision-free") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Sketches
    // skewed fact side: key 1 x5, key 2 x3, key 3 x1, key 9 unmatched
    val a = Seq(1L, 2L, 3L).map(Tuple1(_)).toDF("k")
    val b = (Seq.fill(5)(1L) ++ Seq.fill(3)(2L) ++ Seq(3L, 9L)).map(Tuple1(_)).toDF("k")
    def run(width: Int) = Sketches.cmJoinSizeEstimate(
      a, col("k"), b, col("k"), depth = 3, width = width)
      .head() match { case r => (r.getLong(0), r.getLong(1)) }
    // generous width: collision-free, estimate == exact inner product
    val (estWide, truth) = run(1024)
    assert(truth == 9L) // 1*5 + 1*3 + 1*1
    assert(estWide == truth)
    // width 2 forces collisions: estimate inflates, never deflates
    val (estTight, _) = run(2)
    assert(estTight >= truth)
    // disjoint key sets: truth 0, estimate still >= 0 and defined
    val (estD, truthD) = {
      val r = Sketches.cmJoinSizeEstimate(
        a, col("k"), Seq(Tuple1(77L)).toDF("k"), col("k"), 3, 1024).head()
      (r.getLong(0), r.getLong(1))
    }
    assert(truthD == 0L && estD >= 0L)
  }

  test("hllMergeRegisters: hierarchy rollup equals direct coarse-grain build") {
    val s = spark; import s.implicits._
    // fine groups g0..g3 map to coarse G0 (g0,g1) and G1 (g2,g3);
    // keys overlap across fine groups so the max actually merges
    val df = (0 until 4000)
      .map(i => (s"g${i % 4}", (i % 1500).toLong)).toDF("fine", "k")
    val mapping = Seq(("g0", "G0"), ("g1", "G0"), ("g2", "G1"), ("g3", "G1"))
      .toDF("fine", "coarse")
    val rolled = graft.operators.Sketches.hllMergeRegisters(
      graft.operators.Sketches.hllRegisters(df, "fine", "k", 64),
      mapping, "fine", "coarse")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val direct = graft.operators.Sketches.hllRegisters(
      df.join(mapping, "fine").select("coarse", "k"), "coarse", "k", 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(rolled == direct)
  }

  test("lengthBucketStats: hand-computed pow2 buckets and waste ppm") {
    val s = spark; import s.implicits._
    val d = Seq(("g", 1), ("g", 2), ("g", 3), ("g", 4), ("g", 5), ("g", 8),
      ("g", 9), ("g", 0)) // len-0 row dropped
      .toDF("src", "len")
    val out = Sampling.lengthBucketStats(d, "src", "len", maxBits = 8)
      .collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out == Map(
      1L -> ((1L, 1L, 0L, 0L)),
      2L -> ((1L, 2L, 0L, 0L)),
      4L -> ((2L, 7L, 1L, 125000L)),   // 3+4 pad 1 of 8
      8L -> ((2L, 13L, 3L, 187500L)),  // 5+8 pad 3 of 16
      16L -> ((1L, 9L, 7L, 437500L)))) // 9 pad 7 of 16
  }

  test("interleaveOrder: equal-size sources round-robin; key injective; partition-invariant") {
    val s = spark; import s.implicits._
    val docs = (for { src <- Seq("a", "b", "c"); i <- 0 until 4 }
      yield (s"$src$i", src)).toDF("id", "src")
    val out = Sampling.interleaveOrder(docs, "src", "id")
      .orderBy("order_key").collect()
      .map(r => (r.getAs[String]("src"), r.getAs[Long]("order_key")))
    // keys are injective and, with equal sizes, sources cycle a,b,c,...
    assert(out.map(_._2).distinct.length == 12)
    assert(out.map(_._1).toSeq == Seq.fill(4)(Seq("a", "b", "c")).flatten)
    val reparted = Sampling.interleaveOrder(docs.repartition(5), "src", "id")
      .orderBy("order_key").collect().map(_.getAs[String]("id")).toSeq
    val base = Sampling.interleaveOrder(docs, "src", "id")
      .orderBy("order_key").collect().map(_.getAs[String]("id")).toSeq
    assert(reparted == base)
    // a different salt produces a different within-source order
    val other = Sampling.interleaveOrder(docs, "src", "id", salt = "epoch2")
      .orderBy("order_key").collect().map(_.getAs[String]("id")).toSeq
    assert(other != base && other.sorted == base.sorted)
  }

  test("negativeSample: k cross-group picks per anchor, anchor-independent draws") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (0L, "s0"), (1L, "s0"), (2L, "s0"),
      (3L, "s1"), (4L, "s1"), (5L, "s1"),
      (6L, "s2")).toDF("doc_id", "source")
    val anchors = docs.filter(col("doc_id").isin(0L, 3L))
    val out = Sampling.negativeSample(docs, anchors, k = 2, salt = "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byAnchor = out.groupBy(_._1)
    // exactly k rows per anchor, ranks 1..k, negatives never share the
    // anchor's group
    assert(byAnchor.keySet == Set(0L, 3L))
    byAnchor.foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == Seq(1, 2))
    }
    assert(byAnchor(0L).map(_._2).forall(n => n >= 3L))
    assert(byAnchor(3L).map(_._2).forall(n => n <= 2L || n == 6L))
    // k above the pool size: every eligible candidate, no more
    val all = Sampling.negativeSample(docs, anchors, k = 10, salt = "t")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(all.count(_._1 == 0L) == 4) // 3,4,5,6
    assert(all.count(_._1 == 3L) == 4) // 0,1,2,6
    // partitioning cannot change a single pick
    val rep = Sampling.negativeSample(
      docs.repartition(5), anchors, k = 2, salt = "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(rep == out.toSet)
  }

  test("kmvSetEstimates: exact below k, sane and deterministic above") {
    val s = spark; import s.implicits._
    // below k: sketches hold the whole sets -> every estimate exact
    val a = (1L to 10L).toDF("user_id")
    val b = (6L to 15L).toDF("user_id")
    val r = graft.operators.Sketches.kmvSetEstimates(a, b, "user_id", k = 32).head()
    graft.operators.Caches.release()
    assert(r.getAs[Long]("est_a") == 10L && r.getAs[Long]("est_b") == 10L)
    assert(r.getAs[Long]("est_union") == 15L)
    assert(r.getAs[Long]("est_intersect") == 5L) // 6..10
    // above k: estimates within a loose band, intersect <= union,
    // deterministic under repartitioning
    val bigA = (1L to 500L).toDF("user_id")
    val bigB = (251L to 750L).toDF("user_id")
    val e1 = graft.operators.Sketches.kmvSetEstimates(bigA, bigB, "user_id", k = 32).head()
    graft.operators.Caches.release()
    val e2 = graft.operators.Sketches.kmvSetEstimates(
      bigA.repartition(5), bigB.repartition(3), "user_id", k = 32).head()
    graft.operators.Caches.release()
    assert(e1.toSeq == e2.toSeq)
    val (estU, estI) = (e1.getAs[Long]("est_union"), e1.getAs[Long]("est_intersect"))
    assert(estU > 300L && estU < 2000L, s"union estimate wild: $estU") // true 750
    assert(estI <= estU && estI >= 0L)
  }

  test("kFold: every row gets exactly one fold, stable across runs, near-even sizes") {
    val s = spark; import s.implicits._
    val df = (1L to 1000L).toDF("id")
    val folds = Sampling.kFold(df, "id", "cv", k = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(folds.length == 1000)
    assert(folds.map(_._2).toSet == (0 until 5).map(i => s"f$i").toSet)
    val sizes = folds.groupBy(_._2).view.mapValues(_.length)
    sizes.values.foreach(n => assert(n > 130 && n < 270, s"lopsided folds: $sizes"))
    // pure function of (salt, key): identical on re-run and repartition
    val again = Sampling.kFold(df.repartition(7), "id", "cv", k = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(folds.toMap == again)
  }

  test("kCenterSelect walks the farthest-point order with deterministic ties") {
    val s = spark; import s.implicits._
    // seed = min id (1, pointing +x); farthest by cosine is 5 (-x),
    // then 3 (+y, equidistant from both picks at cos 0)
    val emb = Seq(
      (1L, Array(1f, 0f)),
      (2L, Array(0.99f, 0.1f)),
      (3L, Array(0f, 1f)),
      (4L, Array(0.7f, 0.7f)),
      (5L, Array(-1f, 0f))
    ).toDF("vec_id", "embedding")
    val out = Sampling.kCenterSelect(emb, k = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sortBy(_._1)
    assert(out == Seq((0, 1L), (1, 5L), (2, 3L)))
    // no re-picks, determinism under partitioning
    val rep = Sampling.kCenterSelect(emb.repartition(4), k = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sortBy(_._1)
    assert(rep.map(_._2).distinct.length == 5)
    assert(rep.take(3) == out)
  }

  test("epochAllocation: exact water-filling — caps granted, residual largest-remainder, sum==budget") {
    val s = spark; import s.implicits._
    // alpha=0.5 weights: a n=100→w=10, b n=400→w=20, c n=10000→w=100;
    // maxEpochs=2 caps: 200/800/20000; cap/w ratios 20/40/200.
    // B=10000: a and b cap out (water level t=90 > 20,40; < 200),
    // residual 9000 goes entirely to c (0.9 epochs).
    val df = Seq(("a", 100L), ("b", 400L), ("c", 10000L)).toDF("src", "n")
    val out = Sampling.epochAllocation(df, "src", "n", budget = 10000L, maxEpochs = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out("a") == ((100L, 10L, 200L, 200L, 2000000L)))
    assert(out("b") == ((400L, 20L, 800L, 800L, 2000000L)))
    assert(out("c") == ((10000L, 100L, 20000L, 9000L, 900000L)))

    // budget above the exhausted corpus: every source returns its cap
    val all = Sampling.epochAllocation(df, "src", "n", budget = 50000L, maxEpochs = 2)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(all == Map("a" -> 200L, "b" -> 800L, "c" -> 20000L))

    // nothing capped: allocation proportional to w with seats, sum==budget
    val small = Sampling.epochAllocation(df, "src", "n", budget = 130L, maxEpochs = 2)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(small.values.sum == 130L)
    assert(small("a") == 10L && small("b") == 20L && small("c") == 100L)

    // seats: budget 131 -> one largest-remainder seat, deterministic
    val seat = Sampling.epochAllocation(df, "src", "n", budget = 131L, maxEpochs = 2)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(seat.values.sum == 131L)
    // rem_g = 131*w_g mod 130 -> a:10, b:20, c:100 — c wins the seat
    assert(seat("c") == 101L)
  }

  test("GridQuantileAgg: exact histogram, edge clamping, merge == rebuild") {
    val agg = new graft.functions.GridQuantileAgg(lo = 10L, width = 5L, nBins = 4)
    // grid cells: [10,15) [15,20) [20,25) [25,30); out-of-range clamps
    val xs = Seq(9L, 10L, 14L, 15L, 24L, 29L, 100L, -50L)
    val full = xs.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
    assert(full.toSeq == Seq(4L, 1L, 1L, 2L),
      "9 and -50 clamp to cell 0; 100 clamps to cell 3")
    // mergeability: disjoint halves merge to the full rebuild
    val (h1, h2) = xs.splitAt(3)
    val m = agg.merge(
      h1.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)),
      h2.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)))
    assert(m.toSeq == full.toSeq, "elementwise-sum merge == one-pass rebuild")
  }

  test("GridQuantileAgg distributes: partial aggregation equals driver fold") {
    val s = spark; import s.implicits._
    val gq = org.apache.spark.sql.functions.udaf(
      new graft.functions.GridQuantileAgg(0L, 10L, 8),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Long]())
    val vals = (0 until 1000).map(i => (i % 3).toString -> (i * 7L % 95L))
    val got = vals.toDF("g", "v").repartition(7)
      .groupBy("g").agg(gq(col("v")).as("counts"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    val agg = new graft.functions.GridQuantileAgg(0L, 10L, 8)
    val want = vals.groupBy(_._1).view.mapValues(
      _.map(_._2).foldLeft(agg.zero)((b, x) => agg.reduce(b, x)).toSeq).toMap
    assert(got == want)
  }

  test("HashRankQuantileAgg: state is a pure function of the multiset — any merge tree agrees") {
    val agg = new graft.functions.HashRankQuantileAgg(16)
    val rnd = new scala.util.Random(17L)
    // synthetic (tz, v): geometric-2 tz like the real trailing-bit draw
    val xs = (1 to 400).map { i =>
      var tz = 0
      while (tz < 24 && rnd.nextInt(2) == 0) tz += 1
      (tz, i.toLong)
    }
    def fold(items: Seq[(Int, Long)]) =
      items.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
    val onePass = agg.finish(fold(xs))
    // several adversarial merge trees: shuffled splits, skewed splits,
    // pairwise cascades — all must land on the identical state
    for (trial <- 0 until 5) {
      val shuffled = rnd.shuffle(xs)
      val parts = shuffled.grouped(1 + rnd.nextInt(150)).map(fold).toSeq
      val merged = agg.finish(parts.reduce(agg.merge))
      assert(merged == onePass, s"trial $trial diverged")
    }
    // level selection is minimal: |{tz >= L}| <= k < |{tz >= L-1}|
    val L = onePass.level
    assert(xs.count(_._1 >= L) <= 16)
    assert(L == 0 || xs.count(_._1 >= L - 1) > 16)
    assert(onePass.n == 400L)
    assert(onePass.items == onePass.items.sortBy(x => (x._2, x._1)), "canonical order")
  }

  test("HashRankQuantileAgg: real md5 BIT draw keeps the sample above k/2-ish at k=256") {
    val s = spark; import s.implicits._
    val n = 20000
    // trailing-zero BITS of md5: 4*nibbles + bits of the last non-zero
    // hex char — the halving-per-level draw the production gates use
    val h = md5(concat(lit("t:"), col("id").cast("string")).cast("binary"))
    val tzn = length(regexp_extract(h, "(0*)$", 1)).cast("int")
    val lastNz = h.substr(lit(32) - tzn, lit(1))
    val tzBits = (tzn * 4 +
      when(lastNz === "8", 3).when(lastNz.isin("4", "c"), 2)
        .when(lastNz.isin("2", "6", "a", "e"), 1).otherwise(0)).cast("int")
    val df = (1 to n).map(i => (i.toLong, i.toLong)).toDF("id", "v")
      .withColumn("tz", tzBits)
    val agg = org.apache.spark.sql.functions.udaf(
      new graft.functions.HashRankQuantileAgg(256),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Int, Long)]())
    val sk = df.repartition(13).agg(agg(col("tz"), col("v")).as("sk"))
      .select(col("sk.level"), col("sk.n"), expr("transform(sk.items, x -> x._2)"))
      .head()
    assert(sk.getLong(1) == n.toLong)
    val vs = sk.getSeq[Long](2)
    // the bit draw halves per level, so the minimal level's survivor
    // count sits in (k/2-ish, k] — the 8x-tighter worst-case floor the
    // old nibble draw (divide-by-16 per bump, floor ~k/16) lacked
    assert(vs.size <= 256 && vs.size > 100, s"sample size ${vs.size}")
    // values are uniform 1..n, so the sample median's RANK should land
    // within a generous 4/sqrt(m) band of n/2 (deterministic: the md5
    // draw is fixed, this documents the achieved error, not luck)
    val med = vs((vs.size + 1) / 2 - 1)
    val tol = (4.0 / math.sqrt(vs.size.toDouble) * n).toLong
    assert(math.abs(med - n / 2) <= tol, s"median est $med vs ${n / 2} (tol $tol)")
  }

  test("neymanAllocation: noisy strata earn the budget; zero variance floors at presence") {
    val s = spark; import s.implicits._
    import graft.operators.Sampling
    // A: 100 constant rows (sigma 0 -> weight floored at 1)
    // B: 8 rows alternating 0/20 -> disc = 8*1600 - 80^2 = 6400,
    //    isqrt = 80; Hamilton at budget 6: B takes all seats
    val df = ((1 to 100).map(_ => ("A", 10L)) ++
      (1 to 8).map(i => ("B", if (i % 2 == 0) 20L else 0L))).toDF("g", "v")
    val out = Sampling.neymanAllocation(df, "g", "v", 6).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("A") == ((100L, 1L, 0L)),
      s"constant stratum must floor at presence weight and win no seats: $out")
    assert(out("B") == ((8L, 80L, 6L)),
      s"the small noisy stratum takes the whole budget: $out")
  }
}
