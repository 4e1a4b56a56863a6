package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Events

class EventsSpec extends AnyFunSuite with SparkTest {

  test("sessionize splits on gaps strictly greater than the threshold") {
    val s = spark; import s.implicits._
    val events = Seq(
      (1L, 100L, "2024-01-01 10:00:00", 1.0),
      (2L, 100L, "2024-01-01 10:29:00", 1.0), // gap 29min -> same session
      (3L, 100L, "2024-01-01 10:59:00", 1.0), // gap exactly 30min -> same (strict >)
      (4L, 100L, "2024-01-01 11:29:01", 1.0), // gap 30min 1s -> NEW session
      (5L, 200L, "2024-01-01 00:00:00", 2.0)
    ).toDF("event_id", "user_id", "ts", "value")
      .withColumn("ts", to_timestamp($"ts"))
    val out = Events.sessionize(events, 30).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(4))).toMap
    assert(out == Map((100L, 0L) -> 3L, (100L, 1L) -> 1L, (200L, 0L) -> 1L))
  }

  test("markovStationary converges to the analytic steady state") {
    val s = spark; import s.implicits._
    // chain from the sequence a a b a: P(a->a)=P(a->b)=1/2, P(b->a)=1
    // analytic stationary: pi = (2/3, 1/3); |eig2| = 1/2 so 20
    // iterations land within 2^-20 of it
    val ev = Seq(
      (1L, 1L, "2024-01-01 10:00:00", "a"),
      (2L, 1L, "2024-01-01 10:00:01", "a"),
      (3L, 1L, "2024-01-01 10:00:02", "b"),
      (4L, 1L, "2024-01-01 10:00:03", "a")
    ).toDF("event_id", "user_id", "ts", "event_type")
      .withColumn("ts", to_timestamp($"ts"))
    val out = Events.markovStationary(ev, Seq("a", "b"), iters = 20)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out("a") - 2.0 / 3) < 1e-4, s"pi(a) = ${out("a")}")
    assert(math.abs(out("b") - 1.0 / 3) < 1e-4)
    assert(math.abs(out.values.sum - 1.0) < 1e-9, "probability mass preserved")
  }

  test("markovAbsorption: analytic absorption probabilities, absorbing pinned at 1") {
    val s = spark; import s.implicits._
    // sequence a b a b a c (one user): P(a->b)=2/3, P(a->c)=1/3,
    // P(b->a)=1; c absorbs. Analytic: v_a = 1/3 + 2/3*v_b, v_b = v_a
    // => v_a = v_b = 1 (c is eventually reached with certainty);
    // at 20 iterations the power fold is within (2/3)^10 of 1
    val types = Seq("a", "b", "a", "b", "a", "c")
    val ev = types.zipWithIndex.map { case (t, i) =>
      (i.toLong, 1L, f"2024-01-01 10:00:$i%02d", t)
    }.toDF("event_id", "user_id", "ts", "event_type")
      .withColumn("ts", to_timestamp($"ts"))
    val out = Events.markovAbsorption(ev, Seq("a", "b", "c"), "c", iters = 20)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("c") == 1.0, "absorbing state is pinned at exactly 1")
    assert(out("a") > 0.98 && out("a") <= 1.0, s"v(a) = ${out("a")}")
    assert(out("b") > 0.98 && out("b") <= 1.0)
    // c has no outgoing transitions in the data: with c NOT absorbing,
    // the substochastic row keeps v(c) at 0
    val out2 = Events.markovAbsorption(ev, Seq("a", "b", "c"), "b", iters = 20)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out2("c") == 0.0, "dead-end state absorbs nothing")
    assert(out2("a") == 2.0 / 3.0,
      "a reaches b with exactly P(a->b); the 1/3 path dies in c")
  }

  test("markovSteps: absorbing pinned at 0, dead end settles at 1, analytic chain") {
    val s = spark; import s.implicits._
    // a b a b a c: P(a->b)=2/3, P(a->c)=1/3, P(b->a)=1; c absorbs.
    // Analytic expected steps to c: v_a = 1 + 2/3*v_b, v_b = 1 + v_a
    // => v_a = 5, v_b = 6 (truncation at 20 leaves it a bit below)
    val types = Seq("a", "b", "a", "b", "a", "c")
    val ev = types.zipWithIndex.map { case (t, i) =>
      (i.toLong, 1L, f"2024-01-01 10:00:$i%02d", t)
    }.toDF("event_id", "user_id", "ts", "event_type")
      .withColumn("ts", to_timestamp($"ts"))
    val out = Events.markovSteps(ev, Seq("a", "b", "c"), "c", iters = 60)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("c") == 0.0, "absorbed chain takes no more steps")
    assert(math.abs(out("a") - 5.0) < 1e-3, s"v(a) = ${out("a")}")
    assert(math.abs(out("b") - 6.0) < 1e-3, s"v(b) = ${out("b")}")
    // with b absorbing, c is a dead end: one charged step, then the
    // continuation mass vanishes (the substochastic convention)
    val out2 = Events.markovSteps(ev, Seq("a", "b", "c"), "b", iters = 20)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out2("b") == 0.0)
    assert(out2("c") == 1.0, "dead-end state settles at exactly 1")
  }

  test("subsequenceSupport: gap-tolerant order, strict middle, same-type triple, zero rows") {
    val s = spark; import s.implicits._
    // user 1: v(0) c(1) e(2) p(3)      -> supports (v,c,p) and (v,e,p)
    // user 2: c(0) v(1) p(2)           -> supports (c,v,p); NOT (v,c,p)
    //                                      (no c strictly after first v)
    // user 3: p(0) p(1) p(2)           -> supports (p,p,p) (middle strict)
    // user 4: p(0) p(1)                -> two purchases only: no (p,p,p)
    val rows = Seq(
      (1L, 1L, 0, "view"), (2L, 1L, 1, "click"), (3L, 1L, 2, "error"), (4L, 1L, 3, "purchase"),
      (5L, 2L, 0, "click"), (6L, 2L, 1, "view"), (7L, 2L, 2, "purchase"),
      (8L, 3L, 0, "purchase"), (9L, 3L, 1, "purchase"), (10L, 3L, 2, "purchase"),
      (11L, 4L, 0, "purchase"), (12L, 4L, 1, "purchase"))
    val ev = rows.map { case (e, u, sec, t) =>
      (e, u, f"2024-01-01 10:00:$sec%02d", t)
    }.toDF("event_id", "user_id", "ts", "event_type")
      .withColumn("ts", to_timestamp($"ts"))
    val out = Events.subsequenceSupport(ev, Seq(
        ("view", "click", "purchase"),
        ("view", "error", "purchase"),
        ("click", "view", "purchase"),
        ("purchase", "purchase", "purchase"),
        ("error", "signup", "purchase")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out(("view", "click", "purchase")) == ((1L, 4L, 250000L)))
    assert(out(("view", "error", "purchase")) == ((1L, 4L, 250000L)))
    assert(out(("click", "view", "purchase")) == ((1L, 4L, 250000L)))
    assert(out(("purchase", "purchase", "purchase")) == ((1L, 4L, 250000L)),
      "two purchases must not support the same-type triple")
    assert(out(("error", "signup", "purchase")) == ((0L, 4L, 0L)),
      "unsupported triples emit a zero row, not absence")
  }

  test("markov family: an observed type outside the pinned list fails the job") {
    val s = spark; import s.implicits._
    val ev = Seq(
      (1L, 1L, "2024-01-01 10:00:00", "a"),
      (2L, 1L, "2024-01-01 10:00:01", "zz")
    ).toDF("event_id", "user_id", "ts", "event_type")
      .withColumn("ts", to_timestamp($"ts"))
    val e = intercept[Exception] {
      Events.markovStationary(ev, Seq("a", "b"), iters = 2).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("outside the pinned state list")),
      s"expected the pinnedState raise, got: $e")
  }

  test("eventPatternCounts: non-overlapping matches, detour class, order by (ts, event_id)") {
    val s = spark; import s.implicits._
    // user 1 sequence (ts order): v p v c e p v s p  ->
    //   strict 'vp': 1 (pos 0 only; later v..p are never adjacent)
    //   funnel 'v[ce]{0,2}p': v p | v c e p match; v s p does not (s not a detour)
    val types1 = Seq("view", "purchase", "view", "click", "error", "purchase",
      "view", "signup", "purchase")
    val ev = types1.zipWithIndex.map { case (t, i) =>
      (i.toLong, 1L, f"2024-01-01 10:00:$i%02d", t)
    } ++ Seq((100L, 2L, "2024-01-01 10:00:00", "purchase")) // lone p: zero matches
    val df = ev.toDF("event_id", "user_id", "ts", "event_type")
      .withColumn("ts", to_timestamp($"ts"))
    val out = Events.eventPatternCounts(df,
        Seq("n_strict" -> "vp", "n_funnel" -> "v[ce]{0,2}p"),
        Seq("click", "error", "purchase", "signup", "view"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getInt(3)))).toMap
    assert(out(1L) == ((9L, 1, 2)))
    assert(out(2L) == ((1L, 0, 0)))
  }

  test("rateSpikes: flags only rates above the trailing-mean multiple; no-baseline hours never alarm") {
    val s = spark; import s.implicits._
    // clicks: 2/hour for 3 hours, then 4 in hour 4 (4 > 1.5*2 -> spike);
    // then 3 in hour 5 (3 > 1.5*avg(2,2,2,4)=3.75? no -> calm)
    def rows(hour: Int, n: Int) = (0 until n).map(i =>
      (hour * 100L + i, 1L, f"2024-01-01 $hour%02d:15:00", 1.0))
    val events = (rows(1, 2) ++ rows(2, 2) ++ rows(3, 2) ++ rows(4, 4) ++ rows(5, 3))
      .toDF("event_id", "user_id", "ts", "value")
      .withColumn("ts", to_timestamp($"ts"))
      .withColumn("event_type", lit("click"))
    val out = Events.rateSpikes(events).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))
      .toMap.map { case (h, v) => (h % 24) -> v } // epoch hour -> hour of day (UTC)
    assert(out(1) == ((2L, 0L, 0L, 0)))  // first hour: no baseline, no alarm
    assert(out(2) == ((2L, 2L, 1L, 0)))
    assert(out(3) == ((2L, 4L, 2L, 0)))
    assert(out(4) == ((4L, 6L, 3L, 1)))  // 4*3*2=24 > 6*3=18 -> spike
    assert(out(5) == ((3L, 10L, 4L, 0))) // 3*4*2=24 > 10*3=30? no
  }

  test("transitionCounts builds the per-user Markov matrix with exact ppm") {
    val s = spark; import s.implicits._
    // user 100: a->b, b->a, a->b ; user 200: a->b  => a->b x3, b->a x1
    val events = Seq(
      (1L, 100L, "2024-01-01 10:00:00", "a"),
      (2L, 100L, "2024-01-01 10:01:00", "b"),
      (3L, 100L, "2024-01-01 10:02:00", "a"),
      (4L, 100L, "2024-01-01 10:03:00", "b"),
      (5L, 200L, "2024-01-01 10:00:00", "a"),
      (6L, 200L, "2024-01-01 10:05:00", "b")
    ).toDF("event_id", "user_id", "ts", "event_type")
      .withColumn("ts", to_timestamp($"ts"))
    val got = Events.transitionCounts(events).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    // transitions never cross users; ppm is conditional on the prev type
    assert(got == Map(
      ("a", "b") -> ((3L, 1000000L)),
      ("b", "a") -> ((1L, 1000000L))))
  }

  test("gapFillHourly emits one row per hour, carrying the latest reading forward") {
    val s = spark; import s.implicits._
    val events = Seq(
      (1L, 1L, "2024-01-01 10:30:00", "a", 1.0),
      (2L, 1L, "2024-01-01 13:10:00", "a", 5.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
      .withColumn("ts", to_timestamp($"ts"))
    val out = Events.gapFillHourly(events).collect()
      .map(r => r.getTimestamp(1).toString ->
        (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    // grid: 10:00 (before the first event -> null), 11:00..13:00 carry
    // event 1; the 13:10 reading is after the last grid point
    assert(out == Map(
      "2024-01-01 10:00:00.0" -> -1L,
      "2024-01-01 11:00:00.0" -> 1L,
      "2024-01-01 12:00:00.0" -> 1L,
      "2024-01-01 13:00:00.0" -> 1L))
  }

  test("ewmaTrailing: exact dyadic weights, ramp-up normalization, per-key isolation") {
    val s = spark; import s.implicits._
    val ev = Seq(
      (1L, 100L, 4L), (1L, 200L, 8L), (1L, 300L, 2L),
      (2L, 100L, 6L) // second key: its own ramp-up, untouched by key 1
    ).toDF("user_id", "seq", "units")
    val out = Events.ewmaTrailing(ev, "user_id", Seq("seq"), col("units"), window = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // W=2: weights (current, previous) = (2, 1)
    assert(out((1L, 100L)) == ((8L, 4.0)), "first row: 4*2, denom 2")
    assert(out((1L, 200L)) == ((20L, 20.0 / 3.0)), "8*2 + 4*1 over 3")
    assert(out((1L, 300L)) == ((12L, 4.0)), "2*2 + 8*1 over 3")
    assert(out((2L, 100L)) == ((12L, 6.0)), "other key ramps up independently")
  }

  test("tumblingHourly buckets on the hour") {
    val s = spark; import s.implicits._
    val events = Seq(
      (1L, 1L, "2024-01-01 10:00:00", "a", 1.5),
      (2L, 1L, "2024-01-01 10:59:59", "a", 2.5),
      (3L, 1L, "2024-01-01 11:00:00", "a", 4.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
      .withColumn("ts", to_timestamp($"ts"))
    val out = Events.tumblingHourly(events).collect()
      .map(r => r.getTimestamp(0).toString -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out("2024-01-01 10:00:00.0") == ((2L, 4.0)))
    assert(out("2024-01-01 11:00:00.0") == ((1L, 4.0)))
  }

  test("interpolateDaily: dense calendar, exact integer slopes both directions, endpoints observed") {
    val s = spark; import s.implicits._
    val sparse = Seq(
      ("2024-01-01", 100L), // +3/day to Jan 4
      ("2024-01-04", 109L), // -5 over 2 days: truncation-toward-zero split
      ("2024-01-06", 99L)).toDF("day0", "v")
      .select(to_date($"day0").as("day"), $"v")
    val out = graft.operators.Events.interpolateDaily(sparse, "day", "v")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(out == Seq(
      ("2024-01-01", 100L, 1),
      ("2024-01-02", 103L, 0),
      ("2024-01-03", 106L, 0),
      ("2024-01-04", 109L, 1),
      ("2024-01-05", 104L, 0), // 109 + sign-split((99-109)*1 div 2) = 109 - 5
      ("2024-01-06", 99L, 1)))
  }
  test("concurrencySweep counts live sessions; closed intervals overlap at the boundary") {
    val s = spark; import s.implicits._
    // sessions (gap 45m): u1 [10:00,10:30], u2 [10:15,10:15], u3 [10:30,11:00]
    // u1 ends exactly when u3 starts: +1 sorts first, so both are live
    val events = Seq(
      (1L, 1L, "2024-01-01 10:00:00", 0.0), (2L, 1L, "2024-01-01 10:30:00", 0.0),
      (3L, 2L, "2024-01-01 10:15:00", 0.0),
      (4L, 3L, "2024-01-01 10:30:00", 0.0), (5L, 3L, "2024-01-01 11:00:00", 0.0)
    ).toDF("event_id", "user_id", "ts", "value")
      .withColumn("ts", to_timestamp($"ts"))
    val got = Events.concurrencySweep(events, gapMinutes = 45).collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      ("2024-01-01 10:00:00.0", 1L, 1L),
      ("2024-01-01 10:15:00.0", 1L, 2L), ("2024-01-01 10:15:00.0", -1L, 1L),
      ("2024-01-01 10:30:00.0", 1L, 2L), ("2024-01-01 10:30:00.0", -1L, 1L),
      ("2024-01-01 11:00:00.0", -1L, 0L)))
  }

  test("decayAttribution: hand-computed power-of-two credit ledger") {
    val s = spark; import s.implicits._
    val ev = Seq(
      // user 1: view 1 day before purchase -> full credit to view
      (100L, "2024-01-01 09:00:00", "view", 0.0),
      (100L, "2024-01-02 09:00:00", "purchase", 10.0),
      // user 2: view (dd=1, w=2^12) + click (dd=0, w=2^13) -> 1:2 split
      (200L, "2024-01-01 09:00:00", "view", 0.0),
      (200L, "2024-01-02 08:00:00", "click", 0.0),
      (200L, "2024-01-02 09:00:00", "purchase", 10.0),
      // user 3: no touches -> direct
      (300L, "2024-01-02 09:00:00", "purchase", 10.0),
      // user 4: only touch is outside the 14-day horizon -> direct
      (400L, "2023-12-01 09:00:00", "view", 0.0),
      (400L, "2024-01-02 09:00:00", "purchase", 10.0)
    ).toDF("user_id", "ts", "event_type", "value")
      .withColumn("ts", to_timestamp($"ts"))
    val out = Events.decayAttribution(ev, Seq("view", "click"), "purchase")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // user 2 splits 1000c as 4096:8192 -> 333 + 666 (1c remainder floors)
    assert(out == Map("view" -> 1333L, "click" -> 666L, "direct" -> 2000L),
      s"got $out")
  }

  test("subsequenceSupportK: greedy fold equals brute-force subsequence search, strict time") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(8L)
    val types = Seq("a", "b", "c")
    // random timelines incl. duplicate timestamps (strict-time: same-ts
    // events cannot chain) and repeated-type patterns
    val rows = for {
      u <- 1L to 40L
      i <- 0 until (1 + rnd.nextInt(12))
    } yield (u * 100 + i, u, types(rnd.nextInt(3)),
      f"2024-01-01 10:${rnd.nextInt(10)}%02d:00", 1.0)
    val events = rows.toDF("event_id", "user_id", "event_type", "ts", "value")
      .withColumn("ts", to_timestamp($"ts"))
    val patterns = Seq(
      Seq("a", "b", "c", "a"),
      Seq("b", "b", "b"),
      Seq("a", "a", "b", "b", "c"),
      Seq("c", "a"))
    val got = Events.subsequenceSupportK(events, patterns)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // brute force: DFS over each user's time-sorted multiset
    def supports(times: Map[String, Seq[Long]], p: Seq[String]): Boolean = {
      def go(i: Int, after: Long): Boolean =
        i == p.size || times.getOrElse(p(i), Nil).exists(t =>
          t > after && go(i + 1, t))
      go(0, Long.MinValue)
    }
    val byUser = rows.groupBy(_._2).view.mapValues(rs =>
      rs.groupBy(_._3).view.mapValues(_.map(r =>
        java.sql.Timestamp.valueOf(r._4).getTime).toSeq).toMap).toMap
    patterns.foreach { p =>
      val want = byUser.values.count(supports(_, p)).toLong
      assert(got(p.mkString(">")) == want, s"pattern ${p.mkString(">")}")
    }
    // fixture sanity: at least one supported and one unsupported pattern
    assert(got.values.exists(_ > 0) && patterns.size == got.size)
  }

  test("subsequenceSupportGap: DP frontier equals brute force; greedy would undercount") {
    val s = spark; import s.implicits._
    // the counterexample greedy-earliest misses under a gap bound:
    // a at t=0 and t=50, b at t=55 — greedy anchors a@0, gap 10 fails;
    // the DP keeps BOTH a-frontiers and matches via a@50
    val handRows = Seq(
      (1L, 1L, "a", 0L), (2L, 1L, "a", 50L), (3L, 1L, "b", 55L),
      (4L, 2L, "a", 0L), (5L, 2L, "b", 20L)) // gap 20 > 10 -> no support
    val hand = handRows.map { case (e, u, y, sec) =>
      (e, u, y, new java.sql.Timestamp(sec * 1000L), 1.0)
    }.toDF("event_id", "user_id", "event_type", "ts", "value")
    val gapped = Events.subsequenceSupportGap(hand, Seq(Seq("a", "b")), 10L * 1000000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gapped("a>b") == 1L, "only user 1 (via the LATER a) supports within gap 10s")

    // randomized equivalence against brute-force DFS with the gap rule
    val rnd = new scala.util.Random(21L)
    val types = Seq("a", "b", "c")
    val rows = for {
      u <- 1L to 30L
      i <- 0 until (1 + rnd.nextInt(10))
    } yield (u * 100 + i, u, types(rnd.nextInt(3)), rnd.nextInt(120).toLong)
    val events = rows.map { case (e, u, y, sec) =>
      (e, u, y, new java.sql.Timestamp(sec * 1000L), 1.0)
    }.toDF("event_id", "user_id", "event_type", "ts", "value")
    val patterns = Seq(Seq("a", "b", "c"), Seq("b", "a"), Seq("c", "c", "c"))
    val gapUs = 30L * 1000000L
    val got = Events.subsequenceSupportGap(events, patterns, gapUs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def supports(times: Map[String, Seq[Long]], p: Seq[String]): Boolean = {
      def go(i: Int, after: Long): Boolean =
        i == p.size || times.getOrElse(p(i), Nil).exists(t =>
          t > after && (i == 0 || t - after <= gapUs) && go(i + 1, t))
      go(0, Long.MinValue / 2)
    }
    val byUser = rows.groupBy(_._2).view.mapValues(rs =>
      rs.groupBy(_._3).view.mapValues(_.map(_._4 * 1000000L).toSeq).toMap).toMap
    patterns.foreach { p =>
      val want = byUser.values.count(supports(_, p)).toLong
      assert(got(p.mkString(">")) == want, s"pattern ${p.mkString(">")}")
    }
  }
}
