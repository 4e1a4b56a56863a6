package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOf, RangeJoin}

class NonEquiSpec extends AnyFunSuite with SparkTest {

  // ------------------------------------------------------------ as-of join

  private def mkEvents(rows: Seq[(Long, Long, String, Double)]): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("event_id", "user_id", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
  }

  private def asof(left: DataFrame, right: DataFrame, tolMicros: Option[Long] = None) =
    AsOf.asofJoin(
      left, right.select(col("user_id"), col("ts"),
        col("event_id").as("r_id"), col("value").as("r_value")),
      Seq("user_id"), "ts", tieCol = "r_id", payloadCols = Seq("r_id", "r_value"),
      toleranceMicros = tolMicros)

  test("asofJoin picks the latest right at-or-before each left row") {
    val right = mkEvents(Seq(
      (100L, 1L, "2024-01-01 10:00:00", 1.0),
      (101L, 1L, "2024-01-01 11:00:00", 2.0),
      (102L, 1L, "2024-01-01 13:00:00", 3.0),
      (103L, 2L, "2024-01-01 10:30:00", 9.0)))
    val left = mkEvents(Seq(
      (1L, 1L, "2024-01-01 09:00:00", 0.0), // before all rights -> null
      (2L, 1L, "2024-01-01 11:00:00", 0.0), // equal ts -> inclusive match 101
      (3L, 1L, "2024-01-01 12:59:59", 0.0), // latest at-or-before -> 101
      (4L, 1L, "2024-01-01 23:00:00", 0.0), // -> 102
      (5L, 2L, "2024-01-01 10:31:00", 0.0), // other key -> 103
      (6L, 3L, "2024-01-01 10:31:00", 0.0))) // key with no rights -> null
    val out = asof(left, right).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(out == Map(1L -> -1L, 2L -> 101L, 3L -> 101L, 4L -> 102L, 5L -> 103L, 6L -> -1L))
  }

  test("asofJoin resolves equal-timestamp right rows to the highest tiebreak") {
    val right = mkEvents(Seq(
      (200L, 1L, "2024-01-01 10:00:00", 1.0),
      (205L, 1L, "2024-01-01 10:00:00", 2.0), // same ts, higher id wins
      (201L, 1L, "2024-01-01 10:00:00", 3.0)))
    val left = mkEvents(Seq((1L, 1L, "2024-01-01 10:00:01", 0.0)))
    val row = asof(left, right).collect().head
    assert(row.getLong(4) == 205L && row.getDouble(5) == 2.0)
  }

  test("asofJoin tolerance nulls out stale matches but keeps fresh ones") {
    val right = mkEvents(Seq((300L, 1L, "2024-01-01 10:00:00", 1.0)))
    val left = mkEvents(Seq(
      (1L, 1L, "2024-01-01 10:30:00", 0.0), // 30 min old -> fresh
      (2L, 1L, "2024-01-01 12:00:01", 0.0))) // > 2h -> stale
    val out = asof(left, right, tolMicros = Some(2L * 3600L * 1000000L)).collect()
      .map(r => r.getLong(0) -> r.isNullAt(4)).toMap
    assert(out == Map(1L -> false, 2L -> true))
  }

  test("asofJoin matched payload fields all come from the same right row") {
    val s = spark; import s.implicits._
    // the latest right row carries a NULL payload value; per-column
    // last(ignoreNulls) would backfill it from the older row — the
    // struct carry must not
    val right = Seq(
      (400L, 1L, "2024-01-01 10:00:00", Some(7.0)),
      (401L, 1L, "2024-01-01 11:00:00", None: Option[Double]))
      .toDF("event_id", "user_id", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val left = mkEvents(Seq((1L, 1L, "2024-01-01 12:00:00", 0.0)))
    val row = asof(left, right).collect().head
    assert(row.getLong(4) == 401L && row.isNullAt(5))
  }

  test("asofJoin plans one shuffle and no pair expansion") {
    val right = mkEvents((0 until 50).map(i =>
      (i.toLong, (i % 5).toLong, f"2024-01-01 ${i % 24}%02d:00:00", 1.0)))
    val left = mkEvents((0 until 50).map(i =>
      (100L + i, (i % 5).toLong, f"2024-01-01 ${i % 24}%02d:30:00", 0.0)))
    val df = asof(left, right)
    df.collect()
    // AQE wraps shuffles in ShuffleQueryStage leaves, so count textually
    // on the final plan section only (the string repeats the initial plan)
    val ps = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("Exchange ".r.findAllIn(ps).size == 1, s"expected exactly one shuffle:\n$ps")
    assert(!ps.contains("CartesianProduct") && !ps.contains("BroadcastNestedLoopJoin"),
      s"as-of join expanded pairs:\n$ps")
  }

  test("asofJoin null keys never match (equi-join semantics)") {
    val s = spark; import s.implicits._
    def withNullKey(rows: Seq[(Long, Option[Long], String)]) =
      rows.toDF("event_id", "user_id", "ts_s")
        .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
        .withColumn("value", lit(1.0))
    val right = withNullKey(Seq((500L, None, "2024-01-01 09:00:00")))
    val left = withNullKey(Seq((1L, None, "2024-01-01 10:00:00")))
    val row = asof(left, right).collect().head
    assert(row.isNullAt(4), "null-key rows must not as-of match each other")
  }

  // ------------------------------------------------------------ range join

  private def bands: DataFrame = {
    val s = spark
    s.createDataFrame(Seq(("low", 0.0, 10.0), ("mid", 10.0, 20.0), ("high", 20.0, 30.0)))
      .toDF("band", "lo", "hi")
  }

  private def fact: DataFrame = {
    val s = spark; import s.implicits._
    Seq((1L, 0.0), (2L, 9.999), (3L, 10.0), (4L, 19.5), (5L, 29.999), (6L, 30.0), (7L, -0.1))
      .toDF("id", "v")
  }

  private def asofFwd(left: DataFrame, right: DataFrame, tolMicros: Option[Long] = None) =
    AsOf.asofJoinForward(
      left, right.select(col("user_id"), col("ts"),
        col("event_id").as("r_id"), col("value").as("r_value")),
      Seq("user_id"), "ts", tieCol = "r_id", payloadCols = Seq("r_id", "r_value"),
      toleranceMicros = tolMicros)

  private def asofNear(left: DataFrame, right: DataFrame, tolMicros: Option[Long] = None) =
    AsOf.asofJoinNearest(
      left, right.select(col("user_id"), col("ts"),
        col("event_id").as("r_id"), col("value").as("r_value")),
      Seq("user_id"), "ts", tieCol = "r_id", payloadCols = Seq("r_id", "r_value"),
      toleranceMicros = tolMicros)

  test("asofJoinForward picks the earliest right at-or-after; ties to highest id; tolerance bounds") {
    val right = mkEvents(Seq(
      (100L, 1L, "2024-01-01 10:00:00", 1.0),
      (105L, 1L, "2024-01-01 10:00:00", 1.5), // same ts, higher id wins
      (101L, 1L, "2024-01-01 11:00:00", 2.0),
      (103L, 2L, "2024-01-01 10:30:00", 9.0)))
    val left = mkEvents(Seq(
      (1L, 1L, "2024-01-01 09:00:00", 0.0), // earliest at-or-after -> 105 (tie)
      (2L, 1L, "2024-01-01 10:00:00", 0.0), // equal ts -> inclusive -> 105
      (3L, 1L, "2024-01-01 10:00:01", 0.0), // -> 101
      (4L, 1L, "2024-01-01 12:00:00", 0.0), // after all rights -> null
      (5L, 3L, "2024-01-01 10:00:00", 0.0))) // no rights -> null
    val out = asofFwd(left, right).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(out == Map(1L -> 105L, 2L -> 105L, 3L -> 101L, 4L -> -1L, 5L -> -1L))
    // 30-minute freshness: the 1-hour-away match nulls out
    val tol = asofFwd(left, right, tolMicros = Some(30L * 60L * 1000000L)).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(tol(1L) == -1L && tol(2L) == 105L)
  }

  test("asofJoinNearest picks the closer side, preferring backward on exact ties") {
    val right = mkEvents(Seq(
      (100L, 1L, "2024-01-01 10:00:00", 1.0),
      (101L, 1L, "2024-01-01 12:00:00", 2.0)))
    val left = mkEvents(Seq(
      (1L, 1L, "2024-01-01 10:30:00", 0.0), // 30m back vs 90m fwd -> 100
      (2L, 1L, "2024-01-01 11:30:00", 0.0), // 90m back vs 30m fwd -> 101
      (3L, 1L, "2024-01-01 11:00:00", 0.0), // exact tie -> backward 100
      (4L, 1L, "2024-01-01 09:00:00", 0.0), // only forward exists -> 100
      (5L, 1L, "2024-01-01 13:00:00", 0.0), // only backward exists -> 101
      (6L, 2L, "2024-01-01 13:00:00", 0.0))) // no rights -> null
    val out = asofNear(left, right).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(out == Map(1L -> 100L, 2L -> 101L, 3L -> 100L, 4L -> 100L, 5L -> 101L, 6L -> -1L))
    // tolerance bounds BOTH directions: 45 min keeps only sub-45m matches
    val tol = asofNear(left, right, tolMicros = Some(45L * 60L * 1000000L)).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(tol == Map(1L -> 100L, 2L -> 101L, 3L -> -1L, 4L -> -1L, 5L -> -1L, 6L -> -1L))
  }

  test("asofJoinNearest plans one exchange over the union (no pair expansion)") {
    val right = mkEvents((0 until 200).map(i =>
      (1000L + i, (i % 5).toLong, f"2024-01-01 ${10 + i % 12}%02d:00:00", i.toDouble)))
    val left = mkEvents((0 until 200).map(i =>
      (i.toLong, (i % 5).toLong, f"2024-01-01 ${10 + (i + 3) % 12}%02d:30:00", 0.0)))
    val plan = asofNear(left, right).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"nearest as-of must not expand pairs:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected at most 2 exchanges (two inputs -> one union shuffle), got $exchanges:\n$plan")
  }

  test("bandJoin is left-closed right-open and keeps uncovered rows with null band") {
    val out = RangeJoin.bandJoin(fact, "v", bands).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) "none" else r.getString(2))).toMap
    assert(out == Map(1L -> "low", 2L -> "low", 3L -> "mid", 4L -> "mid",
      5L -> "high", 6L -> "none", 7L -> "none"))
  }

  test("uniformBandJoin matches bandJoin row-for-row on aligned bands") {
    val generic = RangeJoin.bandJoin(fact, "v", bands)
      .select("id", "v", "band").collect().map(_.toSeq).toSet
    val rewrite = RangeJoin.uniformBandJoin(fact, "v", bands, 10.0)
      .select("id", "v", "band").collect().map(_.toSeq).toSet
    assert(generic == rewrite)
  }

  test("asofJoin ignores right rows with a null timestamp") {
    val s = spark; import s.implicits._
    // in range-join semantics r.ts <= l.ts is NULL (never true) for a
    // null right ts; nulls-first ordering must not carry its payload
    val right = Seq(
      (600L, 1L, None: Option[String], 5.0),
      (601L, 1L, Some("2024-01-01 10:00:00"), 1.0))
      .toDF("event_id", "user_id", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val left = mkEvents(Seq(
      (1L, 1L, "2024-01-01 09:00:00", 0.0), // before the only real right -> null
      (2L, 1L, "2024-01-01 11:00:00", 0.0))) // -> 601, never 600
    val out = asof(left, right).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(out == Map(1L -> -1L, 2L -> 601L))
  }

  test("uniformBandJoin accepts widths whose band edges are not exactly representable") {
    val s = spark; import s.implicits._
    // 0.2 + 0.1 != 0.3 in doubles — exact-equality validation would
    // false-reject this perfectly aligned band table
    val tenths = spark.createDataFrame(
      Seq(("a", 0.0, 0.1), ("b", 0.1, 0.2), ("c", 0.2, 0.3))).toDF("band", "lo", "hi")
    val f = Seq((1L, 0.05), (2L, 0.15), (3L, 0.25)).toDF("id", "v")
    val out = RangeJoin.uniformBandJoin(f, "v", tenths, 0.1).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out == Map(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("uniformBandJoin rejects bands misaligned to the width") {
    val bad = spark.createDataFrame(Seq(("x", 5.0, 15.0))).toDF("band", "lo", "hi")
    intercept[IllegalArgumentException] {
      RangeJoin.uniformBandJoin(fact, "v", bad, 10.0)
    }
  }

  // ------------------------------------------------------- overlap join

  private def intervals(rows: Seq[(Long, Long, Long, Long)]) = {
    val s = spark; import s.implicits._
    rows.toDF("key", "id", "lo", "hi")
  }

  test("overlapJoin matches the naive inequality join, one row per pair") {
    // deterministic pseudo-random intervals, lengths 1..40 across a
    // width-16 grid so many pairs share several cells (dedupe must hold)
    def mk(idBase: Long) = intervals((0 until 120).map { i =>
      val lo = (i * 37L) % 200
      ((i % 4).toLong, idBase + i, lo, lo + 1 + (i * 13L) % 40)
    })
    val l = mk(0)
    val r = mk(1000)
    val got = RangeJoin.overlapJoin(l, r, "lo", "hi", width = 16L, keyCols = Seq("key"))
      .select("id", "id_r").collect().map(x => (x.getLong(0), x.getLong(1)))
    val expected = l.as("l").join(r.toDF("key2", "id2", "lo2", "hi2"),
      col("key") === col("key2") && col("lo") < col("hi2") && col("lo2") < col("hi"))
      .select("id", "id2").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(got.length == got.distinct.length, "multi-cell pairs must appear once")
    assert(got.toSet == expected.toSet)
    assert(got.nonEmpty)
  }

  test("overlapJoin drops empty intervals and null keys or bounds") {
    val s = spark; import s.implicits._
    val l = Seq(
      (Some(1L), 1L, Some(10L), Some(10L)), // empty: overlaps nothing
      (Some(1L), 2L, Some(10L), Some(20L)),
      (None, 3L, Some(10L), Some(20L)), // null key: never matches
      (Some(1L), 4L, None: Option[Long], Some(20L))) // null bound: dropped
      .toDF("key", "id", "lo", "hi")
    val r = Seq((Some(1L), 9L, Some(5L), Some(15L)), (None, 8L, Some(5L), Some(15L)))
      .toDF("key", "id", "lo", "hi")
    val got = RangeJoin.overlapJoin(l, r, "lo", "hi", 16L, Seq("key"))
      .select("id", "id_r").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((2L, 9L)))
  }

  test("overlapJoin equals the naive join on randomized intervals, any width, negative bounds") {
    val s = spark; import s.implicits._
    for (seed <- Seq(7, 42); width <- Seq(3L, 16L, 100L)) {
      val rnd = new scala.util.Random(seed)
      def mk(idBase: Long) = (0 until 80).map { i =>
        val lo = rnd.nextLong(300) - 100 // negative los exercise floorDiv
        (rnd.nextLong(4), idBase + i, lo, lo + rnd.nextLong(50)) // includes empty
      }.toDF("key", "id", "lo", "hi")
      val l = mk(0)
      val r = mk(1000)
      val got = RangeJoin.overlapJoin(l, r, "lo", "hi", width, Seq("key"))
        .select("id", "id_r").collect().map(x => (x.getLong(0), x.getLong(1)))
      val expected = l.as("l").join(r.toDF("key2", "id2", "lo2", "hi2"),
        col("key") === col("key2") && col("lo") < col("hi2") && col("lo2") < col("hi") &&
          col("hi") > col("lo") && col("hi2") > col("lo2"))
        .select("id", "id2").collect().map(x => (x.getLong(0), x.getLong(1)))
      assert(got.length == got.distinct.length, s"dupes at seed=$seed width=$width")
      assert(got.toSet == expected.toSet, s"mismatch at seed=$seed width=$width")
    }
  }

  test("overlapJoin plans an equi join, not a nested loop or cartesian") {
    val l = intervals(Seq((1L, 1L, 0L, 10L)))
    val r = intervals(Seq((1L, 2L, 5L, 15L)))
    val df = RangeJoin.overlapJoin(l, r, "lo", "hi", 16L, Seq("key"))
    df.collect()
    val ps = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!ps.contains("BroadcastNestedLoopJoin") && !ps.contains("CartesianProduct"),
      s"overlap join expanded pairs:\n$ps")
  }

  test("uniformBandJoin plans a broadcast hash join, not a nested loop") {
    val df = RangeJoin.uniformBandJoin(fact, "v", bands, 10.0)
    df.collect()
    val ps = df.queryExecution.executedPlan.toString
    assert(ps.contains("BroadcastHashJoin"), s"no hash join in:\n$ps")
    assert(!ps.contains("BroadcastNestedLoopJoin"), s"rewrite fell back to nested loop:\n$ps")
  }
}
