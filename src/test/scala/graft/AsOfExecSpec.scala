package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf

/** The strategy-tier as-of join (BroadcastAsOfJoinExec) must be
  * row-for-row equal to the composed window form on every semantic
  * edge, and must plan with NO exchange on the fact side.
  */
class AsOfExecSpec extends AnyFunSuite with SparkTest {

  private def mkEvents(rows: Seq[(Long, Long, String, Double)]): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("event_id", "user_id", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
  }

  private def right(rows: Seq[(Long, Long, String, Double)]) =
    mkEvents(rows).select(col("user_id"), col("ts"),
      col("event_id").as("r_id"), col("value").as("r_value"))

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(v => String.valueOf(v)).mkString("|")).sorted.toSeq

  private val fixtureRight = Seq(
    (100L, 1L, "2024-01-01 10:00:00", 1.0),
    (101L, 1L, "2024-01-01 11:00:00", 2.0),
    (104L, 1L, "2024-01-01 11:00:00", 2.5), // equal-ts tie: highest r_id wins
    (102L, 1L, "2024-01-01 13:00:00", 3.0),
    (103L, 2L, "2024-01-01 10:30:00", 9.0))
  private val fixtureLeft = Seq(
    (1L, 1L, "2024-01-01 09:00:00", 0.0), // before all rights -> null
    (2L, 1L, "2024-01-01 11:00:00", 0.0), // equal ts inclusive + tie -> 104
    (3L, 1L, "2024-01-01 12:59:59", 0.0), // -> 104
    (4L, 1L, "2024-01-01 23:00:00", 0.0), // -> 102
    (5L, 2L, "2024-01-01 10:31:00", 0.0), // other key -> 103
    (6L, 3L, "2024-01-01 10:31:00", 0.0)) // no rights for key -> null

  test("exec equals the window form on matches, ties, and no-match rows") {
    val l = mkEvents(fixtureLeft)
    val r = right(fixtureRight)
    val viaExec = AsOf.asofJoinBroadcast(l, r, Seq("user_id"), "ts",
      tieCol = "r_id", payloadCols = Seq("r_id", "r_value"))
    val viaWindow = AsOf.asofJoin(l, r, Seq("user_id"), "ts",
      tieCol = "r_id", payloadCols = Seq("r_id", "r_value"))
    assert(canon(viaExec) == canon(viaWindow))
    val m = viaExec.collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(4)) -1L else x.getLong(4))).toMap
    assert(m == Map(1L -> -1L, 2L -> 104L, 3L -> 104L, 4L -> 102L, 5L -> 103L, 6L -> -1L))
  }

  test("exec drops null-key and null-ts right rows; null-key left rows keep null payload") {
    val s = spark; import s.implicits._
    val l = Seq((1L, Option(1L), "2024-01-01 12:00:00"),
      (2L, Option.empty[Long], "2024-01-01 12:00:00"))
      .toDF("event_id", "user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val r = Seq((Option(1L), Option("2024-01-01 10:00:00"), 7L),
      (Option.empty[Long], Option("2024-01-01 10:00:00"), 8L),
      (Option(1L), Option.empty[String], 9L))
      .toDF("user_id", "ts_s", "r_id")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .select(col("user_id"), col("ts"), col("r_id"), lit(0.0).as("r_value"))
    val out = AsOf.asofJoinBroadcast(l, r, Seq("user_id"), "ts",
      tieCol = "r_id", payloadCols = Seq("r_id", "r_value"))
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(3)) -1L else x.getLong(3))).toMap
    assert(out == Map(1L -> 7L, 2L -> -1L))
  }

  test("plan: BroadcastAsOfJoin present, broadcast exchange on the right, NO shuffle of the fact side") {
    val l = mkEvents(fixtureLeft)
    val r = right(fixtureRight)
    val df = AsOf.asofJoinBroadcast(l, r, Seq("user_id"), "ts",
      tieCol = "r_id", payloadCols = Seq("r_id", "r_value"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastAsOfJoin"), s"missing exec node:\n$plan")
    assert(plan.contains("BroadcastExchange"), s"right side must broadcast:\n$plan")
    // walk the physical tree — ShuffleExchangeExec renders as bare
    // "Exchange" in Spark 4.x, so a string match would vacuously pass
    val shuffles = df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(shuffles.isEmpty,
      s"the whole point is zero fact-side exchange:\n$plan")
  }


  test("forward exec equals asofJoinForward on matches, equal-ts ties, and no-match rows") {
    val l = mkEvents(fixtureLeft)
    val r = right(fixtureRight)
    val viaExec = AsOf.asofJoinBroadcast(l, r, Seq("user_id"), "ts",
      tieCol = "r_id", payloadCols = Seq("r_id", "r_value"), forward = true)
    val viaWindow = AsOf.asofJoinForward(l, r, Seq("user_id"), "ts",
      tieCol = "r_id", payloadCols = Seq("r_id", "r_value"))
    assert(canon(viaExec) == canon(viaWindow))
    val m = viaExec.collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(4)) -1L else x.getLong(4))).toMap
    // left 2 at 11:00 matches the equal-ts pair {101, 104} -> highest tie 104;
    // left 4 is after every right -> null
    assert(m(2L) == 104L && m(4L) == -1L)
  }

  test("rejects non-long-backed and mismatched column types eagerly") {
    val l = mkEvents(fixtureLeft)
    val r = right(fixtureRight)
    // DATE is int-backed: the exec's getLong would misread it — must
    // fail fast at the wrapper, not corrupt at runtime
    val lDate = l.withColumn("ts", to_date(col("ts")))
    val rDate = r.withColumn("ts", to_date(col("ts")))
    val e1 = intercept[IllegalArgumentException] {
      AsOf.asofJoinBroadcast(lDate, rDate, Seq("user_id"), "ts",
        tieCol = "r_id", payloadCols = Seq("r_id"))
    }
    assert(e1.getMessage.contains("long-backed"))
    // ts type mismatch across sides
    val e2 = intercept[IllegalArgumentException] {
      AsOf.asofJoinBroadcast(l, rDate, Seq("user_id"), "ts",
        tieCol = "r_id", payloadCols = Seq("r_id"))
    }
    assert(e2.getMessage.contains("type mismatch"))
    // key type mismatch (int vs long) would silently match nothing
    // under binary row equality — must also fail fast
    val e3 = intercept[IllegalArgumentException] {
      AsOf.asofJoinBroadcast(l.withColumn("user_id", col("user_id").cast("int")),
        r, Seq("user_id"), "ts", tieCol = "r_id", payloadCols = Seq("r_id"))
    }
    assert(e3.getMessage.contains("key user_id type mismatch"))
  }

  test("right side above broadcastRowLimit falls back to the window form") {
    val l = mkEvents(fixtureLeft)
    val r = right(fixtureRight)
    val df = AsOf.asofJoinBroadcast(l, r, Seq("user_id"), "ts",
      tieCol = "r_id", payloadCols = Seq("r_id", "r_value"),
      broadcastRowLimit = 2L) // fixtureRight has 5 rows
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastAsOfJoin"),
      s"over-limit right side must not broadcast:\n$plan")
    // identical results through the fallback
    assert(canon(df) == canon(AsOf.asofJoin(l, r, Seq("user_id"), "ts",
      tieCol = "r_id", payloadCols = Seq("r_id", "r_value"))))
    // forward fallback too
    val dff = AsOf.asofJoinBroadcast(l, r, Seq("user_id"), "ts",
      tieCol = "r_id", payloadCols = Seq("r_id", "r_value"),
      forward = true, broadcastRowLimit = 2L)
    assert(canon(dff) == canon(AsOf.asofJoinForward(l, r, Seq("user_id"), "ts",
      tieCol = "r_id", payloadCols = Seq("r_id", "r_value"))))
  }

  test("exec agrees with the window form on a 5k-row pseudo-random corpus") {
    val s = spark; import s.implicits._
    def ts(i: Int) = f"2024-01-01 ${(i % 24)}%02d:${(i % 60)}%02d:${(i * 7) % 60}%02d"
    val l = mkEvents((1 to 5000).map(i =>
      (i.toLong, (i * 31L) % 97L, ts(i * 13), 0.0)))
    val r = right((1 to 800).map(i =>
      (10000L + i, (i * 17L) % 97L, ts(i * 29), i / 10.0)))
    val a = AsOf.asofJoinBroadcast(l, r, Seq("user_id"), "ts",
      tieCol = "r_id", payloadCols = Seq("r_id", "r_value"))
    val b = AsOf.asofJoin(l, r, Seq("user_id"), "ts",
      tieCol = "r_id", payloadCols = Seq("r_id", "r_value"))
    assert(canon(a) == canon(b))
    val af = AsOf.asofJoinBroadcast(l, r, Seq("user_id"), "ts",
      tieCol = "r_id", payloadCols = Seq("r_id", "r_value"), forward = true)
    val bf = AsOf.asofJoinForward(l, r, Seq("user_id"), "ts",
      tieCol = "r_id", payloadCols = Seq("r_id", "r_value"))
    assert(canon(af) == canon(bf))
    // partition invariance: the per-partition index build must not
    // depend on how the fact side is partitioned
    val ap = AsOf.asofJoinBroadcast(l.repartition(7), r, Seq("user_id"), "ts",
      tieCol = "r_id", payloadCols = Seq("r_id", "r_value"))
    assert(canon(ap) == canon(b))
  }
}
