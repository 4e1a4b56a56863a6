package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Incremental

class IncrementalSpec extends AnyFunSuite with SparkTest {

  private def rows(r: (Long, Long)*) = {
    val s = spark; import s.implicits._
    r.toSeq.toDF("user_id", "units")
  }

  private def aggOf(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum(col("units")).as("sum_units"))

  private def toMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("folding a delta equals re-aggregating from scratch") {
    val history = rows((1L, 10L), (1L, 5L), (2L, 7L))
    val delta = rows((1L, 1L), (3L, 9L)) // existing key + brand-new key
    val incremental = Incremental.updateCounts(
      aggOf(history), delta, Seq("user_id"), col("units"))
    assert(toMap(incremental) == toMap(aggOf(history.unionAll(delta))))
    assert(toMap(incremental)(3L) == ((1L, 9L)))
  }

  test("retractions reverse exactly the named rows; fully-retracted keys drop") {
    val history = rows((1L, 10L), (1L, 5L), (2L, 7L), (3L, 4L), (3L, 2L))
    // user 3 fully revoked; user 1 loses one row; user 4 is a new insert
    val delta = rows((3L, 4L), (3L, 2L), (1L, 5L), (4L, 8L))
      .withColumn("op", when(col("user_id") === 4L, 1).otherwise(-1))
    val patched = Incremental.updateWithRetractions(
      aggOf(history), delta, Seq("user_id"), col("units"), col("op"))
    val survivors = rows((1L, 10L), (2L, 7L), (4L, 8L))
    assert(toMap(patched) == toMap(aggOf(survivors)))
    assert(!toMap(patched).contains(3L), "fully-retracted key must disappear")
  }

  test("insert+retract of the same row in one delta is a no-op") {
    val s = spark; import s.implicits._
    val history = rows((1L, 10L))
    val delta = Seq((2L, 6L, 1), (2L, 6L, -1)).toDF("user_id", "units", "op")
    val patched = Incremental.updateWithRetractions(
      aggOf(history), delta, Seq("user_id"), col("units"), col("op"))
    assert(toMap(patched) == toMap(aggOf(history)))
  }

  test("chained deltas equal one-shot aggregation (associativity)") {
    val batches = Seq(
      rows((1L, 1L), (2L, 2L)),
      rows((2L, 3L), (3L, 4L)),
      rows((1L, 5L), (3L, 6L), (4L, 7L)))
    val chained = batches.tail.foldLeft(aggOf(batches.head)) { (agg, b) =>
      Incremental.updateCounts(agg, b, Seq("user_id"), col("units"))
    }
    val oneShot = aggOf(batches.reduce(_ unionAll _))
    assert(toMap(chained) == toMap(oneShot))
  }

  test("updateMinMax: extremum retraction rescans, duplicates survive, interior stays fast") {
    val s = spark; import s.implicits._
    // key 1: max 30 retracted (runner-up 20 must surface), min 10 duplicated
    // key 2: interior 15 retracted (extrema unchanged — fast path)
    // key 3: fully retracted (key disappears)
    // key 4: untouched; key 5: new, insert-only
    val hist = rows(1L -> 10L, 1L -> 10L, 1L -> 20L, 1L -> 30L,
      2L -> 10L, 2L -> 15L, 2L -> 20L, 3L -> 7L, 4L -> 99L)
    val prev = hist.groupBy("user_id")
      .agg(min(col("units")).as("min_v"), max(col("units")).as("max_v"))
    val delta = Seq(
      (1L, 30L, -1), (1L, 10L, -1), // retract the max AND one copy of the dup min
      (2L, 15L, -1),
      (3L, 7L, -1),
      (5L, 42L, 1)).toDF("user_id", "units", "__op")
    val got = Incremental.updateMinMax(prev, hist, delta,
      Seq("user_id"), col("units"), col("__op"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      1L -> (10L, 20L), // dup min survives one retraction; max falls to 20
      2L -> (10L, 20L),
      4L -> (99L, 99L),
      5L -> (42L, 42L)))
    // equals a from-scratch recompute over the surviving multiset
    val surv = rows(1L -> 10L, 1L -> 20L, 2L -> 10L, 2L -> 20L, 4L -> 99L, 5L -> 42L)
    val scratch = surv.groupBy("user_id")
      .agg(min(col("units")).as("min_v"), max(col("units")).as("max_v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == scratch)
  }

  test("empty delta is a no-op") {
    val history = rows((1L, 10L))
    val out = Incremental.updateCounts(
      aggOf(history), history.limit(0), Seq("user_id"), col("units"))
    assert(toMap(out) == toMap(aggOf(history)))
  }

  test("maintainJoin: three-increment refresh equals the full re-join, dB broadcasts") {
    val s = spark; import s.implicits._
    // facts (k, f) and dims (k, g); deltas on both sides, including a
    // new fact whose key only exists in the NEW dim slice (the
    // dA joins-B-full case) and a new dim matching OLD facts
    val aOld = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "f")
    val aDelta = Seq((1L, 11L), (9L, 90L)).toDF("k", "f")
    val bOld = Seq((1L, 100L), (2L, 200L)).toDF("k", "g")
    val bDelta = Seq((3L, 300L), (9L, 900L)).toDF("k", "g")
    val maintained = Incremental.maintainJoin(
      aOld.join(bOld, Seq("k")), aOld, aDelta, bOld, bDelta, Seq("k"))
    val full = aOld.unionByName(aDelta).join(bOld.unionByName(bDelta), Seq("k"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(canon(maintained) == canon(full),
      "refresh must neither lose nor duplicate any join row")
    val exec = maintained.queryExecution.executedPlan.toString
    assert(exec.contains("BroadcastHashJoin"),
      s"the dim delta must broadcast against old facts:\n$exec")
  }

  test("updateTopK: hidden key enters via its delta max; boundary ties stable; merge == rebuild") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    // history: g1 keys 1..4 with maxes 40,30,20,10 -> top3 = 1,2,3
    val hist = Seq(("g1", 1L, 40L), ("g1", 1L, 10L), ("g1", 2L, 30L),
      ("g1", 3L, 20L), ("g1", 4L, 10L)).toDF("g", "k", "v")
    val empty = hist.select(col("g"), col("k"), col("v").as("max_v")).limit(0)
    val st = Incremental.updateTopK(empty, hist, "g", "k", col("v"), k = 3)
    assert(st.collect().map(r => (r.getInt(1), r.getLong(2))).sorted.toSeq ==
      Seq((1, 1L), (2, 2L), (3, 3L)))
    // delta: key 4 (hidden: its old max 10 is NOT in state) jumps to 35
    // -> must enter at rank 2; key 2's retained 30 holds rank 3 (key
    // 9's 25 stays out); key 3 falls off the board
    val delta = Seq(("g1", 4L, 35L), ("g1", 9L, 25L), ("g1", 1L, 5L)).toDF("g", "k", "v")
    val next = Incremental.updateTopK(
      st.select("g", "k", "max_v"), delta, "g", "k", col("v"), k = 3)
    val got = next.collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    // rebuild from all rows
    val all = hist.unionByName(delta)
    val rebuilt = Incremental.updateTopK(empty, all, "g", "k", col("v"), k = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    assert(got == rebuilt)
    assert(got == Seq((1, 1L, 40L), (2, 4L, 35L), (3, 2L, 30L)))
    // boundary tie: two keys at the same max resolve by key id in both paths
    val tieHist = Seq(("g", 7L, 50L), ("g", 8L, 50L), ("g", 9L, 50L), ("g", 10L, 50L))
      .toDF("g", "k", "v")
    val tSt = Incremental.updateTopK(empty, tieHist, "g", "k", col("v"), k = 3)
    assert(tSt.collect().map(_.getLong(2)).sorted.toSeq == Seq(7L, 8L, 9L))
    val tNext = Incremental.updateTopK(tSt.select("g", "k", "max_v"),
      Seq(("g", 6L, 50L)).toDF("g", "k", "v"), "g", "k", col("v"), k = 3)
    assert(tNext.collect().map(_.getLong(2)).sorted.toSeq == Seq(6L, 7L, 8L),
      "a tied smaller id must displace the boundary key")
  }
}
