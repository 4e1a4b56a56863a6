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
}
