package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quantiles

class QuantilesSpec extends AnyFunSuite with SparkTest {

  private def data = {
    val s = spark; import s.implicits._
    // two groups with known shapes: uniform 0..999 and a skewed tail
    ((0 until 1000).map(i => ("uni", i.toDouble)) ++
      (0 until 1000).map(i => ("skew", if (i < 900) i / 10.0 else i.toDouble)))
      .toDF("g", "v")
  }

  test("grid estimate lands within one cell width of the exact quantile") {
    val cells = 256
    val grid = Quantiles.gridQuantiles(data, "v", "g", Seq(0.5, 0.9), cells)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(3)).toMap
    data.createOrReplaceTempView("qt")
    val exact = spark.sql(
      "SELECT g, percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS p50, " +
        "percentile_disc(0.9) WITHIN GROUP (ORDER BY v) AS p90, " +
        "max(v) - min(v) AS range FROM qt GROUP BY g")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    for ((g, (p50, p90, range)) <- exact) {
      val cell = range / cells
      assert(math.abs(grid((g, 0.5)) - p50) <= cell + 1e-9,
        s"$g p50: grid=${grid((g, 0.5))} exact=$p50 cell=$cell")
      assert(math.abs(grid((g, 0.9)) - p90) <= cell + 1e-9,
        s"$g p90: grid=${grid((g, 0.9))} exact=$p90 cell=$cell")
    }
  }

  test("single-value groups return the value itself") {
    val s = spark; import s.implicits._
    val df = Seq(("a", 7.5), ("a", 7.5), ("b", 1.0)).toDF("g", "v")
    val out = Quantiles.gridQuantiles(df, "v", "g", Seq(0.5), 16)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out == Map("a" -> 7.5, "b" -> 1.0))
  }

  test("output is deterministic across partitionings") {
    def run(parts: Int) =
      Quantiles.gridQuantiles(data.repartition(parts), "v", "g", Seq(0.25, 0.5, 0.75, 0.9), 128)
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(run(1) == run(13))
  }
}
