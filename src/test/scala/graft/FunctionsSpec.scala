package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._

class FunctionsSpec extends AnyFunSuite with SparkTest {

  test("aqiCategory replicates the reference band edges exactly") {
    val s = spark; import s.implicits._
    val cases = Seq(
      -1 -> "Unknown", 0 -> "Good", 50 -> "Good", 51 -> "Moderate",
      100 -> "Moderate", 101 -> "Unhealthy for Sensitive Groups",
      150 -> "Unhealthy for Sensitive Groups", 151 -> "Unhealthy",
      200 -> "Unhealthy", 201 -> "Very Unhealthy", 300 -> "Very Unhealthy",
      301 -> "Hazardous", 9999 -> "Hazardous", -500 -> "Unknown")
    val got = cases.map(_._1).toDF("aqi")
      .select($"aqi", aqiCategory($"aqi").as("cat"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    cases.foreach { case (aqi, want) => assert(got(aqi) == want, s"aqi=$aqi") }
  }

  test("occurrences counts non-overlapping literal matches") {
    val s = spark; import s.implicits._
    val got = Seq(" the cat the dog the ").toDF("t")
      .select(occurrences($"t", " the ").as("n")).head().getInt(0)
    // " the cat the dog the " -> matches at 0 and 8 (non-overlapping scan)
    assert(got == 3)
  }

  test("vec_dot matches the built-in higher-order-function dot product") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)((Array.fill(16)(rnd.nextFloat()), Array.fill(16)(rnd.nextFloat())))
    val df = rows.toDF("a", "b")
    val hof = aggregate(
      zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val diffs = df.select(abs(vec_dot($"a", $"b") - hof).as("d"))
      .agg(max($"d")).head().getDouble(0)
    assert(diffs < 1e-12)
  }

  test("wordNGrams yields empty for docs shorter than n") {
    val s = spark; import s.implicits._
    val got = Seq("one two", "a b c d").toDF("t")
      .select(size(wordNGrams(tokens($"t"), 3)).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(0, 2))
  }

  test("word_ngrams_distinct equals array_distinct over the HOF reference") {
    val s = spark; import s.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a a a a a a",                 // heavy duplication
      "one two",                     // shorter than n
      "",                            // empty text
      "x y z x y z x y z"            // repeated grams
    ).toDF("t")
    for (n <- Seq(1, 2, 3, 5)) {
      val rows = docs.select(
        word_ngrams_distinct(tokens($"t"), n).as("fused"),
        array_distinct(wordNGrams(tokens($"t"), n)).as("ref"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"n=$n")
      }
    }
  }

  test("vec_mat_dots is bit-identical to the composed per-row vec_dot array") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(11)
    val mat = Array.fill(16)(Array.fill(64)(rnd.nextFloat() * 2 - 1))
    val df = (0 until 200).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "v")
      .withColumn("nrm", sqrt(vec_dot(col("v"), col("v"))))
    val composed = array(mat.map(row => vec_dot(col("v"), lit(row)) / col("nrm")).toIndexedSeq: _*)
    val rows = df.select(
      vec_mat_dots(col("v"), mat, col("nrm")).as("fused"),
      composed.as("unrolled")).collect()
    rows.foreach { r =>
      // exact double equality — same accumulation order, same division
      assert(r.getSeq[Double](0) == r.getSeq[Double](1))
    }
    // null vector and null divisor both yield null
    val nulls = df.select(
      vec_mat_dots(lit(null).cast("array<float>"), mat, col("nrm")),
      vec_mat_dots(col("v"), mat, lit(null).cast("double"))).collect()
    nulls.foreach { r => assert(r.isNullAt(0) && r.isNullAt(1)) }
  }
}
