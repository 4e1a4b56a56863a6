package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{rolling_hash, vec_dot}
import graft.plans.GraftFunctions

/** SQL surface for the native expressions: after registration, SQL and
  * Column-API results must be bit-identical (same builders).
  */
class ExtensionsSpec extends AnyFunSuite with SparkTest {

  test("vec_dot and rolling_hash are callable from SQL after registration") {
    val s = spark
    GraftFunctions.register(s)
    import s.implicits._

    val df = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f), "hello world"),
      (2L, Array(0.5f, 0.0f), Array(2.0f, 9.0f), "")
    ).toDF("id", "a", "b", "s")
    df.createOrReplaceTempView("vecs")

    val viaSql = s.sql(
      "SELECT id, vec_dot(a, b) AS dot, rolling_hash(s) AS rh FROM vecs ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val viaCol = df
      .select($"id", vec_dot($"a", $"b").as("dot"), rolling_hash($"s").as("rh"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq

    assert(viaSql == viaCol)
    assert(viaSql.head._2 == (4.0 + 10.0 + 18.0))
  }

  test("rolling_hash accepts a literal base from SQL") {
    val s = spark
    GraftFunctions.register(s)
    val Array(r) = s.sql("SELECT rolling_hash('ab', 31) AS h").collect()
    // h = 'a'*31 + 'b' over UTF-8 bytes
    assert(r.getLong(0) == 97L * 31 + 98)
  }

  test("mixed_hash32 from SQL matches the Column API and stays in [0, 2^32)") {
    val s = spark
    GraftFunctions.register(s)
    import s.implicits._
    val df = Seq("alpha", "beta", "").toDF("s")
    df.createOrReplaceTempView("mh")
    val viaSql = s.sql("SELECT mixed_hash32(s) AS h FROM mh").collect().map(_.getLong(0)).toSeq
    val viaCol = df.select(graft.functions.mixed_hash32($"s").as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql == viaCol)
    assert(viaSql.forall(h => h >= 0 && h < (1L << 32)))
  }
}
