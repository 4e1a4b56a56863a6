package graft.aqi

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** The two surrogate-assignment paths (global window for small inserts,
  * range-repartition + zipWithIndex above [[Nds.SurrogateWindowMax]])
  * must produce the same contract: dense keys continuing from the
  * current max, assigned in order-key order.
  */
class SurrogateSpec extends AnyFunSuite with SparkTest {

  private def checkDenseOrdered(n: Int, priorMax: Long): Unit = {
    val s = spark; import s.implicits._
    val existing = (1L to priorMax).map(i => (Some(i), f"zzz$i%08d"))
    val inserted = (0 until n).map(i => (None: Option[Long], f"key$i%08d"))
    val df = s.createDataset(existing ++ inserted).toDF("sk", "k")
    val out = Nds.fillSurrogate(df, "sk", Seq("k"))
      .filter(col("k").startsWith("key"))
      .select("k", "sk").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    assert(out.length == n)
    // dense, continuing from priorMax, in key order
    assert(out.map(_._2).toSeq == (priorMax + 1 to priorMax + n).toSeq)
  }

  test("window path: dense ordered keys continuing from max") {
    checkDenseOrdered(1000, priorMax = 7)
  }

  test("zipWithIndex path: dense ordered keys continuing from max") {
    assert(Nds.SurrogateWindowMax < 150000,
      "test sized to exceed the window threshold")
    checkDenseOrdered(150000, priorMax = 3)
  }
}
