package graft.aqi

import java.nio.file.Files
import java.time.Instant
import java.util.concurrent.Executors

import scala.concurrent.duration._
import scala.concurrent.{Await, ExecutionContext, Future}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.sources.Warehouse

/** Two pipeline runs sharing one SparkSession must not interfere: the
  * NOT-IN / NOT-EXISTS inserts route through `spark.sql` over temp
  * views, which are per-invocation unique (a fixed view name would be
  * session-global state — VERDICT r1). Runs write to separate
  * warehouses; both must land the full, identical NDS result.
  */
class ConcurrentPipelineSpec extends AnyFunSuite with SparkTest {

  private val aqiHeader = "State Name,county Name,State Code,County Code,Date,AQI," +
    "Category,Defining Parameter,Defining Site,Number of Sites Reporting,Created,Last Updated"

  private def writeFixtures(dir: java.nio.file.Path): Unit = {
    val counties = Seq(
      "county,county_ascii,county_full,county_fips,state_id,state_name,lat,lng,population",
      "Hartford,Hartford,Hartford County,09003,CT,Connecticut,41.81,-72.74,899498",
      "Orange,Orange,Orange County,06059,CA,California,33.70,-117.76,3186989")
    Files.writeString(dir.resolve("uscounties.csv"), counties.mkString("\n"))
    val rows = Seq(
      aqiHeader,
      "California,Orange,6,1,1999-01-01,42,Bogus,Ozone,site-a,5,2021-06-15 10:00:00,2021-06-15 12:00:00",
      // county absent from the dim -> exercises the NOT IN insert path
      "California,Mystery County,6,1,1999-01-01,77,Bogus,Ozone,site-b,5,2021-06-16 10:00:00,2021-06-16 12:00:00",
      "Connecticut,Hartford,9,1,1999-01-01,55,Bogus,Ozone,site-c,5,2021-06-17 10:00:00,2021-06-17 12:00:00")
    Files.writeString(dir.resolve("10_state_aqi_2021.csv"), rows.mkString("\n"))
  }

  test("two concurrent Pipeline.run calls on one session produce identical NDS tables") {
    val src = Files.createTempDirectory("aqi-conc-src")
    writeFixtures(src)
    val wh1 = Files.createTempDirectory("aqi-conc-wh1").toString
    val wh2 = Files.createTempDirectory("aqi-conc-wh2").toString
    val now = Instant.parse("2026-01-01T00:00:00Z")

    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      val runs = Future.sequence(Seq(wh1, wh2).map(wh =>
        Future(Pipeline.run(spark, src.toString, wh, now))))
      Await.result(runs, 5.minutes)
    } finally pool.shutdown()

    def countyRows(wh: String): Set[(String, Long)] =
      Warehouse.read(spark, wh, Pipeline.CountyNdsT)
        .select("county_name", "state_id_sk").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    val (c1, c2) = (countyRows(wh1), countyRows(wh2))
    assert(c1 == c2)
    assert(c1.map(_._1).contains("Mystery County")) // NOT-IN insert landed in both
    def measCount(wh: String): Long =
      Warehouse.read(spark, wh, Pipeline.MeasurementNdsT).count()
    assert(measCount(wh1) == 3 && measCount(wh2) == 3)
  }
}
