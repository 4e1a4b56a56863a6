package graft.aqi

import java.nio.file.{Files, Path}
import java.time.Instant

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.sources.Warehouse

/** End-to-end run of the reference-shaped pipeline on a synthesized
  * fixture (FIXTURES.md §A): band edges, whitespace county names, the
  * Windham two-state case, a county missing from the dim, duplicate
  * measurement business keys, bogus CSV Date/Category columns that must
  * be overwritten.
  */
class AqiPipelineSpec extends AnyFunSuite with SparkTest {

  private val aqiHeader = "State Name,county Name,State Code,County Code,Date,AQI," +
    "Category,Defining Parameter,Defining Site,Number of Sites Reporting,Created,Last Updated"

  private def aqiRow(state: String, county: String, code: Int, aqi: Int,
      site: String, created: String, param: String = "Ozone"): String =
    s"""$state,$county,$code,1,1999-01-01,$aqi,Bogus,$param,$site,5,$created 10:00:00,$created 12:00:00"""

  private def writeFixtures(dir: Path): Unit = {
    val counties = Seq(
      "county,county_ascii,county_full,county_fips,state_id,state_name,lat,lng,population",
      "Windham,Windham,Windham County,09015,CT,Connecticut,41.83,-71.98,116418",
      "Hartford,Hartford,Hartford County,09003,CT,Connecticut,41.81,-72.74,899498",
      "Los Angeles,Los Angeles,Los Angeles County,06037,CA,California,34.32,-118.22,10014009",
      "Orange,Orange,Orange County,06059,CA,California,33.70,-117.76,3186989")
    Files.writeString(dir.resolve("uscounties.csv"), counties.mkString("\n"))

    val bandEdges = Seq(-5, 0, 50, 51, 100, 101, 150, 151, 200, 201, 300, 301)
    val bandRows = bandEdges.zipWithIndex.map { case (aqi, i) =>
      aqiRow("California", "Los Angeles", 6, aqi, s"site-$i", "2021-06-15")
    }
    val rows = Seq(aqiHeader) ++ bandRows ++ Seq(
      aqiRow("Connecticut", "  Windham  ", 9, 42, "site-ct", "2021-07-01"), // whitespace
      aqiRow("Vermont", "Windham", 50, 55, "site-vt", "2021-07-02"), // Windham patch case
      aqiRow("California", "Mystery County", 6, 77, "site-my", "2021-07-03"), // NOT-IN insert
      // duplicate business key (same date+param+site), different AQI:
      aqiRow("California", "Orange", 6, 10, "site-dup", "2021-07-04"),
      aqiRow("California", "Orange", 6, 20, "site-dup", "2021-07-04"))
    Files.writeString(dir.resolve("10_state_aqi_2021.csv"), rows.mkString("\n"))
  }

  test("full pipeline run: staging quirks, NDS merges, anti-join inserts, dedup") {
    val s = spark; import s.implicits._
    val src = Files.createTempDirectory("aqi-src")
    val wh = Files.createTempDirectory("aqi-wh").toString
    writeFixtures(src)
    val now1 = Instant.parse("2026-01-01T00:00:00Z")
    Pipeline.run(spark, src.toString, wh, now1)

    // —— staging quirks ——
    val stage = Warehouse.read(spark, wh, Pipeline.StateAqiStage)
    assert(stage.count() == 17)
    // measured_date derives from Created, NOT the bogus CSV Date column
    assert(stage.filter($"measured_date" === lit("1999-01-01").cast("date")).count() == 0)
    val ct = stage.filter($"defining_site" === "site-ct").head()
    assert(ct.getAs[String]("county_name") == "Windham") // trimmed
    assert(ct.getAs[java.sql.Date]("measured_date").toString == "2021-07-01")
    // Category recomputed from aqi_value, never "Bogus"
    assert(stage.filter($"aqi_category" === "Bogus").count() == 0)
    val cats = stage.filter($"state_name" === "California" && $"defining_parameter" === "Ozone")
      .select("aqi_value", "aqi_category").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(cats(-5) == "Unknown" && cats(50) == "Good" && cats(51) == "Moderate" &&
      cats(150) == "Unhealthy for Sensitive Groups" && cats(301) == "Hazardous")

    // —— state_nds: full-outer state universe + dense surrogates ——
    val states = Warehouse.read(spark, wh, Pipeline.StateNdsT)
    val stateRows = states.collect().map(r =>
      r.getAs[String]("state_name") ->
        (r.getAs[Long]("state_id_sk"), r.getAs[Integer]("state_code"),
          r.getAs[String]("state_id"))).toMap
    assert(stateRows.keySet == Set("California", "Connecticut", "Vermont"))
    assert(stateRows("California") == ((1L, 6, "CA"))) // both sources
    assert(stateRows("Vermont")._3 == null) // AQI-only state: no state_id
    assert(stateRows.values.map(_._1).toSet == Set(1L, 2L, 3L))

    // —— county_nds: dim + NOT-IN insert + Windham patch ——
    val counties = Warehouse.read(spark, wh, Pipeline.CountyNdsT)
    assert(counties.count() == 6) // 4 dim + Mystery County + Windham/VT
    val mystery = counties.filter($"county_name" === "Mystery County").collect()
    assert(mystery.length == 1 && mystery.head.getAs[String]("county_fips") == null)
    assert(mystery.head.getAs[Long]("state_id_sk") == stateRows("California")._1)
    val windhams = counties.filter($"county_name" === "Windham").collect()
    assert(windhams.length == 2) // CT (dim) + VT (patch insert)
    val vtWindham = windhams.filter(_.getAs[String]("county_fips") == null)
    assert(vtWindham.length == 1 &&
      vtWindham.head.getAs[Long]("state_id_sk") == stateRows("Vermont")._1)

    // —— measurement_nds: join + dedup on business key ——
    val meas = Warehouse.read(spark, wh, Pipeline.MeasurementNdsT)
    assert(meas.count() == 16) // 17 staged - 1 duplicate business key
    val dup = meas.filter($"defining_site" === "site-dup").collect()
    assert(dup.length == 1 && dup.head.getAs[Int]("aqi_value") == 10) // keep-first survivor
    assert(meas.filter($"aqi_category" === "Bogus").count() == 0)

    // —— second run: idempotency under at-least-once redelivery ——
    val now2 = Instant.parse("2026-01-02T00:00:00Z")
    Pipeline.run(spark, src.toString, wh, now2)
    // window [lset=now1, cet=now2] excludes all 2021 rows -> empty stage
    assert(Warehouse.read(spark, wh, Pipeline.StateAqiStage).count() == 0)
    val meas2 = Warehouse.read(spark, wh, Pipeline.MeasurementNdsT)
    assert(meas2.count() == 16) // unchanged
    assert(meas2.filter($"last_updated_nds" =!= lit(java.sql.Timestamp.from(now1))).count() == 0)
    // counties dim still reloads fully: matched counties get refreshed audit
    val counties2 = Warehouse.read(spark, wh, Pipeline.CountyNdsT)
    assert(counties2.count() == 6)
    val hartford = counties2.filter($"county_name" === "Hartford").head()
    assert(hartford.getAs[java.sql.Timestamp]("last_updated_nds") ==
      java.sql.Timestamp.from(now2))
    assert(hartford.getAs[java.sql.Timestamp]("created_date_nds") ==
      java.sql.Timestamp.from(now1))
  }
}
