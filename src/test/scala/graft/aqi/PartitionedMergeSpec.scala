package graft.aqi

import java.nio.file.{Files, Path}
import java.time.Instant

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.sources.Warehouse

/** Partition-scoped fact merges: a second load touching only one date
  * must rewrite only that date's partition, leave other partitions'
  * files physically untouched, and produce the same logical content as
  * the flat merge.
  */
class PartitionedMergeSpec extends AnyFunSuite with SparkTest {

  private val hdr = "State Name,county Name,State Code,County Code,Date,AQI," +
    "Category,Defining Parameter,Defining Site,Number of Sites Reporting,Created,Last Updated"

  private def row(county: String, aqi: Int, site: String, created: String, lu: String) =
    s"California,$county,6,1,1999-01-01,$aqi,Bogus,Ozone,$site,5,$created,$lu"

  private def counties = Seq(
    "county,county_ascii,county_full,county_fips,state_id,state_name,lat,lng,population",
    "Los Angeles,Los Angeles,Los Angeles County,06037,CA,California,34.32,-118.22,10014009",
    "Orange,Orange,Orange County,06059,CA,California,33.70,-117.76,3186989")

  private def listPartition(wh: String, date: String): Map[String, Long] = {
    val dir = new java.io.File(s"$wh/measurement_nds/measured_date=$date")
    assert(dir.isDirectory, s"missing partition dir $dir")
    dir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
  }

  test("second run touching one date rewrites only that partition") {
    val s = spark; import s.implicits._
    val src1 = Files.createTempDirectory("pm-src1")
    val src2 = Files.createTempDirectory("pm-src2")
    val wh = Files.createTempDirectory("pm-wh").toString
    Files.writeString(src1.resolve("uscounties.csv"), counties.mkString("\n"))
    Files.writeString(src2.resolve("uscounties.csv"), counties.mkString("\n"))
    // run 1: two dates (measured_date derives from Created)
    Files.writeString(src1.resolve("10_state_aqi_2021.csv"), (Seq(hdr) ++ Seq(
      row("Los Angeles", 10, "site-a", "2021-06-15 08:00:00", "2021-06-15 09:00:00"),
      row("Orange", 20, "site-b", "2021-06-15 08:00:00", "2021-06-15 09:00:00"),
      row("Los Angeles", 30, "site-c", "2021-07-01 08:00:00", "2021-07-01 09:00:00")
    )).mkString("\n"))
    val now1 = Instant.parse("2026-01-01T00:00:00Z")
    Pipeline.run(spark, src1.toString, wh, now1, partitionedFacts = true)

    val meas1 = Warehouse.read(spark, wh, Pipeline.MeasurementNdsT)
    assert(meas1.count() == 3)
    val juneFiles = listPartition(wh, "2021-06-15")
    val julyFiles = listPartition(wh, "2021-07-01")

    // run 2: only the July business key arrives again (update aqi 30->99);
    // its last_updated must fall inside the new [lset=now1, cet=now2] window
    Files.writeString(src2.resolve("10_state_aqi_2021.csv"), (Seq(hdr) ++ Seq(
      row("Los Angeles", 99, "site-c", "2021-07-01 08:00:00", "2026-01-01 12:00:00")
    )).mkString("\n"))
    Thread.sleep(1100) // ensure mtime resolution can't mask a rewrite
    val now2 = Instant.parse("2026-01-02T00:00:00Z")
    Pipeline.run(spark, src2.toString, wh, now2, partitionedFacts = true)

    val meas2 = Warehouse.read(spark, wh, Pipeline.MeasurementNdsT)
    assert(meas2.count() == 3) // update, not insert
    val updated = meas2.filter($"defining_site" === "site-c").head()
    assert(updated.getAs[Int]("aqi_value") == 99)
    assert(updated.getAs[java.sql.Timestamp]("last_updated_nds") ==
      java.sql.Timestamp.from(now2))
    // untouched June rows intact, same audit stamps
    assert(meas2.filter($"measured_date" === lit("2021-06-15").cast("date"))
      .filter($"last_updated_nds" === lit(java.sql.Timestamp.from(now1))).count() == 2)
    // physical check: June partition files identical, July rewritten
    assert(listPartition(wh, "2021-06-15") == juneFiles,
      "June partition was rewritten but only July data arrived")
    assert(listPartition(wh, "2021-07-01") != julyFiles,
      "July partition should have been rewritten")
  }

  test("partitioned and flat merges produce identical logical content") {
    val s = spark
    val src = Files.createTempDirectory("pm-src3")
    val whFlat = Files.createTempDirectory("pm-whf").toString
    val whPart = Files.createTempDirectory("pm-whp").toString
    Files.writeString(src.resolve("uscounties.csv"), counties.mkString("\n"))
    Files.writeString(src.resolve("10_state_aqi_2021.csv"), (Seq(hdr) ++ Seq(
      row("Los Angeles", 10, "site-a", "2021-06-15 08:00:00", "2021-06-15 09:00:00"),
      row("Orange", 20, "site-b", "2021-06-16 08:00:00", "2021-06-16 09:00:00"),
      row("Orange", 25, "site-b", "2021-06-16 08:00:00", "2021-06-16 10:00:00") // dup key
    )).mkString("\n"))
    val now = Instant.parse("2026-01-01T00:00:00Z")
    Pipeline.run(spark, src.toString, whFlat, now, partitionedFacts = false)
    Pipeline.run(spark, src.toString, whPart, now, partitionedFacts = true)
    val cols = Schemas.measurementNds.fieldNames.toSeq
    def content(wh: String) =
      Warehouse.read(spark, wh, Pipeline.MeasurementNdsT)
        .select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
    assert(content(whFlat) == content(whPart))
  }
}
