package graft.aqi

import java.nio.file.{Files, Path}
import java.security.MessageDigest
import java.time.Instant

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.sources.Warehouse

/** Golden outputs (SURVEY §5.5): the full pipeline on the canonical
  * fixture must reproduce pinned row counts and content hashes of the
  * three NDS tables, bit for bit. Audit timestamps are excluded (they
  * carry the run time); everything else — including surrogate keys,
  * which are deterministic by design — is hashed over canonically
  * sorted, canonically formatted rows.
  *
  * If an intentional semantic change moves a hash, re-pin it in the
  * same commit and say why in the commit message.
  */
class GoldenSpec extends AnyFunSuite with SparkTest {

  // same fixture shape as AqiPipelineSpec, duplicated deliberately: the
  // golden test must not drift when the other spec's fixture evolves
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
      aqiRow("Connecticut", "  Windham  ", 9, 42, "site-ct", "2021-07-01"),
      aqiRow("Vermont", "Windham", 50, 55, "site-vt", "2021-07-02"),
      aqiRow("California", "Mystery County", 6, 77, "site-my", "2021-07-03"),
      aqiRow("California", "Orange", 6, 10, "site-dup", "2021-07-04"),
      aqiRow("California", "Orange", 6, 20, "site-dup", "2021-07-04"))
    Files.writeString(dir.resolve("10_state_aqi_2021.csv"), rows.mkString("\n"))
  }

  private def canonicalHash(df: DataFrame, dropCols: Seq[String]): String = {
    val kept = df.drop(dropCols: _*)
    val cols = kept.columns.sorted
    val lines = kept.select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq.map {
        case null => "NULL"
        case d: java.lang.Double => if (d == d.longValue()) d.longValue().toString else d.toString
        case v => v.toString
      }.mkString(""))
      .sorted
    val md = MessageDigest.getInstance("MD5")
    lines.foreach(l => md.update((l + "\n").getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  test("NDS tables hash-match the pinned golden outputs") {
    val src = Files.createTempDirectory("aqi-golden-src")
    val wh = Files.createTempDirectory("aqi-golden-wh").toString
    writeFixtures(src)
    Pipeline.run(spark, src.toString, wh, Instant.parse("2026-01-01T00:00:00Z"))

    val audit = Seq("created_date_nds", "last_updated_nds", "last_updated", "created")
    val states = Warehouse.read(spark, wh, Pipeline.StateNdsT)
    val counties = Warehouse.read(spark, wh, Pipeline.CountyNdsT)
    val measurements = Warehouse.read(spark, wh, Pipeline.MeasurementNdsT)

    assert(states.count() == 3)
    assert(counties.count() == 6)
    assert(measurements.count() == 16)

    val gotS = canonicalHash(states, audit)
    val gotC = canonicalHash(counties, audit)
    val gotM = canonicalHash(measurements, audit)
    info(s"hashes: S=$gotS C=$gotC M=$gotM")
    val pinned = Map(
      "state_nds" -> "7222833626dbd767fca394fc3b36d3ba",
      "county_nds" -> "31c0990d8027860473baf332c74ffd69",
      "measurement_nds" -> "581b43d7da8d3e16cc0901d17fe293c0")
    assert(gotS == pinned("state_nds"), s"state_nds hash drifted: $gotS")
    assert(gotC == pinned("county_nds"), s"county_nds hash drifted: $gotC")
    assert(gotM == pinned("measurement_nds"), s"measurement_nds hash drifted: $gotM")
  }
}
