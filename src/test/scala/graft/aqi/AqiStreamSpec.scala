package graft.aqi

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.sources.Warehouse

/** Streaming staging (file-source → aqiTransform → parquet sink) and
  * warehouse crash-safety.
  */
class AqiStreamSpec extends AnyFunSuite with SparkTest {

  private val header = "State Name,county Name,State Code,County Code,Date,AQI," +
    "Category,Defining Parameter,Defining Site,Number of Sites Reporting,Created,Last Updated"

  private def aqiRow(county: String, aqi: Int, site: String): String =
    s"California,$county,6,1,1999-01-01,$aqi,Bogus,Ozone,$site,5,2021-06-15 10:00:00,2021-06-15 12:00:00"

  private def writeFile(dir: Path, name: String, rows: Seq[String]): Unit =
    Files.writeString(dir.resolve(name), (header +: rows).mkString("\n"))

  test("streaming staging processes each source file exactly once across restarts") {
    val s = spark
    val src = Files.createTempDirectory("aqi-stream-src")
    val out = Files.createTempDirectory("aqi-stream-out").toString + "/stage"
    val cp = Files.createTempDirectory("aqi-stream-cp").toString

    writeFile(src, "10_state_aqi_2021.csv", Seq(aqiRow(" Alpha ", 42, "s1"), aqiRow("Beta", 205, "s2")))
    val q1 = Staging.stageAqiStream(s, src.toString, out, cp)
    q1.awaitTermination()

    val first = s.read.parquet(out)
    assert(first.count() == 2)
    // transform chain applied: trim, recomputed banding, date from Created
    val alpha = first.filter(col("defining_site") === "s1").head()
    assert(alpha.getAs[String]("county_name") == "Alpha")
    assert(alpha.getAs[String]("aqi_category") == "Good")
    assert(alpha.getAs[java.sql.Date]("measured_date").toString == "2021-06-15")
    assert(first.filter(col("aqi_category") === "Bogus").count() == 0)

    // restart with a new file: only the new file's rows are appended
    writeFile(src, "10_state_aqi_2022.csv", Seq(aqiRow("Gamma", 301, "s3")))
    val q2 = Staging.stageAqiStream(s, src.toString, out, cp)
    q2.awaitTermination()
    val second = s.read.parquet(out)
    assert(second.count() == 3)
    assert(second.filter(col("defining_site") === "s1").count() == 1) // not reprocessed
    assert(second.filter(col("county_name") === "Gamma").head()
      .getAs[String]("aqi_category") == "Hazardous") // 301 is past the 201-300 band
  }

  test("a failed overwrite leaves the live table untouched") {
    val s = spark; import s.implicits._
    val wh = Files.createTempDirectory("aqi-wh-crash").toString
    Warehouse.overwrite(Seq((1L, "v1")).toDF("id", "v"), wh, "t")

    val poisoned = Seq((2L, "v2")).toDF("id", "v")
      .withColumn("v", when(col("id") === 2L,
        raise_error(lit("boom"))).otherwise(col("v")))
    intercept[Exception] { Warehouse.overwrite(poisoned, wh, "t") }

    val live = Warehouse.read(s, wh, "t").collect()
    assert(live.length == 1 && live.head.getString(1) == "v1")
  }

  test("a crash between the two swap renames self-heals on next access") {
    val s = spark; import s.implicits._
    val wh = Files.createTempDirectory("aqi-wh-swap").toString
    Warehouse.overwrite(Seq((1L, "v1")).toDF("id", "v"), wh, "t")
    // simulate the crash window: live has been renamed to .old, the new
    // tmp never made it to live (and may be partial — it must NOT win)
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$wh/t"),
      new org.apache.hadoop.fs.Path(s"$wh/t.old")))
    Files.createDirectory(java.nio.file.Path.of(wh, "t.tmp"))
    Files.writeString(java.nio.file.Path.of(wh, "t.tmp", "part-00000"), "partial")

    val healed = Warehouse.read(s, wh, "t").collect()
    assert(healed.length == 1 && healed.head.getString(1) == "v1")
    // a subsequent overwrite proceeds normally from the healed state
    Warehouse.overwrite(Seq((2L, "v2")).toDF("id", "v"), wh, "t")
    val next = Warehouse.read(s, wh, "t").collect()
    assert(next.length == 1 && next.head.getString(1) == "v2")
  }
}
