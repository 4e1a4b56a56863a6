package graft.aqi

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.aqiCategory

/** source→stage transforms (`source_to_stage.py:47-108`), set-oriented.
  *
  * The reference parses each CSV fully, then filters in pandas; here the
  * glob read + explicit schema lets Spark prune columns at the scan and
  * the whole rename→cast→filter→band→trim chain is one narrow
  * whole-stage-codegen projection — one job per stage table instead of
  * one INSERT per row.
  */
object Staging {

  /** Glob scan over `10_state_aqi_*.csv` (S1/S2) + the full transform
    * chain (P1, P3, P4, P5, P6, P7). Semantic quirks preserved exactly:
    * `measured_date` derives from `created`, NOT the CSV `Date` column
    * (`source_to_stage.py:70`); `aqi_category` from the CSV is discarded
    * and recomputed from `aqi_value` (`:74`); the extraction window is
    * closed on both ends (`:73`).
    */
  def stageAqi(spark: SparkSession, sourceDir: String, lset: Timestamp, cet: Timestamp): DataFrame =
    spark.read
      .option("header", "true")
      .schema(Schemas.aqiRawCsv)
      .csv(s"$sourceDir/10_state_aqi_*.csv")
      .withColumnsRenamed(Map(
        "State Name" -> "state_name",
        "county Name" -> "county_name",
        "State Code" -> "state_code",
        "County Code" -> "county_code",
        "Date" -> "measured_date",
        "AQI" -> "aqi_value",
        "Category" -> "aqi_category",
        "Defining Parameter" -> "defining_parameter",
        "Defining Site" -> "defining_site",
        "Number of Sites Reporting" -> "num_of_sites_reporting",
        "Created" -> "created",
        "Last Updated" -> "last_updated"))
      .withColumn("measured_date", to_date(to_timestamp(col("created"))))
      .withColumn("created", to_timestamp(col("created")))
      .withColumn("last_updated", to_timestamp(col("last_updated")))
      .filter(col("last_updated").between(lit(lset), lit(cet)))
      .withColumn("aqi_category", aqiCategory(col("aqi_value")))
      .withColumn("county_name", trim(col("county_name")))
      .select(Schemas.stateAqiStage.fieldNames.map(col): _*)

  /** uscounties.csv load (S3) + rename (P2) + trim (P7),
    * `source_to_stage.py:88-108`. `county_fips` stays a string.
    */
  def stageCounties(spark: SparkSession, sourceDir: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema(Schemas.countiesRawCsv)
      .csv(s"$sourceDir/uscounties.csv")
      .withColumnsRenamed(Map(
        "county" -> "county_name",
        "county_full" -> "county_fullname",
        "lat" -> "latitude",
        "lng" -> "longitude",
        "population" -> "county_population"))
      .withColumn("county_name", trim(col("county_name")))
      .select(Schemas.usCountiesStage.fieldNames.map(col): _*)
}
