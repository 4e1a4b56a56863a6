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

  /** The AQI transform chain (P1, P3, P4, P6, P7) without the extraction
    * window — shared by the batch and streaming staging paths. Semantic
    * quirks preserved exactly: `measured_date` derives from `created`,
    * NOT the CSV `Date` column (`source_to_stage.py:70`); `aqi_category`
    * from the CSV is discarded and recomputed from `aqi_value` (`:74`).
    * Pure narrow projections, so it applies unchanged to a streaming
    * DataFrame.
    */
  def aqiTransform(raw: DataFrame): DataFrame =
    raw
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
      .withColumn("aqi_category", aqiCategory(col("aqi_value")))
      .withColumn("county_name", trim(col("county_name")))
      .select(Schemas.stateAqiStage.fieldNames.map(col): _*)

  /** Glob scan over `10_state_aqi_*.csv` (S1/S2) + [[aqiTransform]] +
    * the CET/LSET extraction window (P5) — closed on both ends
    * (`source_to_stage.py:73`).
    */
  def stageAqi(spark: SparkSession, sourceDir: String, lset: Timestamp, cet: Timestamp): DataFrame =
    aqiTransform(
      spark.read
        .option("header", "true")
        .schema(Schemas.aqiRawCsv)
        .csv(s"$sourceDir/10_state_aqi_*.csv"))
      .filter(col("last_updated").between(lit(lset), lit(cet)))

  /** Streaming staging: the same transform chain over a file-source
    * stream of the AQI CSV directory, appended to a parquet stage table.
    * The checkpoint's file tracking replaces the CET/LSET window — each
    * source file is processed exactly once across restarts, which is the
    * guarantee the batch watermark protocol approximates with
    * at-least-once redelivery. Run with `Trigger.AvailableNow` for a
    * drain-and-stop micro-batch load, or a processing-time trigger for
    * continuous ingest.
    */
  def stageAqiStream(
      spark: SparkSession,
      sourceDir: String,
      outPath: String,
      checkpointPath: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow()): org.apache.spark.sql.streaming.StreamingQuery =
    aqiTransform(
      spark.readStream
        .option("header", "true")
        .schema(Schemas.aqiRawCsv)
        .csv(s"$sourceDir/10_state_aqi_*.csv"))
      .writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpointPath)
      .trigger(trigger)
      .start()

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
