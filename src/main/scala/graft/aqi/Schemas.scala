package graft.aqi

import org.apache.spark.sql.types._

/** Static schema catalog for the AQI pipeline tables.
  *
  * The reference's only schema authority is the reflected Postgres
  * catalog (`/root/reference/dags/etl/models.py:9-12`, SQLAlchemy
  * automap); this engine owns explicit StructTypes instead (SURVEY §1).
  * `county_fips` is a 5-char zero-padded STRING (e.g. `06037`) and must
  * never be inferred as int.
  */
object Schemas {

  /** Raw EPA "Daily AQI by County" CSV, headers exactly as consumed by
    * the rename map at `source_to_stage.py:55-68`. Date/timestamp
    * columns land as strings and are cast in the transform, mirroring
    * `pd.read_csv` + `pd.to_datetime`.
    */
  val aqiRawCsv: StructType = StructType(Seq(
    StructField("State Name", StringType),
    StructField("county Name", StringType),
    StructField("State Code", IntegerType),
    StructField("County Code", IntegerType),
    StructField("Date", StringType),
    StructField("AQI", IntegerType),
    StructField("Category", StringType),
    StructField("Defining Parameter", StringType),
    StructField("Defining Site", StringType),
    StructField("Number of Sites Reporting", IntegerType),
    StructField("Created", StringType),
    StructField("Last Updated", StringType)))

  /** Raw uscounties.csv (`/root/reference/dags/uscounties.csv:1`). */
  val countiesRawCsv: StructType = StructType(Seq(
    StructField("county", StringType),
    StructField("county_ascii", StringType),
    StructField("county_full", StringType),
    StructField("county_fips", StringType), // zero-padded, NOT int
    StructField("state_id", StringType),
    StructField("state_name", StringType),
    StructField("lat", DoubleType),
    StructField("lng", DoubleType),
    StructField("population", LongType)))

  val stateAqiStage: StructType = StructType(Seq(
    StructField("state_name", StringType),
    StructField("county_name", StringType),
    StructField("state_code", IntegerType),
    StructField("county_code", IntegerType),
    StructField("measured_date", DateType),
    StructField("aqi_value", IntegerType),
    StructField("aqi_category", StringType),
    StructField("defining_parameter", StringType),
    StructField("defining_site", StringType),
    StructField("num_of_sites_reporting", IntegerType),
    StructField("created", TimestampType),
    StructField("last_updated", TimestampType)))

  val usCountiesStage: StructType = StructType(Seq(
    StructField("county_name", StringType),
    StructField("county_ascii", StringType),
    StructField("county_fullname", StringType),
    StructField("county_fips", StringType),
    StructField("state_id", StringType),
    StructField("state_name", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("county_population", LongType)))

  val stateNds: StructType = StructType(Seq(
    StructField("state_id_sk", LongType),
    StructField("state_code", IntegerType),
    StructField("state_name", StringType),
    StructField("state_id", StringType),
    StructField("created_date_nds", TimestampType),
    StructField("last_updated_nds", TimestampType),
    StructField("source_id", IntegerType)))

  val countyNds: StructType = StructType(Seq(
    StructField("county_id_sk", LongType),
    StructField("county_fips", StringType),
    StructField("county_name", StringType),
    StructField("county_fullname", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("county_population", LongType),
    StructField("state_id_sk", LongType),
    StructField("created_date_nds", TimestampType),
    StructField("last_updated_nds", TimestampType),
    StructField("source_id", IntegerType)))

  /** Columns per the MeasurementNDS constructor at
    * `stage_to_nds.py:156-169`; `measurement_id_sk` replaces the
    * DB-generated serial.
    */
  val measurementNds: StructType = StructType(Seq(
    StructField("measurement_id_sk", LongType),
    StructField("measured_date", DateType),
    StructField("aqi_value", IntegerType),
    StructField("aqi_category", StringType),
    StructField("defining_parameter", StringType),
    StructField("defining_site", StringType),
    StructField("num_of_sites_reporting", IntegerType),
    StructField("created", TimestampType),
    StructField("last_updated", TimestampType),
    StructField("county_id_sk", LongType),
    StructField("created_date_nds", TimestampType),
    StructField("last_updated_nds", TimestampType),
    StructField("source_id", IntegerType)))

  /** Watermark control table (`models.py:17`). */
  val metadata: StructType = StructType(Seq(
    StructField("table_name", StringType),
    StructField("cet", TimestampType),
    StructField("lset", TimestampType)))
}
