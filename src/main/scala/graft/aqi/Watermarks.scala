package graft.aqi

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Row, SparkSession}

import graft.sources.Warehouse

/** CET/LSET watermark manager — the reference's `metadata` table
  * protocol (`source_to_stage.py:9-26,37-45`): CET (Current Extraction
  * Time) is stamped before a stage load, LSET (Last Successful
  * Extraction Time) only after the load commits, so a failed run
  * re-extracts the same closed window on retry (at-least-once,
  * SURVEY §2.6 O3). Stored as a single small parquet table.
  */
object Watermarks {

  val TableName = "metadata"

  /** The epoch default gives a full-history window on first run. */
  private val epoch = Timestamp.from(Instant.EPOCH)

  private def readAll(spark: SparkSession, dir: String) =
    Warehouse.readOrEmpty(spark, dir, TableName, Schemas.metadata)

  /** Read (cet, lset) for a staged table, bootstrapping a row if absent. */
  def getWindow(spark: SparkSession, dir: String, table: String): (Timestamp, Timestamp) = {
    val rows = readAll(spark, dir)
      .filter(col("table_name") === table)
      .collect()
    rows.headOption match {
      case Some(r) =>
        (Option(r.getAs[Timestamp]("cet")).getOrElse(epoch),
          Option(r.getAs[Timestamp]("lset")).getOrElse(epoch))
      case None => (epoch, epoch)
    }
  }

  private def setColumn(
      spark: SparkSession, dir: String, table: String,
      colName: String, value: Timestamp): Unit = {
    val current = readAll(spark, dir)
    val others = current.filter(col("table_name") =!= table).collect().toSeq
    val existing = current.filter(col("table_name") === table).collect().headOption
    val updated = existing match {
      case Some(r) =>
        if (colName == "cet") Row(table, value, r.getAs[Timestamp]("lset"))
        else Row(table, r.getAs[Timestamp]("cet"), value)
      case None =>
        if (colName == "cet") Row(table, value, null) else Row(table, null, value)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(others :+ updated, 1), Schemas.metadata)
    Warehouse.overwrite(df, dir, TableName)
  }

  def setCet(spark: SparkSession, dir: String, table: String, now: Timestamp): Unit =
    setColumn(spark, dir, table, "cet", now)

  def setLset(spark: SparkSession, dir: String, table: String, now: Timestamp): Unit =
    setColumn(spark, dir, table, "lset", now)
}
