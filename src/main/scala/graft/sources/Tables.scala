package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the testdata star schema.
  *
  * `events.parquet` stores `ts` as Parquet TIMESTAMP(NANOS), which the
  * vectorized reader rejects; we read nanos as long
  * (`spark.sql.legacy.parquet.nanosAsLong`) and convert with exact
  * integer division (`div 1000`) — floor semantics, matching how
  * nanosecond timestamps truncate to microseconds elsewhere. A
  * double-division cast would lose precision above 2^53 ns.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    raw.schema.fields.foldLeft(raw) { (df, f) =>
      if (f.dataType == LongType && f.name == "ts")
        df.withColumn(f.name, timestamp_micros(expr(s"${f.name} div 1000")))
      else df
    }
  }
}
