package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the testdata star schema.
  *
  * Timestamp physical types vary by testdata generation era and must
  * all surface as session-zoned TIMESTAMP (the engine's contract —
  * all timestamps are UTC, `Sessions.local` pins the session zone):
  *
  *   - TIMESTAMP(NANOS) is rejected by the vectorized reader; read
  *     nanos as long (`spark.sql.legacy.parquet.nanosAsLong`) and
  *     convert by exact integer division (`div 1000` — floor, the
  *     same truncation nanosecond timestamps get elsewhere; a double
  *     cast would lose precision above 2^53 ns);
  *   - TIMESTAMP(MICROS) without `isAdjustedToUTC` reads as
  *     TIMESTAMP_NTZ; cast to TIMESTAMP, which under the UTC session
  *     zone maps the naive value to the same instant the tz-aware
  *     eras carry. Without the cast, half the temporal surface
  *     (`unix_micros`, interval arithmetic, tumbling windows) fails
  *     to resolve, and rendered timestamps format differently.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    raw.schema.fields.foldLeft(raw) { (df, f) =>
      f.dataType match {
        case LongType if f.name == "ts" =>
          df.withColumn(f.name, timestamp_micros(expr(s"${f.name} div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn(f.name, col(f.name).cast("timestamp"))
        case _ => df
      }
    }
  }

  /** Schema-evolved read: present a parquet directory whose FILES were
    * written under different schema versions as one table with the
    * CURRENT `target` schema. The long-lived-pipeline reality: a 100 TB
    * table's oldest files predate every column added since, and
    * rewriting history per schema change is exactly what a warehouse
    * must never do.
    *
    *   - columns missing from old files surface as typed NULLs;
    *   - columns dropped from `target` disappear (pruned at the scan);
    *   - physical types may differ per era only along SAFE widenings
    *     (`Cast.canUpCast`: int→long, float→double, …) — a narrowing
    *     (long→int) throws instead of silently truncating history.
    *
    * Reads with `mergeSchema` so every era's footer contributes its
    * columns, then projects to `target` column-by-column.
    */
  def readEvolved(
      spark: SparkSession,
      path: String,
      target: org.apache.spark.sql.types.StructType): DataFrame = {
    val raw = spark.read.option("mergeSchema", "true").parquet(path)
    val have = raw.schema.fields.map(f => f.name -> f.dataType).toMap
    val cols = target.fields.map { f =>
      have.get(f.name) match {
        case None => lit(null).cast(f.dataType).as(f.name)
        case Some(dt) if dt == f.dataType => col(f.name)
        case Some(dt)
            if org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(dt, f.dataType) =>
          col(f.name).cast(f.dataType).as(f.name)
        case Some(dt) =>
          throw new IllegalArgumentException(
            s"readEvolved: column ${f.name} cannot safely widen from " +
              s"${dt.catalogString} to ${f.dataType.catalogString}")
      }
    }
    raw.select(cols.toSeq: _*)
  }
}
