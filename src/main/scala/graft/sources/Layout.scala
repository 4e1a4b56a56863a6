package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical layout control for the 100 TB path: bucketing and
  * partitioned writes.
  *
  * Two co-bucketed tables joined on their bucket keys produce a
  * sort-merge join with NO Exchange on either side — the shuffle is
  * paid once at write time and amortized over every subsequent join.
  * That is the difference between re-shuffling 100 TB per query and
  * reading co-located buckets. Date/low-cardinality dimensions go to
  * directory partitioning (`partitionBy`) so partition pruning skips
  * files at the scan.
  */
object Layout {

  /** Write a bucketed + in-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int, keys: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Write a directory-partitioned parquet table (partition pruning). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
