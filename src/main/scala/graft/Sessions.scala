package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's standard configuration.
  *
  * All timestamps are UTC (the reference's watermarks are tz-aware UTC,
  * see `/root/reference/dags/etl/source_to_stage.py:12`); shuffle
  * partitions sized for local[32] rather than the 200 default; AQE on so
  * skewed shuffles re-plan at runtime on a real cluster.
  */
object Sessions {
  def local(appName: String = "graft", cores: String = "*"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", "32")
      // the full extension ladder (native SQL functions, the broadcast
      // as-of strategy, the MV-rewrite and levenshtein-prefilter
      // optimizer rules) rides the config-driven path — exactly how a
      // cluster deploy would enable it
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-spark-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
