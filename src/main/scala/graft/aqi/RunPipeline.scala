package graft.aqi

import graft.Sessions

/** CLI entry point: run one pipeline pass (the engine equivalent of one
  * DAG run) over a source directory of CSVs into a parquet warehouse.
  *
  * Usage: runMain graft.aqi.RunPipeline <sourceDir> <warehouseDir> [--partitioned]
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    val sourceDir = args(0)
    val warehouseDir = args(1)
    val partitioned = args.contains("--partitioned")
    val spark = Sessions.local("aqi-pipeline")
    Pipeline.run(spark, sourceDir, warehouseDir, partitionedFacts = partitioned)
    Seq(Pipeline.StateAqiStage, Pipeline.UsCountiesStage, Pipeline.StateNdsT,
      Pipeline.CountyNdsT, Pipeline.MeasurementNdsT).foreach { t =>
      val n = graft.sources.Warehouse.read(spark, warehouseDir, t).count()
      println(s"[pipeline] $t: $n rows")
    }
    spark.stop()
  }
}
