package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The flat-vs-partitioned fact-merge crossover at 5M rows, as a
  * regression-tracked bench row instead of BASELINE.md prose.
  *
  * Claim under test (BASELINE.md): at 1M rows the flat full-table
  * rewrite still wins on wall-clock (per-partition file overhead
  * dominates small partitions); by 5M rows the partition-scoped merge
  * — read + rewrite ONLY the ~3 of 80 month partitions the delta
  * touches — already beats it, and the gap tracks the rewritten-rows
  * ratio as partitions grow toward GB size. That crossover is the
  * whole 100 TB layout story, so Bench times both layouts' delta
  * merges once per round and publishes them beside the suite.
  *
  * Mechanics: a deterministic 5M-row fact table (month = id mod 80) is
  * materialized ONCE per machine under target/ (content marker = row
  * count) in both layouts; the timed section is the delta merge only —
  * a restatement of the last 3 months (absolute values derived from
  * the synthetic base, so re-merging is idempotent and every round
  * times the same work) plus one insert per restated order (negated
  * key; a same-value match from the second round on).
  */
object MergeCrossoverBench {

  private val Rows = 5000000L
  private val Months = 80

  /** Standalone entry for focused runs; Bench calls [[run]] inline. */
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local("merge5m", cpus)
    val (flatSec, partSec, rewritten) = run(spark)
    println(f"""{"metric":"merge5m","flat_delta_sec":$flatSec%.3f,"partitioned_delta_sec":$partSec%.3f,"rows_rewritten":$rewritten}""")
    spark.stop()
  }

  private def baseDf(spark: SparkSession): DataFrame =
    spark.range(Rows).select(
      col("id").as("o_orderkey"),
      (col("id") % 100000L).as("o_custkey"),
      (col("id") % 9973L).cast("double").as("o_totalprice"),
      date_format(add_months(to_date(lit("2018-01-01")),
        (col("id") % Months).cast("int")), "yyyy-MM").as("o_month"))

  /** @return (flat_delta_sec, partitioned_delta_sec, rows_rewritten) */
  def run(spark: SparkSession): (Double, Double, Long) = {
    import graft.operators.{Merge, MergeSpec}
    import graft.sources.{Layout, Warehouse}
    val dir = new java.io.File("target/graft_wh/merge5m").getAbsolutePath
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val marker = java.nio.file.Paths.get(dir, "base_rows")
    val fresh = java.nio.file.Files.exists(marker) &&
      java.nio.file.Files.readString(marker).trim == Rows.toString &&
      Warehouse.exists(spark, dir, "m5_flat") &&
      Warehouse.exists(spark, dir, "m5_part")
    if (!fresh) {
      val base = baseDf(spark)
      Warehouse.overwrite(base, dir, "m5_flat")
      Layout.writePartitioned(base, s"$dir/m5_part", Seq("o_month"))
      java.nio.file.Files.writeString(marker, Rows.toString)
    }

    // the delta: last 3 months restated (values from the synthetic
    // base — idempotent) + one new row per restated order
    val upd = baseDf(spark).filter(col("o_orderkey") % Months >= Months - 3)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    val delta = upd.unionByName(
      upd.withColumn("o_orderkey", -col("o_orderkey") - 1))
    val spec = MergeSpec(Seq("o_orderkey"), Seq("o_totalprice"))
    val now = to_timestamp(lit("2024-06-01 00:00:00"))

    def timed(f: => Unit): Double = {
      val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
    }
    val flatSec = timed {
      val tgt = Warehouse.read(spark, dir, "m5_flat")
      val merged = Merge.scd1(tgt, delta, spec, now)
        .select(tgt.columns.map(col).toIndexedSeq: _*)
      Warehouse.overwrite(merged, dir, "m5_flat")
    }
    val partSec = timed {
      Merge.scd1PartitionScoped(spark, dir, "m5_part", "o_month", delta, spec, now)
    }
    // layouts must agree — the crossover is only meaningful if both
    // merges produced the same table
    val nFlat = Warehouse.read(spark, dir, "m5_flat").count()
    val nPart = Warehouse.read(spark, dir, "m5_part").count()
    require(nFlat == nPart, s"layouts disagree: flat=$nFlat partitioned=$nPart")
    val rewritten = Warehouse.read(spark, dir, "m5_part")
      .join(delta.select("o_month").distinct(), Seq("o_month"), "left_semi")
      .count()
    (flatSec, partSec, rewritten)
  }
}
