package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.mixed_hash32

/** DataFrame-shaped sketches (the `Aggregator`-shaped ones — KMV,
  * Misra-Gries, Count-Min — live in `graft.functions`).
  */
object Sketches {

  /** HyperLogLog register table per group: `reg = h % m`, `rho` =
    * leading-zero count of the remaining hash bits + 1, `max_rho` = max
    * per register. The register table IS the HLL sketch — exactly `≤ m`
    * rows per group regardless of cardinality, and MERGEABLE: the
    * sketch of a union is the elementwise register max (proven in
    * SamplingSketchSpec), which is how partial sketches from map tasks,
    * days, or shards combine. Duplicate keys are absorbed by the max —
    * no distinct pass needed.
    *
    * The float estimate (`α·m²/Σ2^(−rho)`) deliberately stays OUT of
    * this output so the table is integer-exact and engine-portable; the
    * spec computes it driver-side and checks the error band. The hash
    * is the same rolling-hash → MixHash32 avalanche pipeline as the KMV
    * sketch, replayable in SQL ([[graft.OracleSql.hllRegisters]]).
    *
    * Shape at 100 TB: one combinable aggregation — map-side partial
    * max per (group, reg) caps every map task's output at m rows per
    * group, so the shuffle carries sketches, not data. This is the
    * distinct-count shape when KMV's k-th-order statistic is too big:
    * HLL state is m bytes vs KMV's k hashes.
    */
  def hllRegisters(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      m: Int = 64): DataFrame = {
    require(m > 0 && (m & (m - 1)) == 0, "m must be a power of two")
    val restBits = 32 - Integer.numberOfTrailingZeros(m)
    val h32 = mixed_hash32(
      concat_ws(":", lit("hll"), col(keyCol).cast("string")))
    df.select(col(groupCol), h32.as("h"))
      .withColumn("reg", expr(s"h % $m"))
      .withColumn("rest", expr(s"h div $m"))
      .withColumn("rho",
        expr(s"${restBits + 1} - ${graft.OracleSql.bitLenSum("rest", restBits)}"))
      .groupBy(col(groupCol), col("reg"))
      .agg(max(col("rho")).cast("int").as("max_rho"))
  }

  /** Roll an HLL register table up a dimension hierarchy: re-key each
    * group through `mapping` (`fromCol` → `toCol`, e.g. nation →
    * region) and take the elementwise register max. Because HLL union
    * IS the register max and max is associative, the rolled-up table
    * is BIT-IDENTICAL to a sketch built directly at the coarse level —
    * the property that lets a 100 TB job sketch at the finest grain
    * once and serve every coarser rollup from sketch-sized inputs
    * (the `sketch_hll_rollup` oracle proves the identity cross-engine:
    * DuckDB rebuilds at region level, Spark merges nation sketches).
    *
    * `mapping` must be unique on `fromCol` (a hierarchy, not a graph);
    * it broadcasts — dimension-sized by construction.
    */
  def hllMergeRegisters(
      registers: DataFrame,
      mapping: DataFrame,
      fromCol: String,
      toCol: String): DataFrame =
    registers
      .join(broadcast(mapping.select(col(fromCol), col(toCol))), fromCol)
      .groupBy(col(toCol), col("reg"))
      .agg(max(col("max_rho")).cast("int").as("max_rho"))
}
