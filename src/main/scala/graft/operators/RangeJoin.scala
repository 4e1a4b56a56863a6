package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Interval (band) joins: match fact rows to dimension rows by a range
  * predicate `lo <= value < hi` — value binning, rate tables, SLA
  * tiers.
  *
  * Two tiers, same semantics:
  *
  *   - [[bandJoin]] — the general form for ARBITRARY (even overlapping)
  *     intervals. Spark plans a non-equi join as
  *     BroadcastNestedLoopJoin: each fact row tests every band. That is
  *     exactly right when the band table is small (it is a dimension —
  *     broadcast cost is |bands|), and the per-row work is |bands|
  *     comparisons inside codegen. Cost at 100 TB: one pass over the
  *     fact, zero shuffles.
  *   - [[uniformBandJoin]] — when the bands are aligned to a uniform
  *     width, the range predicate collapses to an EQUI-join on
  *     `floor(value / width)`: a broadcast HASH join, one probe per row
  *     instead of |bands| comparisons, and — unlike the nested loop —
  *     usable even when the band table grows past broadcast size
  *     (hash joins shuffle; nested loops don't scale). RangeJoinSpec
  *     proves both paths produce identical output and that the rewrite
  *     plans a BroadcastHashJoin with no nested loop.
  *
  * Bands are left-closed right-open (`[lo, hi)`) so adjacent bands
  * never double-match a boundary value.
  */
object RangeJoin {

  /** General interval join. `bands` must carry `(bandCol, loCol, hiCol)`;
    * fact rows outside every band are kept with a null band (left join)
    * so downstream sees coverage gaps instead of silently dropping rows.
    */
  def bandJoin(
      fact: DataFrame,
      valueCol: String,
      bands: DataFrame,
      bandCol: String = "band",
      loCol: String = "lo",
      hiCol: String = "hi"): DataFrame = {
    val cond: Column = col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol)
    fact.join(broadcast(bands), cond, "left").drop(loCol, hiCol)
  }

  /** Uniform-width rewrite: bucket both sides on `floor(value / width)`
    * and equi-join. `bands` rows must satisfy `lo = bucket·width`,
    * `hi = lo + width` (checked per row — a misaligned band would
    * silently change semantics).
    */
  def uniformBandJoin(
      fact: DataFrame,
      valueCol: String,
      bands: DataFrame,
      width: Double,
      bandCol: String = "band",
      loCol: String = "lo",
      hiCol: String = "hi"): DataFrame = {
    val misaligned = bands.filter(
      col(loCol) =!= floor(col(loCol) / width) * width || col(hiCol) =!= col(loCol) + width)
    require(misaligned.isEmpty, s"uniformBandJoin: bands are not aligned to width=$width")
    val dim = bands.select(floor(col(loCol) / width).cast("long").as("__bucket"), col(bandCol))
    fact
      .withColumn("__bucket", floor(col(valueCol) / width).cast("long"))
      .join(broadcast(dim), Seq("__bucket"), "left")
      .drop("__bucket")
  }
}
