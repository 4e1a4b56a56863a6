package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.{Column, DataFrame, Row}

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
    // The band table is broadcast-small by contract, so validate it
    // driver-side from ONE collect (the previous exact-equality filter
    // false-rejected widths like 0.1 whose edges aren't representable,
    // and cost a Spark action per invocation on top of the join's read).
    // Tolerance is relative to the width; band edges are expected to be
    // near-integer multiples, so round (not floor) recovers the bucket.
    val rows = bands.select(col(bandCol), col(loCol).cast("double"), col(hiCol).cast("double"))
      .collect()
    val eps = 1e-9 * width
    val buckets = rows.map { r =>
      require(!r.isNullAt(1) && !r.isNullAt(2),
        s"uniformBandJoin: band ${r.get(0)} has a null edge")
      val (lo, hi) = (r.getDouble(1), r.getDouble(2))
      val bucket = math.rint(lo / width).toLong
      require(math.abs(lo - bucket * width) <= eps && math.abs(hi - (lo + width)) <= eps,
        s"uniformBandJoin: band ${r.get(0)} [$lo, $hi) is not aligned to width=$width")
      Row(bucket, r.get(0))
    }
    val dimSchema = StructType(
      StructField("__bucket", LongType, nullable = false) +: Seq(bands.schema(bandCol)))
    val dim = fact.sparkSession.createDataFrame(
      java.util.Arrays.asList(buckets: _*), dimSchema)
    fact
      .withColumn("__bucket", floor(col(valueCol) / width).cast("long"))
      .join(broadcast(dim), Seq("__bucket"), "left")
      .drop("__bucket")
  }

  /** Interval OVERLAP join: all (left, right) pairs whose half-open
    * `[lo, hi)` intervals intersect, optionally restricted to equal
    * `keyCols` — meeting/session overlap, time-range co-occurrence.
    *
    * Spark plans the naive `l.lo < r.hi AND r.lo < l.hi` as a nested
    * loop (per-key cartesian) — quadratic and broadcast-bound. This is
    * the uniform-grid form that scales: each interval explodes into
    * the grid cells it touches, the join is an EQUI-join on
    * `(keys, cell)`, the exact overlap predicate filters within the
    * cell, and each pair is attributed to its FIRST shared cell
    * (`cell == floorDiv(max(l.lo, r.lo), width)`) so no distinct pass
    * is needed to dedupe multi-cell overlaps.
    *
    * Cost at scale: blow-up factor is `length/width + 1` cells per
    * interval — pick `width` near the typical interval length. The
    * shuffle hashes on `(keys, cell)`, so long intervals spread over
    * MANY cells (parallelism), and a hot key is subdivided by time —
    * the grid is a built-in skew splitter.
    *
    * Bounds must be integral (e.g. epoch micros); `floorDiv` arithmetic
    * is exact for negative values too. Empty or inverted intervals
    * (`hi <= lo`) are dropped — an empty interval overlaps nothing.
    * NULL keys or bounds never match (equi semantics). Right columns
    * are suffixed `rightSuffix` in the output.
    */
  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      loCol: String,
      hiCol: String,
      width: Long,
      keyCols: Seq[String] = Nil,
      rightSuffix: String = "_r"): DataFrame = {
    require(width > 0, "width must be positive")
    // floorDiv: the numerator is an exact multiple of width, so the
    // double division is exact for |value| < 2^53 (epoch micros are
    // ~2^50; Spark's `/` on longs always goes through double)
    def fd(c: Column): Column = ((c - pmod(c, lit(width))) / width).cast("long")
    def cells(df: DataFrame, lo: String, hi: String, cell: String): DataFrame =
      df.filter(col(hi) > col(lo))
        .withColumn(cell, explode(sequence(fd(col(lo)), fd(col(hi) - 1))))
    val l = cells(left, loCol, hiCol, "__cell")
    val r = cells(
      right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, c + rightSuffix)),
      loCol + rightSuffix, hiCol + rightSuffix, "__cell" + rightSuffix)
    val equi = keyCols.foldLeft(col("__cell") === col("__cell" + rightSuffix)) {
      (acc, k) => acc && col(k) === col(k + rightSuffix)
    }
    val overlap = col(loCol) < col(hiCol + rightSuffix) &&
      col(loCol + rightSuffix) < col(hiCol)
    val firstSharedCell =
      col("__cell") === fd(greatest(col(loCol), col(loCol + rightSuffix)))
    l.join(r, equi && overlap && firstSharedCell)
      .drop("__cell", "__cell" + rightSuffix)
      .drop(keyCols.map(_ + rightSuffix): _*)
  }
}
