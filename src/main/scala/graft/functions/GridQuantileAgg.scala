package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable fixed-grid quantile sketch: a histogram over `nBins`
  * uniform integer cells of width `width` starting at `lo`, pinned by
  * CONFIG (never by observed min/max). Out-of-range values clamp into
  * the edge cells, so the estimate's error there is unbounded — size
  * the grid from the domain contract, not from a data peek.
  *
  * Why config-pinned bounds when [[graft.operators.Quantiles.gridQuantiles]]
  * already does data-derived two-pass histograms: FIXED cells make the
  * sketch a CRDT-style mergeable summary — two sketches over disjoint
  * row sets merge by elementwise count addition, with no re-bounding
  * and no second pass over either input. That is the shape a 100 TB
  * percentile dashboard needs: per-partition sketches merge up the
  * aggregation tree (this class is partial-aggregation-friendly by
  * construction), per-day sketches roll into ranges, and a delta batch
  * folds into yesterday's materialized sketch in O(delta) — the
  * [[graft.operators.Incremental]] maintenance discipline applied to
  * quantiles, joining [[HeavyHittersAgg]] (top items), [[KmvAgg]]
  * (cardinality) and [[CountMinAgg]] (point frequency) in the
  * mergeable-summaries family.
  *
  * Unlike sampling sketches (KLL/t-digest), every operation here is
  * deterministic integer arithmetic: the bucket index is one floor
  * division, counts are exact longs, and quantile extraction is a
  * cumulative-count walk — so a DuckDB oracle replays the whole sketch
  * bit-for-bit and merge-vs-rebuild equality is exact, not
  * approximate. Rank error is bounded by one cell's occupancy; value
  * error by one cell width — a knob, not a distributional gamble.
  *
  * The p-quantile estimate (read downstream, see the `q_sketch_*`
  * gates) is the UPPER edge `lo + (b+1)·width` of the first cell whose
  * cumulative count reaches `ceil(p·n)` — the same pick rule as
  * `gridQuantiles`, kept in exact integers end-to-end.
  */
class GridQuantileAgg(lo: Long, width: Long, nBins: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(width >= 1, "cell width must be >= 1")
  require(nBins >= 2, "need at least 2 cells")

  private def bin(v: Long): Int = {
    val raw = Math.floorDiv(v - lo, width)
    if (raw < 0L) 0 else if (raw >= nBins.toLong) nBins - 1 else raw.toInt
  }

  override def zero: Array[Long] = new Array[Long](nBins)

  override def reduce(buf: Array[Long], v: Long): Array[Long] = {
    buf(bin(v)) += 1L
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nBins) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
