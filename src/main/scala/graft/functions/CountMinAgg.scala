package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch: `depth × width` counters answer "how often did
  * key k occur?" for EVERY key in bounded memory — the point-frequency
  * member of the mergeable-summaries family beside [[KmvAgg]]
  * (cardinality) and [[HeavyHittersAgg]] (top items).
  *
  * Each input row arrives as its `depth` pre-computed row positions
  * (one independent hash per row, mod width — built column-side with
  * [[graft.functions.mixed_hash32]], so the sketch itself is pure
  * counting); the estimate for a key is the MIN over its cells —
  * always ≥ the true count, over only by colliding keys' mass
  * (ε = e/width of total mass with probability 1−(1/2)^depth... the
  * classic CM guarantee). Merging is elementwise addition, so map-side
  * partial aggregation and day→range rollups are exact in the
  * guarantee: `depth·width` longs per group per map task through the
  * shuffle, regardless of key cardinality.
  *
  * Determinism: the filled sketch is a pure function of the data and
  * the hash seeds — no arrival-order dependence at all (unlike MG
  * under eviction). With collision-free width the estimates are EXACT
  * and sit under the DuckDB oracle gate; the spec asserts the
  * never-undercount bound at tight widths.
  */
class CountMinAgg(depth: Int, width: Int)
    extends Aggregator[Seq[Int], Array[Long], Seq[Long]] {
  require(depth >= 1 && width >= 1)

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], positions: Seq[Int]): Array[Long] = {
    var i = 0
    while (i < depth) {
      buf(i * width + positions(i)) += 1L
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object CountMinAgg {

  /** Column of the `depth` row positions for `key` (deterministic
    * seeded hashes, uniform via the MixHash32 avalanche).
    */
  def positions(key: org.apache.spark.sql.Column, depth: Int, width: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    array((0 until depth).map(i =>
      pmod(mixed_hash32(concat(lit(s"cm$i:"), key)), lit(width.toLong)).cast("int")): _*)
  }

  /** Point estimate for `key` against a finished sketch column:
    * min over the key's `depth` cells.
    */
  def estimate(
      sketch: org.apache.spark.sql.Column,
      key: org.apache.spark.sql.Column,
      depth: Int,
      width: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    (0 until depth)
      .map(i => element_at(sketch,
        pmod(mixed_hash32(concat(lit(s"cm$i:"), key)), lit(width.toLong)).cast("int")
          + lit(i * width) + lit(1)))
      .reduce((a, b) => least(a, b))
  }
}
