package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values distinct-count sketch.
  *
  * Keeps the k smallest DISTINCT hash values seen per group. With
  * hashes uniform on [0, 2^32), the k-th smallest value h_k estimates
  * the distinct count as `(k-1) · 2^32 / h_k` (the k-th order
  * statistic of n uniform draws sits near k·2^32/n); fewer than k
  * distinct hashes means the buffer IS the distinct set and the count
  * is exact.
  *
  * Why this over `approx_count_distinct`: the HLL++ register layout is
  * engine-private, but KMV is just "k smallest values of a hash" — with
  * a portable hash ([[rolling_hash]], replayed in DuckDB by
  * `OracleSql`) the whole sketch, including the estimate, is
  * bit-reproducible across engines, so it sits under the same
  * hash-match oracle gate as the exact operators. Same shape as
  * [[TopKAgg]]: a k-bounded buffer that combines map-side, shipping k
  * values per group per map task through the shuffle — while
  * `count(DISTINCT x)` shuffles every distinct value. Sketch unions
  * are `merge` itself (associative, lossless at fixed k), so per-day
  * sketches roll up to ranges for free.
  *
  * The buffer is a sorted ascending list of distinct hashes, ≤ k long.
  */
class KmvAgg(k: Int) extends Aggregator[Long, List[Long], List[Long]] {
  require(k >= 2, "KMV needs k >= 2")

  private def insert(buf: List[Long], x: Long): List[Long] = {
    if (buf.sizeIs >= k && buf.last <= x) buf
    else {
      val (pre, post) = buf.span(_ < x)
      post match {
        case h :: _ if h == x => buf // already present: it's a set
        case _                => (pre ::: x :: post).take(k)
      }
    }
  }

  override def zero: List[Long] = Nil
  override def reduce(buf: List[Long], x: Long): List[Long] = insert(buf, x)
  override def merge(a: List[Long], b: List[Long]): List[Long] =
    b.foldLeft(a)(insert)
  override def finish(buf: List[Long]): List[Long] = buf
  override def bufferEncoder: Encoder[List[Long]] = ExpressionEncoder[List[Long]]()
  override def outputEncoder: Encoder[List[Long]] = ExpressionEncoder[List[Long]]()
}

object KmvAgg {
  /** Integer-exact estimate from a finished buffer: exact size below k,
    * `(k-1)·2^32 div h_k` at capacity. Floor division — replayed with
    * `//` in the DuckDB oracle.
    */
  def estimate(k: Int, buf: List[Long]): Long =
    if (buf.sizeIs < k) buf.size.toLong
    else ((k - 1).toLong * 4294967296L) / buf.last
}
