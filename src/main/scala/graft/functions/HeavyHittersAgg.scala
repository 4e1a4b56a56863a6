package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters summary: at most `capacity` counters per
  * group, every term with true frequency > n/(capacity+1) guaranteed
  * present, and each reported count within n/(capacity+1) of the true
  * count (a lower bound, never an overcount... the classic MG bound:
  * `true - n/(capacity+1) <= reported <= true`).
  *
  * Why this over a full `GROUP BY term`: the summary is the whole
  * point at 100 TB — `capacity` counters per group PER MAP TASK go
  * through the shuffle instead of every distinct term (the same
  * k-bounded-buffer shape as [[TopKAgg]] and [[KmvAgg]]). Merging two
  * summaries (sum counts; if over capacity, subtract the
  * (capacity+1)-th largest count and drop non-positives) preserves the
  * MG error bound, so partial aggregation and day→range rollups are
  * lossless in the guarantee.
  *
  * Determinism: with `capacity` ≥ the true distinct count no counter
  * is ever evicted and the counts are EXACT — that configuration sits
  * under the DuckDB oracle gate. Under eviction the reported counts
  * depend on arrival order (inherent to MG); only the error bound is
  * deterministic, which the spec asserts instead.
  */
class HeavyHittersAgg(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(capacity >= 1, "capacity must be >= 1")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], x: String): Map[String, Long] =
    buf.get(x) match {
      case Some(c) => buf.updated(x, c + 1)
      case None if buf.size < capacity => buf.updated(x, 1L)
      case None =>
        // decrement-all: drop one occurrence of every tracked term and
        // of x itself (x's counter would be 1-1=0, so it's not added)
        buf.flatMap { case (k, c) => if (c > 1) Some(k -> (c - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (summed.size <= capacity) summed
    else {
      // subtract the (capacity+1)-th largest count from everything;
      // what stays positive is the merged summary (Agarwal et al.'s
      // mergeable-summaries construction)
      val cut = summed.values.toSeq.sortBy(-_)(Ordering.Long).apply(capacity)
      summed.flatMap { case (k, c) => if (c > cut) Some(k -> (c - cut)) else None }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
