package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Single-pass bounded top-k aggregator (by score desc, id asc).
  *
  * The scale-correct reduction for top-k-per-group: a window
  * `row_number` sorts EVERY candidate row inside each partition, so the
  * full |Q|·|C| pair stream is shuffled and sorted; this Aggregator
  * keeps a k-bounded buffer, combines map-side (partial aggregation),
  * and ships only k rows per group per map task through the shuffle.
  * At 1000 executors that is the difference between shuffling the pair
  * stream and shuffling k·|Q| rows.
  */
case class Scored(score: Double, id: Long)

class TopKAgg(k: Int) extends Aggregator[Scored, List[Scored], List[Scored]] {

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  /** buffer kept sorted best-first, length ≤ k */
  private def insert(buf: List[Scored], x: Scored): List[Scored] = {
    if (buf.sizeIs >= k && better(buf.last, x)) buf
    else {
      val (pre, post) = buf.span(better(_, x))
      (pre ::: x :: post).take(k)
    }
  }

  override def zero: List[Scored] = Nil
  override def reduce(buf: List[Scored], x: Scored): List[Scored] = insert(buf, x)
  override def merge(a: List[Scored], b: List[Scored]): List[Scored] =
    b.foldLeft(a)(insert)
  override def finish(buf: List[Scored]): List[Scored] = buf
  override def bufferEncoder: Encoder[List[Scored]] = ExpressionEncoder[List[Scored]]()
  override def outputEncoder: Encoder[List[Scored]] = ExpressionEncoder[List[Scored]]()
}
