package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Sketch state: the sampling LEVEL, the exact total row count, and the
  * surviving (tz, value) pairs — `tz` is the item's trailing-zero-BIT
  * count of its content hash, which is what lets any later level bump
  * (during merges) re-filter the survivors without revisiting data.
  */
final case class HashRankState(level: Int, n: Long, items: Seq[(Int, Long)])

/** Bounded-space quantile sketch for UNBOUNDED value domains — the
  * rank-error companion to [[GridQuantileAgg]], which needs known value
  * bounds and uniform cells.
  *
  * KLL-style geometric level sampling, DERANDOMIZED by content hashing:
  * where KLL's compactor flips coins to keep alternating items, here an
  * item's survival at level L is a pure function of its own hash — it
  * survives iff its md5 carries ≥ L trailing zero BITS (probability
  * 2⁻ᴸ — KLL's own halving rate). The sketch keeps the lowest level at
  * which ≤ k items survive; a `reduce` past capacity bumps the level
  * and re-filters.
  *
  * Why derandomize: a coin-flip compactor's content depends on MERGE
  * ORDER, and Spark's partial-aggregation tree merges in nondeterministic
  * order — a classic KLL would break this repo's bit-exact oracle-hash
  * discipline (and any retry-stability guarantee). Here the final state
  * is a pure function of the input MULTISET: the final level is
  * min{L : |{x : tz(x) ≥ L}| ≤ k} — every partial holds a superset of
  * information for any level ≥ its own (it only dropped items that can
  * never resurface), and no partial ever exceeds the global minimum
  * level (a subset's passing count is ≤ the multiset's) — so any merge
  * tree lands on the identical (level, survivors). A DuckDB oracle
  * replays the whole construction from the same md5 expression.
  *
  * Estimation: survivors are an equal-weight (2^level) hash sample of
  * the rows, so the p-quantile estimate is the survivor multiset's
  * integer-rank pick `sorted[⌈p·m⌉]` — standard uniform-sample bounds
  * give rank error O(√(log(1/δ)/m)) with probability 1−δ, with NO
  * assumption on the value domain. Bit granularity halves the expected
  * sample per level bump, so after any bump the survivor count stays
  * ABOVE ~k/2 in expectation (the worst case an earlier nibble draw —
  * 16× per level — could shrink to ~k/16): the effective sample m is
  * ≥ k/2 rather than ≥ k/16, an 8× tighter worst-case rank-error
  * denominator for the same k, with the same determinism (survival is
  * still a pure function of the multiset).
  *
  * Caller contract: `tz` must be the trailing-zero-BIT count of a hash
  * of a UNIQUE per-row key — from the md5 hex string:
  * `4·tzNibbles + bitsOf(last non-zero hex char)` where bitsOf maps
  * 8→3, {4,c}→2, {2,6,a,e}→1, odd→0 (an expression both Spark and a
  * DuckDB oracle evaluate identically). Hashing the VALUE would make
  * duplicate values live or die together and bias the sample.
  * Combinable by construction (partial aggregation merges states);
  * state is ≤ k pairs + two scalars regardless of input size, exactly
  * what a 100 TB aggregation tree or an O(delta) incremental
  * maintenance fold wants (see the `incr_kll_maintain` gate:
  * yesterday's state ⊎ the delta's state equals the full rebuild
  * EXACTLY, not approximately).
  */
class HashRankQuantileAgg(k: Int)
    extends Aggregator[(Int, Long), HashRankState, HashRankState] {
  require(k >= 8, "capacity below 8 has no usable rank resolution")

  /** md5 has 128 bits; past level 128 nothing can be re-filtered. */
  private val MaxLevel = 128

  private def squeeze(level0: Int, items0: Seq[(Int, Long)]): (Int, Seq[(Int, Long)]) = {
    var level = level0
    var items = items0
    while (items.size > k && level < MaxLevel) {
      level += 1
      items = items.filter(_._1 >= level)
    }
    (level, items)
  }

  override def zero: HashRankState = HashRankState(0, 0L, Vector.empty)

  override def reduce(b: HashRankState, x: (Int, Long)): HashRankState = {
    val n = b.n + 1
    if (x._1 < b.level) HashRankState(b.level, n, b.items)
    else {
      val (l, it) = squeeze(b.level, b.items :+ x)
      HashRankState(l, n, it)
    }
  }

  override def merge(a: HashRankState, b: HashRankState): HashRankState = {
    val level = math.max(a.level, b.level)
    val (l, it) = squeeze(level,
      (a.items ++ b.items).filter(_._1 >= level))
    HashRankState(l, a.n + b.n, it)
  }

  /** Canonical form: survivors sorted by (value, tz) so downstream
    * array reads are deterministic regardless of merge order.
    */
  override def finish(r: HashRankState): HashRankState =
    r.copy(items = r.items.sortBy(identity[(Int, Long)](_).swap))

  override def bufferEncoder: Encoder[HashRankState] =
    ExpressionEncoder[HashRankState]()
  override def outputEncoder: Encoder[HashRankState] =
    ExpressionEncoder[HashRankState]()
}
