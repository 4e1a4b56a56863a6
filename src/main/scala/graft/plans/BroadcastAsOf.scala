package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, AttributeSet, BoundReference,
  GenericInternalRow, InterpretedOrdering, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The strategy-tier as-of join: whole-operator semantics as a custom
  * `LogicalPlan` → `SparkStrategy` → `SparkPlan` stack.
  *
  * Why this one operator gets the strategy tier when the rest of the
  * engine deliberately stays at the composition tier
  * ([[GraftExtensions]] doc): the composed as-of
  * (`AsOf.asofJoin`, union + window) is optimal when both sides are
  * big — but when the right side is DIM-SIZED (a calibration history,
  * an SCD dimension, a quote book per instrument), the window form
  * still pays a full shuffle of the 100 TB fact side, because a
  * window cannot run without clustering its partition keys. No
  * composition of built-in operators can express "probe a broadcast
  * time-index per fact row"; Spark's own planner would produce a
  * BroadcastNestedLoopJoin + per-left top-1 (pair expansion, O(|L|·|R|)
  * compare). This exec is the missing shape: right side broadcast once,
  * sorted per key, each fact row binary-searches its match — ZERO
  * exchange on the fact side (`outputPartitioning` passes the left
  * child's through), O(|L|·log |R_key|) work.
  *
  * Semantics match `AsOf.asofJoin` (backward) exactly, including tie
  * rules — AsOfSpec asserts equality row-for-row: latest right with
  * `r.ts <= l.ts` per key; among equal timestamps the highest `tie`
  * wins; NULL keys and NULL timestamps never match (equi-join
  * semantics); unmatched left rows keep NULL payload.
  */
case class BroadcastAsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    tie: Attribute,
    payload: Seq[Attribute],
    payloadOut: Seq[AttributeReference],
    matchedTs: AttributeReference,
    forward: Boolean = false) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut :+ matchedTs

  override def producedAttributes: AttributeSet =
    AttributeSet(payloadOut :+ matchedTs)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BroadcastAsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[BroadcastAsOfJoinPlan]] to [[BroadcastAsOfJoinExec]]. */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: BroadcastAsOfJoinPlan =>
      BroadcastAsOfJoinExec(
        planLater(p.left),
        planLater(p.right),
        p.leftKeys, p.rightKeys, p.leftTs, p.rightTs, p.tie,
        p.payload, p.payloadOut, p.matchedTs, p.forward) :: Nil
    case _ => Nil
  }
}

object BroadcastAsOfJoinExec {
  /** Per-executor memo of the built per-key sorted index. Keyed WEAKLY
    * by the broadcast value array (identity — the executor's
    * BlockManager caches one deserialized instance per broadcast, and
    * the entry dies with it) and strongly by the structural build
    * descriptor, so two execs consuming one reused exchange with
    * different key/ts columns build separate indexes.
    *
    * Values are held through [[java.lang.ref.SoftReference]]: the index
    * is a second full copy of the broadcast rows (UnsafeRow key+row
    * copies), and holding it strongly for as long as the BlockManager
    * keeps the broadcast value alive roughly doubles broadcast memory
    * across many long-lived as-of joins. A soft reference lets memory
    * pressure evict the index (it is a pure cache — the next task
    * rebuilds it from the still-live broadcast rows) instead of only
    * broadcast GC.
    */
  private val indexCache =
    new java.util.WeakHashMap[AnyRef, java.util.concurrent.ConcurrentHashMap[String, java.lang.ref.SoftReference[AnyRef]]]()

  private[plans] def cachedIndex[A <: AnyRef](rows: AnyRef, desc: String)(build: => A): A = {
    val per = indexCache.synchronized {
      var m = indexCache.get(rows)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, java.lang.ref.SoftReference[AnyRef]]()
        indexCache.put(rows, m)
      }
      m
    }
    // compute() (not computeIfAbsent) so a cleared SoftReference is
    // replaced atomically; build runs under the map's per-key lock,
    // which is the same single-build-per-executor guarantee as before.
    // The ref can in principle clear between compute() returning and
    // get(), so grab the strong value INSIDE the compute closure.
    var result: AnyRef = null
    per.compute(desc, (_, ref) => {
      result = if (ref == null) null else ref.get()
      if (result != null) ref
      else {
        result = build
        new java.lang.ref.SoftReference[AnyRef](result)
      }
    })
    result.asInstanceOf[A]
  }
}

/** Broadcast backward as-of join. The right child arrives as an
  * `IdentityBroadcastMode` array (EnsureRequirements inserts the
  * BroadcastExchange from `requiredChildDistribution`); each EXECUTOR
  * builds the per-key time-sorted index once (memoized against the
  * broadcast value), then every partition streams the left side with a
  * binary search per row. The left child's partitioning
  * and ordering pass through untouched — the whole point.
  */
case class BroadcastAsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    tie: Attribute,
    payload: Seq[Attribute],
    payloadOut: Seq[AttributeReference],
    matchedTs: AttributeReference,
    forward: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut :+ matchedTs

  override def producedAttributes: AttributeSet =
    AttributeSet(payloadOut :+ matchedTs)

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(UnspecifiedDistribution, BroadcastDistribution(IdentityBroadcastMode))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val bc = right.executeBroadcast[Array[InternalRow]]()
    val rOut = right.output
    val lOut = left.output
    val rTsOrd = rOut.indexWhere(_.exprId == rightTs.exprId)
    val lTsOrd = lOut.indexWhere(_.exprId == leftTs.exprId)
    val rKeyAttrs = rightKeys
    val lKeyAttrs = leftKeys
    val tieAttr = tie
    val payloadAttrs = payload
    val rightTsAttr = rightTs
    val outAttrs = output
    val payloadOutAttrs = payloadOut
    val matchedTsAttr = matchedTs
    val nPayloadOut = payload.length + 1

    // structural build descriptor: ordinals + types fully determine the
    // index built from a given broadcast array, so tasks of this (or an
    // exchange-reusing sibling) exec can share one per-executor build
    val rKeyOrds = rKeyAttrs.map(a => rOut.indexWhere(_.exprId == a.exprId))
    val tieOrd = rOut.indexWhere(_.exprId == tieAttr.exprId)
    val indexDesc = s"${rKeyOrds.mkString(",")}|$rTsOrd|$tieOrd|" +
      rOut.map(_.dataType.catalogString).mkString(",")

    left.execute().mapPartitions({ iter =>
      // built ONCE per executor per broadcast (memoized, weak on the
      // broadcast value): key -> rows sorted by (ts, tie) ascending,
      // timestamps pre-extracted. Rebuilding per partition would cost
      // O(tasks × |R| log |R|) redundant work on a wide fact side
      val index = BroadcastAsOfJoinExec.cachedIndex(bc.value, indexDesc) {
        val rKeyProj = UnsafeProjection.create(rKeyAttrs, rOut)
        val rowOrd = new InterpretedOrdering(Seq(
          SortOrder(BoundReference(rTsOrd, rightTsAttr.dataType, nullable = true), Ascending),
          SortOrder(BoundReference(tieOrd, tieAttr.dataType, nullable = true), Ascending)))
        val byKey = new scala.collection.mutable.HashMap[UnsafeRow, scala.collection.mutable.ArrayBuffer[InternalRow]]
        bc.value.foreach { r =>
          val keyOk = rKeyOrds.forall(o => !r.isNullAt(o)) && !r.isNullAt(rTsOrd)
          if (keyOk) {
            byKey.getOrElseUpdate(rKeyProj(r).copy(),
              new scala.collection.mutable.ArrayBuffer[InternalRow]) += r.copy()
          }
        }
        byKey.map { case (k, rows) =>
          val sorted = rows.sorted(rowOrd).toArray
          k -> (sorted.map(_.getLong(rTsOrd)), sorted)
        }: scala.collection.Map[UnsafeRow, (Array[Long], Array[InternalRow])]
      }

      val lKeyProj = UnsafeProjection.create(lKeyAttrs, lOut)
      val lKeyOrds = lKeyAttrs.map(a => lOut.indexWhere(_.exprId == a.exprId))
      val rightOutProj = UnsafeProjection.create(payloadAttrs :+ rightTsAttr, rOut)
      val toUnsafe = UnsafeProjection.create(
        outAttrs, lOut ++ payloadOutAttrs :+ matchedTsAttr)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(nPayloadOut)

      val fwd = forward
      iter.map { lrow =>
        var matched: InternalRow = null
        if (lKeyOrds.forall(o => !lrow.isNullAt(o)) && !lrow.isNullAt(lTsOrd)) {
          index.get(lKeyProj(lrow)).foreach { case (tss, rows) =>
            val lts = lrow.getLong(lTsOrd)
            if (!fwd) {
              // backward: last index with ts <= lts (rows with equal ts
              // are tie-ascending, so "last" is the highest tie)
              var lo = 0; var hi = tss.length - 1; var ans = -1
              while (lo <= hi) {
                val mid = (lo + hi) >>> 1
                if (tss(mid) <= lts) { ans = mid; lo = mid + 1 } else hi = mid - 1
              }
              if (ans >= 0) matched = rows(ans)
            } else {
              // forward: first index with ts >= lts, then walk to the
              // LAST row of that timestamp — equal-ts rights resolve to
              // the highest tie, matching asofJoinForward
              var lo = 0; var hi = tss.length - 1; var ans = -1
              while (lo <= hi) {
                val mid = (lo + hi) >>> 1
                if (tss(mid) >= lts) { ans = mid; hi = mid - 1 } else lo = mid + 1
              }
              if (ans >= 0) {
                var j = ans
                while (j + 1 < tss.length && tss(j + 1) == tss(ans)) j += 1
                matched = rows(j)
              }
            }
          }
        }
        val rightPart: InternalRow =
          if (matched == null) nullRight else rightOutProj(matched)
        toUnsafe(joined(lrow, rightPart))
      }
    }, preservesPartitioning = true)
  }
}
