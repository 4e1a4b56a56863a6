package graft.plans

import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialized-aggregate rewrite — the optimizer-rule tier of the
  * extension ladder, and the READ half of incremental view
  * maintenance ([[graft.operators.Incremental]] is the write half).
  *
  * A pipeline that maintains a per-key aggregate in O(delta) per
  * refresh still pays O(history) on every READ unless queries are
  * rewritten to the maintained table. Asking users to rewrite their
  * queries couples every consumer to the materialization layout; a
  * database solves this with transparent MV rewrite. This rule is
  * that, scoped to the exact-match case: a registered aggregate QUERY
  * (any per-key `Aggregate` plan) maps to a reader of its maintained
  * table, and any query whose aggregate subtree is plan-canonically
  * identical — same source, same grouping, same aggregate
  * expressions, regardless of exprIds or alias order — is rewritten
  * to scan the table instead. Exact-match only, deliberately: partial
  * rewrites (rollups over the MV, predicate subsumption) change
  * result semantics under staleness in ways exact match does not.
  *
  * Freshness is the registrant's contract, exactly as with any
  * manually-refreshed MV: register a reader of the table your refresh
  * job maintains, and the rewrite is as fresh as the last fold.
  *
  * Registrations are session-scoped (weak keys — they die with the
  * session) and keyed by the canonicalized plan, so re-registering
  * the same query replaces the reader (the content-addressed staleness
  * pattern: a new corpus version registers a new table).
  *
  * Injection: config-driven via [[GraftExtensions]]
  * (`spark.sql.extensions`) or [[ensureInjected]] for an existing
  * session (`spark.experimental.extraOptimizations`).
  */
object MaterializedAggRewrite extends Rule[LogicalPlan] {

  private final case class Registration(
      keys: Set[String], canons: Seq[LogicalPlan], read: () => DataFrame)

  private val regs =
    new java.util.WeakHashMap[SparkSession, java.util.concurrent.ConcurrentHashMap[String, Registration]]()

  private def sessionRegs(spark: SparkSession) = regs.synchronized {
    var m = regs.get(spark)
    if (m == null) {
      m = new java.util.concurrent.ConcurrentHashMap[String, Registration]()
      regs.put(spark, m)
    }
    m
  }

  /** Register `aggQuery`'s plan as served by `read`'s table. The
    * reader's columns must cover the query's output names (checked
    * eagerly). Re-registering the same query replaces the reader.
    *
    * Both the ANALYZED and the OPTIMIZED canonical forms are indexed:
    * this rule runs in the "User Provided Optimizers" batch, after
    * constant folding and expression simplification have already
    * rewritten candidate plans, so the analyzed form alone would never
    * match a candidate mid-optimization.
    */
  def register(spark: SparkSession, aggQuery: DataFrame, read: () => DataFrame): Unit = {
    val analyzed = aggQuery.queryExecution.analyzed
    require(analyzed.isInstanceOf[Aggregate],
      s"MaterializedAggRewrite.register expects an aggregate query, got:\n$analyzed")
    val readOut = read().queryExecution.analyzed.output
    val missing = analyzed.output.map(_.name).filterNot(n => readOut.exists(_.name == n))
    require(missing.isEmpty,
      s"maintained table lacks columns ${missing.mkString(", ")} of the registered query")
    // The rewrite swaps the reader's attribute under the query's exprId
    // (apply() below): parents still bind by the ORIGINAL type, so a type
    // mismatch would silently corrupt UnsafeRow reads instead of failing.
    // Enforce the eager type contract here (the asofJoinBroadcast pattern):
    // same dataType, and the reader may not be nullable where the query
    // promised non-null.
    analyzed.output.foreach { out =>
      val src = readOut.find(_.name == out.name).get
      require(src.dataType == out.dataType,
        s"maintained table column ${out.name} has type ${src.dataType}, " +
          s"registered query produces ${out.dataType} — refusing a silent type swap")
      // nullable-widening is deliberately ACCEPTED: a parquet read-back
      // declares every column nullable even though the maintained
      // content derives from this very query and so contains no
      // unexpected nulls (the registrant's freshness contract covers
      // content). Only the physical-layout hazard (dataType) is fatal.
    }
    val m = sessionRegs(spark)
    val aKey = analyzed.canonicalized.toString
    // drop any previous registration of this query FIRST: computing
    // the optimized form below must not itself be rewritten to the
    // old reader, or we would index the wrong plan
    val prev = m.remove(aKey)
    if (prev != null) prev.keys.foreach(m.remove(_))
    val optimized = aggQuery.queryExecution.optimizedPlan
    val canons = Seq(analyzed.canonicalized, optimized.canonicalized)
    val keys = canons.map(_.toString).toSet
    val regn = Registration(keys, canons, read)
    keys.foreach(k => m.put(k, regn))
  }

  /** Drop every registration of this session. */
  def clear(spark: SparkSession): Unit = sessionRegs(spark).clear()

  /** Idempotently add this rule to an existing session's optimizer
    * (the config-driven path is [[GraftExtensions]]).
    */
  def ensureInjected(spark: SparkSession): Unit =
    spark.experimental.synchronized {
      if (!spark.experimental.extraOptimizations.contains(this)) {
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ this
      }
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val sessionOpt = SparkSession.getActiveSession
    val m = sessionOpt.map(sessionRegs).orNull
    if (m == null || m.isEmpty) return plan
    plan.transformUp {
      case agg: Aggregate =>
        val reg = m.get(agg.canonicalized.toString)
        if (reg == null || !reg.canons.contains(agg.canonicalized)) agg
        else {
          val rel = reg.read().queryExecution.analyzed
          // preserve the original output exprIds so parent operators'
          // references stay valid after the swap
          Project(agg.output.map { out =>
            val src = rel.output.find(_.name == out.name).getOrElse(
              throw new IllegalStateException(
                s"maintained table lost column ${out.name}"))
            // re-check the type contract at rewrite time: the reader is a
            // thunk and its table may have been rewritten since register()
            if (src.dataType != out.dataType)
              throw new IllegalStateException(
                s"maintained table column ${out.name} drifted to ${src.dataType} " +
                  s"(registered as ${out.dataType}) — refusing the rewrite")
            Alias(src, out.name)(exprId = out.exprId)
          }, rel)
        }
    }
  }
}
