package graft.operators

import scala.collection.mutable
import scala.util.DynamicVariable

import org.apache.spark.sql.DataFrame

/** Registry of DataFrames persisted inside operators.
  *
  * Operators like [[Dedup.ngramJaccardPairs]] persist shared subplans
  * (Spark re-executes a plan referenced from several joins otherwise).
  * The operator cannot unpersist them itself — the returned DataFrame
  * is lazy and still references the cache — so registrations accumulate
  * until the caller drains them after materializing results.
  *
  * Registrations land in a [[Caches.Scope]]. A caller that wraps plan
  * construction in [[Caches.scoped]] gets a private scope: releasing it
  * drops ONLY that caller's caches, so two pipelines sharing one
  * SparkSession cannot unpersist each other's in-flight subplans (the
  * process-global release of earlier rounds silently forced recompute
  * on the concurrent pipeline). Callers that don't open a scope fall
  * back to a process-wide default scope drained by [[release]], which
  * preserves the simple single-pipeline usage.
  */
object Caches {

  /** A releasable set of operator-persisted DataFrames. */
  final class Scope private[Caches] () {
    private val live = mutable.Buffer[DataFrame]()

    private[Caches] def add(df: DataFrame): Unit = synchronized { live += df }

    /** Unpersist every DataFrame registered in this scope. Call once
      * the results built under the scope are materialized or abandoned.
      */
    def release(): Unit = synchronized {
      live.foreach(_.unpersist(false))
      live.clear()
    }
  }

  // Thread-bound: operator plan construction happens synchronously on
  // the caller's thread, so the binding reaches every persisted() call
  // made while building the scoped plan.
  private val current = new DynamicVariable[Scope](null)
  private val fallback = new Scope

  private[graft] def persisted(df: DataFrame): DataFrame = {
    val p = df.persist()
    Option(current.value).getOrElse(fallback).add(p)
    p
  }

  /** Build a plan under a private scope: registrations made by `body`
    * (on this thread) are collected into the returned [[Scope]] instead
    * of the process-wide one. Release the scope after materializing —
    * not inside `body`, whose result is still lazy.
    */
  def scoped[A](body: => A): (A, Scope) = {
    val s = new Scope
    (current.withValue(s)(body), s)
  }

  /** Unpersist every DataFrame registered OUTSIDE any [[scoped]] block.
    * Scoped registrations are untouched — release those via their own
    * [[Scope.release]].
    */
  def release(): Unit = fallback.release()
}
