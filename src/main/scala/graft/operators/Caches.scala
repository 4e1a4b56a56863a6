package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame

/** Registry of DataFrames persisted inside operators.
  *
  * Operators like [[Dedup.ngramJaccardPairs]] persist shared subplans
  * (Spark re-executes a plan referenced from several joins otherwise).
  * The operator cannot unpersist them itself — the returned DataFrame
  * is lazy and still references the cache. In a long-lived session
  * (benchmark loops, notebook use) that accumulates cached partitions
  * and leans on LRU eviction; callers should instead drain the registry
  * with [[release]] once results are materialized.
  */
object Caches {
  private val live = mutable.Buffer[DataFrame]()

  private[graft] def persisted(df: DataFrame): DataFrame = synchronized {
    val p = df.persist()
    live += p
    p
  }

  /** Unpersist every operator-cached DataFrame registered so far. Safe
    * to call between runs; only DataFrames whose results are already
    * materialized (or abandoned) should be in flight.
    */
  def release(): Unit = synchronized {
    live.foreach(_.unpersist(false))
    live.clear()
  }
}
