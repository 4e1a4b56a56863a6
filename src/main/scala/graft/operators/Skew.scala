package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame}

/** Skew mitigation for large joins.
  *
  * AQE's skew-join handling (on by default in this engine's sessions)
  * re-splits oversized post-shuffle partitions at runtime; explicit
  * salting remains necessary when a single join KEY is hot (AQE can
  * split a partition, but every row of one key still meets every
  * matching row on one executor for sort-merge). Salting spreads a hot
  * key across `saltFactor` reducers: the large side gets a random-ish
  * but deterministic salt per row; the small side is replicated once
  * per salt value. Output equals the unsalted join exactly.
  */
object Skew {

  private val SaltCol = "__salt"

  /** Inner equi-join with the large side salted. `small` is replicated
    * `saltFactor`× (keep it broadcast-sized / dimension-sized).
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltFactor: Int): DataFrame = {
    require(saltFactor >= 1)
    // deterministic per-row spread: hash of the whole row modulo factor
    // (row-content hashing keeps identical runs identical; duplicates
    // colliding on one salt is harmless — they'd co-locate anyway)
    val largeSalted = large.withColumn(
      SaltCol, pmod(xxhash64(large.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val smallSalted = small.withColumn(
      SaltCol, explode(sequence(lit(0), lit(saltFactor - 1))))
    largeSalted
      .join(smallSalted, keys :+ SaltCol, "inner")
      .drop(SaltCol)
  }
}
