package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket affinity mining: co-occurrence counts and lift over
  * (basket, item) pairs.
  *
  * Scale shape: the pair-generation self-join keys on the basket id,
  * so the expansion per basket is C(k,2) where k is the basket's
  * distinct-item count — bounded by the largest order (single digits
  * in an order-lines fact), never by table size. The join shuffles
  * both sides on the basket id once; pair aggregation shuffles on the
  * (item_a, item_b) key with map-side partial counts. Item marginals
  * join on the item key (the item dimension at 100 TB is far past
  * broadcast size, so this stays a shuffle join on pk); the
  * basket-count scalar is a single-row broadcast. The min-support
  * filter runs BEFORE the marginal joins, so the expensive joins see
  * only surviving pairs.
  *
  * Lift is emitted on the ppm grid via integer floor division —
  * `1e6 * n_co * n_baskets div (n_a * n_b)` — exact in any engine
  * (all operands non-negative, so floor division is unambiguous).
  * The numerator is accumulated in decimal(38,0): at sf1000
  * (~1.5e9 baskets) `1e6 * n_co * n_baskets` wraps int64 for any
  * n_co > 6 — Spark would wrap silently while DuckDB raises, so the
  * int64 grid is not safe at the target scale. The quotient itself is
  * a ppm lift value (bounded by 1e6 · n_baskets / max(n_a,n_b) and in
  * practice small), so it casts back to BIGINT losslessly.
  */
object Affinity {

  def pairLift(lineitem: DataFrame, minSupport: Long): DataFrame = {
    require(minSupport >= 1, "minSupport must be >= 1")
    val li = lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val pairs = li.toDF("ok", "pk_a")
      .join(li.toDF("ok2", "pk_b"),
        col("ok") === col("ok2") && col("pk_a") < col("pk_b"))
      .groupBy("pk_a", "pk_b")
      .agg(count(lit(1)).as("n_co"))
      .filter(col("n_co") >= minSupport)
    val items = li.groupBy("pk").agg(count(lit(1)).as("n_item"))
    val baskets = li.agg(count_distinct(col("ok")).as("n_baskets"))
    pairs
      .join(items.select(col("pk").as("pk_a"), col("n_item").as("n_a")), "pk_a")
      .join(items.select(col("pk").as("pk_b"), col("n_item").as("n_b")), "pk_b")
      .crossJoin(broadcast(baskets))
      .select(col("pk_a"), col("pk_b"), col("n_co"), col("n_a"), col("n_b"),
        col("n_baskets"),
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * n_co * n_baskets div " +
          "(CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)").as("lift_ppm"))
  }

  /** Item-item collaborative filtering: per item, the top-`k` most
    * similar items by basket-co-occurrence cosine — the "customers who
    * bought X also bought" recommender table, batch-built.
    *
    * Similarity is SQUARED cosine on the ppm grid — `1e6 · n_co² div
    * (n_a · n_b)` — because cos² is a monotone transform of cosine on
    * non-negative counts, so the ranking is identical while everything
    * stays integer-exact (a sqrt would put an irrational between the
    * engines). Numerator in decimal(38,0): n_co² wraps int64 past
    * n_co ≈ 3e6 (plausible for staple pairs at sf1000).
    *
    * Shape at 100 TB: [[pairLift]]'s bounded basket expansion plus one
    * symmetric explode (each pair feeds both directions) and one
    * per-item top-k window over each item's surviving candidates
    * (min-support prunes BEFORE the window; candidates per item are
    * co-purchase-degree-bounded, not catalog-bounded). Deterministic
    * tie-break (cos2 desc, neighbor id asc) makes top-k hash-stable.
    */
  def itemCosineTopK(lineitem: DataFrame, minSupport: Long, k: Int): DataFrame =
    itemCosineTopKFromLift(pairLift(lineitem, minSupport), k)

  /** [[itemCosineTopK]] over a PRE-COMPUTED [[pairLift]] table — the
    * production shape where the co-occurrence pair table is a
    * materialized artifact shared by several consumers (lift reports,
    * item-item recs, co-purchase graphs) rather than re-mined per
    * query. Identical output to [[itemCosineTopK]] on the same pairs.
    */
  def itemCosineTopKFromLift(lift: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val base = lift
      .select(col("pk_a"), col("pk_b"), col("n_co"), col("n_a"), col("n_b"))
    val directed = base.select(
        col("pk_a").as("item"), col("pk_b").as("rec"),
        col("n_co"), col("n_a").as("n_i"), col("n_b").as("n_r"))
      .unionByName(base.select(
        col("pk_b").as("item"), col("pk_a").as("rec"),
        col("n_co"), col("n_b").as("n_i"), col("n_a").as("n_r")))
      .withColumn("cos2_ppm",
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * n_co * n_co div " +
          "(CAST(n_i AS DECIMAL(38,0)) * n_r) AS BIGINT)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("item"))
      .orderBy(col("cos2_ppm").desc, col("rec"))
    directed
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("item"), col("rnk"), col("rec"), col("n_co"), col("cos2_ppm"))
  }

  /** USER-level top-`n` recommendations composed from the item-item
    * table: each candidate item's score is the SUM of cos²-ppm edges
    * from the user's purchase history into it (the classic
    * neighborhood-aggregation serving rule), items the user already
    * bought are anti-joined out, and a per-user window keeps the top
    * `n` (score desc, item id tiebreak — hash-stable).
    *
    * Shape at 100 TB: the user-item table joins the k-bounded item-rec
    * table on the ITEM key, so per-user candidates are ≤ k · |user's
    * items| — basket-bounded, never catalog-bounded; scoring is one
    * combinable (user, rec) aggregate; the already-bought exclusion is
    * a keyed anti-join; the final window sees only each user's
    * surviving candidates. Every shuffle is keyed; nothing broadcasts
    * a catalog. Integer-exact: scores are sums of ppm longs.
    */
  def userTopN(lineitem: DataFrame, orders: DataFrame,
      minSupport: Long, k: Int, n: Int): DataFrame =
    userTopNFromLift(pairLift(lineitem, minSupport), lineitem, orders, k, n)

  /** [[userTopN]] over a PRE-COMPUTED [[pairLift]] table (see
    * [[itemCosineTopKFromLift]]) — identical output on the same pairs.
    */
  def userTopNFromLift(lift: DataFrame, lineitem: DataFrame, orders: DataFrame,
      k: Int, n: Int): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val itemRecs = itemCosineTopKFromLift(lift, k)
      .select(col("item"), col("rec"), col("cos2_ppm"))
    val bought = lineitem.select(col("l_orderkey").as("ok"), col("l_partkey").as("item"))
      .join(orders.select(col("o_orderkey").as("ok"), col("o_custkey").as("cust")), "ok")
      .select("cust", "item").distinct()
    val scored = bought.join(itemRecs, "item")
      .groupBy(col("cust"), col("rec"))
      .agg(sum("cos2_ppm").as("score_ppm"), count(lit(1)).as("n_sources"))
    val fresh = scored.join(
      bought.select(col("cust"), col("item").as("rec")), Seq("cust", "rec"), "left_anti")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cust")).orderBy(col("score_ppm").desc, col("rec"))
    fresh.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= n)
      .select(col("cust"), col("rnk"), col("rec"), col("score_ppm"), col("n_sources"))
  }
}
