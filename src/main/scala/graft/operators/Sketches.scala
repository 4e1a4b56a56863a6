package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.mixed_hash32

/** DataFrame-shaped sketches (the `Aggregator`-shaped ones — KMV,
  * Misra-Gries, Count-Min — live in `graft.functions`).
  */
object Sketches {

  /** HyperLogLog register table per group: `reg = h % m`, `rho` =
    * leading-zero count of the remaining hash bits + 1, `max_rho` = max
    * per register. The register table IS the HLL sketch — exactly `≤ m`
    * rows per group regardless of cardinality, and MERGEABLE: the
    * sketch of a union is the elementwise register max (proven in
    * SamplingSketchSpec), which is how partial sketches from map tasks,
    * days, or shards combine. Duplicate keys are absorbed by the max —
    * no distinct pass needed.
    *
    * The float estimate (`α·m²/Σ2^(−rho)`) deliberately stays OUT of
    * this output so the table is integer-exact and engine-portable; the
    * spec computes it driver-side and checks the error band. The hash
    * is the same rolling-hash → MixHash32 avalanche pipeline as the KMV
    * sketch, replayable in SQL ([[graft.OracleSql.hllRegisters]]).
    *
    * Shape at 100 TB: one combinable aggregation — map-side partial
    * max per (group, reg) caps every map task's output at m rows per
    * group, so the shuffle carries sketches, not data. This is the
    * distinct-count shape when KMV's k-th-order statistic is too big:
    * HLL state is m bytes vs KMV's k hashes.
    */
  def hllRegisters(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      m: Int = 64): DataFrame = {
    require(m > 0 && (m & (m - 1)) == 0, "m must be a power of two")
    val restBits = 32 - Integer.numberOfTrailingZeros(m)
    val h32 = mixed_hash32(
      concat_ws(":", lit("hll"), col(keyCol).cast("string")))
    df.select(col(groupCol), h32.as("h"))
      .withColumn("reg", expr(s"h % $m"))
      .withColumn("rest", expr(s"h div $m"))
      .withColumn("rho",
        expr(s"${restBits + 1} - ${graft.OracleSql.bitLenSum("rest", restBits)}"))
      .groupBy(col(groupCol), col("reg"))
      .agg(max(col("rho")).cast("int").as("max_rho"))
  }

  /** Roll an HLL register table up a dimension hierarchy: re-key each
    * group through `mapping` (`fromCol` → `toCol`, e.g. nation →
    * region) and take the elementwise register max. Because HLL union
    * IS the register max and max is associative, the rolled-up table
    * is BIT-IDENTICAL to a sketch built directly at the coarse level —
    * the property that lets a 100 TB job sketch at the finest grain
    * once and serve every coarser rollup from sketch-sized inputs
    * (the `sketch_hll_rollup` oracle proves the identity cross-engine:
    * DuckDB rebuilds at region level, Spark merges nation sketches).
    *
    * `mapping` must be unique on `fromCol` (a hierarchy, not a graph);
    * it broadcasts — dimension-sized by construction.
    */
  def hllMergeRegisters(
      registers: DataFrame,
      mapping: DataFrame,
      fromCol: String,
      toCol: String): DataFrame =
    registers
      .join(broadcast(mapping.select(col(fromCol), col(toCol))), fromCol)
      .groupBy(col(toCol), col("reg"))
      .agg(max(col("max_rho")).cast("int").as("max_rho"))

  /** KMV set-operation estimates: |A|, |B|, |A∪B|, |A∩B| from two
    * k-minimum-value sketches — the cross-dataset overlap estimator at
    * sketch size. KMV union is exact on sketches (the k smallest of
    * A∪B are among the k smallest of each side), and the intersection
    * estimate is the classic Jaccard-via-union-sketch form
    * `shared·est(∪) div k` where `shared` counts union-sketch hashes
    * present in BOTH sketches (Beyer et al., SIGMOD 2007). Degenerate
    * exactness: a union sketch smaller than k IS the whole union, so
    * the intersection estimate collapses to the exact shared count.
    * Same portable hash and `cap div kth` estimator as
    * `sketch_kmv_distinct`, so everything replays in integer SQL.
    *
    * Shape at 100 TB: each side reduces to k hashes via a
    * TakeOrdered over the distinct-hash stream (map-side partial
    * top-k); every join afterward touches k-row tables only. The
    * sketches are the ONLY thing the two datasets exchange — the
    * overlap of two 100 TB corpora costs two scans and kilobytes of
    * traffic.
    */
  def kmvSetEstimates(
      a: DataFrame,
      b: DataFrame,
      keyCol: String,
      k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val cap = (k - 1).toLong * 4294967296L
    def sketch(df: DataFrame): DataFrame = graft.operators.Caches.persisted(
      df.select(mixed_hash32(
          concat_ws(":", lit("kmv"), col(keyCol).cast("string"))).as("h32"))
        .distinct().orderBy(col("h32")).limit(k))
    val ska = sketch(a)
    val skb = sketch(b)
    val sku = graft.operators.Caches.persisted(
      ska.union(skb).distinct().orderBy(col("h32")).limit(k))
    def stats(s: DataFrame, tag: String): DataFrame =
      s.agg(count(lit(1)).as(s"__n_$tag"), max(col("h32")).as(s"__kth_$tag"))
    val shared = sku.join(ska, "h32").join(skb, "h32")
      .agg(count(lit(1)).as("n_shared_topk"))
    def est(tag: String) =
      expr(s"CASE WHEN __n_$tag < $k THEN __n_$tag ELSE $cap div __kth_$tag END")
    stats(ska, "a").crossJoin(stats(skb, "b")).crossJoin(stats(sku, "u"))
      .crossJoin(shared)
      .select(
        lit(k).as("k"),
        est("a").as("est_a"),
        est("b").as("est_b"),
        est("u").as("est_union"),
        col("n_shared_topk"),
        // __n_u >= k is guaranteed in the otherwise() branch, so the
        // union estimate there is always the cap/kth form
        when(col("__n_u") < k, col("n_shared_topk"))
          .otherwise(expr(s"n_shared_topk * ($cap div __kth_u) div $k"))
          .as("est_intersect"))
  }

  /** Count-Min sketch registers: `depth × width` integer counters,
    * each row hashed into one bucket per depth row by the seeded
    * rolling hash (`'cm<r>:' || item`). Point-frequency estimates read
    * `min` over the depth buckets — always ≥ the true count, within
    * `ε·N` of it with probability 1 − δ at width = e/ε, depth = ln(1/δ).
    *
    * Shape at 100 TB: the registers are ONE combinable groupBy into at
    * most depth·width groups — fixed-size state regardless of input
    * size, map-side partials absorbing everything, mergeable across
    * days/streams by adding counters (same property [[hllRegisters]]
    * exploits). The explode is map-side; nothing item-cardinality-sized
    * is ever shuffled. Deterministic: the hash is the seeded rolling
    * hash both engines replay byte-for-byte.
    */
  def countMinRegisters(
      df: DataFrame,
      itemExpr: org.apache.spark.sql.Column,
      depth: Int = 4,
      width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 1)
    df.select(itemExpr.cast("string").as("__item"))
      .select(col("__item"), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col("r"),
        pmod(graft.functions.rolling_hash(
          concat(lit("cm"), col("r").cast("string"), lit(":"), col("__item"))),
          lit(width.toLong)).as("bucket"))
      .groupBy("r", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** JOIN-SIZE estimation from Count-Min registers — what a planner
    * needs BEFORE committing to a join strategy at 100 TB: the exact
    * equi-join row count is the frequency-vector inner product
    * Σₖ f_A(k)·f_B(k), and the classic AGMS/CM estimate is the MIN over
    * depth rows of the register dot product Σ_b cntA[r,b]·cntB[r,b] —
    * each row-dot equals the true inner product PLUS nonnegative
    * collision cross-terms, so the estimate NEVER undercounts (the safe
    * direction for planning: an overestimate never picks a broadcast
    * that OOMs). Width must be a power of two (the register hash is the
    * signed rolling hash; pmod by 2ⁿ equals the unsigned low bits both
    * engines agree on).
    *
    * Scale shape: each side folds to depth×width registers in one
    * combinable pass (fixed-size state — the two tables are never
    * joined); the dot is a register-sized join. The exact count rides
    * along as the demonstration truth side, computed from group counts
    * (never materializing the join itself). Sizing: per-row collision
    * noise ≈ |A|·|B|/width, so pick width ≳ |A|·|B| / (acceptable
    * absolute error) — width is the whole accuracy dial, and registers
    * stay millions of rows even at 100 TB inputs.
    */
  def cmJoinSizeEstimate(
      a: DataFrame, aKey: org.apache.spark.sql.Column,
      b: DataFrame, bKey: org.apache.spark.sql.Column,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    require(width >= 2 && (width & (width - 1)) == 0, "width: power of two")
    val ra = countMinRegisters(a, aKey, depth, width).toDF("r", "bucket", "cnt_a")
    val rb = countMinRegisters(b, bKey, depth, width).toDF("r", "bucket", "cnt_b")
    val rowDots = ra.join(rb, Seq("r", "bucket"))
      .groupBy("r").agg(sum(col("cnt_a") * col("cnt_b")).as("dot"))
    // a row with NO shared bucket proves the inner product is 0 — its
    // dot is 0, not absent (disjoint key sets estimate 0 exactly)
    val est = a.sparkSession.range(depth).select(col("id").cast("int").as("r"))
      .join(rowDots, Seq("r"), "left")
      .agg(min(coalesce(col("dot"), lit(0L))).as("est_join_rows"))
    val ka = a.select(aKey.cast("string").as("__k"))
      .groupBy("__k").agg(count(lit(1)).as("__na"))
    val kb = b.select(bKey.cast("string").as("__k"))
      .groupBy("__k").agg(count(lit(1)).as("__nb"))
    val exact = ka.join(kb, "__k")
      .agg(coalesce(sum(col("__na") * col("__nb")), lit(0L)).as("true_join_rows"))
    est.crossJoin(exact)
  }

  /** Heavy hitters through the Count-Min sketch: the true top-`topK`
    * items (the demonstration truth side) alongside their sketch
    * estimates — `est_n = min` over each item's depth buckets, read
    * from [[countMinRegisters]]. `est_n ≥ true_n` always; the gap IS
    * the collision error the width bounds. The register build is the
    * scale path (fixed-size state); the truth side exists to gate the
    * estimate against the oracle.
    */
  def heavyHitters(
      df: DataFrame,
      itemExpr: org.apache.spark.sql.Column,
      topK: Int = 20,
      depth: Int = 4,
      width: Int = 256): DataFrame = {
    val items = df.select(itemExpr.cast("string").as("item"))
    val regs = countMinRegisters(df, itemExpr, depth, width)
    val truth = items.groupBy("item").agg(count(lit(1)).as("true_n"))
    val top = truth
      .orderBy(col("true_n").desc, col("item"))
      .limit(topK)
    val probes = top
      .select(col("item"), col("true_n"), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col("item"), col("true_n"), col("r"),
        pmod(graft.functions.rolling_hash(
          concat(lit("cm"), col("r").cast("string"), lit(":"), col("item"))),
          lit(width.toLong)).as("bucket"))
    probes.join(broadcast(regs), Seq("r", "bucket"))
      .groupBy("item", "true_n")
      .agg(min(col("cnt")).as("est_n"))
  }

  /** Rolling distinct estimate over a trailing `windowDays`-day window
    * from mergeable per-day HLL sketches — "distinct users in the last
    * 7 days, for every day" WITHOUT the user×day dedup table an exact
    * answer needs ([[graft.operators.Events]]' WAU path); this is the
    * sketch answer at m registers per day, the shape that survives
    * when the distinct key is unbounded (IPs, sessions, ngrams).
    *
    * Pipeline: one combinable [[hllRegisters]] pass per day (the only
    * data-sized step) → registers densified onto the calendar×m grid
    * (crossJoin of two BOUNDED sides: distinct days × m literal
    * registers) → per-register rolling MAX over a day-indexed RANGE
    * frame (window union = register max, the same associativity
    * `sketch_hll_rollup` proves) → per-day integer state
    * S = Σⱼ 2^(P − ρⱼ) and the pinned integer estimator
    * `est = (α_ppk·m²·2^P) div (1000·S)` with α_ppk derived from m
    * (673/697/709/… — Flajolet's bias constants) — every step exact, so
    * the oracle matches bit-for-bit. The float-free estimator is the
    * standard α_m·m²/Σ2^(−ρ) on the ppk grid (α₆₄ ≈ 0.709); small-n
    * linear-counting correction is deliberately omitted — pinned,
    * engine-portable arithmetic beats the last few % of accuracy here.
    */
  def hllRollingDistinct(
      df: DataFrame,
      dayCol: Column,
      keyCol: String,
      m: Int = 64,
      windowDays: Int = 7,
      alphaPpk: Int = 0): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    require(m >= 16 && (m & (m - 1)) == 0, "m must be a power of two >= 16")
    // alpha is COUPLED to m (Flajolet et al.'s bias constants); 0 means
    // derive — passing an explicit value is for oracle-pinning only
    val alpha =
      if (alphaPpk > 0) alphaPpk
      else if (m == 16) 673
      else if (m == 32) 697
      else if (m == 64) 709
      else math.round(721.3 / (1.0 + 1.079 / m)).toInt
    val restBits = 32 - Integer.numberOfTrailingZeros(m)
    val p = restBits + 1
    val base = df.withColumn("__d", dayCol)
    val regs = df.sparkSession.range(m)
      .select(col("id").cast("long").as("reg"))
    val daily = Caches.persisted(hllRegisters(base, "__d", keyCol, m)
      .withColumnRenamed("__d", "d"))
    // day list off the REGISTER table (any day with events has at
    // least one register row) — metadata-sized, not a second corpus
    // scan; the daily register build stays the only data-sized step
    val days = daily.select("d").distinct()
    val grid = days.crossJoin(broadcast(regs)) // calendar × m: bounded
    val w = org.apache.spark.sql.expressions.Window.partitionBy("reg")
      .orderBy(col("__x")).rangeBetween(-(windowDays - 1).toLong, 0L)
    grid.join(daily, Seq("d", "reg"), "left")
      .withColumn("__x", datediff(col("d"), to_date(lit("1970-01-01"))))
      .withColumn("__rho7", max(col("max_rho")).over(w))
      .groupBy("d")
      .agg(
        count(col("__rho7")).as("regs_hit"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $p - coalesce(__rho7, 0))"))
          .as("s_sum"))
      .withColumn("est_window", expr(
        s"($alpha * CAST($m AS BIGINT) * $m * shiftleft(CAST(1 AS BIGINT), $p)) " +
          "div (1000 * s_sum)"))
  }
}
