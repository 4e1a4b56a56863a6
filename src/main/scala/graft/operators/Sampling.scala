package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic, engine-portable dataset splitting — the
  * train/val/test primitive for training-data pipelines.
  *
  * `df.randomSplit` re-draws on every run and every recomputation (a
  * lost executor re-rolls its partition), which leaks validation rows
  * into training across runs. This split is a PURE FUNCTION of the row
  * key: `split(row) = f(md5(salt || key))`, so it is
  *
  *   - stable across runs, re-runs, partitionings and engines — the
  *     same key lands in the same split forever;
  *   - leak-proof under dataset growth: adding rows never moves an
  *     existing key between splits;
  *   - zero-shuffle: a narrow projection that fuses into the scan's
  *     codegen stage.
  *
  * Mechanics: the first 4 hex chars of `md5(salt || ':' || key)` are a
  * uniform draw on a 65,536-cell grid; cumulative fraction thresholds
  * on that grid pick the split. Comparison is LEXICOGRAPHIC on the
  * fixed-width lowercase hex — identical to numeric comparison, and
  * expressible verbatim in any engine with `md5` (the DuckDB oracle
  * replays it as a CASE over the same hex literals, see
  * `OracleSql.hashSplitCase`).
  *
  * The salt namespaces the assignment: different salts give
  * independent splits of the same keys (e.g. a fresh holdout per
  * experiment) — without it, every 80/10/10 split of any dataset would
  * correlate.
  */
object Sampling {

  /** Cumulative upper-bound hex thresholds (exclusive) for all but the
    * last split; the last takes the remainder. Fractions must be
    * positive and sum to ~1 (grid rounding absorbs < 1/65536).
    */
  private[graft] def thresholds(fractions: Seq[(String, Double)]): Seq[(String, String)] = {
    require(fractions.sizeIs >= 2, "need at least two splits")
    require(fractions.forall(_._2 > 0), "fractions must be positive")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9, "fractions must sum to 1")
    var cum = 0.0
    fractions.init.map { case (name, f) =>
      cum += f
      // clamp to the grid max: a cumulative fraction that rounds to
      // 65536 would print 5 hex chars ("10000") and the fixed-width
      // lexicographic compare would misorder it below 4-char hashes,
      // silently collapsing a near-1.0 non-final split
      name -> f"${math.min(math.round(cum * 65536), 65535L).toInt}%04x"
    }
  }

  /** The split-label column for `key` under `salt`/`fractions`.
    *
    * `concat` (not `concat_ws`) so a NULL key nulls the hash: the
    * when-chain then falls through to the last split in BOTH engines
    * (`concat_ws` would silently hash the bare salt on the Spark side
    * while the oracle's `||` yields NULL — an engine divergence).
    */
  private[graft] def splitCol(
      key: Column, salt: String, fractions: Seq[(String, Double)]): Column = {
    val h = md5(concat(lit(salt + ":"), key.cast("string")).cast("binary")).substr(1, 4)
    val last = lit(fractions.last._1)
    thresholds(fractions).foldRight(last: Column) { case ((name, hex), rest) =>
      when(h < lit(hex), lit(name)).otherwise(rest)
    }
  }

  /** Adds `splitColName` to `df`. Keys must be stable identifiers (a
    * content hash also works and then splits by content identity).
    */
  def hashSplit(
      df: DataFrame,
      keyCol: String,
      salt: String,
      fractions: Seq[(String, Double)],
      splitColName: String = "split"): DataFrame =
    df.withColumn(splitColName, splitCol(col(keyCol), salt, fractions))

  /** k-fold cross-validation assignment: fold `f0..f{k−1}` as an equal
    * split of the hash grid — [[hashSplit]] with k equal fractions, so
    * every fold inherits the full stability contract (pure function of
    * salt+key, engine-portable, zero-shuffle) and the oracle replays it
    * with the same threshold literals. Train/test for fold i is
    * `fold != s"f$i"` / `fold == s"f$i"` — no per-fold re-draw.
    */
  def kFold(
      df: DataFrame,
      keyCol: String,
      salt: String,
      k: Int,
      foldColName: String = "fold"): DataFrame = {
    require(k >= 2, "need at least two folds")
    hashSplit(df, keyCol, salt,
      (0 until k).map(i => s"f$i" -> 1.0 / k), foldColName)
  }

  /** Leakage-safe split: near-duplicate documents NEVER straddle a
    * split boundary. [[hashSplit]] keyed on the doc id still leaks —
    * two near-identical crawls of one page land in train and test
    * independently, and the model is then evaluated on (a paraphrase
    * of) its own training data. Here the split key is the near-dup
    * CLUSTER id ([[Dedup.dedupClusters]] over the caller's pair list:
    * the smallest doc id reachable through near-dup edges), so a whole
    * duplicate cluster moves as one unit; docs in no pair fall back to
    * their own id — for them this IS `hashSplit`, same salt, same
    * assignment.
    *
    * Same determinism contract as [[hashSplit]] (pure function of
    * salt+cluster key), with one caveat: adding a NEW near-dup edge can
    * merge clusters and move the merged cluster's rows together —
    * that's the feature (the merged pair must not straddle), not a
    * stability bug; rows in unchanged clusters never move.
    *
    * Shape at 100 TB: the pair list is the expensive input (see the
    * dedup family for its scale tiers); given pairs, clustering is
    * O(log diameter) keyed shuffles and the split itself is one
    * broadcast-or-shuffle left join + a narrow projection.
    */
  def clusterSafeSplit(
      df: DataFrame,
      pairs: DataFrame,
      idCol: String,
      salt: String,
      fractions: Seq[(String, Double)],
      splitColName: String = "split"): DataFrame = {
    val clusters = Dedup.dedupClusters(pairs)
      .withColumnsRenamed(Map("doc_id" -> idCol, "cluster_id" -> "__cluster"))
    df.join(clusters, Seq(idCol), "left")
      .withColumn(splitColName,
        splitCol(coalesce(col("__cluster"), col(idCol)), salt, fractions))
      .drop("__cluster")
  }

  /** Train/eval leakage audit: for the SAME near-dup pair set, count
    * how many pairs straddle a split boundary under (a) the naive
    * per-doc hash split and (b) the cluster-safe split — each
    * straddling pair is an eval example whose near-duplicate sits in
    * training. The cluster-safe count is zero BY CONSTRUCTION (both
    * ends of a pair share a component, hence a split key); emitting it
    * beside the naive count makes the audit self-verifying rather than
    * vacuous, and the naive count quantifies the leakage the
    * cluster-safe split bought you.
    *
    * Shape at scale: the split table is built once (one CC run + two
    * split expressions), pairs join it twice on the doc key — all
    * pair-table-sized, never corpus².
    *
    * Output: (method, n_cross_pairs, n_pairs).
    */
  def splitLeakageAudit(
      docs: DataFrame,
      pairs0: DataFrame,
      idCol: String,
      salt: String,
      fractions: Seq[(String, Double)]): DataFrame = {
    // the pair set feeds BOTH the component build and the cross-split
    // count — persist it once so an expensive candidate pipeline
    // (inverted-index n-gram join) never runs twice
    val pairs = Caches.persisted(pairs0.select("id_a", "id_b"))
    val clusters = Dedup.dedupClusters(pairs)
      .withColumnsRenamed(Map("doc_id" -> idCol, "cluster_id" -> "__cluster"))
    val spl = docs.select(col(idCol)).join(clusters, Seq(idCol), "left")
      .select(col(idCol),
        splitCol(col(idCol), salt, fractions).as("__naive"),
        splitCol(coalesce(col("__cluster"), col(idCol)), salt, fractions)
          .as("__safe"))
    val a = spl.select(col(idCol).as("id_a"),
      col("__naive").as("__na"), col("__safe").as("__sa"))
    val b = spl.select(col(idCol).as("id_b"),
      col("__naive").as("__nb"), col("__safe").as("__sb"))
    pairs.join(a, "id_a").join(b, "id_b")
      .agg(
        coalesce(sum(when(col("__na") =!= col("__nb"), 1L).otherwise(0L)), lit(0L))
          .as("__naive_x"),
        coalesce(sum(when(col("__sa") =!= col("__sb"), 1L).otherwise(0L)), lit(0L))
          .as("__safe_x"),
        count(lit(1)).as("n_pairs"))
      .select(
        expr("stack(2, 'hash_by_doc', __naive_x, 'cluster_safe', __safe_x) " +
          "AS (method, n_cross_pairs)"),
        col("n_pairs"))
  }

  /** Exclusive upper-bound hex threshold for a single keep-rate on the
    * 65,536 grid (4 lowercase hex chars). Rates ≥ 1 have no threshold
    * (keep everything).
    */
  private[graft] def rateHex(rate: Double): Option[String] = {
    require(rate >= 0, "rate must be non-negative")
    if (rate >= 1.0) None
    else Some(f"${math.min(math.round(rate * 65536), 65535L).toInt}%04x")
  }

  /** Deterministic per-stratum downsampling — the corpus-mixing
    * primitive: "keep 100% of wikipedia, 10% of commoncrawl". Same
    * stability contract as [[hashSplit]] (pure function of salt+key:
    * re-runs, engine changes, and corpus growth never re-draw a kept
    * row), and the same zero-shuffle narrow-projection shape.
    *
    * `rates` maps stratum values to keep-rates; strata not listed get
    * `defaultRate`. Keeping is NOT independent across salts of the
    * nested-subset property: lowering a rate under the SAME salt keeps
    * a strict subset of the rows (thresholds nest), which lets a mix be
    * tuned without churning the retained set.
    */
  def stratifiedKeep(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      salt: String,
      rates: Seq[(String, Double)],
      defaultRate: Double): DataFrame = {
    // concat (null-propagating) for the same cross-engine null-key
    // contract as splitCol: a NULL key is dropped in both engines
    val h = md5(concat(lit(salt + ":"), col(keyCol).cast("string")).cast("binary"))
      .substr(1, 4)
    def keep(rate: Double): Column =
      rateHex(rate).map(h < lit(_)).getOrElse(lit(true))
    val cond = rates.foldRight(keep(defaultRate)) { case ((stratum, rate), rest) =>
      when(col(strataCol) === stratum, keep(rate)).otherwise(rest)
    }
    df.filter(cond)
  }

  /** Deterministic CLASS REBALANCING — downsample every class to the
    * minority class's size, the classifier-training prerequisite a
    * skewed corpus needs (a 99:1 label mix trains a constant
    * predictor). Exact-k per class, not Bernoulli: each row ranks
    * within its class by the portable md5 draw (key tiebreak — a total
    * order, so the survivor set is a pure function of salt + corpus),
    * and ranks ≤ the minimum class count survive. Re-runs, engine
    * changes, and partitioning never re-draw a decision.
    *
    * Scale shape: one combinable class-count aggregate (class-count
    * rows, broadcast back), one class-keyed window for the rank —
    * a single shuffle partitioned by class. A pathologically hot
    * class makes that window the ordinary skew case (salting or
    * per-class range partitioning apply unchanged); the draw column
    * is codegen'd md5, no UDF.
    */
  def classBalance(
      df: DataFrame,
      keyCol: String,
      classCol: String,
      salt: String): DataFrame = {
    val counts = df.groupBy(col(classCol)).agg(count(lit(1)).as("__cn"))
    val minCount = counts.agg(min(col("__cn"))).head().getLong(0)
    val h = md5(concat(lit(salt + ":"), col(keyCol).cast("string")).cast("binary"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(classCol)).orderBy(h, col(keyCol))
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= minCount)
      .drop("__rk")
  }

  /** Deterministic weighted Bernoulli keep — "sample proportional to
    * quality/length": each row survives with probability
    * `weight / wMax`, decided by a pure function of salt+key, so
    * re-runs, engine changes, and corpus growth never re-draw a
    * decision (same stability contract as [[hashSplit]]).
    *
    * All-integer thresholding: the rate is quantized on the 65,536
    * grid by integer division `(w·65536)/wMax` and rendered as a
    * fixed-width 4-hex threshold compared lexicographically against
    * the md5 draw — no float at the boundary, replayable verbatim in
    * any engine with md5/hex. Rows with `w ≥ wMax` always keep;
    * `w ≤ 0` always drops. Zero-shuffle narrow projection.
    *
    * `weightCol` must be integral with `w·65536` inside Long range
    * (w < ~1.4e14 — any count/length weight qualifies).
    */
  def weightedKeep(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      salt: String,
      wMax: Long): DataFrame = {
    require(wMax > 0, "wMax must be positive")
    val h = md5(concat(lit(salt + ":"), col(keyCol).cast("string")).cast("binary"))
      .substr(1, 4)
    val w = col(weightCol).cast("long")
    val t = lpad(lower(hex((w * 65536L) / wMax)), 4, "0")
    df.filter(w >= wMax || (w > 0L && h < t))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES)
    * — [[weightedKeep]]'s fixed-size sibling: draw EXACTLY k rows with
    * inclusion pushed toward weight, no row twice. Each row gets the
    * exponential-race key `ln(u)/w` (u a deterministic uniform from
    * the salted md5's first 8 hex digits, shifted off 0 by +0.5 on the
    * 2³² grid; equivalent to ranking u^(1/w)) and the sample is the
    * top-k by key — the classic distributed one-pass reservoir
    * equivalent, here derandomized so retries and the oracle replay
    * the identical sample. Rows with w ≤ 0 never qualify.
    *
    * Scale shape: a narrow zero-shuffle projection plus ONE
    * distributed top-k (`orderBy.limit` = per-partition take-ordered +
    * a k-row driver merge) — never a global sort. The hex→integer
    * bridge is portable: Spark `conv(hex, 16, 10)`, DuckDB
    * `CAST('0x'||hex AS BIGINT)`, identical integers.
    *
    * @return the k sampled rows as (idCol, weightCol, es_key, rnk)
    */
  def weightedTopK(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      salt: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val hexPfx = substring(
      md5(concat(lit(salt + ":"), col(idCol).cast("string"))), 1, 8)
    val u = (conv(hexPfx, 16, 10).cast("long").cast("double") + 0.5) /
      4294967296.0
    val w = col(weightCol).cast("long")
    val keyed = df.where(w > 0L)
      .select(col(idCol), w.as(weightCol), (log(u) / w.cast("double")).as("es_key"))
      .orderBy(col("es_key").desc, col(idCol))
      .limit(k)
    // rank assigned AFTER the k-row cut: the window runs on k rows,
    // not the corpus
    keyed.withColumn("rnk",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("es_key").desc, col(idCol))).cast("int"))
  }

  /** Prefix-sum packing: assign each row (document) of a group to a
    * fixed-budget bin — the corpus-assembly step that batches documents
    * into training shards / sequence-packing buckets of roughly
    * `budget` units (tokens, chars, bytes).
    *
    * Rows are ordered deterministically within the group (by `idCol`)
    * and binned by `floor(prefix_sum_before / budget)`: each row lands
    * wholly in the bin where it starts, so bins overflow by AT MOST one
    * row's weight. That bounded overflow is the price of a distributed
    * formulation — exact greedy packing is inherently sequential, while
    * this is one window per group, and the assignment is a pure
    * function of the (group, order, weights) so re-runs agree.
    *
    * Groups are the parallelism unit (one task per group's window, as
    * with any per-group sequential semantics); shard-count per group =
    * group weight / budget. `idCol` must be unique within a group — a
    * duplicate id makes the prefix-sum order, and therefore the bin
    * assignment, engine-dependent.
    */
  def packByBudget(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      weightCol: String,
      budget: Long,
      binCol: String = "bin"): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn(binCol,
      floor(coalesce(sum(col(weightCol)).over(w), lit(0L)) / budget).cast("int"))
  }

  /** GPT-style sequence packing: concatenate the corpus's token stream
    * in `idCol` order and cut it into fixed `capacity`-token context
    * windows, letting documents CROSS window boundaries (the standard
    * pretraining layout — no padding, 100% fill except the final
    * window). Emits one row per (document, window) span:
    * `(idCol, seqCol, begin_in_seq, n_in_seq)` — the manifest a loader
    * needs to materialize window `seq` by slicing each listed doc's
    * tokens. Rows with `weightCol <= 0` (empty docs) are dropped.
    *
    * The global token offset is an exclusive prefix sum over the doc
    * order — computed WITHOUT a global window (a single-reducer sort
    * of the whole corpus at scale). Two-level shape instead:
    * range-partition by `idCol`, per-partition running sums via a
    * window PARTITIONED BY the range id (parallel — each range sorts
    * independently), plus per-range totals (one row per range,
    * collected and prefix-summed at the driver, broadcast back).
    * Range boundaries vary run to run, but a prefix sum over
    * internally-sorted ranges of a unique key equals the one global
    * prefix sum, so the output is a pure function of (data, order).
    *
    * Window membership is then pure integer arithmetic: a doc spanning
    * global tokens `[start, end)` appears in windows
    * `start div capacity .. (end-1) div capacity`, emitted via an
    * in-plan `sequence`/`explode` — a doc's span count is
    * `O(doc_len/capacity)`, so the expansion is corpus-sized, never
    * quadratic.
    */
  def packContextStream(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      capacity: Long,
      seqCol: String = "seq_id"): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val spark = df.sparkSession
    val ranged = Caches.persisted(
      df.filter(col(weightCol) > 0)
        .select(col(idCol), col(weightCol).cast("long").as("__w"))
        .repartitionByRange(col(idCol))
        .sortWithinPartitions(col(idCol))
        .withColumn("__pid", spark_partition_id()))
    // exclusive prefix offsets of the ranges: one row per range
    val totals = ranged.groupBy("__pid").agg(sum(col("__w")).as("__t"))
      .orderBy("__pid").collect()
    var off = 0L
    val offRows = totals.map { r =>
      val m = org.apache.spark.sql.Row(r.getInt(0), off)
      off += r.getLong(1); m
    }.toSeq
    val offSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        "__pid", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField(
        "__off", org.apache.spark.sql.types.LongType, nullable = false)))
    val offs = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1), offSchema)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cap = lit(capacity)
    ranged
      .withColumn("__within", coalesce(sum(col("__w")).over(w), lit(0L)))
      .join(broadcast(offs), Seq("__pid"))
      .withColumn("__start", col("__off") + col("__within"))
      .withColumn("__end", col("__start") + col("__w"))
      .withColumn(seqCol,
        explode(sequence(
          expr(s"__start div $capacity"), expr(s"(__end - 1) div $capacity"))))
      .withColumn("begin_in_seq",
        greatest(col("__start"), col(seqCol) * cap) - col(seqCol) * cap)
      .withColumn("n_in_seq",
        least(col("__end"), (col(seqCol) + 1) * cap) -
          greatest(col("__start"), col(seqCol) * cap))
      .select(col(idCol), col(seqCol), col("begin_in_seq"), col("n_in_seq"))
  }

  /** Length-bucket padding accounting: assign each row the next
    * power-of-two at or above its length (`2^ceil(log2 len)`, len ≥ 1)
    * — the bucketing dynamic-padding batch schedulers use — and report
    * per-(group, bucket) document count, payload, padding, and waste
    * ppm (`padding·10⁶ / (payload+padding)`). The report says what
    * fraction of a training batch's compute would be spent on pad
    * tokens under each bucket — the signal for choosing bucket
    * boundaries or sequence-packing instead.
    *
    * The bucket is computed in pure integer arithmetic
    * (`shiftleft(1, bitlen(len−1))` with bitlen as a comparison sum,
    * exact to `maxBits`) — no float log2, whose rounding at exact
    * powers of two is engine lottery. One combinable aggregation;
    * zero joins.
    */
  def lengthBucketStats(
      df: DataFrame,
      groupCol: String,
      lenCol: String,
      maxBits: Int = 30): DataFrame = {
    require(maxBits >= 1 && maxBits <= 62)
    val bitlen = (0 until maxBits)
      .map(j => s"CAST($lenCol - 1 >= ${1L << j} AS INT)").mkString(" + ")
    df.filter(col(lenCol) >= 1)
      .withColumn("bucket", expr(s"shiftleft(CAST(1 AS BIGINT), $bitlen)"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(lenCol)).as("sum_len"),
        sum(col("bucket") - col(lenCol)).as("sum_pad"))
      .withColumn("waste_ppm",
        expr("sum_pad * 1000000 div (sum_len + sum_pad)"))
  }

  /** Deterministic source-interleaved training order — the
    * reproducible "global shuffle" for a training corpus. Each row
    * gets `order_key = rk·nSources + sourceIndex`, where `rk` is the
    * row's salted-md5 rank WITHIN its source and `sourceIndex` is the
    * source's lexicographic index: reading in `order_key` order visits
    * row r of every source before row r+1 of any source, so
    * consecutive batches draw from all sources instead of clumping
    * (equal-sized sources give exact round-robin). The key is a pure
    * function of (data, salt): re-runs, recomputations, engines, and
    * partitionings produce the identical order, and the salt
    * namespaces independent epoch orders.
    *
    * No window ANYWHERE — not even per source. A per-source
    * `row_number` window funnels each source through one reducer, and
    * a real training mix is dominated by one source (Common Crawl is
    * routinely 90% of the corpus), so that "parallel" rank is a
    * single-task sort of 90% of 100 TB. Instead the corpus is
    * range-partitioned on `(source, hash, key)`, sorted within
    * partitions, and `zipWithIndex`ed — the fillSurrogate >100k shape
    * ([[graft.aqi.Nds]]): rows of one source land contiguously in the
    * GLOBAL order but spread across many range partitions, and the
    * per-source rank is recovered as `globalIdx − offset(source)`
    * where the exclusive prefix offsets come from a one-row-per-source
    * count (collected at the driver — sources are a mix spec, not
    * data-scale; hard-capped below). Range boundaries vary run to run,
    * but concatenating internally-sorted ranges of a unique sort key
    * reproduces the one global order, so the rank — and the key — stay
    * a pure function of (data, salt).
    */
  def interleaveOrder(
      df: DataFrame,
      sourceCol: String,
      keyCol: String,
      salt: String = "ilv"): DataFrame = {
    val spark = df.sparkSession
    val stats = df.groupBy(col(sourceCol).as("__src"))
      .agg(count(lit(1)).as("__cnt"))
      .orderBy(col("__src"))
      .collect()
    require(stats.length <= 65536,
      s"interleaveOrder: ${stats.length} distinct sources — the source " +
        "column must be an enumerable mix spec (<= 65536 values), not a " +
        "data-scale key")
    val nSrc = stats.length.toLong
    var off = 0L
    val metaRows = stats.zipWithIndex.map { case (r, i) =>
      val m = org.apache.spark.sql.Row(r.get(0), i.toLong, off)
      off += r.getLong(1); m
    }.toSeq
    val metaSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        "__src", df.schema(sourceCol).dataType),
      org.apache.spark.sql.types.StructField(
        "__sidx", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField(
        "__off", org.apache.spark.sql.types.LongType, nullable = false)))
    val meta = spark.createDataFrame(
      spark.sparkContext.parallelize(metaRows, 1), metaSchema)
    val ordered = df
      .withColumn("__h",
        md5(concat(lit(s"$salt:"), col(keyCol).cast("string"))))
      .repartitionByRange(col(sourceCol), col("__h"), col(keyCol))
      .sortWithinPartitions(col(sourceCol), col("__h"), col(keyCol))
    val gSchema = ordered.schema.add(org.apache.spark.sql.types.StructField(
      "__gidx", org.apache.spark.sql.types.LongType, nullable = false))
    val indexed = ordered.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(indexed, gSchema)
      .join(broadcast(meta), col(sourceCol) === col("__src"))
      .withColumn("order_key",
        (col("__gidx") - col("__off")) * lit(nSrc) + col("__sidx"))
      .drop("__h", "__gidx", "__src", "__sidx", "__off")
  }

  /** Deterministic per-group row cap — "at most `cap` examples per
    * class/source", the balance primitive for long-tailed corpora.
    *
    * Rows in each group are ranked by `(md5(salt || ':' || key), key)`
    * — a stable pseudo-random order — and rows ranked past `cap` are
    * dropped. Because the order is a pure function of salt+key, the
    * retained set is reproducible, and growing a group only ever
    * REPLACES retained rows with better-ranked newcomers (never
    * re-rolls the whole group).
    *
    * One shuffle on the group key; the per-group sort is the window
    * sort. Groups are the parallelism unit — a single giant group
    * ranks in one task, the same bound as any top-N-per-group.
    */
  def capPerGroup(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      salt: String,
      cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    val h = md5(concat(lit(salt + ":"), col(keyCol).cast("string")).cast("binary"))
    // nulls-first pinned explicitly (Spark's default, DuckDB's is
    // NULLS LAST — the oracle states it too)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(h.asc_nulls_first, col(keyCol).asc_nulls_first)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap)
      .drop("__rk")
  }

  /** Temporal train/test split with an embargo gap — the time-series
    * counterpart of [[hashSplit]]: evaluation rows must come strictly
    * AFTER training rows, with a buffer zone between them wide enough
    * that lagged features (rolling windows, as-of joins) computed on
    * the train side cannot see into the test period. Rows inside the
    * buffer are labeled `embargo` rather than silently dropped, so the
    * caller decides (and can audit) what the gap cost.
    *
    *   - `train`:   ts <  cutoff − embargo
    *   - `embargo`: cutoff − embargo ≤ ts < cutoff
    *   - `test`:    ts ≥ cutoff
    *
    * Boundaries are exact microsecond integer comparisons (never
    * second-truncated), so a row lands in the same split in every
    * engine. Zero-shuffle: a narrow projection fused into the scan,
    * like every split in this module.
    */
  def temporalSplit(
      df: DataFrame,
      tsCol: String,
      cutoff: java.time.Instant, // Instant, not Timestamp: timezone-proof
      embargo: java.time.Duration,
      splitColName: String = "split"): DataFrame = {
    require(!embargo.isNegative, "embargo must be non-negative")
    val cutMicros = cutoff.getEpochSecond * 1000000L + cutoff.getNano / 1000L
    val embargoMicros = embargo.toNanos / 1000L
    val t = unix_micros(col(tsCol))
    df.withColumn(splitColName,
      when(t < cutMicros - embargoMicros, "train")
        .when(t < cutMicros, "embargo")
        .otherwise("test"))
  }

  /** Exact integer square root: the unique s with s² ≤ n < (s+1)².
    *
    * `floor(sqrt(double))` alone is off by one when the double rounding
    * of √n crosses an integer (possible once n exceeds 2^52); the two
    * integer-compare corrections make the result exact for every
    * non-negative long, and both correct in the same way on any engine,
    * so the oracle can replay the same three-step expression.
    */
  private[graft] def isqrt(n: Column): Column = {
    val s0 = floor(sqrt(n.cast("double"))).cast("long")
    // s0 <= isqrt(Long.MaxValue) = 3037000499 always (sqrt of the
    // double-rounded n cannot reach 3037000500), so s0*s0 fits; the
    // +1 probe is guarded so (s0+1)^2 cannot overflow either — above
    // the guard an undershoot is impossible
    when(s0 < 3037000499L && (s0 + 1) * (s0 + 1) <= n, s0 + 1)
      .when(s0 * s0 > n, s0 - 1)
      .otherwise(s0)
  }

  /** Temperature-scaled mixture allocation — how many examples each
    * source contributes to a fixed training budget, with the
    * head/tail balance set by the temperature exponent:
    * weight w_g ∝ n_g^alpha.
    *
    *   - alpha = 1: proportional (the raw mixture, heads dominate)
    *   - alpha = 0.5: sqrt-smoothed (the standard multilingual /
    *     multi-source rebalancing point — tails upweighted, order kept)
    *   - alpha = 0: uniform (every source equal, sizes ignored)
    *
    * Only these three points are supported because each has an EXACT
    * integer weight (n, isqrt(n), 1) — no float `pow` whose rounding
    * could flip an allocation between engines.
    *
    * Seats are apportioned by the largest-remainder (Hamilton) method,
    * entirely in long arithmetic: base_g = (budget·w_g) div W, and the
    * `budget − Σbase` leftover seats go to the largest remainders
    * (ties to the smaller group key). Allocations are finally capped at
    * n_g — a group cannot contribute more rows than it has; the output
    * keeps (n, w) alongside so a binding cap is visible to the caller.
    *
    * Shape at scale: one combinable count per group; everything after
    * runs on the groups table (sources/languages/domains — orders of
    * magnitude smaller than the corpus), with totals broadcast and the
    * remainder ranking a single-partition window over that tiny table.
    * Requires budget·max(w) to fit a long (budget < 2^63 / max group
    * weight — any real corpus qualifies).
    *
    * @return one row per group: `(groupCol, n, w, alloc)`
    */
  def temperatureAllocation(
      df: DataFrame,
      groupCol: String,
      budget: Long,
      alpha: Double = 0.5): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(alpha == 0.0 || alpha == 0.5 || alpha == 1.0,
      "alpha must be 0, 0.5 or 1 (the exact-integer temperature points)")
    val g = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
    val weighted = g.withColumn("w", alpha match {
      case 0.0 => lit(1L)
      case 0.5 => isqrt(col("n"))
      case _   => col("n")
    })
    val tot = weighted.agg(sum(col("w")).as("__wt"))
    val based = weighted.crossJoin(broadcast(tot))
      .withColumn("__bw", col("w") * budget)
      .withColumn("__base", expr("__bw div __wt"))
      .withColumn("__rem", col("__bw") - col("__base") * col("__wt"))
    val seats = based.agg((lit(budget) - sum(col("__base"))).as("__seats"))
    // constant partition key: same single-task ranking a global window
    // would do (the table is groups-sized), without the planner warning
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0))
      .orderBy(col("__rem").desc, col(groupCol).asc_nulls_first)
    based.crossJoin(broadcast(seats))
      .withColumn("__rrk", row_number().over(rankW))
      .select(col(groupCol), col("n"), col("w"),
        least(col("__base") +
          when(col("__rrk") <= col("__seats"), 1L).otherwise(0L),
          col("n")).as("alloc"))
  }

  /** NEYMAN (variance-optimal) stratified allocation — how many eval /
    * labeling samples each stratum gets from a fixed budget when the
    * goal is the tightest estimate of the population mean: n_h ∝
    * N_h·σ_h (big AND noisy strata earn more; a huge but constant
    * stratum earns almost nothing — the allocation
    * [[temperatureAllocation]]'s size-only weights cannot express).
    *
    * Exact-integer discipline: per-stratum moments (n, Σx, Σx²) are
    * long sums of caller-supplied integer units; the weight is
    * isqrt(n·Σx² − (Σx)²) = floor(N_h·σ_h·√1) on the integer grid
    * (floored at 1 so zero-variance strata keep presence), and seats
    * are apportioned by the same largest-remainder method as the
    * temperature mixer — no float whose rounding could flip a seat
    * between engines. ANSI overflow on n·Σx² is a loud failure;
    * corpora past ~2⁶³ in that product take the decimal(38,0) route.
    *
    * Shape at scale: one combinable moment pass; everything after runs
    * on the strata table. @return `(stratumCol, n, w, alloc)`.
    */
  def neymanAllocation(
      df: DataFrame,
      stratumCol: String,
      valueCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val g = df.groupBy(col(stratumCol)).agg(
      count(lit(1)).as("n"),
      sum(col(valueCol).cast("long")).as("sx"),
      sum(col(valueCol).cast("long") * col(valueCol).cast("long")).as("sxx"))
    val weighted = g.withColumn("w",
      greatest(isqrt(col("n") * col("sxx") - col("sx") * col("sx")), lit(1L)))
    val tot = weighted.agg(sum(col("w")).as("__wt"))
    val based = weighted.crossJoin(broadcast(tot))
      .withColumn("__bw", col("w") * budget)
      .withColumn("__base", expr("__bw div __wt"))
      .withColumn("__rem", col("__bw") - col("__base") * col("__wt"))
    val seats = based.agg((lit(budget) - sum(col("__base"))).as("__seats"))
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0))
      .orderBy(col("__rem").desc, col(stratumCol).asc_nulls_first)
    based.crossJoin(broadcast(seats))
      .withColumn("__rrk", row_number().over(rankW))
      .select(col(stratumCol), col("n"), col("w"),
        least(col("__base") +
          when(col("__rrk") <= col("__seats"), 1L).otherwise(0L),
          col("n")).as("alloc"))
  }

  /** Data-constrained mixture allocation with repetition — how many
    * TOKENS each source contributes to a fixed training budget when
    * sources may be repeated up to `maxEpochs` times (the
    * data-constrained-scaling regime: the desired mix wants more of a
    * small source than it holds even after every allowed epoch).
    *
    * Semantics: temperature weights `w_g ∝ n_g^alpha` (same exact
    * integer points as [[temperatureAllocation]]) set the DESIRED mix;
    * each source is capped at `cap_g = maxEpochs · n_g` tokens; the
    * budget is water-filled exactly — a level `t` such that
    * `Σ min(cap_g, t·w_g) = budget`, every capped source granted its
    * full cap and the residual split across uncapped sources
    * proportionally to `w_g` with largest-remainder rounding, so
    * `Σ alloc = budget` exactly whenever `budget ≤ Σ cap` (above that
    * the corpus is exhausted: every source returns its cap).
    *
    * All comparisons are exact: sources sort by `cap_g/w_g` (IEEE
    * double division — bit-identical on any engine — tie-broken by
    * group), and the capped-prefix test cross-multiplies in
    * DECIMAL(38,0), so no threshold decision ever rides float
    * rounding. The group table is mixture-spec-sized (sources, not
    * rows), making the single-task windows deliberate — the same
    * groups-scale shape as [[temperatureAllocation]].
    *
    * @return one row per group:
    *   `(groupCol, n_toks, w, cap, alloc, epochs_ppm)` with
    *   `epochs_ppm = alloc·10⁶ div n_toks` (1e6 = exactly one epoch).
    */
  def epochAllocation(
      df: DataFrame,
      groupCol: String,
      weightCol: String,
      budget: Long,
      maxEpochs: Int,
      alpha: Double = 0.5): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(maxEpochs >= 1, "maxEpochs must be >= 1")
    require(alpha == 0.0 || alpha == 0.5 || alpha == 1.0,
      "alpha must be 0, 0.5 or 1 (the exact-integer temperature points)")
    val g = df.groupBy(col(groupCol))
      .agg(sum(col(weightCol)).cast("long").as("n_toks"))
      .filter(col("n_toks") > 0)
    val wExpr = alpha match {
      case 0.0 => lit(1L)
      case 0.5 => isqrt(col("n_toks"))
      case _   => col("n_toks")
    }
    val base0 = g.withColumn("w", wExpr)
      .withColumn("cap", col("n_toks") * maxEpochs)
    val W = org.apache.spark.sql.expressions.Window
    val ord = W.partitionBy(lit(0))
      .orderBy((col("cap").cast("double") / col("w")).asc,
        col(groupCol).asc_nulls_first)
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val pre = base0
      .withColumn("__rnk", row_number().over(ord))
      .withColumn("__cumcap",
        sum(col("cap")).over(ord.rowsBetween(W.unboundedPreceding, 0)))
      .withColumn("__cumw",
        sum(col("w")).over(ord.rowsBetween(W.unboundedPreceding, 0)))
      .withColumn("__wtot",
        sum(col("w")).over(W.partitionBy(lit(0))))
      // water-level test for "the first __rnk sources are all capped":
      // cap/w <= (budget - cumcap)/wafter, cross-multiplied exactly
      .withColumn("__cappedP",
        dec(col("cap")) * dec(col("__wtot") - col("__cumw")) <=
          dec(lit(budget) - col("__cumcap")) * dec(col("w")))
    val k = pre.agg(
      coalesce(max(when(col("__cappedP"), col("__rnk"))), lit(0)).as("__k"))
    val marked = pre.crossJoin(broadcast(k))
      .withColumn("__capped", col("__rnk") <= col("__k"))
    val resid = marked.agg(
      (lit(budget) - coalesce(sum(when(col("__capped"), col("cap"))), lit(0L)))
        .as("__r"),
      coalesce(sum(when(!col("__capped"), col("w"))), lit(0L)).as("__wu"))
    val based = marked.crossJoin(broadcast(resid))
      .withColumn("__base",
        when(col("__capped"), col("cap"))
          .otherwise(expr(
            "CAST(CAST(__r AS DECIMAL(38,0)) * w AS DECIMAL(38,0)) div __wu")))
      .withColumn("__rem",
        when(col("__capped"), lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)"))
          .otherwise(dec(col("__r")) * dec(col("w")) -
            dec(col("__base")) * dec(col("__wu"))))
    val seats = based.agg(
      (lit(budget) - sum(col("__base"))).as("__seats"))
    val seatW = W.partitionBy(lit(0))
      .orderBy(col("__capped").asc, col("__rem").desc, col(groupCol).asc_nulls_first)
    based.crossJoin(broadcast(seats))
      .withColumn("__srk", row_number().over(seatW))
      .withColumn("alloc",
        when(col("__capped"), col("cap"))
          .otherwise(col("__base") +
            when(col("__srk") <= col("__seats"), 1L).otherwise(0L)))
      .withColumn("epochs_ppm",
        expr("CAST(CAST(alloc AS DECIMAL(38,0)) * 1000000 AS DECIMAL(38,0)) div n_toks"))
      .select(col(groupCol), col("n_toks"), col("w"), col("cap"),
        col("alloc"), col("epochs_ppm"))
  }

  /** Realize a [[temperatureAllocation]]: keep exactly `alloc_g` rows
    * of each group, picked by the same stable pseudo-random
    * `(md5(salt || ':' || key), key)` ranking as [[capPerGroup]] — so
    * the sampled set is a pure function of (data, salt, budget, alpha):
    * reproducible across runs, engines and partitionings, and a budget
    * increase only ever ADDS rows per group, never re-rolls.
    *
    * One shuffle on the group key for the ranking window; the
    * allocation table rides along as a broadcast.
    */
  def temperatureSample(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      salt: String,
      budget: Long,
      alpha: Double = 0.5): DataFrame = {
    val alloc = temperatureAllocation(df, groupCol, budget, alpha)
      .select(col(groupCol), col("alloc").as("__alloc"))
    val h = md5(concat(lit(salt + ":"), col(keyCol).cast("string")).cast("binary"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(h.asc_nulls_first, col(keyCol).asc_nulls_first)
    df.join(broadcast(alloc), Seq(groupCol))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= col("__alloc"))
      .drop("__rk", "__alloc")
  }

  /** Contrastive negative mining: for each anchor, the `k` candidates
    * with the smallest salted md5 draw among candidates from a
    * DIFFERENT group (`groupCol` — source, cluster, label…), the
    * training-pair generator for contrastive/embedding objectives.
    * The draw hashes (salt, anchor, candidate) TOGETHER, so each
    * anchor gets its own independent permutation of the candidate pool
    * — hashing the candidate alone would hand every anchor the same
    * negatives. Deterministic: ties (impossible for md5 in practice)
    * break by candidate id, and the output is a pure function of
    * (data, salt, k).
    *
    * Output: (anchor_id, neg_id, rk) with rk in 1..k.
    *
    * Shape at 100 TB: the anchor table broadcasts (anchors are a
    * bounded working set by construction — a query batch, a hard-
    * example frontier); candidates stream through ONE window shuffle
    * keyed by anchor. For unbounded anchor sets, swap the window for
    * [[graft.functions.TopKAgg]] keyed on the draw — k rows per anchor
    * per map task through the shuffle.
    */
  def negativeSample(
      cands: DataFrame,
      anchors: DataFrame,
      k: Int,
      salt: String,
      idCol: String = "doc_id",
      groupCol: String = "source"): DataFrame = {
    require(k > 0, "k must be positive")
    val a = anchors.select(
      col(idCol).as("anchor_id"), col(groupCol).as("__ag"))
    val c = cands.select(col(idCol).as("neg_id"), col(groupCol).as("__cg"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("anchor_id"))
      .orderBy(col("__draw").asc_nulls_first, col("neg_id").asc_nulls_first)
    c.crossJoin(broadcast(a))
      .filter(col("__cg") =!= col("__ag"))
      .withColumn("__draw", md5(concat_ws(":", lit(salt),
        col("anchor_id").cast("string"), col("neg_id").cast("string"))
        .cast("binary")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("anchor_id"), col("neg_id"), col("rk"))
  }

  /** Greedy k-center coreset selection (farthest-point traversal) over
    * an embedding column — diversity sampling: pick `k` rows that
    * spread across the embedding space, the 2-approximation of the
    * k-center cover (Gonzalez). Where [[weightedKeep]] samples by
    * per-row importance, this selects by COVERAGE — every unselected
    * row is within the selection's covering radius, which is what a
    * "representative subset" of a 100 TB corpus means geometrically.
    *
    * Deterministic end to end: the seed is the smallest id (not a
    * random draw), distance is cosine (via the same codegen dot
    * product as the ANN family), and the per-round pick breaks
    * distance ties to the smallest id.
    *
    * Shape at scale: the selection state per row is ONE double (best
    * similarity to the nearest selected center). Each of the k rounds
    * folds exactly one new center — shipped to executors as a literal,
    * nothing broadcast-joined — into that column and takes the global
    * argmin via `orderBy().limit(1)` (a TakeOrdered: per-partition
    * top-1 then a k-way driver merge, no shuffle of the corpus at
    * any point). Total cost O(k·n) dot products and k single-row
    * collects; lineage stays flat through a per-round localCheckpoint,
    * the same pattern as the iterative graph operators.
    *
    * The k single-row driver round trips bound the operator to
    * sample-scale k (enforced: k ≤ 256). If the input holds fewer than
    * k distinct rows, selection stops early and returns every row as a
    * center.
    *
    * @return `(sel_round, vec_id)` — selection order, min(k, rows) rows
    */
  def kCenterSelect(
      emb: DataFrame,
      k: Int,
      vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // each selected center costs one 1-row driver round trip (k Spark
    // jobs total): this is a sample-scale selector by construction —
    // cap k so a miscalled job fails fast instead of queueing thousands
    // of driver round trips
    require(k <= 256,
      s"kCenterSelect runs one driver job per center; k=$k exceeds the " +
        "256 sample-scale bound (use clustered/LSH selection for more)")
    val spark = emb.sparkSession

    // identical accumulation order to FloatVecDot so the driver-side
    // center norm is the same double an executor would compute
    def dotD(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def cosTo(center: Array[Float]): Column = {
      val cNorm = math.sqrt(dotD(center, center))
      graft.functions.vec_dot(col("__vec"), typedLit(center)) /
        (col("__norm") * lit(cNorm))
    }

    val base = emb.select(
      col(idCol).cast("long").as("__id"),
      col(vecCol).as("__vec"),
      sqrt(graft.functions.vec_dot(col(vecCol), col(vecCol))).as("__norm"))
    val seedRows = base.orderBy(col("__id")).limit(1)
      .select(col("__id"), col("__vec")).collect()
    var picks = Vector.empty[(Int, Long)]
    if (seedRows.nonEmpty) {
      picks :+= ((0, seedRows(0).getLong(0)))
      var centerVec = seedRows(0).getSeq[Float](1).toArray
      var best = base.withColumn("__best", cosTo(centerVec))
      var lastCkpt: Option[DataFrame] = None
      var round = 1
      var exhausted = false
      while (round < k && !exhausted) {
        val ck = best.localCheckpoint(true)
        lastCkpt.foreach(_.unpersist(false))
        lastCkpt = Some(ck)
        val selIds = picks.map(_._2)
        val pickRows = ck
          .filter(!col("__id").isInCollection(selIds))
          .orderBy(col("__best").asc, col("__id").asc)
          .limit(1)
          .select(col("__id"), col("__vec")).collect()
        if (pickRows.isEmpty) {
          // fewer distinct rows than k: every row is already a center —
          // stop early and return what was selected
          exhausted = true
        } else {
          picks :+= ((round, pickRows(0).getLong(0)))
          centerVec = pickRows(0).getSeq[Float](1).toArray
          best = ck.withColumn("__best",
            greatest(col("__best"), cosTo(centerVec)))
          round += 1
        }
      }
      lastCkpt.foreach(_.unpersist(false))
    }
    import spark.implicits._
    picks.toDF("sel_round", "vec_id")
  }
}
