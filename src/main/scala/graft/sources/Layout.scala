package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Physical layout control for the 100 TB path: bucketing and
  * partitioned writes.
  *
  * Two co-bucketed tables joined on their bucket keys produce a
  * sort-merge join with NO Exchange on either side — the shuffle is
  * paid once at write time and amortized over every subsequent join.
  * That is the difference between re-shuffling 100 TB per query and
  * reading co-located buckets. Date/low-cardinality dimensions go to
  * directory partitioning (`partitionBy`) so partition pruning skips
  * files at the scan.
  */
object Layout {

  /** Write a bucketed + in-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int, keys: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Write a directory-partitioned parquet table (partition pruning). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Compact a parquet directory to ~`rowsPerFile` rows per file via
    * the atomic warehouse swap — the small-files remedy for streaming
    * and incremental ingest (micro-batches and per-partition appends
    * accumulate KB-sized files whose open/footer overhead eventually
    * dominates 100 TB scans; metadata pressure grows per file).
    *
    * One count (combinable) sizes the target; `repartition` rebalances
    * evenly (round-robin — no key assumption, unlike coalesce which
    * only narrows and can leave skew). Readers racing the swap get the
    * warehouse's single-writer retry contract; content is unchanged.
    */
  def compact(spark: SparkSession, dir: String, table: String, rowsPerFile: Long): Unit = {
    require(rowsPerFile > 0, "rowsPerFile must be positive")
    val df = Warehouse.read(spark, dir, table)
    val n = df.count()
    val files = math.max(1L, (n + rowsPerFile - 1) / rowsPerFile).toInt
    Warehouse.overwrite(df.repartition(files), dir, table)
  }

  /** Morton (Z-order) value over two numeric columns, each linearly
    * quantized to 16 bits between the given bounds and bit-interleaved.
    * Pure column arithmetic — codegen'd, no UDF.
    */
  private[graft] def zValue(
      a: Column, aMin: Double, aMax: Double,
      b: Column, bMin: Double, bMax: Double): Column = {
    def bucket(c: Column, lo: Double, hi: Double): Column = {
      val span = if (hi > lo) hi - lo else 1.0
      least(greatest(floor((c - lo) / span * 65535.0), lit(0.0)), lit(65535.0)).cast("long")
    }
    val qa = bucket(a, aMin, aMax)
    val qb = bucket(b, bMin, bMax)
    (0 until 16).map { i =>
      (shiftright(qa, i).bitwiseAND(1) * lit(1L << (2 * i))) +
        (shiftright(qb, i).bitwiseAND(1) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _) // disjoint bit positions: + is |
  }

  /** Z-ordered parquet write: range-partition and sort the data along
    * the Morton curve of TWO filter columns, so every output file
    * covers a narrow range of BOTH — parquet min/max stats then skip
    * files for predicates on EITHER column. Linear sort gives that
    * property for one column only; directory partitioning needs low
    * cardinality. Z-order is the layout lever for multi-dimensional
    * range predicates over high-cardinality numerics at 100 TB.
    *
    * Quantization bounds come from one combinable min/max aggregate
    * (driver reads 4 scalars). Linear bucketing is skew-sensitive —
    * for production layouts substitute approximate-quantile boundaries
    * per column (same interleave); the curve property is unchanged.
    * `numFiles` range-partitions by z-value (one sort shuffle, paid
    * once at write time like bucketing).
    */
  def writeZOrdered(
      df: DataFrame,
      colA: String,
      colB: String,
      path: String,
      numFiles: Int): Unit = {
    val Array(aMin, aMax, bMin, bMax) = df.select(
      min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double")))
      .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
    df.withColumn("__z", zValue(
        col(colA).cast("double"), aMin, aMax, col(colB).cast("double"), bMin, bMax))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file min/max manifest over `cols`: one row per data file with
    * `<col>_min` / `<col>_max` bounds — the manifest-table pattern
    * (what table formats keep in metadata). Built with ONE distributed
    * scan grouped by `input_file_name()`; build it once right after a
    * layout write (z-order, bucketing, compaction) and persist it as a
    * table, so reads pay metadata-sized pruning instead of 100 TB
    * footer walks. On a sorted/z-ordered layout the bounds are narrow —
    * that is precisely what makes [[readPruned]] effective.
    */
  def fileManifest(spark: SparkSession, path: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).as(s"${c}_min"),
      max(col(c)).as(s"${c}_max")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Range scan through the manifest: keep only data files whose
    * [min, max] interval INTERSECTS every requested `[lo, hi]` range,
    * then read just those files and apply the exact predicate. The
    * result equals the plain filtered scan row-for-row; what changes is
    * I/O — non-overlapping files are never opened. The manifest filter
    * and file-list collect are metadata-sized (rows = files, not
    * records); this is the explicit form of the skipping that parquet
    * footer stats give implicitly, made table-driven so it survives
    * catalogs, object stores with slow LIST, and 10⁶-file tables.
    */
  def readPruned(
      spark: SparkSession,
      path: String,
      manifest: DataFrame,
      ranges: Seq[(String, Double, Double)]): DataFrame = {
    require(ranges.nonEmpty)
    val overlap = ranges.map { case (c, lo, hi) =>
      col(s"${c}_max") >= lo && col(s"${c}_min") <= hi
    }.reduce(_ && _)
    val files = manifest.where(overlap).select("file")
      .collect().map(_.getString(0)) // metadata-sized: one row per file
    val residual = ranges.map { case (c, lo, hi) =>
      col(c) >= lo && col(c) <= hi
    }.reduce(_ && _)
    if (files.isEmpty) spark.read.parquet(path).where(lit(false))
    else spark.read.parquet(files: _*).where(residual)
  }

  /** CLUSTERING-DEPTH metric over a file manifest — the "does this
    * table need re-clustering" signal an OPTIMIZE planner reads: for
    * each file, how many OTHER files' `[min, max]` key intervals
    * overlap it. A perfectly range-clustered layout scores 0
    * everywhere (every point lookup or range scan opens the minimal
    * file set); a hash- or arrival-ordered layout scores ~n_files
    * (every file spans the domain, min/max skipping prunes nothing —
    * the situation [[bloomManifest]] exists for). The depth is exactly
    * the extra I/O multiplier a range predicate pays vs the clustered
    * ideal.
    *
    * Input is the METADATA manifest ([[fileManifest]] — one row per
    * file), so the self-join is manifest² at worst and interval-sorted
    * in practice — thousands of rows at 100 TB, never data-sized.
    * Overlap is closed-interval on exact values; ties count.
    */
  def clusteringDepth(manifest: DataFrame, keyCol: String): DataFrame = {
    val lo = s"${keyCol}_min"
    val hi = s"${keyCol}_max"
    val a = manifest.select(col("file"), col(lo).as("__alo"), col(hi).as("__ahi"))
    val b = manifest.select(col("file").as("__bfile"),
      col(lo).as("__blo"), col(hi).as("__bhi"))
    a.join(b, col("file") =!= col("__bfile") &&
        col("__ahi") >= col("__blo") && col("__alo") <= col("__bhi"), "left")
      .groupBy(col("file"), col("__alo").as(lo), col("__ahi").as(hi))
      .agg(count(col("__bfile")).as("n_overlaps"))
  }

  /** Z-ORDER (Morton) interleaved key over two integer columns — the
    * multi-dimensional clustering key: sorting/range-partitioning by
    * the interleaved bits gives every physical unit a roughly SQUARE
    * footprint in (x, y) space, so min/max skipping prunes on BOTH
    * dimensions at once, where a linear sort prunes on its lead column
    * only (every file spans the other dimension's full domain —
    * [[clusteringDepth]]'s blind case). Inputs are masked to the low
    * `bits` bits; the interleave is a fixed 2·bits-term bitwise
    * expression (codegen'd, no UDF) that any engine replays exactly.
    */
  def zOrderKey(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits per dimension must be in [1, 31]")
    val mask = lit((1L << bits) - 1L)
    val xm = x.bitwiseAND(mask)
    val ym = y.bitwiseAND(mask)
    (0 until bits).flatMap { b =>
      Seq(shiftleft(shiftright(xm, b).bitwiseAND(lit(1L)), 2 * b),
        shiftleft(shiftright(ym, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Z-order vs linear layout, MEASURED: lay the same rows out as
    * 2^unitBits physical units two ways — linear (top bits of x, the
    * "sorted by the lead column" layout) and z-order (top bits of the
    * Morton key) — build each unit's (x, y) min/max manifest, and for
    * each probe RECTANGLE count the units whose closed min/max
    * intervals intersect it on BOTH dimensions (exactly the files a
    * min/max-skipping scan must open). The report is the layout
    * decision a 100 TB table owner reads: a rectangle selective on
    * both dimensions touches ~√selectivity of the z-units but every
    * x-slice of the linear layout, because linear units span the full
    * y domain.
    *
    * Scale shape: one corpus scan per layout folds to the
    * 2^unitBits-row manifest (combinable min/max); probes explode
    * against the manifest (metadata × probes). Deterministic and
    * engine-replayable: the interleave is exact integer bitwork and
    * the manifests are exact mins/maxes.
    *
    * @param probes (x_lo, x_hi, y_lo, y_hi) closed-interval rectangles
    */
  def zOrderPruningReport(
      df: DataFrame,
      x: Column,
      y: Column,
      probes: Seq[(Long, Long, Long, Long)],
      bits: Int = 16,
      unitBits: Int = 6): DataFrame = {
    require(unitBits >= 1 && unitBits <= 2 * bits)
    require(probes.nonEmpty)
    val mask = lit((1L << bits) - 1L)
    val pts = df.select(x.bitwiseAND(mask).as("x"), y.bitwiseAND(mask).as("y"))
    def manifest(unit: Column, tag: String): DataFrame =
      pts.groupBy(unit.as("unit"))
        .agg(min("x").as("x_min"), max("x").as("x_max"),
          min("y").as("y_min"), max("y").as("y_max"))
        .withColumn("layout", lit(tag))
    val m = manifest(shiftright(col("x"), bits - math.min(unitBits, bits)), "linear")
      .unionByName(manifest(
        shiftright(zOrderKey(col("x"), col("y"), bits), 2 * bits - unitBits), "zorder"))
    val probeLit = array(probes.zipWithIndex.map { case ((xl, xh, yl, yh), i) =>
      struct(lit(i).as("probe_id"), lit(xl).as("x_lo"), lit(xh).as("x_hi"),
        lit(yl).as("y_lo"), lit(yh).as("y_hi"))
    }: _*)
    m.withColumn("p", explode(probeLit))
      .select(col("layout"), col("p.probe_id").as("probe_id"),
        col("p.x_lo").as("x_lo"), col("p.x_hi").as("x_hi"),
        col("p.y_lo").as("y_lo"), col("p.y_hi").as("y_hi"),
        (col("x_max") >= col("p.x_lo") && col("x_min") <= col("p.x_hi") &&
          col("y_max") >= col("p.y_lo") && col("y_min") <= col("p.y_hi"))
          .cast("long").as("__hit"))
      .groupBy("layout", "probe_id", "x_lo", "x_hi", "y_lo", "y_hi")
      .agg(count(lit(1)).as("n_units"), sum(col("__hit")).as("units_touched"))
  }

  /** Per-file BLOOM manifest over a key column — the point-lookup twin
    * of [[fileManifest]]'s range bounds. Min/max skipping is blind for
    * equality probes on a column the layout is NOT sorted by (every
    * file's [min,max] spans the whole key domain); a per-file Bloom
    * filter answers "might this file contain key v" with no false
    * negatives regardless of layout.
    *
    * Encoding: `hashes` seeded xxhash64 positions per key into a
    * `bits`-cell filter, stored RELATIONALLY as (file, word_idx, word)
    * 64-bit words — ≤ bits/64 rows per file, metadata-sized, built
    * with one distributed scan (explode k positions, bit_or per word).
    * A table format keeps the same structure in file footers; the
    * explicit table survives slow-LIST object stores and 10⁶-file
    * tables, exactly like [[fileManifest]].
    *
    * Sizing: false-positive rate ≈ (1 − e^(−kn/m))^k for n keys/file,
    * m = bits, k = hashes — size `bits` to ~10 n for ~1% at k = 4.
    */
  def bloomManifest(spark: SparkSession, path: String, keyCol: String,
      bits: Int = 65536, hashes: Int = 4): DataFrame = {
    require(bits % 64 == 0 && bits > 0, "bits must be a positive multiple of 64")
    require(hashes >= 1, "need at least one hash")
    val positions = (0 until hashes).map(i =>
      pmod(xxhash64(lit(i), col("k")), lit(bits.toLong)))
    spark.read.parquet(path)
      .select(input_file_name().as("file"), col(keyCol).as("k"))
      .select(col("file"), explode(array(positions: _*)).as("p"))
      .groupBy(col("file"), expr("p div 64").as("word_idx"))
      .agg(call_function("bit_or",
        expr("shiftleft(1L, CAST(p % 64 AS INT))")).as("word"))
      // the (bits, hashes) that built this manifest ride IN it: a probe
      // with different parameters would silently produce FALSE
      // NEGATIVES (missing rows), so readBloomPruned validates against
      // these instead of trusting its caller
      .withColumn("bits", lit(bits))
      .withColumn("hashes", lit(hashes))
  }

  /** Point lookup through the Bloom manifest: open only files whose
    * filter has ALL `hashes` bits of `value` set, then apply the exact
    * equality. Result equals the plain filtered scan (no false
    * negatives by construction); false positives only cost I/O. The
    * probe's bit positions are computed in one 1-row Spark job (same
    * hash codepath as the build — never reimplemented driver-side) and
    * the manifest filter is metadata-sized, like [[readPruned]].
    */
  def readBloomPruned(spark: SparkSession, path: String, manifest: DataFrame,
      keyCol: String, value: Column, bits: Int = 65536, hashes: Int = 4): DataFrame = {
    // no-false-negatives depends on probing with the manifest's OWN
    // (bits, hashes); reject a mismatched caller (manifests built
    // before the meta columns existed are trusted as passed)
    if (manifest.columns.contains("bits")) {
      val meta = manifest.select("bits", "hashes").head()
      require(meta.getInt(0) == bits && meta.getInt(1) == hashes,
        s"bloom manifest was built with bits=${meta.getInt(0)}, hashes=${meta.getInt(1)}; " +
          s"probing with ($bits, $hashes) would drop rows")
    }
    val probe = spark.range(1)
      .select(array((0 until hashes).map(i =>
        pmod(xxhash64(lit(i), value), lit(bits.toLong))): _*).as("ps"))
      .head().getSeq[Long](0)
    // collapse probe bits into per-word masks; a file qualifies when
    // every probed word carries its full mask
    val wordMasks = probe.map(p => (p / 64, 1L << (p % 64).toInt))
      .groupBy(_._1).map { case (wi, ms) => wi -> ms.map(_._2).reduce(_ | _) }
    val hit = wordMasks.map { case (wi, m) =>
      col("word_idx") === wi && (col("word").bitwiseAND(lit(m))) === lit(m)
    }.reduce(_ || _)
    val files = manifest.where(hit)
      .groupBy("file").agg(count(lit(1)).as("__n"))
      .where(col("__n") === wordMasks.size)
      .select("file").collect().map(_.getString(0)) // metadata-sized
    if (files.isEmpty) spark.read.parquet(path).where(lit(false))
    else spark.read.parquet(files.toIndexedSeq: _*).where(col(keyCol) === value)
  }

  /** Column-ENCODING advisor: the statistics a layout planner reads
    * before choosing parquet encodings (and the dictionary-vs-RLE
    * decision Delta/Iceberg OPTIMIZE makes implicitly), computed in one
    * distributed pass and emitted one row per analyzed column:
    *
    *   - `n_rows` / `n_nulls` / `n_distinct`: global cardinality facts;
    *   - `n_runs`: value runs counted WITHIN each physical unit
    *     (`fileCol` — a file, partition, or bucket proxy) along that
    *     unit's `orderCols` sort — the quantity run-length encoding
    *     actually compresses, which global cardinality cannot see
    *     (a 7-value column sorted by date RLEs superbly; shuffled
    *     randomly it doesn't);
    *   - `chars`: total stringified length, the plain-encoding byte
    *     floor.
    *
    * The recommendation is a deterministic integer rule, cross-
    * multiplied so no engine divides: avg run ≥ 8 (`n_runs`·8 ≤ n) →
    * `rle`; else distinct ratio ≤ 5% (`n_distinct`·20 ≤ n) → `dict`;
    * else `plain`. RLE is checked first: long runs beat dictionary
    * even when the dictionary would also fit.
    *
    * Scale shape: the lag/row_number windows partition by `fileCol`
    * (unit-sized, never global), every per-column stat folds in ONE
    * aggregate to a single metadata row, and the unpivot is a stack
    * over that row — the whole advisor is one scan + one unit-keyed
    * shuffle regardless of table size. `orderCols` must be a total
    * order within each unit (a unique key suffix guarantees it);
    * otherwise the run count is tie-order-dependent.
    */
  def encodingAdvisor(df: DataFrame, fileCol: Column, orderCols: Seq[Column],
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "advise at least one column")
    // user column names reach col() backtick-quoted (dots, spaces,
    // hyphens are all legal Spark names), and every DERIVED name is
    // indexed rather than name-interpolated — no string SQL anywhere,
    // so no name can break or inject an expression
    def bq(n: String): Column = col("`" + n.replace("`", "``") + "`")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(fileCol).orderBy(orderCols: _*)
    val lagged = df.select(
      (col("*") +: (row_number().over(w).as("__rn") +:
        cols.zipWithIndex.map { case (c, i) =>
          lag(bq(c), 1).over(w).as(s"__lag_$i") })): _*)
    val aggs = count(lit(1)).as("__n") +:
      cols.zipWithIndex.flatMap { case (c, i) => Seq(
        sum(when(bq(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$i"),
        count_distinct(bq(c)).as(s"__nd_$i"),
        sum(when(col("__rn") === 1 || !(bq(c) <=> col(s"__lag_$i")), 1L)
          .otherwise(0L)).as(s"__runs_$i"),
        sum(coalesce(length(bq(c).cast("string")).cast("long"), lit(0L)))
          .as(s"__chars_$i")) }
    val one = lagged.agg(aggs.head, aggs.tail: _*)
    val rows = cols.zipWithIndex.map { case (c, i) => struct(
      lit(c).as("col_name"), col("__n").as("n_rows"),
      col(s"__nulls_$i").as("n_nulls"), col(s"__nd_$i").as("n_distinct"),
      col(s"__runs_$i").as("n_runs"), col(s"__chars_$i").as("chars")) }
    one.select(explode(array(rows: _*)).as("__r")).select(col("__r.*"))
      .withColumn("encoding",
        when(col("n_runs") * 8 <= col("n_rows"), lit("rle"))
          .otherwise(when(col("n_distinct") * 20 <= col("n_rows"), lit("dict"))
            .otherwise(lit("plain"))))
  }

  /** The consistent-hash ring: `vnodes` points per shard at
    * `md5(salt:shard:vnode)`, sorted by point. A pure function of the
    * parameters — no data touched — so both engines (and any future
    * re-run) derive the identical ring from the formula alone.
    */
  private[graft] def ringPoints(
      nShards: Int, vnodes: Int, salt: String): Seq[(String, Int)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (for { s <- 0 until nShards; v <- 0 until vnodes } yield {
      val pt = md.digest(s"$salt:$s:$v".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      md.reset()
      (pt, s)
    }).sortBy(_._1)
  }

  /** Consistent-hash shard assignment: each key goes to the shard
    * owning the first ring point at or after `md5(salt:key:<key>)`
    * (wrapping to the ring's first point). Unlike `hash(key) % n` —
    * where changing `n` remaps almost EVERY key — growing the ring
    * from n to n+1 shards moves only ~1/(n+1) of the keys, and every
    * moved key lands on the NEW shard. That is the resharding
    * primitive for a live 100 TB corpus: adding capacity re-copies
    * one shard's worth of data, not the whole table.
    *
    * The ring (nShards·vnodes entries, e.g. 128) rides inside the
    * projection as a sorted array literal; assignment is a narrow
    * per-row scan of that array — zero shuffle, zero join, nothing
    * broadcast. Lexicographic compare on fixed-width lowercase hex
    * equals numeric compare, so the DuckDB oracle replays the exact
    * assignment from the same md5 formula.
    */
  def consistentShard(
      df: DataFrame,
      keyCol: String,
      nShards: Int,
      vnodes: Int = 16,
      salt: String = "ring",
      outCol: String = "shard"): DataFrame = {
    require(nShards >= 1 && vnodes >= 1)
    val ring = ringPoints(nShards, vnodes, salt)
    val ringArr = array(ring.map { case (pt, sh) =>
      struct(lit(pt).as("pt"), lit(sh).as("shard"))
    }: _*)
    val h = md5(concat(lit(s"$salt:key:"), col(keyCol).cast("string")))
    // ring is sorted ascending, filter preserves order: element 1 of
    // the survivors IS the successor point; empty -> NULL under
    // try_element_at (ANSI element_at throws) -> wrap to ring head
    val successor = coalesce(
      try_element_at(filter(ringArr, x => x("pt") >= h), lit(1)),
      try_element_at(ringArr, lit(1)))
    df.withColumn(outCol, successor("shard"))
  }

  /** RENDEZVOUS (highest-random-weight) shard assignment — the
    * ring's vnode-free sibling: each key goes to the shard with the
    * highest portable hash of (salt, shard, key). Perfectly uniform in
    * expectation with NO vnode tuning, and MINIMALLY DISRUPTIVE by
    * construction: adding shard n+1 relocates exactly the keys whose
    * new argmax IS the new shard (≈ 1/(n+1) of them) and nothing else —
    * a key's relative order among surviving shards can't change
    * (`shard_rendezvous` gates n_misplaced == 0 machine-checked).
    * Pick HRW when shard counts are small and vnode memory matters;
    * the ring when weighted shards or locality-aware vnode placement
    * is needed.
    *
    * Scale shape: one map-side explode to (key × nShards) rows and a
    * per-KEY window over nShards rows (keyed shuffle, frame size =
    * shard count — never data-sized). Deterministic: md5 weights
    * compared as hex strings (NOT the polynomial rolling hash, which
    * is LINEAR in the one character that varies across shards — its
    * argmax is badly biased; the avalanched digest is what makes HRW
    * uniform), ties broken by shard index.
    */
  def rendezvousShard(
      df: DataFrame,
      keyCol: String,
      nShards: Int,
      salt: String = "hrw",
      outCol: String = "shard"): DataFrame = {
    require(nShards >= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("__hrw_h").desc, col("__hrw_s"))
    df.withColumn("__hrw_s", explode(sequence(lit(0), lit(nShards - 1))))
      .withColumn("__hrw_h",
        md5(concat(lit(s"hrw:$salt:"),
          col("__hrw_s").cast("string"), lit(":"), col(keyCol).cast("string"))))
      .withColumn("__hrw_rn", row_number().over(w))
      .where(col("__hrw_rn") === 1)
      .drop("__hrw_h", "__hrw_rn")
      .withColumnRenamed("__hrw_s", outCol)
  }

  /** Ordered shard export — the corpus-assembly last mile: write the
    * training set as `nShards` parquet shards that together hold the
    * rows in GLOBAL `orderCol` order (shard 0's keys all precede shard
    * 1's, and each shard is internally sorted), so a trainer streaming
    * shard 0, 1, 2, … replays exactly the curriculum an
    * [[graft.operators.Sampling.interleaveOrder]]-style key encodes.
    *
    * `repartitionByRange` + `sortWithinPartitions` is the scale shape:
    * one range shuffle (boundaries from Spark's reservoir sample of
    * the key column) and a per-shard sort — never a single-partition
    * global sort. Written through the warehouse's atomic tmp-and-swap,
    * with the shard index recoverable from the row order: files are
    * committed as part-<shard> in partition order.
    */
  def writeOrderedShards(
      df: DataFrame,
      dir: String,
      table: String,
      orderCol: String,
      nShards: Int): Unit = {
    require(nShards >= 1, "need at least one shard")
    Warehouse.overwrite(
      df.repartitionByRange(nShards, org.apache.spark.sql.functions.col(orderCol))
        .sortWithinPartitions(orderCol),
      dir, table)
  }

  /** Compaction PLAN over a file/partition inventory: assign each
    * input unit (identified by `orderCols`, sized by `sizeCol`) to an
    * output bin by running-sum segmentation — bin = ⌊exclusive-prefix
    * -sum ÷ target⌋ in the key order, the sorted-greedy packing a
    * lakehouse OPTIMIZE planner emits (adjacent units coalesce, so
    * clustering on `orderCols` survives compaction and each output
    * file lands within one unit-size of `targetSize`).
    *
    * The input here is METADATA — one row per file or partition, not
    * per data row — so the unpartitioned ordered window is bounded by
    * the file count (thousands at 100 TB after directory
    * partitioning), exactly like the driver-side planning loop of
    * Delta/Iceberg OPTIMIZE, but expressed as a plan any engine can
    * run. All arithmetic is integer; floor division on non-negative
    * sizes is engine-agnostic.
    */
  def compactionPlan(
      files: DataFrame,
      orderCols: Seq[String],
      sizeCol: String,
      targetSize: Long): DataFrame = {
    require(targetSize > 0, "targetSize must be positive")
    import org.apache.spark.sql.functions.{coalesce, col, lit, sum}
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    files
      .withColumn("cum_before", coalesce(sum(col(sizeCol)).over(w), lit(0L)))
      .withColumn("bin",
        org.apache.spark.sql.functions.expr(s"cum_before div $targetSize"))
  }
}
