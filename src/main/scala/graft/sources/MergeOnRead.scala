package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Merge, MergeSpec}

/** Merge-on-read keyed table: an immutable BASE plus an ordered chain
  * of compact DELTA files, reconciled at read time — the lake-scale
  * upgrade of [[Warehouse]]'s copy-on-write paths.
  *
  * Why: every copy-on-write merge ([[Merge.scd1PartitionScoped]],
  * [[Warehouse.overwritePartitions]]) rewrites whole touched
  * partitions — a 10-row late-arriving correction to one partition
  * still rewrites that partition end to end. Here a merge appends ONLY
  * the post-merge row images of the touched keys (write I/O = O(changed
  * rows), not O(partition)), and the read view reconciles
  * base − superseded + latest-delta in one broadcast anti-join — the
  * Hudi MoR / Iceberg merge-on-read shape, built on the same primitives
  * the rest of the warehouse uses.
  *
  * Layout under `dir`:
  * {{{
  *   <table>.morbase/<gen>/    immutable base generations (parquet)
  *   <table>.mordelta/<seq>/   immutable delta files (post-merge images)
  *   <table>.mor               one-line manifest (atomic rename-replace)
  * }}}
  *
  * The manifest (`base=<gen>;from=<a>;to=<b>;batch=<id>;keys=<k,...>`)
  * is the single commit point, replaced like [[Warehouse.Pointer]]'s
  * pointer file: readers resolve base generation + delta range
  * atomically, and every referenced directory is immutable — no crash
  * window, nothing to heal. A crash after a delta/base write but
  * before its manifest commit leaves an unreferenced directory that
  * the next write at that position overwrites.
  *
  * Batch-id idempotence rides the manifest: [[deltaMerge]] carries the
  * caller's monotone `batchId`, and a crash-replayed batch (id ≤ the
  * committed one) is recognized and skipped — the same at-least-once
  * stamp discipline as the `stream_*_replay` folds, here covering the
  * merge path itself.
  *
  * Semantics: each delta holds the FULLY-RESOLVED row image per touched
  * key, computed by the ordinary [[Merge.scd1]] against the then-
  * current read view restricted to the source's keys — so ANY MergeSpec
  * (updateCols subsets, audit stamps, touchCols) reconciles exactly to
  * the eager copy-on-write result under last-writer-wins per key.
  * Deletes are out of scope (a tombstone marker column would slot into
  * the same reconcile — see [[deltaDelete]]); `nullSafeKeys` is
  * rejected (the broadcast anti-join below is null-strict).
  *
  * Scale shape of [[readView]]: the base is scanned once and NEVER
  * shuffled — superseded keys drop via a broadcast anti-join on the
  * live delta keys (deltas are compact by contract; compact when they
  * are not), and the latest-image resolution windows over delta rows
  * only. [[compact]] folds the chain back into a new base generation
  * when the delta fraction crosses the caller's threshold.
  */
object MergeOnRead {

  final case class Manifest(
      baseGen: Long, deltaFrom: Long, deltaTo: Long,
      lastBatch: Long, keys: Seq[String]) {
    def deltaSeqs: Seq[Long] = deltaFrom to deltaTo
    def serialize: String =
      s"base=$baseGen;from=$deltaFrom;to=$deltaTo;batch=$lastBatch;keys=${keys.mkString(",")}"
  }

  private def manifestPath(dir: String, table: String) = new Path(s"$dir/$table.mor")
  private def basePath(dir: String, table: String, gen: Long) =
    new Path(s"$dir/$table.morbase/$gen")
  private def deltaPath(dir: String, table: String, seq: Long) =
    new Path(s"$dir/$table.mordelta/$seq")

  private def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, dir: String, table: String): Boolean =
    fsOf(spark, dir).exists(manifestPath(dir, table))

  def manifest(spark: SparkSession, dir: String, table: String): Manifest = {
    val fs = fsOf(spark, dir)
    val in = fs.open(manifestPath(dir, table))
    val line = try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
    val kv = line.split(";").map { p =>
      val Array(k, v) = p.split("=", 2); k -> v
    }.toMap
    Manifest(kv("base").toLong, kv("from").toLong, kv("to").toLong,
      kv("batch").toLong, kv("keys").split(",").toSeq)
  }

  /** Atomic manifest commit: tmp file + rename-replace (the
    * [[Warehouse.Pointer]] protocol — a reader sees the old or the new
    * manifest, never an absent or partial one).
    */
  private def commit(spark: SparkSession, dir: String, table: String, m: Manifest): Unit = {
    val fs = fsOf(spark, dir)
    val ptr = manifestPath(dir, table)
    val tmp = new Path(ptr.toString + ".tmp")
    val out = fs.create(tmp, true)
    try out.write((m.serialize + "\n").getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      ptr.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, ptr, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Create the table: base generation 1, empty delta chain. */
  def init(df: DataFrame, dir: String, table: String, keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "merge-on-read tables are keyed")
    val spark = df.sparkSession
    df.write.mode("overwrite").parquet(basePath(dir, table, 1L).toString)
    commit(spark, dir, table, Manifest(1L, 1L, 0L, -1L, keys))
  }

  /** Tombstone marker column inside delta files: false on upsert
    * images, true on delete rows (key columns set, payload NULL).
    * Older delta files without the column read as false.
    */
  private val DelMarker = "__mor_del"

  /** Producing batch id stamped on every delta row — what makes the
    * chain CONSUMABLE as a change feed ([[changesSince]]), not just
    * reconcilable. Older delta files without the column read as -1.
    */
  private val BatchCol = "__mor_batch"

  /** Latest post-merge image per key across the live delta chain:
    * higher delta seq wins (each delta holds at most one row per key
    * by [[deltaMerge]]/[[deltaDelete]] construction). Rows carry
    * [[DelMarker]]; empty when the chain is empty.
    */
  private def latestDelta(spark: SparkSession, dir: String, table: String,
      m: Manifest): Option[DataFrame] = {
    if (m.deltaSeqs.isEmpty) None
    else {
      val stacked = m.deltaSeqs.map { q =>
        spark.read.parquet(deltaPath(dir, table, q).toString)
          .withColumn("__mor_seq", lit(q))
      }.reduce(_.unionByName(_, allowMissingColumns = true))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(m.keys.map(col): _*).orderBy(col("__mor_seq").desc)
      val marked =
        if (stacked.columns.contains(DelMarker))
          stacked.withColumn(DelMarker, coalesce(col(DelMarker), lit(false)))
        else stacked.withColumn(DelMarker, lit(false))
      Some(marked
        .withColumn("__mor_rn", row_number().over(w))
        .where(col("__mor_rn") === 1)
        .drop("__mor_seq", "__mor_rn"))
    }
  }

  /** The reconciled table: base minus superseded-or-deleted keys plus
    * latest surviving delta images (a key whose newest delta row is a
    * tombstone vanishes from the view). The base scan is shuffle-free
    * — delta keys broadcast into a null-strict anti-join (compact
    * deltas are the contract that keeps the broadcast small).
    */
  def readView(spark: SparkSession, dir: String, table: String): DataFrame = {
    val m = manifest(spark, dir, table)
    val base = spark.read.parquet(basePath(dir, table, m.baseGen).toString)
    latestDelta(spark, dir, table, m) match {
      case None => base
      case Some(latest) =>
        base.join(broadcast(latest.select(m.keys.map(col): _*).distinct()),
            m.keys, "left_anti")
          .unionByName(latest.where(!col(DelMarker))
            .select(base.columns.map(col).toIndexedSeq: _*))
    }
  }

  /** Keyed SCD-1 merge as a compact delta append: the write is
    * O(touched keys). Returns false when `batchId` is not beyond the
    * committed one (crash replay — skipped). The source must be UNIQUE
    * on the merge key ([[Merge.scd1]]'s existing contract) — duplicate
    * source keys would write multiple images of one key into a single
    * delta, where the latest-image window has no order to break the
    * tie.
    *
    * The source's keys slice the current view (broadcast semi-join —
    * the base is read, never rewritten), [[Merge.scd1]] resolves the
    * post-merge images, and the images land as delta `to+1` followed by
    * the manifest commit. Read I/O is one pruned view pass; write I/O
    * is the images themselves.
    */
  def deltaMerge(
      spark: SparkSession, dir: String, table: String,
      source: DataFrame, spec: MergeSpec,
      now: org.apache.spark.sql.Column, batchId: Long): Boolean = {
    require(!spec.nullSafeKeys,
      "merge-on-read reconcile is null-strict; null-safe keyed dims belong in copy-on-write tables")
    val m = manifest(spark, dir, table)
    if (batchId <= m.lastBatch) false
    else {
      val view = readView(spark, dir, table)
      val srcKeys = source.select(spec.keys.map(col): _*).distinct()
      val slice = view.join(broadcast(srcKeys), spec.keys, "left_semi")
      val images = Merge.scd1(slice, source, spec, now)
        .select(view.columns.map(col).toIndexedSeq: _*)
        .withColumn(DelMarker, lit(false))
        .withColumn(BatchCol, lit(batchId))
      images.write.mode("overwrite")
        .parquet(deltaPath(dir, table, m.deltaTo + 1).toString)
      commit(spark, dir, table,
        m.copy(deltaTo = m.deltaTo + 1, lastBatch = batchId))
      true
    }
  }

  /** Keyed delete as a tombstone delta: the write is O(deleted keys) —
    * key columns plus a true [[DelMarker]], payload NULL. The view
    * drops tombstoned keys; [[compact]] physically removes them (the
    * folded base simply lacks the rows). Same batch-id stamp contract
    * as [[deltaMerge]].
    */
  def deltaDelete(
      spark: SparkSession, dir: String, table: String,
      keysDf: DataFrame, batchId: Long): Boolean = {
    val m = manifest(spark, dir, table)
    if (batchId <= m.lastBatch) false
    else {
      val base = spark.read.parquet(basePath(dir, table, m.baseGen).toString)
      val tomb = keysDf.select(m.keys.map(col): _*).distinct()
      val full = base.columns.foldLeft(tomb) { (df, c) =>
        if (m.keys.contains(c)) df
        else df.withColumn(c, lit(null).cast(base.schema(c).dataType))
      }.select(base.columns.map(col).toIndexedSeq: _*)
        .withColumn(DelMarker, lit(true))
        .withColumn(BatchCol, lit(batchId))
      full.write.mode("overwrite")
        .parquet(deltaPath(dir, table, m.deltaTo + 1).toString)
      commit(spark, dir, table,
        m.copy(deltaTo = m.deltaTo + 1, lastBatch = batchId))
      true
    }
  }

  /** Fold the delta chain into a new base generation and reset the
    * chain — run when live delta rows exceed `maxDeltaRatio` of the
    * base (checked here so schedulers can call it unconditionally).
    *
    * Retention matches [[Warehouse.Pointer]]'s keepGenerations
    * discipline: the files THIS compaction displaces are retained for
    * one full cycle (an in-flight reader that resolved the previous
    * manifest just before the commit still finds every file it
    * references); what the PREVIOUS compaction displaced is deleted
    * here, strictly after the new manifest is live. At 100 TB
    * retention is storage, never a copy — nothing is rewritten.
    */
  def compact(spark: SparkSession, dir: String, table: String,
      maxDeltaRatio: Double = 0.0): Unit = {
    val m = manifest(spark, dir, table)
    if (m.deltaSeqs.isEmpty) return
    if (maxDeltaRatio > 0) {
      val deltaRows = m.deltaSeqs.map(q =>
        spark.read.parquet(deltaPath(dir, table, q).toString).count()).sum
      val baseRows = spark.read.parquet(basePath(dir, table, m.baseGen).toString).count()
      if (baseRows > 0 && deltaRows.toDouble / baseRows <= maxDeltaRatio) return
    }
    val nextGen = m.baseGen + 1
    readView(spark, dir, table).write.mode("overwrite")
      .parquet(basePath(dir, table, nextGen).toString)
    commit(spark, dir, table,
      m.copy(baseGen = nextGen, deltaFrom = m.deltaTo + 1, lastBatch = m.lastBatch))
    // prune the PREVIOUS cycle's superseded files; keep this cycle's
    // (base gen m.baseGen, deltas m.deltaSeqs) as the reader grace set
    val fs = fsOf(spark, dir)
    val baseDir = new Path(s"$dir/$table.morbase")
    if (fs.exists(baseDir)) fs.listStatus(baseDir).toSeq
      .flatMap(st => scala.util.Try(st.getPath.getName.toLong).toOption)
      .filter(_ < m.baseGen)
      .foreach(g => fs.delete(basePath(dir, table, g), true))
    val deltaDir = new Path(s"$dir/$table.mordelta")
    if (fs.exists(deltaDir)) fs.listStatus(deltaDir).toSeq
      .flatMap(st => scala.util.Try(st.getPath.getName.toLong).toOption)
      .filter(_ < m.deltaFrom)
      .foreach(q => fs.delete(deltaPath(dir, table, q), true))
  }

  /** The delta chain as a CHANGE FEED: the latest image per key among
    * delta rows produced by batches AFTER `sinceBatch`, each tagged
    * `change` = upsert | delete — what an incremental downstream
    * consumer (a derived aggregate, a search index, a cache) applies
    * instead of re-reading the table. Cost is chain-sized, never
    * base-sized.
    *
    * Retention contract (standard CDC): [[compact]] truncates the
    * chain, so changes older than the live `deltaFrom` are gone — a
    * consumer must keep up with the compaction cadence or re-bootstrap
    * from [[readView]]. Delta files written before the batch stamp
    * existed read as batch -1 (never "after" any requested point).
    */
  def changesSince(spark: SparkSession, dir: String, table: String,
      sinceBatch: Long): DataFrame = {
    val m = manifest(spark, dir, table)
    val base = spark.read.parquet(basePath(dir, table, m.baseGen).toString)
    val dataCols = base.columns.filterNot(_ == DelMarker).toIndexedSeq
    latestDelta(spark, dir, table, m) match {
      case None => base.select(dataCols.map(col): _*)
        .withColumn("change", lit("")).limit(0)
      case Some(latest) =>
        val withBatch =
          if (latest.columns.contains(BatchCol))
            latest.withColumn(BatchCol, coalesce(col(BatchCol), lit(-1L)))
          else latest.withColumn(BatchCol, lit(-1L))
        withBatch.where(col(BatchCol) > sinceBatch)
          .select(dataCols.map(col) :+
            when(col(DelMarker), lit("delete")).otherwise(lit("upsert"))
              .as("change"): _*)
    }
  }

  /** Rows per live delta file, oldest first — the O(changed rows)
    * write-amplification evidence the bench publishes.
    */
  def deltaRowCounts(spark: SparkSession, dir: String, table: String): Seq[Long] = {
    val m = manifest(spark, dir, table)
    m.deltaSeqs.map(q =>
      spark.read.parquet(deltaPath(dir, table, q).toString).count())
  }
}
