package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Warehouse

/** Resumable, materialized curation pipeline — the orchestration tier
  * for multi-stage corpus assembly at 100 TB.
  *
  * The in-plan curation flagships (`pipeline_curation_v2..v4`) hand
  * Catalyst the whole chain as ONE declarative plan — right for a
  * single run, wrong for operations: a crash in stage 4 of a 12-hour
  * run repeats stages 1–3, and no intermediate is inspectable.
  *
  * This runner materializes every stage as a warehouse table under a
  * CONTENT-ADDRESSED key: each stage's key is the md5 of the corpus
  * version, the stage's own configuration, and its upstream stages'
  * keys — build-system semantics (Bazel/Nix) applied to DataFrames. A
  * rerun skips any stage whose table already exists for the same key;
  * change one knob and exactly the downstream cone recomputes; crash
  * anywhere and the rerun resumes at the first unfinished stage. The
  * at-least-once idempotence contract the reference gets from
  * Airflow + LSET watermarks (`/root/reference/dags/etl/main.py:36-42`),
  * generalized from "daily window" to "arbitrary DAG of operators".
  *
  * The corpus is identified by a caller-supplied `corpusVersion`
  * string (a snapshot/generation id) — at 100 TB you version inputs,
  * you don't re-fingerprint them per run.
  *
  * Writes go through [[Warehouse.overwrite]]'s atomic tmp-and-swap, so
  * a stage table either exists complete or not at all — the skip check
  * can never observe a half-written stage.
  */
object Curation {

  /** One stage's outcome: its table name, whether it was reused from a
    * previous run, and the output row count (from the materialized
    * table, so reporting never recomputes the plan).
    */
  final case class StageRun(
      stage: String, table: String, reused: Boolean, rows: Long)

  private def stageKey(corpusVersion: String, stage: String, config: String,
      upstream: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update((corpusVersion + "|" + stage + "|" + config +
      "|" + upstream.mkString(",")).getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString.take(16)
  }

  /** Materialize `build` under `dir` as `cur_<stage>_<key>` unless that
    * table already exists; returns the (lazily re-read) table and the
    * run record. Reading BACK the materialized parquet — not returning
    * the built plan — is deliberate: downstream stages depend on the
    * bytes on disk, so a resumed run and a fresh run see byte-identical
    * inputs.
    */
  private def stage(
      spark: SparkSession,
      dir: String,
      stage: String,
      key: String,
      build: => DataFrame): (DataFrame, StageRun) = {
    val table = s"cur_${stage}_$key"
    val reused = Warehouse.exists(spark, dir, table)
    if (!reused) {
      // a private cache scope per stage: operator-persisted subplans
      // (the gram table inside ngramJaccardPairs) are dropped the
      // moment the stage's parquet is on disk, and a concurrent
      // pipeline's caches are never touched
      val (_, scope) = Caches.scoped(Warehouse.overwrite(build, dir, table))
      scope.release()
    }
    val out = Warehouse.read(spark, dir, table)
    // row count from the parquet footers of the materialized table —
    // metadata-only, never recomputes the stage plan
    (out, StageRun(stage, table, reused, out.count()))
  }

  /** The keep → split → mix pipeline, resumable.
    *
    * Stages: near-dup pairs (n-gram Jaccard) → connected-component
    * clusters → keep-list (one best copy per cluster) → cluster-safe
    * split of the kept docs → per-(split, source) mix stats. Each is a
    * warehouse table; `force` recomputes everything regardless (the
    * "clean build" switch).
    *
    * @return the final mix table plus the per-stage run records in
    *         execution order
    */
  def runResumable(
      docs: DataFrame,
      dir: String,
      corpusVersion: String,
      threshNum: Int = 1,
      threshDen: Int = 20,
      salt: String = "cur",
      fractions: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      force: Boolean = false): (DataFrame, Seq[StageRun]) = {
    val spark = docs.sparkSession
    // every stage key is computable before any work runs — compute all
    // five upfront so `force` can target exactly this run's tables
    val kPairs = stageKey(corpusVersion, "pairs", s"$threshNum/$threshDen", Nil)
    val kClusters = stageKey(corpusVersion, "clusters", "", Seq(kPairs))
    val kKeep = stageKey(corpusVersion, "keep", "n_chars", Seq(kClusters))
    val fracCfg = fractions.map { case (n, f) => s"$n=$f" }.mkString(",")
    val kSplit = stageKey(corpusVersion, "split", s"$salt|$fracCfg", Seq(kKeep, kClusters))
    val kMix = stageKey(corpusVersion, "mix", "", Seq(kSplit))

    if (force) {
      // "clean build": drop exactly THIS run's five stage tables.
      // Other corpus versions' tables — and a concurrent pipeline's —
      // share the directory under different keys and must survive.
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      Seq("pairs" -> kPairs, "clusters" -> kClusters, "keep" -> kKeep,
        "split" -> kSplit, "mix" -> kMix).foreach { case (st, k) =>
        val p = new org.apache.hadoop.fs.Path(s"$dir/cur_${st}_$k")
        if (fs.exists(p)) fs.delete(p, true)
      }
    }

    val (pairs, rPairs) = stage(spark, dir, "pairs", kPairs,
      Dedup.ngramJaccardPairs(docs, threshNum, threshDen)
        .select("id_a", "id_b"))

    val (clusters, rClusters) = stage(spark, dir, "clusters", kClusters,
      Dedup.dedupClusters(pairs))

    val (keep, rKeep) = stage(spark, dir, "keep", kKeep,
      Dedup.keepListFromClusters(docs, clusters))

    val (split, rSplit) = stage(spark, dir, "split", kSplit, {
      val kept = docs.join(
        keep.where(col("keep_flag") === 1).select("doc_id"), "doc_id")
      // split by the near-dup cluster key so surviving docs of one
      // cluster can never straddle a boundary (same rule as
      // clusterSafeSplit, with the already-materialized cluster table)
      kept.join(clusters, Seq("doc_id"), "left")
        .withColumn("split", graft.operators.Sampling.splitCol(
          coalesce(col("cluster_id"), col("doc_id")), salt, fractions))
        .select("doc_id", "source", "n_chars", "split")
    })

    val (mix, rMix) = stage(spark, dir, "mix", kMix,
      split.groupBy("split", "source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars")))

    (mix, Seq(rPairs, rClusters, rKeep, rSplit, rMix))
  }
}
