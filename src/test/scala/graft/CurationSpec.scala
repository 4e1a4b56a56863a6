package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

/** Resumable materialized curation: content-addressed stage tables,
  * skip-if-built, recompute-exactly-the-invalidated-cone.
  */
class CurationSpec extends AnyFunSuite with SparkTest {

  private def newDir() = java.nio.file.Files.createTempDirectory("cur").toString

  // small corpus with one planted near-dup pair (docs 1/2 share most
  // trigrams) so pairs/clusters/keep all have real work
  private def docs = {
    val s = spark; import s.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Seq(
      (1L, base + " lambda", "web"),
      (2L, base + " mu", "web"),
      (3L, "totally different words with no shared trigram runs at all", "wiki"),
      (4L, "another unrelated document of its own content entirely here", "wiki")
    ).toDF("doc_id", "text", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  private def mixRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet

  test("fresh run builds every stage; rerun reuses every stage with equal output") {
    val dir = newDir()
    val (mix1, runs1) = Curation.runResumable(docs, dir, corpusVersion = "v1")
    assert(runs1.map(_.stage) == Seq("pairs", "clusters", "keep", "split", "mix"))
    assert(runs1.forall(!_.reused))
    val out1 = mixRows(mix1)
    assert(out1.nonEmpty)
    val (mix2, runs2) = Curation.runResumable(docs, dir, corpusVersion = "v1")
    assert(runs2.forall(_.reused))
    assert(mixRows(mix2) == out1)
  }

  test("a deleted intermediate rebuilds alone; downstream stays reused") {
    val dir = newDir()
    val (_, runs1) = Curation.runResumable(docs, dir, corpusVersion = "v1")
    val keepTable = runs1.find(_.stage == "keep").get.table
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$keepTable"), true)
    val (_, runs2) = Curation.runResumable(docs, dir, corpusVersion = "v1")
    assert(runs2.map(r => r.stage -> r.reused).toMap ==
      Map("pairs" -> true, "clusters" -> true, "keep" -> false,
        "split" -> true, "mix" -> true))
  }

  test("a config change recomputes exactly its downstream cone") {
    val dir = newDir()
    Curation.runResumable(docs, dir, corpusVersion = "v1")
    val (_, runs) = Curation.runResumable(docs, dir, corpusVersion = "v1", salt = "other")
    assert(runs.map(r => r.stage -> r.reused).toMap ==
      Map("pairs" -> true, "clusters" -> true, "keep" -> true,
        "split" -> false, "mix" -> false))
    // a new corpus version invalidates everything
    val (_, runsV2) = Curation.runResumable(docs, dir, corpusVersion = "v2")
    assert(runsV2.forall(!_.reused))
    // force recomputes even with every table present
    val (_, runsF) = Curation.runResumable(docs, dir, corpusVersion = "v2", force = true)
    assert(runsF.forall(!_.reused))
  }

  test("kill mid-stage: resume skips completed stages, recomputes exactly the downstream cone") {
    val s = spark; import s.implicits._
    val dir = newDir()
    // uninterrupted reference run in its own dir
    val (refMix, refRuns) = Curation.runResumable(docs, newDir(), corpusVersion = "v1")
    val expected = mixRows(refMix)
    // poison: evaluating n_chars throws as soon as the clusters stage
    // table is on disk. Stage 1 (pairs) prunes n_chars and the guard is
    // false while it runs; stage 3 (keep) is the first n_chars consumer
    // after clusters materializes — the run dies inside stage 3's real
    // Spark write job, exactly a mid-DAG kill.
    val poison = udf { (n: Long) =>
      val base = new java.io.File(dir)
      if (base.exists && base.listFiles.exists(_.getName.startsWith("cur_clusters_")))
        throw new RuntimeException("injected fault: killed during stage 'keep'")
      n
    }
    val poisoned = docs.withColumn("n_chars", poison(col("n_chars")))
    intercept[Exception] {
      Curation.runResumable(poisoned, dir, corpusVersion = "v1")
    }
    graft.operators.Caches.release()
    // stages 1-2 are live; the killed stage left no LIVE table (at most
    // a .tmp partial, which the atomic swap protocol never reads)
    def live(prefix: String): Boolean = {
      val fs = new java.io.File(dir)
      fs.listFiles.exists(f => f.getName.startsWith(prefix) &&
        !f.getName.endsWith(".tmp") && !f.getName.endsWith(".old"))
    }
    assert(live("cur_pairs_") && live("cur_clusters_"))
    assert(!live("cur_keep_") && !live("cur_split_") && !live("cur_mix_"))
    // resume with the healthy input: completed stages skip, the cone
    // from the kill point recomputes, output matches the reference
    val (mix, runs) = Curation.runResumable(docs, dir, corpusVersion = "v1")
    assert(runs.map(r => r.stage -> r.reused).toMap ==
      Map("pairs" -> true, "clusters" -> true, "keep" -> false,
        "split" -> false, "mix" -> false))
    assert(mixRows(mix) == expected)
    // StageRun.rows reports the materialized counts, reused or rebuilt
    assert(runs.map(r => r.stage -> r.rows) == refRuns.map(r => r.stage -> r.rows))
    assert(runs.find(_.stage == "keep").exists(_.rows > 0))
  }

  test("force is scoped to the requested run: other corpus versions' stages survive") {
    val dir = newDir()
    Curation.runResumable(docs, dir, corpusVersion = "v1")
    Curation.runResumable(docs, dir, corpusVersion = "v2")
    // clean-build v2 only
    val (_, runsF) = Curation.runResumable(docs, dir, corpusVersion = "v2", force = true)
    assert(runsF.forall(!_.reused))
    // v1's content-addressed tables were never touched
    val (_, runsV1) = Curation.runResumable(docs, dir, corpusVersion = "v1")
    assert(runsV1.forall(_.reused))
  }

  test("materialized runner equals the direct in-plan composition") {
    val dir = newDir()
    val (mix, _) = Curation.runResumable(docs, dir, corpusVersion = "v1")
    // the same stages composed directly, no materialization
    val pairs = graft.operators.Dedup.ngramJaccardPairs(docs, 1, 20)
      .select("id_a", "id_b")
    val clusters = graft.operators.Dedup.dedupClusters(pairs)
    val keep = graft.operators.Dedup.keepListFromClusters(docs, clusters)
    val kept = docs.join(keep.where(col("keep_flag") === 1).select("doc_id"), "doc_id")
    val direct = kept.join(clusters, Seq("doc_id"), "left")
      .withColumn("split", graft.operators.Sampling.splitCol(
        coalesce(col("cluster_id"), col("doc_id")), "cur",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
      .groupBy("split", "source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    graft.operators.Caches.release()
    assert(mixRows(mix) == mixRows(direct))
  }

  test("near-dup clusters never straddle the split; losers are dropped") {
    val dir = newDir()
    val (_, runs) = Curation.runResumable(docs, dir, corpusVersion = "v1")
    val splitTable = runs.find(_.stage == "split").get.table
    val split = graft.sources.Warehouse.read(spark, dir, splitTable).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    // docs 1 and 2 are near-dups: only the keeper (longer doc wins,
    // tie to smaller id -> doc 1 at equal length? lengths differ by
    // suffix) survives, so at most one of them is present
    assert(!(split.contains(1L) && split.contains(2L)))
    assert(split.contains(3L) && split.contains(4L))
  }
}
