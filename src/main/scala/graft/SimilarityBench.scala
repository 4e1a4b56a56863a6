package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Caches, Similarity}

/** Vector-search throughput + recall benchmark — the ANN analog of
  * [[DedupBench]]: synthesizes a CLUSTERED embedding corpus (vectors
  * concentrate around seeded directions, the regime IVF exists for),
  * times the search tiers, and measures recall@k against the exact
  * brute-force ranking of the same queries. One JSON line; BASELINE.md
  * records it.
  *
  *   sbt "runMain graft.SimilarityBench [vectors] [dim]"   (default 100,000 × 64)
  *
  * Generation is distributed (spark.range + hash-derived components):
  * vector i belongs to cluster `i % 100` and its component j is the
  * cluster direction plus deterministic jitter. Queries are the first
  * 50 vectors (self-hit excluded by rank, not worth special-casing —
  * every tier sees the same ground truth).
  */
object SimilarityBench {

  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toInt).getOrElse(100000)
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val nQueries = 50
    val k = 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // clustered corpus: direction of cluster c, component j is a hash
    // in [-1, 1]; each member adds +-0.15 jitter — cosine structure IVF
    // can exploit, deterministic end to end
    val emb = spark.range(nVecs.toLong)
      .select(col("id").as("vec_id"),
        expr(s"""transform(sequence(0, ${dim - 1}), j -> CAST(
          (pmod(hash(id % 100, j), 2001) - 1000) / 1000.0 +
          (pmod(hash(id, j), 301) - 150) / 1000.0 AS FLOAT))""").as("embedding"))
      .persist()
    emb.count()

    val isQuery = col("vec_id") < nQueries
    val isCand = col("vec_id") >= nQueries.toLong

    def timed[A](body: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }
    def collectPairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val out = df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      Caches.release()
      out
    }

    val (tBrute, truth) = timed(collectPairs(
      Similarity.bruteForceTopK(emb, isQuery, isCand, k)))
    def recall(got: Set[(Long, Long)]): Double =
      got.intersect(truth).size.toDouble / truth.size

    // production shape: the corpus assignment is paid ONCE at index
    // build; query batches probe the stored cells
    val wh = java.nio.file.Files.createTempDirectory("ann-bench").toString
    val (tBuild, _) = timed(Similarity.buildIvfIndex(
      emb, isCand, wh, "corpus", numCentroids = 64, refineIters = 2))
    val (tIvf, ivf) = timed(collectPairs(
      Similarity.ivfTopKIndexed(emb.where(isQuery), wh, "corpus", k, nProbe = 8)))
    val (tLsh, lsh) = timed(collectPairs(
      Similarity.lshTopK(emb, isQuery, isCand, k, numPlanes = 12, dim = dim)))
    // PQ codebook quality A/B at equal m/codebookSize: per-subspace
    // Lloyd-trained book vs the untrained seed-slice book — the trained
    // tier must never measure below the slice tier it replaced
    val (tPqT, pqTrained) = timed(collectPairs(
      Similarity.pqTopK(emb, isQuery, isCand, k, m = 4, codebookSize = 16)))
    val (tPq0, pqSlice) = timed(collectPairs(
      Similarity.pqTopK(emb, isQuery, isCand, k, m = 4, codebookSize = 16,
        trainIters = 0)))
    require(recall(pqTrained) >= recall(pqSlice),
      s"trained PQ codebook recall ${recall(pqTrained)} fell below the " +
        s"untrained slice codebook's ${recall(pqSlice)}")

    def phase(name: String, t: Double, r: Double): String =
      s""""$name":{"sec":${f"$t%.2f"},"recall_at_$k":${f"$r%.3f"}}"""
    println(
      s"""{"metric":"ann_bench","vectors":$nVecs,"dim":$dim,"queries":$nQueries,""" +
        s""""brute":{"sec":${f"$tBrute%.2f"},"recall_at_$k":1.0},""" +
        s""""ivf_build":{"sec":${f"$tBuild%.2f"}},""" +
        phase("ivf_probe", tIvf, recall(ivf)) + "," +
        phase("lsh", tLsh, recall(lsh)) + "," +
        phase("pq_trained", tPqT, recall(pqTrained)) + "," +
        phase("pq_slice", tPq0, recall(pqSlice)) + "}")
    spark.stop()
  }
}
