package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite with SparkTest {

  test("bruteForceTopK ranks by cosine with deterministic tie-break") {
    val s = spark; import s.implicits._
    val emb = Seq(
      (0L, Array(1f, 0f)), // query
      (10L, Array(1f, 0.01f)), // nearly parallel -> rank 1
      (11L, Array(1f, 1f)), // 45 degrees -> rank 2
      (12L, Array(0f, 1f)), // orthogonal -> rank 3
      (13L, Array(-1f, 0f)) // opposite -> rank 4
    ).toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(emb, col("vec_id") < 10, col("vec_id") >= 10, 3)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    assert(got == Map(10L -> 1, 11L -> 2, 12L -> 3))
  }

  test("lshTopK achieves high recall vs brute force on clustered data") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(3)
    val dim = 16
    // clustered vectors: 8 clusters, queries drawn near cluster centers
    val centers = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val rows = (0 until 200).map { i =>
      val c = centers(i % 8)
      (i.toLong + 100L, c.map(v => v + 0.1f * rnd.nextGaussian().toFloat))
    } ++ (0 until 8).map(i => (i.toLong, centers(i).map(v => v + 0.05f * rnd.nextGaussian().toFloat)))
    val emb = rows.toDF("vec_id", "embedding")
    val brute = Similarity.bruteForceTopK(emb, col("vec_id") < 8, col("vec_id") >= 8, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(emb, col("vec_id") < 8, col("vec_id") >= 8, 5,
      numPlanes = 8, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall=$recall")
  }

  test("ivfTopK achieves high recall vs brute force on clustered data") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(3)
    val dim = 16
    val centers = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val rows = (0 until 200).map { i =>
      val c = centers(i % 8)
      (i.toLong + 100L, c.map(v => v + 0.1f * rnd.nextGaussian().toFloat))
    } ++ (0 until 8).map(i => (i.toLong, centers(i).map(v => v + 0.05f * rnd.nextGaussian().toFloat)))
    val emb = rows.toDF("vec_id", "embedding")
    val brute = Similarity.bruteForceTopK(emb, col("vec_id") < 8, col("vec_id") >= 8, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, col("vec_id") < 8, col("vec_id") >= 8, 5,
      numCentroids = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.6, s"recall=$recall")
    // nProbe = numCentroids probes every cell -> exact
    val full = Similarity.ivfTopK(emb, col("vec_id") < 8, col("vec_id") >= 8, 5,
      numCentroids = 16, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == brute)
  }
}
