package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Search

class SearchSpec extends AnyFunSuite with SparkTest {

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  // --------------------------------------------------------- phrase search

  test("phraseSearch finds consecutive-token matches with positions") {
    val d = docs(
      1L -> "the quick brown fox",
      2L -> "quick brown shoes and quick brown fox",
      3L -> "brown quick fox", // terms present, wrong order -> no match
      4L -> "quick fox") // adjacency broken -> no match
    val out = Search.phraseSearchDocs(d, Seq("quick", "brown"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 1L, 1L), (2L, 2L, 0L)))
  }

  test("phraseSearch handles repeated terms and overlapping anchors") {
    val d = docs(1L -> "a a a b", 2L -> "a b a", 3L -> "b b a")
    // phrase "a a": doc 1 anchors at 0 and 1 (overlap allowed)
    val out = Search.phraseSearchDocs(d, Seq("a", "a"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 2L, 0L)))
    // single-word phrase degrades to term lookup with occurrence counts
    val one = Search.phraseSearchDocs(d, Seq("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(one == Set((1L, 1L, 3L), (2L, 1L, 1L), (3L, 2L, 0L)))
  }

  test("phraseSearch over a persisted index equals the inline path") {
    val d = docs(
      1L -> "x y z x y",
      2L -> "y x y",
      3L -> "z z z")
    val dir = java.nio.file.Files.createTempDirectory("searchidx").toString
    Search.invertedIndex(d).write.mode("overwrite").parquet(dir)
    val idx = spark.read.parquet(dir)
    val live = Search.phraseSearchDocs(d, Seq("x", "y")).collect().toSet
    val persisted = Search.phraseSearch(idx, Seq("x", "y")).collect().toSet
    assert(live == persisted && live.nonEmpty)
  }

  test("invertedIndex postings carry sorted positions and tf") {
    val d = docs(1L -> "b a b  a b")
    val rows = Search.invertedIndex(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Int](2), r.getLong(3)))
      .toSet
    assert(rows == Set(("a", 1L, Seq(1, 3), 2L), ("b", 1L, Seq(0, 2, 4), 3L)))
  }

  // ------------------------------------------------------------------ BM25

  test("bm25TopK hand-computed score on a two-doc corpus") {
    // corpus: doc 1 = "w w x", doc 2 = "x y z". N=2, T=6.
    // query "w": tf=2, dl=3, df=1 ->
    //   num = 22*2*6 * (2*(2-1)+1) * 1e6 = 264 * 3 * 1e6
    //   den = (10*2*6 + 3*6 + 9*3*2) * (2*1+1) = (120+18+54)*3 = 576
    //   score = 792_000_000 div 576 = 1_375_000
    val d = docs(1L -> "w w x", 2L -> "x y z")
    val out = Search.bm25TopK(d, Seq(1 -> Seq("w")), k = 5)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1, 1, 1L, 1375000L)))
  }

  test("bm25TopK rare terms outweigh common terms (df weighting)") {
    // 'rare' appears in 1 of 6 docs; 'common' in all. A doc matching
    // the rare term must outrank docs with only the common term.
    val d = docs(
      1L -> "common rare pad pad",
      2L -> "common common common pad",
      3L -> "common pad pad pad",
      4L -> "common pad pad pad",
      5L -> "common pad pad pad",
      6L -> "common pad pad pad")
    val top = Search.bm25TopK(d, Seq(1 -> Seq("rare", "common")), k = 6)
      .orderBy("rk").collect().map(_.getLong(2))
    assert(top.head == 1L)
    // doc 2 (tf=3 on the common term) beats the tf=1 docs but not doc 1
    assert(top(1) == 2L)
  }

  test("bm25TopKFromIndex equals bm25TopK; appendToInvertedIndex is O(delta) and replay-safe") {
    val d = docs(
      1L -> "alpha beta gamma alpha",
      2L -> "beta beta delta",
      3L -> "gamma alpha epsilon",
      4L -> "zeta eta theta")
    val q = Seq(1 -> Seq("alpha", "beta"), 2 -> Seq("gamma"))
    val idx = Search.invertedIndex(d)
    val live = Search.bm25TopK(d, q, k = 4).collect().toSet
    val served = Search.bm25TopKFromIndex(idx, q, k = 4).collect().toSet
    assert(live == served && live.nonEmpty)
    // incremental: index built from a prefix + appended delta == rebuild
    val prefix = d.filter("doc_id <= 2")
    val delta = d.filter("doc_id >= 2") // doc 2 overlaps: replay-safe skip
    val appended = Search.appendToInvertedIndex(Search.invertedIndex(prefix), delta)
    assert(appended.collect().toSet == idx.collect().toSet)
    // replaying the same delta changes nothing
    val replayed = Search.appendToInvertedIndex(appended, delta)
    assert(replayed.collect().toSet == idx.collect().toSet)
    graft.operators.Caches.release()
  }

  test("deleteFromInvertedIndex: served scores match a fresh index of the survivors") {
    val s = spark; import s.implicits._
    val d = docs(
      1L -> "alpha beta gamma alpha",
      2L -> "beta beta delta",
      3L -> "gamma alpha epsilon",
      4L -> "zeta eta theta alpha")
    val q = Seq(1 -> Seq("alpha", "beta"), 2 -> Seq("gamma"))
    val idx = Search.invertedIndex(d)
    val revoked = Seq(3L).toDF("doc_id")
    val pruned = Search.deleteFromInvertedIndex(idx, revoked)
    // revoked postings are gone wholesale
    assert(pruned.filter("doc_id = 3").count() == 0)
    // serving from the pruned index == fresh index of the surviving
    // corpus: dl, df, N, T all shift because stats derive from the index
    val served = Search.bm25TopKFromIndex(pruned, q, k = 4).collect().toSet
    val fresh = Search.bm25TopKFromIndex(
      Search.invertedIndex(d.filter("doc_id <> 3")), q, k = 4).collect().toSet
    assert(served == fresh && served.nonEmpty)
    // deleting an absent id is a no-op (replay-safe)
    val again = Search.deleteFromInvertedIndex(pruned, Seq(3L, 99L).toDF("doc_id"))
    assert(again.collect().toSet == pruned.collect().toSet)
    // a revoked doc can be re-ingested later: delete + append round-trips
    val restored = Search.appendToInvertedIndex(pruned, d.filter("doc_id = 3"))
    assert(restored.collect().toSet == idx.collect().toSet)
    graft.operators.Caches.release()
  }


  test("ndcgAtK: inclusion-ordered corpus ranks ideally (ndcg exactly 1)") {
    val s = spark; import s.implicits._
    // equal doc lengths => per-term BM25 scores are identical across
    // docs, so the score is monotone in the matched-term SET and the
    // BM25 order equals the relevance order => DCG == IDCG term-wise.
    val docs = Seq(
      (1L, "x y z"), (2L, "x y q"), (3L, "x q q"), (4L, "q q q")
    ).toDF("doc_id", "text")
    val out = Search.ndcgAtK(docs, Seq(1 -> Seq("x", "y", "z")), k = 3)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == r.getLong(2), "dcg_ppm must equal idcg_ppm")
    assert(r.getDouble(3) == 1.0)
  }

  test("ndcgAtK penalizes an inverted ranking below 1") {
    val s = spark; import s.implicits._
    // one rare high-rel doc vs a doc stuffed with the common term:
    // tf weighting ranks the stuffed doc first, but relevance grades
    // disagree -> ndcg < 1 while staying positive
    val docs = Seq(
      (1L, "x x x x x x q q"), (2L, "x y z q q q q q")
    ).toDF("doc_id", "text")
    val out = Search.ndcgAtK(docs, Seq(7 -> Seq("x", "y", "z")), k = 2)
      .collect().head
    assert(out.getLong(1) > 0L && out.getLong(1) <= out.getLong(2))
    assert(out.getDouble(3) > 0.0 && out.getDouble(3) <= 1.0)
  }

  test("rrfFuse hand-computed: overlap beats either single list") {
    val s = spark; import s.implicits._
    // system A ranks docs 1,2,3; system B ranks 2,3,4. kRrf=60.
    val a = Seq((1, 1, 1L), (1, 2, 2L), (1, 3, 3L)).toDF("query_id", "rk", "doc_id")
      .select($"query_id", $"doc_id", $"rk")
    val b = Seq((1, 1, 2L), (1, 2, 3L), (1, 3, 4L)).toDF("query_id", "rk", "doc_id")
      .select($"query_id", $"doc_id", $"rk")
    val got = graft.operators.Search.rrfFuse(a, b, k = 4)
      .orderBy("rk").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    def rr(rk: Long) = 1000000000L / (60 + rk)
    // doc2: rank1 in A? no — A: doc1@1, doc2@2, doc3@3; B: doc2@1, doc3@2, doc4@3
    val expected = Seq(
      (2L, rr(2) + rr(1)), // doc 2: strongest (both lists, high ranks)
      (3L, rr(3) + rr(2)),
      (1L, rr(1)), // doc 1: only in A at rank 1
      (4L, rr(3)))
    assert(got.map(g => (g._2, g._3)).toSeq == expected)
    assert(got.map(_._1).toSeq == Seq(1, 2, 3, 4))
  }

  test("rrfFuse breaks score ties by doc id and respects k") {
    val s = spark; import s.implicits._
    val a = Seq((7, 1, 10L), (7, 2, 11L)).toDF("query_id", "rk", "doc_id")
      .select($"query_id", $"doc_id", $"rk")
    val b = Seq((7, 1, 11L), (7, 2, 10L)).toDF("query_id", "rk", "doc_id")
      .select($"query_id", $"doc_id", $"rk")
    // both docs score rr(1)+rr(2) -> tie -> doc 10 first; k=1 truncates
    val got = graft.operators.Search.rrfFuse(a, b, k = 1).collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, 10L)))
  }

  test("bm25TopK is deterministic under repartitioning and ties break by doc id") {
    val d = docs(
      1L -> "t u", 2L -> "t u", 3L -> "t u", // identical docs -> tied scores
      4L -> "u v")
    val q = Seq(1 -> Seq("t"), 2 -> Seq("t", "v"))
    val a = Search.bm25TopK(d, q, k = 3).collect().toSeq
    val b = Search.bm25TopK(d.repartition(7), q, k = 3).collect().toSeq
    assert(a.toSet == b.toSet)
    val tied = a.filter(_.getInt(0) == 1).sortBy(_.getInt(1)).map(_.getLong(2))
    assert(tied == Seq(1L, 2L, 3L)) // score ties -> ascending doc id
    graft.operators.Caches.release()
  }
}
