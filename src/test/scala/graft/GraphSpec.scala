package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

class GraphSpec extends AnyFunSuite with SparkTest {

  private def ranks(edges: Seq[(Long, Long)], iters: Int) = {
    val s = spark; import s.implicits._
    Graph.pageRankFixed(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("symmetric cycle keeps ranks equal; mass is conserved up to flooring") {
    // directed 3-cycle: perfectly symmetric, so every node's rank is
    // identical at every iteration
    val got = ranks(Seq((1L, 2L), (2L, 3L), (3L, 1L)), 3)
    assert(got.size == 3 && got.values.toSet.size == 1)
    // each floor division drops < 1 unit per term: ≤ 2 per node per
    // round (base share + damped contribution) + 1 per node at init
    val total = got.values.sum
    assert(total <= 1000000000000L && total >= 1000000000000L - (3 * 3 * 2 + 3))
  }

  test("hub of an undirected star outranks the leaves") {
    // path a-b-c as bidirectional edges: b is the hub
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    val got = ranks(e, 3)
    assert(got(2L) > got(1L) && got(1L) == got(3L))
  }

  test("ranks are bit-identical across partitionings (integer arithmetic)") {
    val s = spark; import s.implicits._
    val e = (1L to 40L).map(i => (i, i % 7 + 1)) ++ (1L to 7L).map(i => (i, 8L))
    val df = e.toDF("src", "dst")
    val a = Graph.pageRankFixed(df, 4).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = Graph.pageRankFixed(df.repartition(13), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }

  test("zero iterations returns the uniform base rank") {
    val got = ranks(Seq((1L, 2L), (2L, 1L)), 0)
    assert(got == Map(1L -> 500000000000L, 2L -> 500000000000L))
  }
}
