package graft

import org.apache.spark.sql.functions.col
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

  private def bfs(edges: Seq[(Long, Long)], seeds: Seq[Long], maxHops: Int) = {
    val s = spark; import s.implicits._
    Graph.bfsDistances(edges.toDF("src", "dst"), seeds.toDF("node"), maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("bfsDistances: exact hop counts on a chain, cap respected, unreachable absent") {
    // directed chain 1->2->3->4->5, plus an island 9
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (9L, 9L))
    assert(bfs(e, Seq(1L), 3) == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    assert(bfs(e, Seq(1L), 10) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
    assert(bfs(e, Seq(1L), 0) == Map(1L -> 0L))
  }

  test("bfsDistances: multi-seed takes the minimum; seeds stay at 0") {
    val e = Seq((1L, 2L), (2L, 3L), (5L, 4L), (4L, 3L), (1L, 5L))
    // node 3: 2 hops from seed 1, 2 via 5->4 from... seed 5 reaches 3 in 2;
    // with both seeds, 4 is 1 hop (from 5) not 3 (from 1)
    val got = bfs(e, Seq(1L, 5L), 5)
    assert(got(1L) == 0L && got(5L) == 0L)
    assert(got(4L) == 1L && got(2L) == 1L && got(3L) == 2L)
  }

  test("bfsDistances is identical across partitionings") {
    val s = spark; import s.implicits._
    val e = (1L to 40L).map(i => (i, i % 7 + 100L)) ++ (100L to 106L).map(i => (i, 1L))
    val a = Graph.bfsDistances(e.toDF("src", "dst").repartition(1), Seq(1L).toDF("n"), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Graph.bfsDistances(e.toDF("src", "dst").repartition(13), Seq(1L).toDF("n"), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b && a.nonEmpty)
  }

  private def core(edges: Seq[(Long, Long)], k: Int) = {
    val s = spark; import s.implicits._
    // bidirectional convention, as for pageRankFixed
    val bi = edges ++ edges.map(e => (e._2, e._1))
    Graph.kCore(bi.toDF("src", "dst"), k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("kCore: peeling cascades — a tail chain dissolves, the clique survives") {
    // K4 on {1,2,3,4} plus a pendant chain 4-5-6: at k=2 the chain
    // peels in cascade (6 first, then 5), K4 survives with degree 3
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val got = core(k4 ++ Seq((4L, 5L), (5L, 6L)), 2)
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // at k=4 even K4 dissolves (max degree 3)
    assert(core(k4, 4).isEmpty)
    // at k=3 K4 survives intact
    assert(core(k4, 3).values.forall(_ == 3L))
  }

  test("kCore is identical across partitionings") {
    val s = spark; import s.implicits._
    val edges = ((1L to 30L).map(i => (i, i % 7 + 31L)) ++
      Seq((31L, 32L), (32L, 33L), (33L, 31L))).flatMap(e => Seq(e, (e._2, e._1)))
    val a = Graph.kCore(edges.toDF("src", "dst").repartition(1), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Graph.kCore(edges.toDF("src", "dst").repartition(11), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  private def propagate(edges: Seq[(Long, Long)], seeds: Seq[(Long, Long)], iters: Int) = {
    val s = spark; import s.implicits._
    Graph.labelPropagation(edges.toDF("src", "dst"), seeds.toDF("node", "label"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("labelPropagation spreads one hop per round along the chain") {
    // undirected chain 1-2-3, seed at 1
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    assert(propagate(e, Seq(1L -> 7L), 1) == Map(1L -> 7L, 2L -> 7L))
    assert(propagate(e, Seq(1L -> 7L), 2) == Map(1L -> 7L, 2L -> 7L, 3L -> 7L))
  }

  test("labelPropagation: majority wins, ties to the smaller label, seeds clamp") {
    // node 4 hears label 9 from two neighbors and 5 from one -> 9;
    // node 5 hears 5 and 9 once each -> tie -> smaller label 5;
    // seed 1 keeps its label even though its neighbors say otherwise
    val e = Seq(
      (1L, 4L), (2L, 4L), (3L, 4L),
      (2L, 5L), (1L, 5L),
      (2L, 1L), (3L, 1L),
      // reverse edges so every node is a source (undirected convention)
      (4L, 1L), (4L, 2L), (4L, 3L), (5L, 2L), (5L, 1L), (1L, 2L), (1L, 3L))
    val seeds = Seq(1L -> 5L, 2L -> 9L, 3L -> 9L)
    val got = propagate(e, seeds, 1)
    assert(got(4L) == 9L && got(5L) == 5L && got(1L) == 5L && got(2L) == 9L)
  }

  test("labelPropagation is bit-identical across partitionings") {
    val s = spark; import s.implicits._
    val e = ((1L to 30L).map(i => (i, i % 5 + 31L)) ++ (1L to 30L).map(i => (i % 5 + 31L, i))).toDF("src", "dst")
    val seeds = Seq(31L -> 1L, 32L -> 2L, 33L -> 1L).toDF("node", "label")
    val a = Graph.labelPropagation(e, seeds, 3).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = Graph.labelPropagation(e.repartition(11), seeds, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  private def triangles(edges: Seq[(Long, Long)]) = {
    val s = spark; import s.implicits._
    val got = Graph.triangleCounts(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.operators.Caches.release()
    got
  }

  test("triangleCounts: K4 gives every node 3 triangles; appendage gets 0") {
    // complete graph on {1,2,3,4} (4 triangles, each node in 3) plus a
    // pendant edge 4-5 (node 5 in none)
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val got = triangles(k4 ++ Seq((4L, 5L)))
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 0L))
  }

  test("triangleCounts ignores direction, duplicates, and self-loops") {
    // triangle given with mixed directions, a repeated edge, a self-loop
    val e = Seq((1L, 2L), (2L, 1L), (3L, 2L), (1L, 3L), (3L, 3L), (1L, 2L))
    val got = triangles(e)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("connectedComponents: chain graph converges in O(log n) rounds, not O(n)") {
    val s = spark; import s.implicits._
    // a 256-node path is the worst case for min-label propagation
    // (255 rounds); star contraction must close it in ≤ 2·log₂(256)
    // alternation cycles
    val n = 256
    val chain = (1L until n.toLong).map(i => (i, i + 1)).toDF("src", "dst")
    val (labels, rounds) = Graph.connectedComponentsWithRounds(chain)
    val out = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == n && out.forall(_._2 == 1L),
      s"all $n chain nodes must land in component 1, got ${out.take(5).toSeq}...")
    val bound = 2 * (math.log(n.toDouble) / math.log(2.0)).ceil.toInt
    assert(rounds <= bound, s"chain of $n took $rounds rounds (bound $bound)")
  }

  test("connectedComponents matches dedupClusters on mixed components and is partition-invariant") {
    val s = spark; import s.implicits._
    // two cliques bridged to one component + an isolated pair + a chain
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 7L), (7L, 8L), (8L, 9L),
      (7L, 9L), (20L, 21L), (30L, 31L), (31L, 32L), (32L, 33L)).toDF("src", "dst")
    val a = Graph.connectedComponents(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = Graph.connectedComponents(e.repartition(5)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b, "component labels must be partition-invariant")
    val viaDedup = graft.operators.Dedup.dedupClusters(
      e.select(col("src").as("id_a"), col("dst").as("id_b"))).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == viaDedup, "star contraction and min-label propagation must agree")
  }

  test("triangleCounts is partition-invariant and handles skewed hubs") {
    val s = spark; import s.implicits._
    // hub 100 connects to everyone; triangles = edges among the leaves
    val e = ((1L to 20L).map(i => (100L, i)) ++
      Seq((1L, 2L), (2L, 3L), (5L, 6L))).toDF("src", "dst")
    val a = Graph.triangleCounts(e).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = Graph.triangleCounts(e.repartition(7)).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    graft.operators.Caches.release()
    assert(a == b)
    val m = a.toMap
    assert(m(100L) == 3L && m(1L) == 1L && m(2L) == 2L && m(3L) == 1L &&
      m(5L) == 1L && m(6L) == 1L && m(10L) == 0L)
  }

  test("ssspBounded: hop cap trades the cheap long route for the direct edge") {
    val s = spark; import s.implicits._
    // 1 -(1)- 2 -(1)- 3 and a direct 1 -(10)- 3: two hops cost 2,
    // one hop costs 10
    val e = Seq((1L, 2L, 1L), (2L, 1L, 1L), (2L, 3L, 1L), (3L, 2L, 1L),
      (1L, 3L, 10L), (3L, 1L, 10L)).toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("node")
    def run(h: Int) = Graph.ssspBounded(e, seeds, maxHops = h)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val one = run(1)
    assert(one(1L) == 0L && one(2L) == 1L && one(3L) == 10L,
      "one hop: only the direct (expensive) edge reaches 3")
    val two = run(2)
    assert(two(3L) == 2L, "two hops: the relay route wins")
    graft.operators.Caches.release()
    // early stop: extra hop budget beyond the fixpoint changes nothing
    val ten = run(10)
    graft.operators.Caches.release()
    assert(ten == two)
  }

  test("commonNeighborCandidates: scores non-adjacent pairs, cap silences hubs") {
    val s = spark; import s.implicits._
    // 4-cycle 1-3-2-4-1: (1,2) and (3,4) are non-adjacent with two
    // common neighbors each; adjacent pairs must not appear
    val e = Seq((1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L)).toDF("src", "dst")
    val got = Graph.commonNeighborCandidates(e, maxCenterDegree = 64, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    graft.operators.Caches.release()
    assert(got == Map((1L, 2L) -> 2L, (3L, 4L) -> 2L))
    // cap below every degree: no wedge centers, no candidates
    val none = Graph.commonNeighborCandidates(e, maxCenterDegree = 1, topK = 10)
      .collect()
    graft.operators.Caches.release()
    assert(none.isEmpty)
  }

  test("clusteringCoefficient: triangle nodes close, pendant is NULL") {
    val s = spark; import s.implicits._
    // triangle {1,2,3} plus pendant edge 1-4
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val got = Graph.clusteringCoefficient(e).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    graft.operators.Caches.release()
    assert(got(1L) == ((3L, 1L, 333333L)), "deg-3 node: 1 of 3 pairs closed")
    assert(got(2L) == ((2L, 1L, 1000000L)) && got(3L) == ((2L, 1L, 1000000L)),
      "deg-2 triangle corners are fully closed")
    assert(got(4L) == ((1L, 0L, -1L)), "pendant: no neighbor pairs, NULL")
  }

  test("maintainComponents: delta-edge label repair equals the full rebuild") {
    val s = spark; import s.implicits._
    // old graph: {1-2, 2-3} comp 1; {10-11} comp 10; {20-21} comp 20
    val old = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("src", "dst")
    val labels = Graph.connectedComponents(old)
    // delta: bridge comps 1 and 10; attach NEW node 30 to comp 20;
    // an intra-component edge (no-op); a brand-new pair 40-41; and a
    // new node 0 that becomes its merged component's NEW minimum
    val delta = Seq((3L, 10L), (21L, 30L), (1L, 3L), (40L, 41L), (0L, 11L))
      .toDF("src", "dst")
    val got = Graph.maintainComponents(labels, delta)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Graph.connectedComponents(old.unionByName(delta))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"repair diverged from rebuild: $got vs $want")
    // the 0-bridge pulls the whole 1-2-3-10-11 component down to 0
    assert(got(11L) == 0L && got(1L) == 0L)
    assert(got(30L) == 20L && got(40L) == 40L)
    // randomized: any split of a random edge set repairs to the rebuild
    val rnd = new scala.util.Random(33L)
    val edges = (0 until 120).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
    for (trial <- 0 until 3) {
      val (o, dl) = rnd.shuffle(edges).splitAt(edges.size * 2 / 3)
      val g2 = Graph.maintainComponents(
        Graph.connectedComponents(o.toDF("src", "dst")), dl.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val w2 = Graph.connectedComponents((o ++ dl).toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(g2 == w2, s"trial $trial diverged")
    }
  }

  test("ancestorClosure: tree and DAG ancestry exact, cycles fail loudly") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    // tree: 1 <- 2,3; 2 <- 4; plus DAG node 5 with TWO parents (3,4)
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 2L), (5L, 3L), (5L, 4L))
      .toDF("child", "parent")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("node")
    val got = graft.operators.Graph.ancestorClosure(edges, nodes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    graft.operators.Caches.release()
    val expected = Set(
      (1L, 1L, 0L), (2L, 2L, 0L), (3L, 3L, 0L), (4L, 4L, 0L), (5L, 5L, 0L),
      (2L, 1L, 1L), (3L, 1L, 1L), (4L, 2L, 1L), (4L, 1L, 2L),
      (5L, 3L, 1L), (5L, 4L, 1L), // both DAG parents
      (5L, 1L, 2L), (5L, 2L, 2L), // via 3 -> 1 and via 4 -> 2
      (5L, 1L, 3L))               // via 4 -> 2 -> 1: BOTH paths to 1 kept
    assert(got == expected)
    // a cycle can never converge: loud failure, not an infinite loop
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("child", "parent")
    val e = intercept[Exception] {
      graft.operators.Graph.ancestorClosure(cyc, Seq(1L, 2L).toDF("node"), maxDepth = 8)
        .count()
    }
    graft.operators.Caches.release()
    assert(e.getMessage.contains("maxDepth"))
  }

  test("extendAncestorClosure: delta chains compose with the base; re-parenting rejects") {
    val s = spark; import s.implicits._
    import graft.operators.Graph
    // base tree: 1 <- 2 <- 3
    val baseEdges = Seq((2L, 1L), (3L, 2L)).toDF("child", "parent")
    val base = Graph.ancestorClosure(baseEdges, Seq(1L, 2L, 3L).toDF("node"))
    // delta: 4 under 3 (existing), 5 under 4 (a NEW-node chain)
    val dEdges = Seq((4L, 3L), (5L, 4L)).toDF("child", "parent")
    val maint = Graph.extendAncestorClosure(base, dEdges, Seq(4L, 5L).toDF("node"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val rebuilt = Graph.ancestorClosure(
      baseEdges.unionByName(dEdges), (1L to 5L).toDF("node"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    graft.operators.Caches.release()
    assert(maint == rebuilt, "maintained closure must equal the full rebuild")
    assert(maint.contains((5L, 1L, 4L)), "chain 5->4->3->2->1 composed through the base")
    // re-parenting an EXISTING node must reject loudly
    val e = intercept[IllegalArgumentException] {
      Graph.extendAncestorClosure(base, Seq((3L, 1L)).toDF("child", "parent"),
        Seq(6L).toDF("node"))
    }
    graft.operators.Caches.release()
    assert(e.getMessage.contains("rebuild"))
  }

  test("moveSubtree: maintain equals rebuild for root/leaf/DAG moves; invalid moves reject") {
    val s = spark; import s.implicits._
    import graft.operators.Graph
    // per-path DAG semantics: compare as MULTISETS, not sets
    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(identity).view.mapValues(_.size).toMap
    // tree: 1 <- 2,3 ; 2 <- 4,5 ; 3 <- 6
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 2L), (5L, 2L), (6L, 3L))
      .toDF("child", "parent")
    val nodes = (1L to 6L).toDF("node")
    val closure = Graph.ancestorClosure(edges, nodes)
    def rebuilt(newEdges: Seq[(Long, Long)], nn: org.apache.spark.sql.DataFrame = nodes) =
      multiset(Graph.ancestorClosure(newEdges.toDF("child", "parent"), nn))
    // root-adjacent move: 2 (whole subtree {2,4,5}) re-files under 3
    val mv1 = multiset(Graph.moveSubtree(closure, edges, 2L, 3L))
    assert(mv1 == rebuilt(Seq((2L, 3L), (3L, 1L), (4L, 2L), (5L, 2L), (6L, 3L))),
      "root-adjacent move must equal the full rebuild")
    // leaf move: 5 under 6
    val mv2 = multiset(Graph.moveSubtree(closure, edges, 5L, 6L))
    assert(mv2 == rebuilt(Seq((2L, 1L), (3L, 1L), (4L, 2L), (5L, 6L), (6L, 3L))),
      "leaf move must equal the full rebuild")
    graft.operators.Caches.release()
    // DAG: 7 has TWO parents INSIDE the moved subtree (4 and 5) — per-
    // path multiplicity must survive the move (7 reaches 1 twice)
    val dagEdges = edges.unionByName(Seq((7L, 4L), (7L, 5L)).toDF("child", "parent"))
    val dagNodes = (1L to 7L).toDF("node")
    val dagClosure = Graph.ancestorClosure(dagEdges, dagNodes)
    val mv3 = multiset(Graph.moveSubtree(dagClosure, dagEdges, 2L, 6L))
    assert(mv3 == rebuilt(Seq((2L, 6L), (3L, 1L), (4L, 2L), (5L, 2L), (6L, 3L),
      (7L, 4L), (7L, 5L)), dagNodes),
      "DAG multi-parent inside the subtree must be preserved per path")
    graft.operators.Caches.release()
    // new parent inside the moved subtree would be a cycle: loud
    val e1 = intercept[IllegalArgumentException] {
      Graph.moveSubtree(closure, edges, 2L, 4L)
    }
    assert(e1.getMessage.contains("cycle"))
    // a subtree node whose edge exits the subtree NOT via the moved
    // root: its paths cannot be reassigned from the closure — loud
    val exitEdges = edges.unionByName(Seq((4L, 3L)).toDF("child", "parent"))
    val exitClosure = Graph.ancestorClosure(exitEdges, nodes)
    val e2 = intercept[IllegalArgumentException] {
      Graph.moveSubtree(exitClosure, exitEdges, 2L, 6L)
    }
    assert(e2.getMessage.contains("rebuild"))
    graft.operators.Caches.release()
  }

  test("removeSubtree: maintain equals rebuild; a multi-parent survivor rejects") {
    val s = spark; import s.implicits._
    import graft.operators.Graph
    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(identity).view.mapValues(_.size).toMap
    // tree: 1 <- 2,3 ; 2 <- 4,5 ; 3 <- 6; retire 2's subtree {2,4,5}
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 2L), (5L, 2L), (6L, 3L))
      .toDF("child", "parent")
    val closure = Graph.ancestorClosure(edges, (1L to 6L).toDF("node"))
    val kept = multiset(Graph.removeSubtree(closure, edges, 2L))
    val rebuilt = multiset(Graph.ancestorClosure(
      Seq((3L, 1L), (6L, 3L)).toDF("child", "parent"), Seq(1L, 3L, 6L).toDF("node")))
    assert(kept == rebuilt, "delete maintenance must equal the shrunken rebuild")
    graft.operators.Caches.release()
    // DAG: 5 also has parent 6 OUTSIDE the subtree — it would survive a
    // true edge delete, so the one-anti-join maintenance must refuse
    val dagEdges = edges.unionByName(Seq((5L, 6L)).toDF("child", "parent"))
    val dagClosure = Graph.ancestorClosure(dagEdges, (1L to 6L).toDF("node"))
    val e = intercept[IllegalArgumentException] {
      Graph.removeSubtree(dagClosure, dagEdges, 2L)
    }
    assert(e.getMessage.contains("re-parent"))
    graft.operators.Caches.release()
  }
}
