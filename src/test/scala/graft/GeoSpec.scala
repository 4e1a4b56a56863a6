package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Geo

class GeoSpec extends AnyFunSuite with SparkTest {

  /** Deterministic pseudo-random points on [0, span)². */
  private def points(n: Int, span: Long, mulX: Long, mulY: Long) = {
    val s = spark; import s.implicits._
    (1 to n).map { i =>
      (i.toLong, (i.toLong * mulX) % span, (i.toLong * mulY) % span)
    }.toDF("id", "x", "y")
  }

  test("gridPairs equals the brute-force all-pairs radius search") {
    val s = spark
    val pts = points(300, 10000L, 48271L, 69621L)
    val r = 900L
    val got = Geo.gridPairs(pts, r)
      .collect().map(rw => (rw.getLong(0), rw.getLong(1), rw.getLong(2))).toSet
    // brute force: every unordered pair, exact integer distance
    val raw = pts.collect().map(rw => (rw.getLong(0), rw.getLong(1), rw.getLong(2)))
    val want = (for {
      a <- raw; b <- raw if a._1 < b._1
      d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d2 <= r * r
    } yield (a._1, b._1, d2)).toSet
    assert(want.nonEmpty, "test must exercise non-empty result")
    assert(got == want)
  }

  test("gridPairs buckets NEGATIVE coordinates correctly (floorDiv cells)") {
    val s = spark; import s.implicits._
    // points straddling zero on both axes: truncate-toward-zero cell
    // division would widen the cells around the origin and either
    // duplicate or miss pairs near the seam
    val pts = (1 to 200).map { i =>
      (i.toLong, (i.toLong * 48271L) % 4001L - 2000L, (i.toLong * 69621L) % 4001L - 2000L)
    }.toDF("id", "x", "y")
    val r = 700L
    val got = Geo.gridPairs(pts, r)
      .collect().map(rw => (rw.getLong(0), rw.getLong(1), rw.getLong(2))).toSet
    val raw = pts.collect().map(rw => (rw.getLong(0), rw.getLong(1), rw.getLong(2)))
    val want = (for {
      a <- raw; b <- raw if a._1 < b._1
      d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d2 <= r * r
    } yield (a._1, b._1, d2)).toSet
    assert(want.nonEmpty, "test must exercise non-empty result")
    assert(raw.exists(p => p._2 < 0) && raw.exists(p => p._2 >= 0),
      "fixture must straddle zero")
    assert(got == want)
  }

  test("zoneAssign: containment, overlap resolves to min zone id, outside is NULL") {
    val s = spark; import s.implicits._
    val pts = Seq(
      (1L, 5L, 5L),    // inside zone 1 only
      (2L, 15L, 15L),  // inside zones 1 AND 2 -> min id 1
      (3L, 25L, 15L),  // inside zone 2 only
      (4L, 99L, 99L),  // outside all -> NULL
      (5L, 10L, 10L),  // on zone 1's corner boundary (closed) -> 1
      (6L, 30L, 30L)   // on zone 2's hi corner (closed) -> 2
    ).toDF("id", "x", "y")
    val zones = Seq(
      (1L, 0L, 20L, 0L, 20L),
      (2L, 10L, 30L, 10L, 30L)).toDF("zone_id", "x_lo", "x_hi", "y_lo", "y_hi")
    val out = graft.operators.Geo.zoneAssign(pts, zones)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out == Map(1L -> Some(1L), 2L -> Some(1L), 3L -> Some(2L),
      4L -> None, 5L -> Some(1L), 6L -> Some(2L)))
  }

  test("gridPairs produces each pair exactly once (no neighbor-cell dups)") {
    val pts = points(300, 10000L, 48271L, 69621L)
    val out = Geo.gridPairs(pts, 900L)
      .groupBy("id_a", "id_b").count().filter(col("count") > 1)
    assert(out.isEmpty, "a pair must match via the home cell only once")
  }

  test("knnRadius matches brute-force radius-bounded kNN with (dist2, id) ties") {
    val s = spark
    val qs = points(20, 10000L, 16807L, 65539L)
    val cs = points(500, 10000L, 48271L, 69621L)
    val r = 1500L; val k = 3
    val got = Geo.knnRadius(qs, cs, r, k)
      .collect().map(rw => (rw.getLong(0), rw.getInt(1), rw.getLong(2), rw.getLong(3))).toSet
    val qRaw = qs.collect().map(rw => (rw.getLong(0), rw.getLong(1), rw.getLong(2)))
    val cRaw = cs.collect().map(rw => (rw.getLong(0), rw.getLong(1), rw.getLong(2)))
    val want = (for (q <- qRaw) yield {
      val cands = cRaw.map { c =>
        (c._1, (q._2 - c._2) * (q._2 - c._2) + (q._3 - c._3) * (q._3 - c._3))
      }.filter(_._2 <= r * r).sortBy(c => (c._2, c._1)).take(k)
      cands.zipWithIndex.map { case ((cid, d2), i) => (q._1, i + 1, cid, d2) }
    }).flatten.toSet
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("cellSmooth is the exact 3x3 box filter of the cell histogram") {
    val s = spark; import s.implicits._
    // two occupied cells: (0,0) with 2 points, (2,0) with 1 point —
    // the cell between them receives mass from both
    val pts = Seq((1L, 1L, 1L), (2L, 3L, 2L), (3L, 21L, 4L)).toDF("id", "x", "y")
    val out = Geo.cellSmooth(pts, 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((0L, 0L)) == 2L, "own cell count")
    assert(out((1L, 0L)) == 3L, "between the two occupied cells: 2 + 1")
    assert(out((2L, 0L)) == 1L)
    assert(out((3L, 0L)) == 1L, "right neighbor of (2,0)")
    assert(out((-1L, -1L)) == 2L, "corner neighbor of (0,0)")
    // total mass = 9 x point count (every point lands in 9 cells)
    assert(out.values.sum == 9L * 3L)
  }

  test("corePoints matches brute-force neighbor counts; isolated points report 0") {
    val pts = points(300, 10000L, 48271L, 69621L)
    val r = 400L; val minPts = 3
    val got = Geo.corePoints(pts, r, minPts)
      .collect().map(rw => rw.getLong(0) -> ((rw.getLong(1), rw.getBoolean(2)))).toMap
    val raw = pts.collect().map(rw => (rw.getLong(0), rw.getLong(1), rw.getLong(2)))
    raw.foreach { a =>
      val n = raw.count { b =>
        b._1 != a._1 &&
          (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3) <= r * r
      }
      assert(got(a._1) == ((n.toLong, n >= minPts)), s"point ${a._1}")
    }
    assert(got.values.exists(_._2) && got.values.exists(!_._2),
      "test must exercise both core and non-core points")
    assert(got.values.exists(_._1 == 0L), "an isolated point must report 0")
  }

  test("knnGraph matches brute-force per-point nearest lists") {
    val pts = points(300, 10000L, 48271L, 69621L)
    val r = 900L; val k = 3
    val got = Geo.knnGraph(pts, r, k)
      .collect().map(rw => (rw.getLong(0), rw.getInt(1), rw.getLong(2), rw.getLong(3))).toSet
    val raw = pts.collect().map(rw => (rw.getLong(0), rw.getLong(1), rw.getLong(2)))
    val want = raw.flatMap { a =>
      raw.filter(_._1 != a._1).map { b =>
        (b._1, (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3))
      }.filter(_._2 <= r * r).sortBy(c => (c._2, c._1)).take(k)
        .zipWithIndex.map { case ((nb, d2), i) => (a._1, i + 1, nb, d2) }
    }.toSet
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("dbscanClusters equals a sequential DBSCAN with min-id clusters") {
    val pts = points(300, 10000L, 48271L, 69621L)
    val r = 400L; val minPts = 3
    val got = Geo.dbscanClusters(pts, r, minPts)
      .collect().map { rw =>
        rw.getLong(0) -> ((if (rw.isNullAt(1)) -1L else rw.getLong(1), rw.getString(2)))
      }.toMap
    // reference: brute neighbors, union-find over core-core edges
    val raw = pts.collect().map(rw => (rw.getLong(0), rw.getLong(1), rw.getLong(2)))
    def near(a: (Long, Long, Long), b: (Long, Long, Long)) =
      (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3) <= r * r
    val neighbors = raw.map(a => a._1 -> raw.filter(b => b._1 != a._1 && near(a, b)).map(_._1).toSet).toMap
    val cores = raw.map(_._1).filter(id => neighbors(id).size >= minPts).toSet
    val parent = scala.collection.mutable.Map(cores.toSeq.map(c => c -> c): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val rt = find(parent(x)); parent(x) = rt; rt }
    for (a <- cores; b <- neighbors(a) if cores(b)) {
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val clusterOf = cores.map { c =>
      val members = cores.filter(x => find(x) == find(c))
      c -> members.min
    }.toMap
    raw.map(_._1).foreach { id =>
      val want =
        if (cores(id)) (clusterOf(id), "core")
        else {
          val coreNbs = neighbors(id).filter(cores)
          if (coreNbs.nonEmpty) (coreNbs.map(clusterOf).min, "border") else (-1L, "noise")
        }
      assert(got(id) == want, s"point $id")
    }
    assert(got.values.map(_._2).toSet == Set("core", "border", "noise"),
      "test must exercise all three kinds")
  }

  test("pointInPolygon: hand-computed ray crossings on the concave pentagon") {
    val s = spark; import s.implicits._
    // the gate's pinned polygon: square with a V-notch cut into the top
    val poly = Seq((20000L, 20000L), (80000L, 20000L), (80000L, 80000L),
      (50000L, 50000L), (20000L, 80000L))
    val pts = Seq(
      (1L, 50000L, 30000L), // bottom center: inside
      (2L, 50000L, 70000L), // in the notch: outside (2 crossings)
      (3L, 30000L, 60000L), // left arm interior: inside (3 crossings)
      (4L, 10000L, 50000L), // left of the square: outside (4 crossings)
      (5L, 90000L, 90000L)  // above and right: outside (0 crossings)
    ).toDF("id", "x", "y")
    val out = graft.operators.Geo.pointInPolygon(pts, poly)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(1L)._2 && out(3L) == ((3L, true)))
    assert(out(2L) == ((2L, false)), "the notch must read OUTSIDE")
    assert(out(4L) == ((4L, false)) && out(5L) == ((0L, false)))
    // zero-shuffle contract: the polygon compiles into the projection
    val plan = graft.operators.Geo.pointInPolygon(pts, poly)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"containment must be a pure projection:\n$plan")
  }

  test("grid path plans equi-joins only — no cartesian, no BNLJ") {
    val pts = points(300, 10000L, 48271L, 69621L)
    val joined = Geo.gridPairs(pts, 900L)
    joined.count() // let AQE finalize
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"grid radius search must be an equi-join:\n$plan")
  }
}
