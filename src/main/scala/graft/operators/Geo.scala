package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Grid-bucketed spatial operators over integer planar coordinates —
  * the candidate-generation discipline applied to geometry.
  *
  * All-pairs radius search is the spatial twin of all-pairs
  * similarity: O(n²) brute force is the oracle tier, never the
  * production tier. The scale shape here is the uniform grid: bucket
  * every point into a cell of side `r`, and any pair within Euclidean
  * distance `r` necessarily lands in the same or an adjacent cell
  * (|dx| ≤ r ⇒ cell delta ≤ 1 per axis). Expanding one side by its
  * 3×3 cell neighborhood turns radius search into an EQUI-join on
  * (cell_x, cell_y) — a keyed shuffle that partitions by spatial
  * locality, exactly how a 100 TB point corpus distributes: each
  * reducer sees one bucket of cells, never the whole plane. Skewed
  * hotspots (many points in one cell) are ordinary join skew —
  * AQE's skew split or [[Skew.saltedJoin]] apply unchanged.
  *
  * Coordinates are LONG and every distance is the exact integer
  * squared Euclidean distance, so results hash-compare bit-for-bit
  * against a cross-join oracle — no float epsilon anywhere. Cell
  * bucketing uses explicit FLOOR division ([[Geo.floorDiv]]) rather
  * than Spark's truncate-toward-zero `div`, so NEGATIVE coordinates
  * bucket correctly too (truncation would widen the cells straddling
  * zero and, in [[dbscanClusters]], silently merge cores farther than
  * `r` apart) and the arithmetic matches DuckDB's `//` for every sign.
  */
object Geo {

  private def checkR(r: Long): Unit = require(r >= 1, "radius must be >= 1")

  /** The 3×3 neighbor-offset expansion of a cell pair, as an explode
    * over a 9-element literal array — rides inside the projection,
    * no join, no broadcast.
    */
  private def withNeighborCells(df: DataFrame, cx: String, cy: String): DataFrame = {
    val offsets = array((for { dx <- -1 to 1; dy <- -1 to 1 } yield
      struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
    df.withColumn("__o", explode(offsets))
      .withColumn("__jcx", col(cx) + col("__o.dx"))
      .withColumn("__jcy", col(cy) + col("__o.dy"))
      .drop("__o")
  }

  /** Exact integer FLOOR division as a SQL expression — matches
    * DuckDB's `//` for every sign. Spark's `div` truncates toward
    * zero, which mis-buckets negative coordinates (cells straddling
    * zero widen), so every cell computation routes through this.
    */
  private[operators] def floorDiv(e: String, d: Long): String =
    s"(($e - ((($e % $d) + $d) % $d)) div $d)"

  private def cellCols(df: DataFrame, r: Long): DataFrame =
    df.withColumn("__cx", expr(floorDiv("x", r)))
      .withColumn("__cy", expr(floorDiv("y", r)))

  /** Exact squared Euclidean distance between two long points. */
  private def dist2(xa: Column, ya: Column, xb: Column, yb: Column): Column =
    (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)

  /** All pairs of points within Euclidean distance `r` (inclusive),
    * as (id_a < id_b, dist2). Input: (id LONG, x LONG, y LONG) —
    * coordinates of either sign ([[floorDiv]] buckets negative
    * coordinates correctly; Spark's truncate-toward-zero `div` would
    * widen the cells straddling zero).
    *
    * One side is expanded by its 9 neighbor cells and equi-joined on
    * the other side's single home cell, so each ordered pair is
    * produced exactly once (the home cell is unique and the nine
    * probe cells are distinct) — no post-join dedup. The residual
    * `dist2 ≤ r²` filter runs inside the join's codegen stage.
    * Output pairs ≈ density²·πr²·area — the join, not the output,
    * is what the grid keeps linear.
    */
  def gridPairs(points: DataFrame, r: Long): DataFrame = {
    checkR(r)
    val pts = cellCols(points.select(
      col("id").cast("long").as("id"),
      col("x").cast("long").as("x"),
      col("y").cast("long").as("y")), r)
    val l = withNeighborCells(
      pts.select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
        col("__cx"), col("__cy")), "__cx", "__cy")
    val rgt = pts.select(col("id").as("id_b"), col("x").as("xb"), col("y").as("yb"),
      col("__cx").as("__bcx"), col("__cy").as("__bcy"))
    l.join(rgt, col("__jcx") === col("__bcx") && col("__jcy") === col("__bcy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist2", dist2(col("xa"), col("ya"), col("xb"), col("yb")))
      .filter(col("dist2") <= lit(r * r))
      .select("id_a", "id_b", "dist2")
  }

  /** Radius-bounded k-nearest-neighbors: for every query point, the
    * `k` nearest candidate points within Euclidean distance `r`,
    * ranked by (dist2, candidate id) — the deterministic tie-break
    * that makes top-k hash-comparable. Queries and candidates are
    * separate tables (the asymmetric probe: few queries, many
    * candidates — the index-lookup shape).
    *
    * The radius bound is the contract, not a shortcut: candidates
    * come from the query's 3×3 cell neighborhood at cell side `r`,
    * which is complete for distance ≤ r, and the per-query window
    * ranks only those survivors. Unbounded kNN would need expanding
    * ring probes (iterative); radius-bounded kNN is one keyed join +
    * one partitioned window — the shape that survives 10⁹ candidates.
    */
  def knnRadius(queries: DataFrame, candidates: DataFrame, r: Long, k: Int): DataFrame = {
    checkR(r); require(k >= 1, "k must be >= 1")
    val q = withNeighborCells(cellCols(queries.select(
      col("id").cast("long").as("q_id"),
      col("x").cast("long").as("x"),
      col("y").cast("long").as("y")), r)
      .select(col("q_id"), col("x").as("qx"), col("y").as("qy"), col("__cx"), col("__cy")),
      "__cx", "__cy")
    val c = cellCols(candidates.select(
      col("id").cast("long").as("c_id"),
      col("x").cast("long").as("x"),
      col("y").cast("long").as("y")), r)
      .select(col("c_id"), col("x").as("cx_"), col("y").as("cy_"),
        col("__cx").as("__ccx"), col("__cy").as("__ccy"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("dist2"), col("c_id"))
    q.join(c, col("__jcx") === col("__ccx") && col("__jcy") === col("__ccy"))
      .withColumn("dist2", dist2(col("qx"), col("qy"), col("cx_"), col("cy_")))
      .filter(col("dist2") <= lit(r * r))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "c_id", "dist2")
  }

  /** Radius-bounded kNN GRAPH: for every point, its `k` nearest other
    * points within distance `r` — the self-join form of [[knnRadius]]
    * and the construction step of mutual-kNN clustering and
    * graph-based ANN indexes. One [[gridPairs]] pass symmetrized into
    * directed neighbor rows, one partitioned rank window; (dist2, id)
    * ties pinned. Points with no neighbor within `r` emit nothing
    * (the graph simply has no edges there).
    */
  def knnGraph(points: DataFrame, r: Long, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // persisted: the symmetrizing union references the pair table
    // twice — unpersisted, the grid join would re-execute per branch
    val pairs = Caches.persisted(gridPairs(points, r))
    val directed = pairs
      .select(col("id_a").as("id"), col("id_b").as("nb"), col("dist2"))
      .unionByName(pairs.select(col("id_b").as("id"), col("id_a").as("nb"), col("dist2")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("dist2"), col("nb"))
    directed.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("id", "rank", "nb", "dist2")
  }

  /** DBSCAN core-point identification: a point is `core` when at
    * least `minPts` OTHER points lie within distance `r`. Composed
    * from [[gridPairs]] (each unordered pair symmetrized into two
    * directed neighbor rows) + one count + one left join back to the
    * point set, so isolated points report 0 — the density-clustering
    * primitive, at grid-join cost. Cluster expansion from the cores
    * is [[Dedup.dedupClusters]]/`Graph.connectedComponents` over the
    * core-core pair edges — the same candidate-then-cluster split the
    * dedup family uses.
    */
  def corePoints(points: DataFrame, r: Long, minPts: Int): DataFrame = {
    require(minPts >= 1, "minPts must be >= 1")
    // persisted: both union branches read the pair table
    val pairs = Caches.persisted(gridPairs(points, r))
    val directed = pairs.select(col("id_a").as("id"))
      .unionByName(pairs.select(col("id_b").as("id")))
    val counts = directed.groupBy("id").agg(count(lit(1)).as("n_neighbors"))
    points.select(col("id").cast("long").as("id"))
      .join(counts, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"),
        (coalesce(col("n_neighbors"), lit(0L)) >= minPts).as("is_core"))
  }

  /** Full DBSCAN labeling from the grid pairs: every point classified
    * `core` / `border` / `noise` with a deterministic cluster id.
    *
    * The classic split: clusters are connected components of the
    * core-core proximity graph ([[graft.operators.Graph
    * .connectedComponents]] — O(log n) star contraction, so a snaking
    * density ridge doesn't degrade into diameter-many rounds);
    * borders (non-core within `r` of a core) adopt the MINIMUM
    * cluster id among their core neighbors — the pinned tie-break for
    * the points DBSCAN leaves order-dependent; noise keeps a NULL
    * cluster. Cluster id = min point id in the component, stable
    * under any partitioning. The pair table is persisted once
    * ([[Caches]]) — three consumers (core counts, core edges, border
    * adoption) must not re-run the grid join.
    */
  def dbscanClusters(points: DataFrame, r: Long, minPts: Int): DataFrame = {
    require(minPts >= 1, "minPts must be >= 1")
    val ids = points.select(col("id").cast("long").as("id"))
    val pairs = Caches.persisted(gridPairs(points, r))
    val directed = pairs.select(col("id_a").as("id"), col("id_b").as("nb"))
      .unionByName(pairs.select(col("id_b").as("id"), col("id_a").as("nb")))
    val cores = directed.groupBy("id").agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minPts).select("id")
    // cell pre-contraction (grid DBSCAN): every two points in a cell
    // of side ⌊r/√2⌋ are mutually within r, so a cell's cores are
    // ALWAYS one cluster — collapse each cell to its min core id
    // before star contraction. On dense data (the regime where the
    // core graph explodes) this shrinks the component input from
    // O(points·density) edges to O(occupied cells) edges; star
    // contraction then runs on the contracted graph only. Cluster ids
    // are unchanged: each rep is its cell's min, so the component min
    // over reps IS the component min over cores.
    val side = math.max(1L, (r.toDouble / math.sqrt(2.0)).toLong)
    val withCell = points.select(col("id").cast("long").as("id"),
        expr(floorDiv("x", side)).as("__gx"),
        expr(floorDiv("y", side)).as("__gy"))
      .join(cores, "id")
    val reps = withCell.groupBy("__gx", "__gy").agg(min("id").as("__rep"))
    val coreRep = Caches.persisted(withCell.join(reps, Seq("__gx", "__gy"))
      .select(col("id"), col("__rep")))
    val superEdges = pairs
      .join(coreRep.select(col("id").as("id_a"), col("__rep").as("src")), "id_a")
      .join(coreRep.select(col("id").as("id_b"), col("__rep").as("dst")), "id_b")
      .where(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
    // components cover reps with an out-of-cell core neighbor;
    // single-cell clusters label themselves through their rep
    val comp = cellGraphComponents(points.sparkSession, superEdges)
    val coreLabel = coreRep.join(comp, Seq("__rep"), "left")
      .select(col("id"),
        coalesce(col("component_id"), col("__rep")).as("cluster_id"))
    val borderLabel = directed
      .join(coreLabel.select(col("id").as("nb"), col("cluster_id")), "nb")
      .groupBy("id").agg(min("cluster_id").as("__bcl"))
    ids
      .join(coreLabel.withColumnRenamed("cluster_id", "__ccl"), Seq("id"), "left")
      .join(borderLabel, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("__ccl"), col("__bcl")).as("cluster_id"),
        when(col("__ccl").isNotNull, "core")
          .when(col("__bcl").isNotNull, "border")
          .otherwise("noise").as("kind"))
  }

  /** Components of the CONTRACTED cell graph, as (__rep,
    * component_id = min rep in component).
    *
    * Guarded strategy tier (the broadcast-as-of discipline): the
    * contracted graph has at most min(occupied cells, core count)
    * nodes and cell-adjacency-bounded edges — usually metadata-sized
    * (domain²/r² is corpus-INDEPENDENT for a fixed domain). Up to
    * [[driverEdgeLimit]] edges, one `take` + a driver union-find
    * replaces log(n) driver-synchronized star-contraction rounds —
    * the rounds, not the data, dominate DBSCAN's wall clock after
    * contraction. Past the limit (continent-scale domains at fine r)
    * it falls back to [[Graph.connectedComponents]], so the operator
    * never depends on the collect being small.
    */
  private val driverEdgeLimit = 200000

  private def cellGraphComponents(
      spark: org.apache.spark.sql.SparkSession,
      superEdges: DataFrame): DataFrame = {
    val probe = superEdges.select(col("src").cast("long"), col("dst").cast("long"))
      .take(driverEdgeLimit + 1)
    if (probe.length > driverEdgeLimit) {
      Graph.connectedComponents(superEdges)
        .select(col("node").as("__rep"), col("component_id"))
    } else {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      probe.foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { // union by min keeps component_id = min rep
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val rows = parent.keys.toSeq.map(n => (n, find(n)))
      import spark.implicits._
      rows.toDF("__rep", "component_id")
    }
  }

  /** 3×3 neighborhood-smoothed cell density: per-cell point counts,
    * then each cell's count scattered to its nine neighbors and
    * re-summed — the raster box-filter as two keyed aggregations.
    * Output covers every cell that receives any mass (i.e. cells
    * within one step of an occupied cell); `smoothed` is an exact
    * integer count. The scatter is an explode over nine literal
    * offsets: 9× the CELL table (already aggregated, tiny relative
    * to points), never 9× the point table.
    */
  def cellSmooth(points: DataFrame, cellSize: Long): DataFrame = {
    checkR(cellSize)
    val counts = cellCols(points.select(
      col("x").cast("long").as("x"), col("y").cast("long").as("y")), cellSize)
      .groupBy(col("__cx").as("cx0"), col("__cy").as("cy0"))
      .agg(count(lit(1)).as("n"))
    withNeighborCells(counts, "cx0", "cy0")
      .groupBy(col("__jcx").as("cx"), col("__jcy").as("cy"))
      .agg(sum("n").as("smoothed"))
  }

  /** Zone assignment — the geofencing join: each point gets the
    * SMALLEST-id rectangular zone containing it (zones may overlap;
    * the min-id rule makes assignment deterministic), NULL when no
    * zone contains it. Zones: (zone_id, x_lo, x_hi, y_lo, y_hi),
    * closed intervals.
    *
    * Shape at 100 TB: the zone table is dim-sized BY CONTRACT (a
    * geofence catalog, not data), so the containment join is a
    * BROADCAST nested loop — the fact side streams once, never
    * shuffles, and the per-row cost is |zones| comparisons inside
    * codegen. That is the right plan for small-dim 2D containment;
    * past broadcast size the move is the grid trick again (bucket
    * zones AND points by cell, equi-join on cell — [[gridPairs]]'
    * shape with rectangles expanded to their covered cells).
    */
  /** Point-in-POLYGON containment — the concave upgrade of
    * [[zoneAssign]]'s rectangles: exact integer ray casting against a
    * config-pinned polygon. For each point, count edges crossed by the
    * horizontal ray to +∞ under the half-open rule (an edge counts iff
    * its y-span straddles the point's y as `[min, max)` — vertices and
    * horizontal edges never double-count), with the `px <
    * x-intersection` test cross-multiplied by the edge's dy (sign
    * decided per edge AT PLAN TIME — the polygon is a literal) so no
    * engine ever divides: products stay under 2·10¹⁰ on the 10⁵
    * coordinate grid, exact in int64. Odd crossings = inside.
    *
    * Scale shape: the polygon compiles INTO the projection — one
    * when-chain per edge, zero joins, zero shuffles, whole-stage
    * codegen over the fact stream. A polygon CATALOG (many polygons,
    * dim-sized) is [[zoneAssign]]'s broadcast shape with this
    * predicate per row; past broadcast size, grid-bucket polygons by
    * covered cells and equi-join on the cell like [[gridPairs]].
    * Boundary points follow the half-open rule deterministically —
    * both engines replay the identical decision.
    */
  def pointInPolygon(points: DataFrame, polygon: Seq[(Long, Long)]): DataFrame = {
    require(polygon.size >= 3, "a polygon needs at least 3 vertices")
    val p = points.select(col("id").cast("long").as("id"),
      col("x").cast("long").as("x"), col("y").cast("long").as("y"))
    val crossings = polygon.zip(polygon.tail :+ polygon.head).map {
      case ((x1, y1), (x2, y2)) =>
        if (y1 == y2) lit(0L) // horizontal: never straddles half-open
        else {
          val dy = y2 - y1
          val straddle =
            if (dy > 0) col("y") >= y1 && col("y") < y2
            else col("y") >= y2 && col("y") < y1
          val lhs = col("x") * dy
          val rhs = lit(x1) * dy + lit(x2 - x1) * (col("y") - y1)
          val before = if (dy > 0) lhs < rhs else lhs > rhs
          when(straddle && before, 1L).otherwise(0L)
        }
    }.reduce(_ + _)
    p.withColumn("crossings", crossings)
      .withColumn("inside", col("crossings") % 2 === 1)
  }

  def zoneAssign(points: DataFrame, zones: DataFrame): DataFrame = {
    val p = points.select(col("id").cast("long").as("id"),
      col("x").cast("long").as("x"), col("y").cast("long").as("y"))
    val z = zones.select(col("zone_id").cast("long").as("zone_id"),
      col("x_lo").cast("long").as("x_lo"), col("x_hi").cast("long").as("x_hi"),
      col("y_lo").cast("long").as("y_lo"), col("y_hi").cast("long").as("y_hi"))
    p.join(broadcast(z),
        col("x") >= col("x_lo") && col("x") <= col("x_hi") &&
          col("y") >= col("y_lo") && col("y") <= col("y_hi"), "left")
      .groupBy(col("id"), col("x"), col("y"))
      .agg(min(col("zone_id")).as("zone_id"))
  }
}
