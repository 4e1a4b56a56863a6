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
  * against a cross-join oracle — no float epsilon anywhere. Floor
  * division buckets negative coordinates correctly via explicit
  * floor-div arithmetic (Spark's `div` and DuckDB's `//` truncate
  * identically for the non-negative coordinates used here; the
  * operators require non-negative inputs to keep the two engines'
  * integer-division semantics aligned).
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

  private def cellCols(df: DataFrame, r: Long): DataFrame =
    df.withColumn("__cx", expr(s"x div $r"))
      .withColumn("__cy", expr(s"y div $r"))

  /** Exact squared Euclidean distance between two long points. */
  private def dist2(xa: Column, ya: Column, xb: Column, yb: Column): Column =
    (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)

  /** All pairs of points within Euclidean distance `r` (inclusive),
    * as (id_a < id_b, dist2). Input: (id LONG, x LONG, y LONG),
    * coordinates non-negative.
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
    val pairs = gridPairs(points, r)
    val directed = pairs.select(col("id_a").as("id"))
      .unionByName(pairs.select(col("id_b").as("id")))
    val counts = directed.groupBy("id").agg(count(lit(1)).as("n_neighbors"))
    points.select(col("id").cast("long").as("id"))
      .join(counts, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"),
        (coalesce(col("n_neighbors"), lit(0L)) >= minPts).as("is_core"))
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
}
