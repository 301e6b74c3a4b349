package graft.geo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geo feature tagging — the reference's polygon metadata join
  * (geo/PolygonSet.java, TableTarget.java:146-154 getGeo): a small set
  * of named polygon features lives at the root; each row's coordinates
  * are resolved to the containing feature.
  *
  * Spark shape: the polygon set is broadcast (it is metadata-sized) and
  * containment is a pure array expression over the vertex list — no UDF,
  * fully codegen'd, evaluated rowside against every feature. At 100 TB
  * the corpus never shuffles: one broadcast nested-loop pass, O(#polys)
  * work per row (bound #polys or pre-filter by bounding box for large
  * feature sets).
  */
object Geo {

  /** Point-in-polygon for a CONVEX polygon with counter-clockwise
    * vertices (array<struct<x,y>>): the point lies weakly left of every
    * edge — all cross products (b-a)×(p-a) ≥ 0. Boundary points are
    * inside. Integer-valued coordinates evaluate exactly in doubles, so
    * the predicate is engine-portable.
    */
  def containsPoint(verts: Column, px: Column, py: Column): Column = {
    val nxt = concat(slice(verts, lit(2), size(verts)), slice(verts, 1, 1))
    forall(
      zip_with(verts, nxt, (a, b) =>
        (b("x") - a("x")) * (py - a("y")) - (b("y") - a("y")) * (px - a("x")) >= 0),
      ok => ok)
  }

  /** Point-in-polygon for an ARBITRARY simple polygon (convex or not,
    * either winding) by the even-odd ray-casting rule — the general
    * case the reference gets from JTS contains() on shapefile features
    * (geo/PolygonSet.java:20-27): a rightward horizontal ray from the
    * point crosses an odd number of edges iff the point is interior.
    * Boundary points are inside (matching [[containsPoint]]).
    *
    * The crossing test is division-free: `px < ax + (bx−ax)·(py−ay)/
    * (by−ay)` is cross-multiplied into a sign comparison, so on
    * integer-valued grids every product is exact in doubles and the
    * predicate is engine-portable (an inexact division could flip a
    * grid point lying exactly under a vertex). The half-open vertex
    * rule ((ay > py) ≠ (by > py)) counts a vertex-touching ray once.
    * Still a pure codegen'd array expression — no UDF, no JTS.
    */
  private def ringEdges(verts: Column): Column = {
    val nxt = concat(slice(verts, lit(2), size(verts)), slice(verts, 1, 1))
    zip_with(verts, nxt, (a, b) =>
      struct(a("x").as("ax"), a("y").as("ay"), b("x").as("bx"), b("y").as("by")))
  }

  private def onEdgeExpr(verts: Column, px: Column, py: Column): Column =
    exists(ringEdges(verts), e => {
      val cross = (e("bx") - e("ax")) * (py - e("ay")) -
        (e("by") - e("ay")) * (px - e("ax"))
      cross === 0 &&
        px >= least(e("ax"), e("bx")) && px <= greatest(e("ax"), e("bx")) &&
        py >= least(e("ay"), e("by")) && py <= greatest(e("ay"), e("by"))
    })

  private def crossingCountExpr(verts: Column, px: Column, py: Column): Column =
    size(filter(ringEdges(verts), e => {
      val num = (e("bx") - e("ax")) * (py - e("ay")) -
        (px - e("ax")) * (e("by") - e("ay"))
      ((e("ay") > py) =!= (e("by") > py)) && ((num > 0) === (e("by") > e("ay")))
    }))

  def containsPointRayCast(verts: Column, px: Column, py: Column): Column =
    onEdgeExpr(verts, px, py) || crossingCountExpr(verts, px, py) % 2 === 1

  /** Point-in-polygon for a MULTI-RING feature (outer boundary plus
    * hole rings — the shapefile polygon record's native shape,
    * `rings: array<array<struct<x,y>>>`) by the even-odd rule ACROSS
    * rings: total crossing parity over every ring's edges, so a point
    * inside a hole (even: outer + hole) is outside the feature while a
    * point inside outer-only (odd) is inside. Any ring boundary is
    * inside (closed-set semantics, matching the single-ring tests).
    * Still a pure codegen'd array expression. */
  def containsPointEvenOdd(rings: Column, px: Column, py: Column): Column =
    exists(rings, r => onEdgeExpr(r, px, py)) ||
      aggregate(rings, lit(0),
        (acc, r) => acc + crossingCountExpr(r, px, py)) % 2 === 1

  /** Build the polygon metadata frame from (name, vertex list) pairs. */
  def polygonSet(spark: org.apache.spark.sql.SparkSession,
      polys: Seq[(String, Seq[(Double, Double)])]): DataFrame = {
    import spark.implicits._
    polys.toDF("poly", "vr").select(col("poly"),
      transform(col("vr"), v => struct(v("_1").as("x"), v("_2").as("y"))).as("verts"))
  }

  /** Build the multi-ring feature frame from (name, rings) pairs —
    * ring 0 the outer boundary, subsequent rings holes (or further
    * outers; even-odd handles any nesting). */
  def ringSet(spark: org.apache.spark.sql.SparkSession,
      feats: Seq[(String, Seq[Seq[(Double, Double)]])]): DataFrame = {
    import spark.implicits._
    feats.toDF("poly", "rr").select(col("poly"),
      transform(col("rr"), r =>
        transform(r, v => struct(v("_1").as("x"), v("_2").as("y")))).as("rings"))
  }

  /** Tag points against multi-ring (hole-aware) features — broadcast
    * nested-loop like [[tagPoints]], even-odd containment. */
  def tagPointsRings(points: DataFrame, features: DataFrame,
      px: Column, py: Column): DataFrame =
    points.join(broadcast(features),
      containsPointEvenOdd(col("rings"), px, py)).drop("rings")

  /** Tag each point row with the polygon containing it (rows outside
    * every polygon are dropped; polygons are assumed disjoint, else a
    * row is tagged once per containing feature). `convex = true` uses
    * the cheaper all-half-planes test and requires CCW winding;
    * `convex = false` handles any simple polygon via ray casting.
    */
  def tagPoints(points: DataFrame, polygons: DataFrame,
      px: Column, py: Column, convex: Boolean = true): DataFrame = {
    val pred =
      if (convex) containsPoint(col("verts"), px, py)
      else containsPointRayCast(col("verts"), px, py)
    points.join(broadcast(polygons), pred).drop("verts")
  }
}
