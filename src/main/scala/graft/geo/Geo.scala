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

  /** Build the polygon metadata frame from (name, vertex list) pairs. */
  def polygonSet(spark: org.apache.spark.sql.SparkSession,
      polys: Seq[(String, Seq[(Double, Double)])]): DataFrame = {
    import spark.implicits._
    polys.toDF("poly", "vr").select(col("poly"),
      transform(col("vr"), v => struct(v("_1").as("x"), v("_2").as("y"))).as("verts"))
  }

  /** Tag each point row with the polygon containing it (rows outside
    * every polygon are dropped; polygons are assumed disjoint, else a
    * row is tagged once per containing feature).
    */
  def tagPoints(points: DataFrame, polygons: DataFrame,
      px: Column, py: Column): DataFrame =
    points.join(broadcast(polygons), containsPoint(col("verts"), px, py))
      .drop("verts")
}
