package graft.geo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Row-local containment kernels — the same double arithmetic as the
  * higher-order-function formulations they replace, in one primitive
  * loop per row. Spark's array lambdas (filter/exists/zip_with/
  * aggregate) are CodegenFallback: each edge test ran interpreted
  * (~30 µs/row·feature measured at sf0.1, the dominant term of every
  * geo query), where this walk is branch-and-multiply per edge. All
  * products and comparisons are evaluated in the same order on the
  * same doubles, so results are bit-identical and the geo oracles are
  * unchanged.
  */
object GeoKernels {
  /** Edge i pairs vertex i with vertex (i+1) mod n — the ringEdges
    * wrap rule. */
  def onEdge(vs: ArrayData, px: Double, py: Double): Boolean = {
    val n = vs.numElements()
    var i = 0
    while (i < n) {
      val a = vs.getStruct(i, 2)
      val b = vs.getStruct(if (i + 1 < n) i + 1 else 0, 2)
      val ax = a.getDouble(0); val ay = a.getDouble(1)
      val bx = b.getDouble(0); val by = b.getDouble(1)
      val cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
      if (cross == 0.0 &&
        px >= math.min(ax, bx) && px <= math.max(ax, bx) &&
        py >= math.min(ay, by) && py <= math.max(ay, by)) return true
      i += 1
    }
    false
  }

  /** Rightward-ray crossing count under the half-open vertex rule. */
  def crossings(vs: ArrayData, px: Double, py: Double): Int = {
    val n = vs.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      val a = vs.getStruct(i, 2)
      val b = vs.getStruct(if (i + 1 < n) i + 1 else 0, 2)
      val ax = a.getDouble(0); val ay = a.getDouble(1)
      val bx = b.getDouble(0); val by = b.getDouble(1)
      val num = (bx - ax) * (py - ay) - (px - ax) * (by - ay)
      if (((ay > py) != (by > py)) && ((num > 0.0) == (by > ay))) c += 1
      i += 1
    }
    c
  }

  def rayCast(vs: ArrayData, px: Double, py: Double): Boolean =
    onEdge(vs, px, py) || crossings(vs, px, py) % 2 == 1

  def convex(vs: ArrayData, px: Double, py: Double): Boolean = {
    val n = vs.numElements()
    var i = 0
    while (i < n) {
      val a = vs.getStruct(i, 2)
      val b = vs.getStruct(if (i + 1 < n) i + 1 else 0, 2)
      val ax = a.getDouble(0); val ay = a.getDouble(1)
      val bx = b.getDouble(0); val by = b.getDouble(1)
      if (!((bx - ax) * (py - ay) - (by - ay) * (px - ax) >= 0.0)) return false
      i += 1
    }
    true
  }

  /** Even-odd across rings: any ring boundary is inside; otherwise
    * total crossing parity over every ring's edges. */
  def evenOdd(rings: ArrayData, px: Double, py: Double): Boolean = {
    val n = rings.numElements()
    var i = 0
    while (i < n) {
      if (onEdge(rings.getArray(i), px, py)) return true
      i += 1
    }
    var total = 0
    var j = 0
    while (j < n) {
      total += crossings(rings.getArray(j), px, py)
      j += 1
    }
    total % 2 == 1
  }
}

/** Codegen containment expression: mode ∈ convex | raycast | evenodd
  * (evenodd takes `array<array<struct<x,y>>>` rings, the others a
  * single vertex ring). */
case class GeoContains(first: Expression, second: Expression,
    third: Expression, mode: String) extends TernaryExpression {
  override def dataType: DataType = BooleanType

  // the kernels read vertex-struct fields BY ORDINAL (0 = x, 1 = y) and
  // assume doubles throughout; the interpreted lambdas this expression
  // replaced resolved fields by name and coerced numerics, so a caller
  // passing int coords or a reordered struct must fail in ANALYSIS, not
  // as runtime garbage (r15 advisor). Field NAMES are deliberately not
  // pinned — ordinal layout and double types are the actual contract.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types._
    def isRing(t: DataType): Boolean = t match {
      case ArrayType(StructType(Array(
        StructField(_, DoubleType, _, _), StructField(_, DoubleType, _, _))), _) =>
        true
      case _ => false
    }
    val firstOk = first.dataType match {
      case t if mode != "evenodd" => isRing(t)
      case ArrayType(inner, _) => isRing(inner)
      case _ => false
    }
    if (firstOk && second.dataType == DoubleType && third.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"geo_contains_$mode expects (" +
          (if (mode == "evenodd") "array<array<struct<double,double>>>"
           else "array<struct<double,double>>") +
          ", double, double), got (" +
          s"${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql})")
  }

  private def call(vs: ArrayData, px: Double, py: Double): Boolean = mode match {
    case "convex"  => GeoKernels.convex(vs, px, py)
    case "raycast" => GeoKernels.rayCast(vs, px, py)
    case _         => GeoKernels.evenOdd(vs, px, py)
  }

  override def nullSafeEval(vs: Any, px: Any, py: Any): Any =
    call(vs.asInstanceOf[ArrayData],
      px.asInstanceOf[Double], py.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = mode match {
      case "convex"  => "convex"
      case "raycast" => "rayCast"
      case _         => "evenOdd"
    }
    nullSafeCodeGen(ctx, ev, (vs, px, py) =>
      s"${ev.value} = graft.geo.GeoKernels.$fn($vs, $px, $py);")
  }

  override def prettyName: String = s"geo_contains_$mode"
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

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
  def containsPoint(verts: Column, px: Column, py: Column): Column =
    org.apache.spark.sql.graftshim.exprToColumn(GeoContains(
      org.apache.spark.sql.graftshim.columnToExpr(verts),
      org.apache.spark.sql.graftshim.columnToExpr(px),
      org.apache.spark.sql.graftshim.columnToExpr(py), "convex"))

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
  def containsPointRayCast(verts: Column, px: Column, py: Column): Column =
    org.apache.spark.sql.graftshim.exprToColumn(GeoContains(
      org.apache.spark.sql.graftshim.columnToExpr(verts),
      org.apache.spark.sql.graftshim.columnToExpr(px),
      org.apache.spark.sql.graftshim.columnToExpr(py), "raycast"))

  /** Point-in-polygon for a MULTI-RING feature (outer boundary plus
    * hole rings — the shapefile polygon record's native shape,
    * `rings: array<array<struct<x,y>>>`) by the even-odd rule ACROSS
    * rings: total crossing parity over every ring's edges, so a point
    * inside a hole (even: outer + hole) is outside the feature while a
    * point inside outer-only (odd) is inside. Any ring boundary is
    * inside (closed-set semantics, matching the single-ring tests).
    * Still a pure codegen'd array expression. */
  def containsPointEvenOdd(rings: Column, px: Column, py: Column): Column =
    org.apache.spark.sql.graftshim.exprToColumn(GeoContains(
      org.apache.spark.sql.graftshim.columnToExpr(rings),
      org.apache.spark.sql.graftshim.columnToExpr(px),
      org.apache.spark.sql.graftshim.columnToExpr(py), "evenodd"))

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
