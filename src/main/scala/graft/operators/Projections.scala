package graft.operators

import org.apache.spark.mllib.linalg.Vectors
import org.apache.spark.mllib.linalg.distributed.RowMatrix
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dimensionality-reduction projections (reference: PCACorrelationSketch
  * + LinearProjectionMap for PCA, maps/LAMPMap.java for LAMP MDS,
  * sketches/JLSketch.java for Johnson-Lindenstrauss).
  *
  * PCA follows the reference's split: a distributed one-pass moment
  * computation, eigen-decomposition at the driver (root node), then the
  * projection applied as a narrow map (LinearProjectionMap). LAMP and JL
  * are row-local transforms — no shuffle anywhere.
  */
object Projections {

  /** Principal components of the given numeric columns: distributed
    * covariance via RowMatrix, eigen at the driver (the reference uses
    * jblas at the root, CorrelationMatrixTarget). Returns the projection
    * matrix rows (one per component) for use with
    * ColumnOps.linearProjection.
    */
  def principalComponents(df: DataFrame, cols: Seq[String], k: Int): Seq[Seq[Double]] = {
    val rows = df.select(cols.map(col): _*).rdd
      .map(r => Vectors.dense(cols.indices.map(i => r.getDouble(i)).toArray))
    val mat = new RowMatrix(rows)
    val pc = mat.computePrincipalComponents(k) // cols × k, column-major
    (0 until k).map(j => (0 until cols.length).map(i => pc(i, j)))
  }

  /** PCA projection: compute components, append projected columns. */
  def pcaProject(df: DataFrame, cols: Seq[String], k: Int): DataFrame = {
    val comps = principalComponents(df, cols, k)
    ColumnOps.linearProjection(df, cols, comps, (0 until k).map(i => s"pc$i"))
  }

  /** Two-column PCA with fully pinned-down numerics — the reference's
    * root-side eigen split (PCACorrelationSketch → jblas at root →
    * LinearProjectionMap) made oracle-checkable: one exact-decimal moment
    * aggregation (same policy as Stats.correlationMatrix), the 2×2
    * population-covariance eigenvector in closed form at the driver, a
    * deterministic sign rule (first nonzero component positive), then the
    * projection as a codegen'd narrow map. Returns (id cols, pc0, pc1)
    * rounded once at 4 decimals.
    */
  def pca2Project(df: DataFrame, c0: String, c1: String, keep: Seq[String]): DataFrame = {
    val dec = (c: String) => col(c).cast("decimal(18,2)")
    val r = df.agg(
      count(lit(1)).as("n"),
      sum(dec(c0)).cast("double").as("sx"), sum(dec(c1)).cast("double").as("sy"),
      sum(dec(c0) * dec(c0)).cast("double").as("sxx"),
      sum(dec(c0) * dec(c1)).cast("double").as("sxy"),
      sum(dec(c1) * dec(c1)).cast("double").as("syy")).head()
    val n = r.getLong(0).toDouble
    val (sx, sy, sxx, sxy, syy) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    val a = sxx / n - (sx / n) * (sx / n)
    val c = sxy / n - (sx / n) * (sy / n)
    val b = syy / n - (sy / n) * (sy / n)
    val l0 = (a + b) / 2 + math.sqrt((a - b) * (a - b) / 4 + c * c)
    // eigenvector of [[a,c],[c,b]] for l0 is (c, l0-a); degenerate c≈0 →
    // axis-aligned
    val (e0, e1) =
      if (math.abs(c) > 1e-12) (c, l0 - a)
      else if (a >= b) (1.0, 0.0) else (0.0, 1.0)
    val nrm = math.sqrt(e0 * e0 + e1 * e1) // not hypot: oracle SQL mirrors this exact form
    var (v0, v1) = (e0 / nrm, e1 / nrm)
    if (v0 < 0 || (v0 == 0 && v1 < 0)) { v0 = -v0; v1 = -v1 }
    var (w0, w1) = (-v1, v0) // orthogonal second component
    if (w0 < 0 || (w0 == 0 && w1 < 0)) { w0 = -w0; w1 = -w1 }
    df.select(keep.map(col) ++ Seq(
      round(col(c0) * v0 + col(c1) * v1, 4).as("pc0"),
      round(col(c0) * w0 + col(c1) * w1, 4).as("pc1")): _*)
  }

  /** LAMP (local affine multidimensional projection, Joia et al.; the
    * reference's LAMPMap): project each row to 2D from a small set of
    * control points with known 2D positions. Control points are
    * broadcast (closure capture); per row: distance weights, weighted
    * centroids, and the orthogonal map from the SVD of the 2-column
    * cross-covariance — all O(#controls) local math, embarrassingly
    * parallel at any scale.
    */
  def lampProject(
      df: DataFrame, cols: Seq[String],
      controls: Array[(Array[Double], (Double, Double))]): DataFrame = {
    val lampUdf = udf { (xs: Seq[Double]) =>
      val x = xs.toArray
      val eps = 1e-9
      val m = controls.length
      val alpha = new Array[Double](m)
      var aSum = 0.0
      var i = 0
      while (i < m) {
        var d2 = eps
        val c = controls(i)._1
        var j = 0
        while (j < c.length) { val t = x(j) - c(j); d2 += t * t; j += 1 }
        alpha(i) = 1.0 / d2; aSum += alpha(i); i += 1
      }
      val d = x.length
      val cBar = new Array[Double](d)
      var y0 = 0.0; var y1 = 0.0
      i = 0
      while (i < m) {
        val (c, (u, v)) = controls(i)
        var j = 0
        while (j < d) { cBar(j) += alpha(i) * c(j); j += 1 }
        y0 += alpha(i) * u; y1 += alpha(i) * v; i += 1
      }
      var j = 0
      while (j < d) { cBar(j) /= aSum; j += 1 }
      y0 /= aSum; y1 /= aSum
      // B = Σ αᵢ ĉᵢ ŷᵢᵀ  (d×2)
      val b0 = new Array[Double](d); val b1 = new Array[Double](d)
      i = 0
      while (i < m) {
        val (c, (u, v)) = controls(i)
        j = 0
        while (j < d) {
          val ch = c(j) - cBar(j)
          b0(j) += alpha(i) * ch * (u - y0)
          b1(j) += alpha(i) * ch * (v - y1)
          j += 1
        }
        i += 1
      }
      // M = U Vᵀ from SVD(B): orthogonal part via eigen of BᵀB (2×2)
      var g00 = 0.0; var g01 = 0.0; var g11 = 0.0
      j = 0
      while (j < d) { g00 += b0(j) * b0(j); g01 += b0(j) * b1(j); g11 += b1(j) * b1(j); j += 1 }
      val tr = g00 + g11
      val det = g00 * g11 - g01 * g01
      val disc = math.sqrt(math.max(tr * tr / 4 - det, 0.0))
      val l0 = math.max(tr / 2 + disc, eps)
      val l1 = math.max(tr / 2 - disc, eps)
      // B = U Σ Vᵀ → M = U Vᵀ = B V Σ⁻¹ Vᵀ
      val (v00, v10) =
        // sqrt(t²+g01²), not hypot: hypot's extra-precision path is not
        // replayable in SQL; this exact form is what the oracle mirrors
        // (overflow is impossible at these magnitudes)
        if (math.abs(g01) > eps) {
          val t = l0 - g11; val n = math.sqrt(t * t + g01 * g01); (t / n, g01 / n)
        } else (1.0, 0.0)
      val (v01, v11) = (-v10, v00)
      val s0 = math.sqrt(l0); val s1 = math.sqrt(l1)
      val xr = new Array[Double](d)
      j = 0
      while (j < d) { xr(j) = x(j) - cBar(j); j += 1 }
      // p = x̂ M + ȳ where M = B · V Σ⁻¹ Vᵀ
      var xb0 = 0.0; var xb1 = 0.0
      j = 0
      while (j < d) { xb0 += xr(j) * b0(j); xb1 += xr(j) * b1(j); j += 1 }
      // xb (1×2) · V Σ⁻¹ Vᵀ
      val t0 = xb0 * v00 + xb1 * v10
      val t1 = xb0 * v01 + xb1 * v11
      val u0 = t0 / s0; val u1 = t1 / s1
      val p0 = u0 * v00 + u1 * v01 + y0
      val p1 = u0 * v10 + u1 * v11 + y1
      Seq(p0, p1)
    }
    df.withColumn("__lamp", lampUdf(array(cols.map(c => col(c).cast("double")): _*)))
      .withColumn("lamp_x", col("__lamp")(0))
      .withColumn("lamp_y", col("__lamp")(1))
      .drop("__lamp")
  }

  /** Johnson-Lindenstrauss ±1 random projection (JLSketch.java:38-121):
    * deterministic sign matrix from md5(component, column-index) —
    * reproducible anywhere, applied as a codegen'd linear map.
    */
  def jlSigns(cols: Int, k: Int): Seq[Seq[Double]] =
    (0 until k).map(p => (0 until cols).map { c =>
      val b = java.security.MessageDigest.getInstance("MD5")
        .digest(s"jl:$p:$c".getBytes("UTF-8"))(0)
      if ((b & 1) == 0) 1.0 else -1.0
    })

  def jlProject(df: DataFrame, cols: Seq[String], k: Int): DataFrame =
    ColumnOps.linearProjection(df, cols, jlSigns(cols.length, k),
      (0 until k).map(i => s"jl$i"))
}
