package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column quantization — the reference's differential-privacy substrate
  * (table/columns/DoubleColumnQuantization.java, QuantizedTable): values
  * snapped to a bucket grid before any aggregation, so downstream
  * sketches only ever see quantized data. Pure expressions; noise
  * injection (web/.../DPWrapper.java) defaults to zero in the reference
  * RPC path and is modeled the same way here.
  */
/** PrivacySchema (table/PrivacySchema.java:47-99): the DP budget
  * lookup — per-column-combination epsilons with a fallback default,
  * keyed by the SORTED column set exactly as the reference; ε ≤ 0 is an
  * error, never silent zero noise. Laplace noise scale for a count
  * query is 1/ε (DPWrapper.computeCountNoise, web/.../DPWrapper
  * .java:187-205).
  */
case class PrivacySchema(epsilons: Map[Seq[String], Double],
    defaultEpsilon: Double = 0.0) {
  // keys are canonicalized at construction: a budget stored under
  // Seq("b","a") must match a lookup of ("a","b") — silently falling to
  // the default would over-noise (or under-protect) the column pair
  private val normalized: Map[Seq[String], Double] =
    epsilons.map { case (k, v) => (k.sorted, v) }
  def epsilon(cols: String*): Double = {
    val e = normalized.getOrElse(cols.sorted.toSeq, defaultEpsilon)
    require(e > 0.0, s"Zero epsilon for column set ${cols.sorted.mkString("+")}")
    e
  }
  def noiseScale(cols: String*): Double = 1.0 / epsilon(cols: _*)
}

object Quantization {
  /** Snap to multiples of `granularity` (left edge). */
  def quantize(c: Column, granularity: Double): Column =
    floor(c / lit(granularity)) * lit(granularity)

  /** String-column quantization (table/columns/StringColumnQuantization
    * .java:28): snap each value to the largest grid boundary <= it;
    * values below the first boundary or above `globalMax` are
    * out-of-range (null — the reference routes them to its missing
    * bucket). The sorted boundary list unrolls to a codegen'd CASE chain
    * — bounded vocab, zero shuffle, so DP histograms work on string axes
    * exactly like numeric ones.
    */
  def quantizeString(c: Column, boundaries: Seq[String], globalMax: String): Column = {
    require(boundaries.nonEmpty, "need at least one boundary")
    require(boundaries == boundaries.sorted, "boundaries must be sorted")
    // constructor parity (StringColumnQuantization.java:50): the last
    // boundary must sit strictly below globalMax
    require(boundaries.last < globalMax,
      s"globalMax '$globalMax' must exceed the last boundary '${boundaries.last}'")
    val snapped = boundaries.foldLeft(lit(null).cast("string")) {
      (acc, b) => when(c >= lit(b), lit(b)).otherwise(acc)
    }
    // roundDown parity: value == globalMax snaps to globalMax itself
    // (the reference's value >= globalMax branch); only value >
    // globalMax is out of range (outOfRange's strict compare)
    when(c.isNull || c > lit(globalMax), lit(null).cast("string"))
      .when(c === lit(globalMax), lit(globalMax))
      .otherwise(snapped)
  }

  /** NoisyHLogLog (sketches/results/NoisyHLogLog.java:12): distinct
    * count with a confidence radius, optionally Laplace-noised for DP.
    * The HLL++ estimate contributes z·rsd·count to the 95% radius; a
    * nonzero noise scale adds the Laplace 95% quantile b·ln(20)
    * (reference default is the zero-noise path, scale = 0 → exact
    * sketch value, radius purely from the sketch error).
    */
  def noisyDistinct(df: org.apache.spark.sql.DataFrame, column: String,
      rsd: Double = 0.05, noiseScale: Double = 0.0, seed: Long = 42L,
      keyLoader: Option[graft.security.KeyLoader] = None)
      : org.apache.spark.sql.DataFrame =
    df.agg(approx_count_distinct(col(column), rsd).as("__raw"))
      .select(
        round(col("__raw") +
          laplaceNoise(lit(column), noiseScale, seed, keyLoader), 4).as("noisy_distinct"),
        round(lit(1.96 * rsd) * col("__raw") +
          lit(noiseScale * math.log(20.0)), 4).as("conf_radius"))

  /** Keyed Laplace noise from a tag column — for DP histogram counts.
    * The PRF path ([[graft.security.SecurePrf]], mirroring the
    * reference's security/SecureLaplace.java): noise is
    * HMAC-SHA256(key, tag) → inverse-CDF Laplace, so holders of the
    * same key reproduce it exactly (the binary-mechanism consistency
    * requirement) while it is unpredictable without the key. The
    * default loader is the deterministic test key derived from `seed`
    * (security/TestKeyLoader — the reproducible-spec mode); production
    * passes a [[graft.security.PersistedKeyLoader]]. scale=0 → exact
    * (the default, as in the reference's NoisyHLogLog/DPHistogram
    * zero-noise path). */
  def laplaceNoise(key: Column, scale: Double, seed: Long = 42L,
      keyLoader: Option[graft.security.KeyLoader] = None): Column =
    if (scale == 0.0) lit(0.0)
    else graft.security.SecureLaplaceExpr.noise(
      key.cast("string"), scale,
      keyLoader.getOrElse(
        graft.security.TestKeyLoader(index = seed.toInt)))

  /** Dyadic decomposition of the leaf interval [left, right) — the
    * binary-mechanism interval cover (Chan/Song/Shi TISSEC '11) the
    * reference computes in web/src/main/java/org/hillview/
    * dataStructures/IntervalDecomposition.java:63: repeatedly take the
    * largest aligned power-of-two interval starting at `left` that does
    * not extend past `right`. Returns (start, size) pairs. Any [l, r)
    * over T leaves decomposes into ≤ 2·log₂T intervals, so a noisy
    * range/CDF query sums O(log T) independent noise variables instead
    * of O(r − l) per-bucket ones.
    */
  def dyadicDecomposition(left: Int, right: Int): Seq[(Int, Int)] = {
    require(left >= 0 && right >= left, s"invalid interval $left:$right")
    val nodes = Seq.newBuilder[(Int, Int)]
    var l = left
    while (l < right) {
      val lob = java.lang.Integer.lowestOneBit(l)
      val lsb = if (lob > 0) 31 - java.lang.Integer.numberOfLeadingZeros(lob) else -1
      val rem = 31 - java.lang.Integer.numberOfLeadingZeros(right - l)
      val pow = if (lsb < 0) rem else math.min(lsb, rem)
      val sz = 1 << pow
      nodes += ((l, sz))
      l += sz
    }
    nodes.result()
  }

  /** k-adic decomposition (IntervalDecomposition.java:94
    * kadicDecomposition) for a degree-k interval tree — the reference's
    * default branching factor is 20 (BRANCHING_FACTOR). Mirrors the
    * reference's alignment rule, including its quirk of using
    * floor(log_k(left)) rather than the largest power of k DIVIDING
    * left: the emitted intervals are what seed the per-interval noise,
    * so matching the reference's cover keeps noise composition
    * behavior-identical even where the cover is not a strict tree-node
    * set. A full-width interval of exactly k leaves is emitted as k
    * unit leaves ("no root node").
    */
  def kadicDecomposition(left: Int, right: Int, k: Int): Seq[(Int, Int)] = {
    require(left >= 0 && right >= left, s"invalid interval $left:$right")
    if (k == 2) return dyadicDecomposition(left, right)
    if (right - left == k) return (left until right).map(i => (i, 1))
    val nodes = Seq.newBuilder[(Int, Int)]
    var l = left
    while (l < right) {
      val smallestPower =
        if (l > 0) math.floor(math.log(l) / math.log(k)).toInt else -1
      val rem = (math.log(right - l) / math.log(k)).toInt
      val pow = if (smallestPower < 0) rem else math.min(smallestPower, rem)
      val sz = math.pow(k, pow).toInt
      nodes += ((l, sz))
      l += sz
    }
    nodes.result()
  }

  /** Laplace scale for the interval-tree mechanism
    * (PrivacyUtils.computeNoiseScale, web/.../utils/PrivacyUtils
    * .java:18): ceil(log_branching(leaves)) / ε — each level of the
    * tree consumes an equal share of the budget.
    */
  def noiseScaleForLeaves(epsilon: Double, leaves: Int, branching: Int = 20): Double = {
    require(epsilon > 0.0, "epsilon must be positive")
    math.ceil(math.log(leaves.toDouble) / math.log(branching.toDouble)) / epsilon
  }

  /** DP histogram / CDF over a quantized numeric axis with PER-DYADIC-
    * INTERVAL noise (DPHistogram.java postProcess + noiseForRange):
    * each interval-tree node carries one independent Laplace(scale)
    * variable (deterministically seeded by the node, so repeated and
    * overlapping queries see CONSISTENT noise — the binary-mechanism
    * composition property), and a bucket's noise is the sum over its
    * range's k-adic decomposition. With `cdf = true` each bucket uses
    * the decomposition of [0, bucketEnd) — O(log T) variables — and the
    * noisy CDF is clamped monotone exactly as the reference.
    *
    * Output per bucket: exact count, noisy count, number of noise
    * variables, and a 99% confidence radius (reference alpha = 0.01;
    * the reference simulates the n-fold Laplace sum's quantile — here
    * the exact Laplace quantile is used for n = 1 and the CLT normal
    * approximation for n > 1, documented deviation).
    *
    * Scale shape: one partial-aggregated histogram pass over the data;
    * the decomposition, noise, and CI live on the O(buckets) result
    * (the tiny post-agg single partition the plan audit already
    * accepts for hist_cdf). The interval table is driver-generated
    * metadata (O(buckets·log leaves) rows), never data.
    */
  def noisyHistogramDyadic(
      df: org.apache.spark.sql.DataFrame, column: String,
      minValue: Double, granularity: Double, leaves: Int,
      bucketStarts: Seq[Int], epsilon: Double, branching: Int = 20,
      cdf: Boolean = false, seed: Long = 42L,
      keyLoader: Option[graft.security.KeyLoader] = None)
      : org.apache.spark.sql.DataFrame = {
    require(bucketStarts.nonEmpty && bucketStarts == bucketStarts.sorted,
      "bucketStarts must be sorted")
    require(bucketStarts.head == 0, "first bucket starts at leaf 0")
    val spark = df.sparkSession
    import spark.implicits._
    val nb = bucketStarts.length
    val ends = bucketStarts.drop(1) :+ leaves
    val scale = noiseScaleForLeaves(epsilon, leaves, branching)
    // driver-side metadata: per bucket, its range's interval cover
    val decomp: Seq[(Int, Int, Int)] = (0 until nb).flatMap { i =>
      val l = if (cdf) 0 else bucketStarts(i)
      kadicDecomposition(l, ends(i), branching).map { case (lo, sz) => (i, lo, sz) }
    }
    val noisePerBucket = decomp.toDF("bucket", "ilo", "isz")
      .groupBy(col("bucket"))
      .agg(
        sum(laplaceNoise(concat_ws(":", col("ilo"), col("isz")), scale, seed,
          keyLoader)).as("__noise"),
        count(lit(1)).as("n_intervals"))
    // exact per-bucket histogram: leaf = grid cell, bucket = largest
    // start ≤ leaf (codegen'd CASE chain — buckets are bounded)
    val leaf = floor((col(column) - lit(minValue)) / lit(granularity)).cast("int")
    val bucketOf = bucketStarts.zipWithIndex.tail.foldLeft(lit(0)) {
      case (acc, (s, i)) => when(leaf >= lit(s), lit(i)).otherwise(acc)
    }
    val counts = df
      .filter(col(column).isNotNull && leaf >= 0 && leaf < lit(leaves))
      .groupBy(bucketOf.as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val winAll = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val base = noisePerBucket
      .join(counts, Seq("bucket"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    val measured =
      if (cdf) base.withColumn("cnt", sum(col("cnt")).over(winAll)) else base
    val noisy = measured
      .withColumn("__raw", col("cnt") + col("__noise"))
    val clamped =
      if (cdf) noisy.withColumn("__raw", max(col("__raw")).over(winAll))
      else noisy
    clamped.select(
      col("bucket"),
      col("cnt"),
      round(col("__raw"), 4).as("noisy_cnt"),
      col("n_intervals"),
      round(when(col("n_intervals") === 1, lit(scale * math.log(100.0)))
        .otherwise(lit(2.576) * sqrt(col("n_intervals") * lit(2.0 * scale * scale))), 4)
        .as("conf_radius"))
      .orderBy(col("bucket"))
  }

  /** DP heatmap with PER-2-D-DYADIC-RECTANGLE noise (DPHeatmapSketch
    * .java:54 noiseForDecomposition + postProcess): each (x-interval ×
    * y-interval) tree-node rectangle carries one independent
    * Laplace(scale) variable seeded by the rectangle, and a cell's
    * noise sums over the CROSS PRODUCT of its two axes' k-adic covers —
    * O(log Tx · log Ty) variables per cell instead of O(area) flat
    * ones, so 2-D range queries over the noisy heatmap compose with
    * bounded variance exactly like the 1-D binary mechanism. The scale
    * multiplies the per-axis tree depths (PrivacyUtils.java:18
    * computeNoiseScale over both decompositions: ceil(log_b Tx) ·
    * ceil(log_b Ty) / ε). Confidence radius at alpha = 0.01 follows the
    * 1-D policy (exact Laplace quantile for one variable, CLT
    * approximation otherwise — documented deviation from the
    * reference's simulated quantile).
    *
    * Scale shape: one partial-aggregated 2-D histogram pass; the
    * noise table is driver metadata, O(cells · log Tx · log Ty) rows
    * joined on the O(cells) post-agg result.
    */
  def noisyHeatmapDyadic(
      df: org.apache.spark.sql.DataFrame, xColumn: String, yColumn: String,
      xMin: Double, xGranularity: Double, xLeaves: Int, xBucketStarts: Seq[Int],
      yMin: Double, yGranularity: Double, yLeaves: Int, yBucketStarts: Seq[Int],
      epsilon: Double, branching: Int = 20, seed: Long = 42L,
      keyLoader: Option[graft.security.KeyLoader] = None)
      : org.apache.spark.sql.DataFrame = {
    require(xBucketStarts.nonEmpty && xBucketStarts == xBucketStarts.sorted &&
      xBucketStarts.head == 0, "xBucketStarts must be sorted from 0")
    require(yBucketStarts.nonEmpty && yBucketStarts == yBucketStarts.sorted &&
      yBucketStarts.head == 0, "yBucketStarts must be sorted from 0")
    val spark = df.sparkSession
    import spark.implicits._
    def depth(leaves: Int) =
      math.ceil(math.log(leaves.toDouble) / math.log(branching.toDouble))
    val scale = depth(xLeaves) * depth(yLeaves) / epsilon
    val xEnds = xBucketStarts.drop(1) :+ xLeaves
    val yEnds = yBucketStarts.drop(1) :+ yLeaves
    val xCovers = xBucketStarts.indices.map(i =>
      kadicDecomposition(xBucketStarts(i), xEnds(i), branching))
    val yCovers = yBucketStarts.indices.map(j =>
      kadicDecomposition(yBucketStarts(j), yEnds(j), branching))
    // driver-side metadata: per cell, the cross product of its covers
    val decomp: Seq[(Int, Int, Int, Int, Int, Int)] = for {
      i <- xBucketStarts.indices; j <- yBucketStarts.indices
      (xlo, xsz) <- xCovers(i); (ylo, ysz) <- yCovers(j)
    } yield (i, j, xlo, xsz, ylo, ysz)
    val noisePerCell = decomp.toDF("bx", "by", "xlo", "xsz", "ylo", "ysz")
      .groupBy(col("bx"), col("by"))
      .agg(
        sum(laplaceNoise(
          concat_ws(":", col("xlo"), col("xsz"), col("ylo"), col("ysz")),
          scale, seed, keyLoader)).as("__noise"),
        count(lit(1)).as("n_intervals"))
    def bucketOf(c: String, minV: Double, gran: Double, starts: Seq[Int]) = {
      val leaf = floor((col(c) - lit(minV)) / lit(gran)).cast("int")
      starts.zipWithIndex.tail.foldLeft(lit(0)) {
        case (acc, (s, i)) => when(leaf >= lit(s), lit(i)).otherwise(acc)
      }
    }
    val xLeaf = floor((col(xColumn) - lit(xMin)) / lit(xGranularity)).cast("int")
    val yLeaf = floor((col(yColumn) - lit(yMin)) / lit(yGranularity)).cast("int")
    val counts = df
      .filter(col(xColumn).isNotNull && xLeaf >= 0 && xLeaf < lit(xLeaves) &&
        col(yColumn).isNotNull && yLeaf >= 0 && yLeaf < lit(yLeaves))
      .groupBy(
        bucketOf(xColumn, xMin, xGranularity, xBucketStarts).as("bx"),
        bucketOf(yColumn, yMin, yGranularity, yBucketStarts).as("by"))
      .agg(count(lit(1)).as("cnt"))
    noisePerCell
      .join(counts, Seq("bx", "by"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .select(
        col("bx"), col("by"), col("cnt"),
        round(col("cnt") + col("__noise"), 4).as("noisy_cnt"),
        col("n_intervals"),
        round(when(col("n_intervals") === 1, lit(scale * math.log(100.0)))
          .otherwise(lit(2.576) * sqrt(col("n_intervals") * lit(2.0 * scale * scale))), 4)
          .as("conf_radius"))
      .orderBy(col("bx"), col("by"))
  }
}

/** The row-wise UDF surface — hillview's JavaScript map/filter columns
  * (maps/CreateColumnJSMap.java, table/filters/JSFilterDescription.java)
  * re-expressed as registered Scala lambdas. UDFs are opaque to Catalyst
  * (no pushdown through them) — prefer Column expressions; this is the
  * escape hatch for genuinely arbitrary row logic.
  */
object Udfs {
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("qty_band", (q: Double) =>
      if (q < 10) "low" else if (q < 30) "mid" else "high")
    spark.udf.register("price_per_unit", (price: Double, qty: Double) =>
      if (qty == 0) 0.0 else price / qty)
  }
}
