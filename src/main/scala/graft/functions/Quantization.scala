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
    val snapped = boundaries.foldLeft(lit(null).cast("string")) {
      (acc, b) => when(c >= lit(b), lit(b)).otherwise(acc)
    }
    when(c.isNull || c > lit(globalMax), lit(null).cast("string")).otherwise(snapped)
  }

  /** NoisyHLogLog (sketches/results/NoisyHLogLog.java:12): distinct
    * count with a confidence radius, optionally Laplace-noised for DP.
    * The HLL++ estimate contributes z·rsd·count to the 95% radius; a
    * nonzero noise scale adds the Laplace 95% quantile b·ln(20)
    * (reference default is the zero-noise path, scale = 0 → exact
    * sketch value, radius purely from the sketch error).
    */
  def noisyDistinct(df: org.apache.spark.sql.DataFrame, column: String,
      rsd: Double = 0.05, noiseScale: Double = 0.0, seed: Long = 42L)
      : org.apache.spark.sql.DataFrame =
    df.agg(approx_count_distinct(col(column), rsd).as("__raw"))
      .select(
        round(col("__raw") +
          laplaceNoise(lit(column), noiseScale, seed), 4).as("noisy_distinct"),
        round(lit(1.96 * rsd) * col("__raw") +
          lit(noiseScale * math.log(20.0)), 4).as("conf_radius"))

  /** Deterministic pseudo-Laplace noise from a seed column — for DP
    * histogram counts. scale=0 → exact (the default, as in the
    * reference's NoisyHLogLog/DPHistogram zero-noise path).
    */
  def laplaceNoise(key: Column, scale: Double, seed: Long = 42L): Column =
    if (scale == 0.0) lit(0.0)
    else {
      // uniform in (-0.5, 0.5) EXCLUSIVE from a hash of (seed, key):
      // offset by half a grid step so |u| < 0.5 and log(1-2|u|) is finite
      val u = ((pmod(xxhash64(lit(seed), key), lit(1000000L)).cast("double") +
        lit(0.5)) / lit(1000000.0)) - lit(0.5)
      // inverse-CDF Laplace
      -lit(scale) * signum(u) * log(lit(1.0) - lit(2.0) * abs(u))
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
