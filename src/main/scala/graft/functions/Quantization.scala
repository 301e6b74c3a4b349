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
object Quantization {
  /** Snap to multiples of `granularity` (left edge). */
  def quantize(c: Column, granularity: Double): Column =
    floor(c / lit(granularity)) * lit(granularity)

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
