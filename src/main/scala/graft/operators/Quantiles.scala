package graft.operators

import org.apache.spark.sql.DataFrame
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
    * StringQuantiles, sketches/SampleDistinctElementsSketch.java:37-122):
    * split the ordered distinct strings into `n` tiles and report each
    * tile's max.
    *
    * Computed through the KMV min-K-hash distinct sampler
    * (functions.MinKHash) — one aggregation pass with O(sampleK)
    * mergeable state, exactly the reference's MinKSet. No global window,
    * no single-partition sort of the distinct set. When the distinct
    * cardinality is ≤ `sampleK` the sample is exhaustive and the
    * boundaries are exactly the ntile tile-maxima (the oracle form);
    * beyond that they are the sampled approximation the reference itself
    * returns.
    */
  def stringBoundaries(df: DataFrame, column: String, n: Int,
      sampleK: Int = 4096): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sample = df.select(col(column)).where(col(column).isNotNull).as[String]
      .select(new graft.functions.MinKHash.MinKAggregator(sampleK).toColumn)
      .head()
    val size = sample.size
    // ntile(n) semantics over the sampled distinct set: the first
    // (size % n) tiles get ceil(size/n) values, the rest floor(size/n);
    // boundary i = last value of tile i
    val q = size / n
    val r = size % n
    val tiles = (1 to math.min(n, size)).map { i =>
      val cum = i.toLong * q + math.min(i, r)
      (i, sample(cum.toInt - 1))
    }
    tiles.toDF("tile", "boundary")
  }
}
