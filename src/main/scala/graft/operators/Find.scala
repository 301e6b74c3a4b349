package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FindSketch (sketches/FindSketch.java:37-216): locate a string pattern
  * within a sorted view — how many matches fall before/at-or-after the
  * pivot, and the first matching row at-or-after. Two bounded aggregates
  * + a top-1; no full sort materializes (TakeOrderedAndProject for the
  * first-row leg).
  */
object Find {
  def find(
      df: DataFrame,
      matchPred: Column,
      order: Seq[NextK.Order],
      pivot: Seq[Any],
      firstRowCols: Seq[String]): DataFrame = {
    val after = Filters.rowSeek(order.map(o => col(o.column)), pivot)
    // at = sort-key tuple equals the pivot exactly (FindSketch counts
    // before / at / after separately; "after" here excludes "at")
    val at = order.map(o => col(o.column)).zip(pivot)
      .map { case (c, v) => c === lit(v) }.reduce(_ && _)
    val matches = df.filter(matchPred)
    val counts = matches.agg(
      count(when(!after, 1)).as("before_cnt"),
      count(when(at, 1)).as("at_cnt"),
      count(when(after && !at, 1)).as("after_cnt"))
    val first = matches.filter(after)
      .orderBy(order.map(_.col): _*)
      .limit(1)
      .select(firstRowCols.map(c => col(c).as(s"first_$c")): _*)
    counts.crossJoin(first)
  }

  /** Row at an ordinal position under a sort order — the scrollbar
    * gesture backed by SampleQuantileSketch in the reference (root
    * extracts the row at a position).
    *
    * Exact two-phase seek: a naive `orderBy.offset(position)` funnels
    * position+1 rows through one partition (at 13 B rows the scrollbar
    * midpoint is the worst case). Instead: (1) one aggregate finds the
    * range of the leading sort column; (2) one count-by-equal-width-
    * bucket pass (O(nBuckets) result at the driver) locates the bucket
    * containing the position; (3) the seek runs on that bucket only —
    * the residual offset funnel is bounded by ~N/nBuckets rows, the same
    * res² bound the reference's sampler targets. Buckets are a pure
    * function of the value, so rows with equal keys share a bucket and
    * the result is identical to the global-sort form.
    */
  def rowAtPosition(df: DataFrame, order: Seq[NextK.Order], position: Int,
      nBuckets: Int = 1024): DataFrame = {
    val c0 = col(order.head.column).cast("double")
    val mm = df.agg(min(c0), max(c0)).head()
    if (mm.isNullAt(0)) return df.filter(lit(false)).limit(1)
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    if (hi == lo) // degenerate single-value leading key: no bucket cuts
      return df.orderBy(order.map(_.col): _*).offset(position).limit(1)
    val bucket = least(floor((c0 - lit(lo)) / lit((hi - lo) / nBuckets)),
      lit(nBuckets - 1)).cast("int")
    val counts = df.groupBy(bucket.as("__b")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var before = 0L
    var target = -1
    var local = 0L
    counts.foreach { case (b, n) =>
      if (target < 0 && before + n > position) { target = b; local = position - before }
      before += n
    }
    if (target < 0) df.filter(lit(false)).limit(1) // position beyond table end
    else df.filter(bucket === lit(target))
      .orderBy(order.map(_.col): _*).offset(local.toInt).limit(1)
  }

  /** The reference's actual scheme (SampleQuantileSketch.java:39-120):
    * uniform row sample at rate res²/N, sorted; the row at the scaled
    * position approximates the exact answer within ~N/res positions.
    * One sampled pass; the sort handles O(res²) rows.
    */
  def rowAtPositionSampled(df: DataFrame, order: Seq[NextK.Order], position: Long,
      resolution: Int = 100, seed: Long = 42L): DataFrame = {
    val n = df.count()
    if (n == 0) return df.limit(0)
    val frac = math.min(1.0, resolution.toDouble * resolution / n)
    val sample = df.sample(withReplacement = false, frac, seed)
    val m = sample.count()
    if (m == 0) return df.orderBy(order.map(_.col): _*).limit(1)
    val idx = math.min(m - 1, math.round(position.toDouble * m / n))
    sample.orderBy(order.map(_.col): _*).offset(idx.toInt).limit(1)
  }

  /** ContainsMap (maps/ContainsMap.java:40-60): does a (partial) row
    * occur in the table — a boolean gate used for view reconstruction.
    */
  def containsRow(df: DataFrame, pred: Column): DataFrame =
    df.agg((count(when(pred, 1)) > 0).as("found"))
}
