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
    * extracts the row at a position). Exact declaration: global sort is
    * avoided by Spark's ORDER BY + LIMIT planning; the reference samples
    * instead, trading exactness for one pass.
    */
  def rowAtPosition(df: DataFrame, order: Seq[NextK.Order], position: Int): DataFrame =
    df.orderBy(order.map(_.col): _*).offset(position).limit(1)

  /** ContainsMap (maps/ContainsMap.java:40-60): does a (partial) row
    * occur in the table — a boolean gate used for view reconstruction.
    */
  def containsRow(df: DataFrame, pred: Column): DataFrame =
    df.agg((count(when(pred, 1)) > 0).as("found"))
}
