package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join — for each left row, the latest right row with
  * `right.ts <= left.ts` on the same key (time-series / feature-lookup
  * staple; parity-plus over the reference, which has no joins at all).
  *
  * Spark-first shape: no range cross-join and no per-key collect.
  * Both sides are tagged and unioned, shuffled ONCE on the key, sorted
  * within each key partition by (ts, tag), and the right payload is
  * carried forward with a running `last(ignoreNulls)` window. Left rows
  * then read the most recent right payload at or before their timestamp
  * (inclusive: at equal ts the right row sorts first). This is the
  * canonical linear-scan merge — O(n log n) in partition sort, one
  * shuffle total, skew handled by AQE like any other hot-key window.
  */
object AsOfJoin {

  /** @param keys     equality columns (must exist on both sides)
    * @param ts       ordering column name (both sides)
    * @param payload  right-side columns delivered to matched left rows
    *                 (null when no right row precedes the left row);
    *                 `tiebreak` orders right rows sharing (key, ts) —
    *                 the greatest wins, mirroring "latest record".
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String], ts: String,
      payload: Seq[String], tiebreak: Option[String] = None): DataFrame = {
    val rightTagged = right
      .select((keys.map(col) :+ col(ts) :+
        struct(payload.map(col): _*).as("__p")): _*)
      .withColumn("__tag", lit(0))
    val leftTagged = left.withColumn("__tag", lit(1))
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    // tiebreak lives in the right payload struct; left rows (null __p)
    // only tie among themselves where relative order is irrelevant
    val orderCols = (col(ts) +: col("__tag") +:
      tiebreak.map(t => col(s"__p.$t").asc_nulls_first).toSeq)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(left.columns.map(col) ++
        payload.map(p => col(s"__asof.$p").as(p)): _*)
  }
}
