package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Set operations (maps/SetOperationMap.java:28-62 — union/intersection/
  * minus of two *filtered views of the same base table* via membership-set
  * algebra; mergeWith concatenation, TableTarget.java:734-746;
  * SetCompareColumnMap dataset comparison).
  *
  * The view-algebra forms compile to a single predicate over one scan —
  * zero shuffle, zero copy, exactly the reference's membership-set trick.
  * The generic forms (for independent tables) use Spark's native
  * union/intersect/except.
  */
object SetOps {
  /** Union of two views of the same table: p1 ∨ p2. */
  def viewUnion(df: DataFrame, p1: Column, p2: Column): DataFrame = df.filter(p1 || p2)
  /** Intersection: p1 ∧ p2. */
  def viewIntersect(df: DataFrame, p1: Column, p2: Column): DataFrame = df.filter(p1 && p2)
  /** Set-minus: p1 ∧ ¬p2. */
  def viewMinus(df: DataFrame, p1: Column, p2: Column): DataFrame = df.filter(p1 && !p2)

  /** mergeWith: concatenate same-schema tables (bag semantics). */
  def merge(dfs: Seq[DataFrame]): DataFrame = dfs.reduce(_ unionByName _)

  /** Generic distinct set ops for independent tables. */
  def intersect(a: DataFrame, b: DataFrame): DataFrame = a.intersect(b)
  def except(a: DataFrame, b: DataFrame): DataFrame    = a.except(b)

  /** compareDatasets / SetCompareColumnMap: tag each distinct row by
    * which inputs contain it. Tagged union + one aggregation — no N-way
    * join, scales linearly in total input size.
    */
  def compare(dfs: Seq[(String, DataFrame)]): DataFrame = {
    val tagged = dfs.map { case (tag, df) => df.withColumn("__src", lit(tag)) }
      .reduce(_ unionByName _)
    val dataCols = dfs.head._2.columns.toSeq
    tagged
      .groupBy(dataCols.map(col): _*)
      .agg(sort_array(collect_set(col("__src"))).as("sources"))
  }
}
