package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline staples beyond the reference's surface:
  * deterministic corpus shuffling, hash-based dataset splits, and
  * token-budget sequence packing. All engine-portable (md5-derived
  * hashes, no RNG) so every one is oracle-checkable, and all shaped as
  * one hash-map + at most one shuffle — the forms that survive 100 TB.
  */
object Pipeline {

  /** 60-bit engine-portable hash of a key column (same md5-prefix trick
    * as SimHash token hashes: identical in Spark and DuckDB SQL).
    */
  private def keyHash(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long")

  /** Deterministic global shuffle: rank every row by a hash of its key.
    * The standard "shuffle the corpus before training" pass — a global
    * sort by an incompressible key, which Spark executes as range
    * partitioning + per-partition sort (the scalable distributed sort);
    * downstream writers consume the rank as the new row order.
    */
  def deterministicShuffle(df: DataFrame, key: Column): DataFrame =
    df.withColumn("shuffle_rank",
      row_number().over(Window.orderBy(keyHash(key), key.cast("string"))))

  /** Hash split: assign each row to train/test by key hash — stable
    * under any partitioning, reproducible across engines and runs,
    * leak-free as long as the key identifies the leakage unit.
    */
  def hashSplit(df: DataFrame, key: Column, trainPct: Int): DataFrame =
    df.withColumn("split",
      when(pmod(keyHash(key), lit(100L)) < trainPct, lit("train"))
        .otherwise(lit("test")))

  /** Token-budget sequence packing: within each group, documents are
    * laid out in a deterministic order and cut into contiguous bins of
    * ~`budget` tokens (bin = floor(preceding-token-count / budget) —
    * fixed-boundary packing, the shuffle-free approximation of greedy
    * first-fit). One window per group; groups pack independently, so
    * the operation scales with the corpus, not a driver loop.
    */
  def packSequences(docs: DataFrame, group: Column, order: Column,
      nTokens: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(group).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("__cum", sum(nTokens).over(w))
      .withColumn("bin", floor((col("__cum") - nTokens) / lit(budget)))
      .drop("__cum")
  }
}
