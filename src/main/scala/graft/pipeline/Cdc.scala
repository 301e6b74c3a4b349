package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture maintenance of corpus snapshots — the table-
  * maintenance half a month-over-month 100 TB pipeline needs beside the
  * folded artifacts: apply an upsert/delete change feed to a snapshot
  * (MERGE INTO semantics) and build the SCD2 validity history of a key.
  *
  * Scale posture: [[mergeApply]] never reshuffles the BASE snapshot —
  * the latest-wins election is a window over the FEED alone (feed-sized
  * shuffle), and the base contributes via a left-anti join on the key
  * whose build side is the feed's key set (broadcastable whenever the
  * feed is deltas-sized, which is the CDC regime; AQE picks the
  * broadcast at runtime). [[scd2]] is inherently history-sized: one
  * shuffle on the key over base ∪ feed, the minimum any interval
  * construction pays.
  *
  * Contracts: base keys are unique (it is a snapshot); (key, seq) is
  * unique in the feed with seq > 0 (a CDC log's sequence number /
  * LSN), so latest-wins is deterministic; ops are I/U (full new row
  * image — I vs U is provenance, not semantics, as in Debezium-style
  * row logs) or D (tombstone, row image ignored).
  */
object Cdc {

  private def feedAligned(base: DataFrame, feed: DataFrame,
      seqCol: String, opCol: String): DataFrame = {
    require(!base.columns.contains(seqCol) && !base.columns.contains(opCol),
      s"base snapshot must not carry the CDC columns '$seqCol'/'$opCol'" +
        " — pass different seqCol/opCol names")
    feed.select((base.columns.toSeq ++ Seq(opCol, seqCol)).map(col): _*)
  }

  /** MERGE INTO / upsert-apply: the post-feed snapshot. Latest feed row
    * per key wins; a winning tombstone deletes; keys untouched by the
    * feed pass through unshuffled.
    *
    * The winners subtree feeds two consumers (the anti-join's key set
    * and the upsert union) and is deliberately left un-materialized, so
    * the plan computes the feed window twice under different column
    * pruning — two FEED-sized passes in exchange for never shuffling
    * the base, the right trade in the CDC regime (plan-gated). Callers
    * merging in a loop should localCheckpoint the result per step (see
    * [[graft.streaming.Events.cdcMergeIngestGate]]).
    */
  def mergeApply(base: DataFrame, feed: DataFrame, keys: Seq[String],
      seqCol: String = "seq", opCol: String = "op"): DataFrame = {
    val dataCols = base.columns.toSeq
    val w = Window.partitionBy(keys.map(col): _*).orderBy(desc(seqCol))
    val winners = feedAligned(base, feed, seqCol, opCol)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
    val untouched = base.join(
      winners.select(keys.map(col): _*), keys, "left_anti")
    untouched.unionByName(
      winners.filter(col(opCol) =!= "D").select(dataCols.map(col): _*))
  }

  /** SCD2 history: one row per (key, version) with its validity
    * interval. The base snapshot enters as version `seq = 0`; each feed
    * row opens an interval closed by the key's next change (a tombstone
    * closes without opening). `valid_to` is NULL on the open interval;
    * `is_current` marks it.
    */
  def scd2(base: DataFrame, feed: DataFrame, keys: Seq[String],
      seqCol: String = "seq", opCol: String = "op"): DataFrame = {
    val base0 = base.withColumn(opCol, lit("I"))
      .withColumn(seqCol, lit(0L))
    val all = base0.unionByName(feedAligned(base, feed, seqCol, opCol))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(seqCol))
    all.withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .filter(col(opCol) =!= "D")
      .withColumnRenamed(seqCol, "valid_from")
      .withColumn("is_current", col("valid_to").isNull)
      .drop(opCol)
  }
}
