package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout utilities for cluster scale. None of this changes
  * query semantics — it changes where the shuffles happen (or removes
  * them). At 100 TB these are the difference between a query that runs
  * and one that doesn't:
  *
  * - **Bucketing**: pre-shuffle fact tables on their join key once at
  *   write time; subsequent equi-joins between tables bucketed on the
  *   same key by the same count plan with NO Exchange.
  * - **Salting**: explode a hot key across `salt` sub-keys so one
  *   reducer doesn't receive the whole skewed partition (AQE skew-join
  *   handles moderate skew; salting is for the pathological tail).
  */
object Layout {

  /** Write a table bucketed + sorted by join keys. Readers joining two
    * tables bucketed identically get a shuffle-free sort-merge join.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Salted equi-join for a skewed big side: the big side gets a random
    * salt in [0, salt); the small side is replicated `salt` times; the
    * join key becomes (key, salt). Result is identical to the plain
    * join, but the hot key's rows spread over `salt` reducers.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salt)))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(salt - 1L))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Partition-count advisory for a target on-disk size: the knob the
    * reference doesn't need (its leaves are files) but Spark does.
    */
  def partitionsForBytes(totalBytes: Long, targetBytesPerPartition: Long = 128L << 20): Int =
    math.max(1, math.ceil(totalBytes.toDouble / targetBytesPerPartition).toInt)

  /** ParallelizerMap (reference maps/ParallelizerMap.java:31-45): split
    * an under-partitioned input so narrow CPU-heavy maps (signature
    * builds, all-pairs scoring) use every core. A single-row-group
    * parquet file scans as ONE task no matter how many cores exist —
    * exactly the case the reference splits a leaf for. No-op when the
    * scan already has enough splits (the normal case at corpus scale),
    * so the repartition cost is only paid when it buys parallelism.
    */
  def ensureParallelism(df: DataFrame, min: Int = 0): DataFrame = {
    val target =
      if (min > 0) min else df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
