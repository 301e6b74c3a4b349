package graft.engine

import graft.streaming.Memo
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cluster-management surface — the reference's control messages
  * re-expressed over Spark's public status APIs (no RPC layer to build:
  * the cluster manager already owns liveness and metrics).
  *
  * Reference behavior being reproduced:
  *  - PingSketch (platform/.../management/PingSketch.java:32): the
  *    deduplicated machine names holding leaf data, gathered by an
  *    actual distributed round-trip.
  *  - MemoryUse (management/MemoryUse.java:28): per-process used memory.
  *  - PurgeMemoization (management/PurgeMemoization.java:28) and
  *    SetMemoization: clear / toggle the sketch-result cache.
  *  - PurgeLeafDatasets (management/PurgeLeafDatasets.java): drop
  *    materialized leaf data — in Spark the cached relations; lineage
  *    re-derives them lazily on next use, so a purge is always safe.
  */
object Cluster {

  /** Distributed ping: one trivial task per core, each reporting its
    * executor id + host; result deduped like PingSketch's merge. On
    * local[n] this is a single (driver) executor; on a 1000-executor
    * cluster the same job fans one wave of empty tasks — O(cores) tasks
    * of O(1) work, the cheapest full-cluster round-trip Spark offers.
    */
  def ping(spark: SparkSession): Seq[String] = {
    val sc = spark.sparkContext
    val slots = math.max(sc.defaultParallelism, 1)
    sc.parallelize(1 to slots, slots)
      .mapPartitions { _ =>
        Iterator(org.apache.spark.SparkEnv.get.executorId + "@" +
          java.net.InetAddress.getLocalHost.getHostName)
      }
      .distinct().collect().sorted.toSeq
  }

  /** Per-executor memory/cache usage as a DataFrame (host, storage
    * memory used/total on+off heap, cached blocks, running tasks), one
    * row per live executor — MemoryUse's per-process report, served
    * from the driver's status tracker (no job, no executor round-trip).
    */
  def memoryUse(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.sparkContext.statusTracker.getExecutorInfos.toSeq
      .map { e =>
        (e.host,
          e.usedOnHeapStorageMemory + e.usedOffHeapStorageMemory,
          e.totalOnHeapStorageMemory + e.totalOffHeapStorageMemory,
          e.cacheSize, e.numRunningTasks)
      }
      .toDF("host", "storage_used", "storage_total", "cache_size",
        "running_tasks")
  }

  /** Driver-JVM used memory in bytes (the MemoryUse number for the
    * coordinating process). Like the reference, a System.gc() first —
    * and like the reference's own comment, the result may still count
    * dead objects; it is an observability number, not an accounting one.
    */
  def driverMemoryUsed(): Long = {
    System.gc()
    val rt = Runtime.getRuntime
    rt.totalMemory() - rt.freeMemory()
  }

  /** PurgeMemoization: drop every memoized sketch result. */
  def purgeMemoization(): Unit = Memo.clear()

  /** SetMemoization: toggle the sketch-result cache. */
  def setMemoization(on: Boolean): Unit = Memo.setEnabled(on)

  /** PurgeLeafDatasets: unpersist every cached relation in the session.
    * Safe by construction — Spark lineage recomputes on next access.
    */
  def purgeCachedData(spark: SparkSession): Unit =
    spark.catalog.clearCache()

  /** One-stop health row set for dashboards: executor rows from
    * [[memoryUse]] plus a `driver` row, so a single bounded query
    * answers "is the cluster alive and how full is it".
    */
  def health(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val driver = Seq((
      "driver", driverMemoryUsed(), Runtime.getRuntime.maxMemory(),
      0L, 0)).toDF("host", "storage_used", "storage_total",
      "cache_size", "running_tasks")
    memoryUse(spark).unionByName(driver)
  }
}
