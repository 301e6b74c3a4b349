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
        // A misconfigured resolver on one host must degrade that host's
        // label, not fail the whole liveness probe.
        val host = scala.util.Try(
          java.net.InetAddress.getLocalHost.getHostName).getOrElse("unknown")
        Iterator(org.apache.spark.SparkEnv.get.executorId + "@" + host)
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
    * coordinating process). The reference runs a System.gc() first so
    * the number excludes trivially-dead garbage; here that is OPT-IN
    * (`forceGc = true` for the interactive management call) because
    * `cluster_health` also runs inside the bench suite, where a forced
    * full GC mid-suite perturbs adjacent query timings and folds pause
    * time into the reported total. Without the GC the result may count
    * dead objects — it is an observability number, not an accounting one.
    */
  def driverMemoryUsed(forceGc: Boolean = false): Long = {
    if (forceGc) System.gc()
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
    *
    * The memory columns are deliberately neutral (`mem_used`/`mem_total`)
    * because their meaning differs by `kind`: executor rows report
    * storage-pool memory (used / total on+off-heap storage), while the
    * driver row reports JVM heap (used / max). Consumers must split on
    * `kind` before comparing rows — the schema says so instead of two
    * incompatible metrics silently sharing a "storage" name.
    */
  def health(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val execs = memoryUse(spark)
      .withColumnRenamed("storage_used", "mem_used")
      .withColumnRenamed("storage_total", "mem_total")
      .withColumn("kind", org.apache.spark.sql.functions.lit("executor"))
    val driver = Seq((
      "driver", driverMemoryUsed(), Runtime.getRuntime.maxMemory(),
      0L, 0, "driver")).toDF("host", "mem_used", "mem_total",
      "cache_size", "running_tasks", "kind")
    execs.unionByName(driver)
  }
}
