package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Zone-map data skipping: prune PARTITIONS on NON-partition-column
  * predicates.
  *
  * Spark's built-in partition pruning only fires on the partition
  * column itself; a range predicate on any other column still scans
  * every partition. The lakehouse answer (Delta/Iceberg file-skipping
  * statistics) is a tiny stats table — per partition, min/max of the
  * queried columns — consulted BEFORE the scan so provably-empty
  * partitions are never opened. At 100 TB this is the difference
  * between touching 3 partitions and touching 3000; the stats table is
  * kilobytes and builds in the same pass that wrote the data.
  *
  * The skip decision is conservative (a partition is read unless its
  * zone PROVES no row can match: lo > zmax or hi < zmin), so results
  * are exactly those of the full scan — which is how the query stays
  * hash-oracleable against an engine that reads everything.
  */
object Skipping {

  /** Per-partition zone map: one row per `partCol` value with
    * min/max/count of each stat column — buildable in the same job
    * that writes the partitioned layout, storable next to it. */
  def buildZoneMap(df: DataFrame, partCol: String,
      statCols: Seq[String]): DataFrame =
    df.groupBy(col(partCol)).agg(
      count(lit(1)).as("zone_rows"),
      statCols.flatMap(c => Seq(
        min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max"))): _*)

  /** Partition values whose zones MIGHT contain a row with
    * `statCol ∈ [lo, hi]` — the driver-side skip decision (zone-map
    * sized collect: one row per partition, never per data row). */
  def candidatePartitions(zoneMap: DataFrame, partCol: String,
      statCol: String, lo: Column, hi: Column): Seq[Any] =
    zoneMap
      .filter(col(s"${statCol}_min") <= hi && col(s"${statCol}_max") >= lo)
      .select(col(partCol)).collect().map(_.get(0)).toSeq

  /** Read `dir` (hive-partitioned by `partCol`) with zone-map skipping
    * for `statCol ∈ [lo, hi]`: qualifying partitions come from the
    * stats table, reach the scan as a partition-column `isin` (so
    * Spark's partition pruning skips the rest at the file index), and
    * the row-level predicate still applies inside survivors. */
  def readWithSkipping(spark: SparkSession, dir: String, zoneMap: DataFrame,
      partCol: String, statCol: String, lo: Column, hi: Column): DataFrame = {
    val parts = candidatePartitions(zoneMap, partCol, statCol, lo, hi)
    val full = spark.read.parquet(dir)
    if (parts.isEmpty) full.filter(lit(false)) // zone maps prove: no row
    else full
      .filter(col(partCol).isin(parts: _*))
      .filter(col(statCol) >= lo && col(statCol) <= hi)
  }
}
