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
    // pre-shuffle to the bucket spec's own hash partitioning: each
    // write task then owns exactly one bucket, producing `buckets`
    // files total instead of (input tasks × buckets) fragments — the
    // difference between a clean co-located layout and a small-files
    // problem at fact-table scale
    df.repartition(buckets, keys.map(col): _*)
      .write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** [[writeBucketed]] with idempotent REcreation: drops the catalog
    * entry AND clears a stale warehouse location left by a previous
    * session (DROP TABLE on a fresh in-memory catalog doesn't know the
    * old table, so the managed-location collision must be cleared on
    * disk or the write dies with LOCATION_ALREADY_EXISTS). */
  def recreateBucketed(spark: org.apache.spark.sql.SparkSession,
      df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit = {
    // the name is both interpolated into SQL and turned into a filesystem
    // path for a recursive delete — restrict it to a plain unqualified
    // identifier before doing either
    require(table.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"recreateBucketed needs a plain table identifier, got '$table'")
    val wh = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
      .getCanonicalFile
    // resolve the managed location from the catalog while the entry still
    // exists (Spark lowercases the identifier for the directory, so a
    // name-derived path would miss a mixed-case table); fall back to the
    // lowercased name for the stale-location case where the in-memory
    // catalog has no entry but a previous session's directory survives
    val catalogLoc: Option[java.io.File] =
      if (spark.catalog.tableExists(table))
        spark.sql(s"DESCRIBE TABLE EXTENDED $table").collect()
          .find(_.getString(0) == "Location")
          .map(r => new java.io.File(
            new java.io.File(r.getString(1).stripPrefix("file:")).getPath))
      else None
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = catalogLoc.getOrElse(
      new java.io.File(wh, table.toLowerCase(java.util.Locale.ROOT)))
      .getCanonicalFile
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
      f.delete(); ()
    }
    // recursive deletes stay strictly under the warehouse — an external
    // or oddly-resolved location is a caller error, not something to rm
    if (loc.getPath.startsWith(wh.getPath + java.io.File.separator) &&
        loc.exists) rm(loc)
    writeBucketed(df, table, keys, buckets)
  }

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

  /** 16-bit Morton spread: the low 16 bits of x distributed to the even
    * bit positions of a 32-bit value, via the standard magic-mask
    * doubling — 4 shift/and steps, pure codegen'd integer ops.
    */
  private def spread16(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.lit
    val a = x.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Z-order (Morton) key of two 16-bit bucket ids: bits of `a` and `b`
    * interleaved, so sorting by the key clusters rows that are close in
    * BOTH dimensions into the same files. At 100 TB this is the
    * file-skipping lever for two-column predicates: parquet min/max
    * stats prune on either column, where a one-column sort only prunes
    * on its leading column. Pure integer expressions — engine-portable
    * and oracle-checkable (the magic-mask spread is public domain
    * bit-twiddling, e.g. Bit Twiddling Hacks "Interleave bits by Binary
    * Magic Numbers").
    */
  def zorder16(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** RLE sink-layout audit — the sort-key chooser for columnar writes
    * (the ascending-cardinality rule made measurable): under a sort by
    * (k1, k2, k3), column k_i breaks into a new run whenever the
    * (k1..k_i) prefix changes, so distinct(k1..k_i) counts its runs —
    * EXACT unless two adjacent prefix groups happen to end and start
    * with the same k_i value (then it over-counts by one per such
    * coincidence: a documented upper bound that never exceeds the true
    * count by more than #groups−1 and does not move the ordering
    * decision). All 6 candidate orders assemble from the 7 prefix-set
    * distinct counts — ONE aggregation pass, no sort executed
    * anywhere. Fewer runs = better RLE/dictionary pages and tighter
    * min-max zone maps at the 100 TB sink; best = min total (tie:
    * lexicographically-first key string). Keys must be non-null (the
    * engines' multi-column DISTINCT treat null tuples differently). */
  /** Small-files compaction PLAN — the OPTIMIZE planner every table
    * format ships (Delta OPTIMIZE / Iceberg rewrite_data_files): given
    * a hive-partitioned dataset, assign each data file to a compaction
    * bin of ~`targetBytes` by CUMULATIVE size in file-name order within
    * its partition. Name order preserves the writer's clustering;
    * offset binning `floor(bytes_before / target)` makes the plan a
    * pure function of the listing (no sequential state, so the whole
    * plan replays in SQL over the same listing); a bin exceeds the
    * target by at most one file — the standard contract. The listing
    * is driver-side METADATA (file-count sized, the
    * candidatePartitions posture — no data page is read); the plan is
    * what an executor fleet then executes partition-parallel.
    */
  def compactionPlan(spark: SparkSession, dir: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "compaction target must be positive")
    import spark.implicits._
    val parts = Option(new java.io.File(dir).listFiles).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.contains("="))
    val rows = for {
      p <- parts.sortBy(_.getName)
      f <- Option(p.listFiles).toSeq.flatten.sortBy(_.getName)
      if f.isFile && f.getName.endsWith(".parquet") &&
        !f.getName.startsWith(".")
    } yield (p.getName, f.getName, f.length)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("part_dir")).orderBy(col("file"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    rows.toDF("part_dir", "file", "bytes")
      .withColumn("bin", graft.text.TextAnalysis.intDiv(
        coalesce(sum(col("bytes")).over(w), lit(0L)), lit(targetBytes)))
  }

  def rleLayoutAudit(df: DataFrame,
      keys: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(keys.size == 3, "audit expects exactly three candidate keys")
    import org.apache.spark.sql.functions._
    val spark = df.sparkSession
    import spark.implicits._
    val named = df.select(keys.map { case (n, c) => c.as(n) }: _*)
    val ns = keys.map(_._1)
    val subsets: Seq[Seq[String]] =
      Seq(Seq(ns(0)), Seq(ns(1)), Seq(ns(2)),
        Seq(ns(0), ns(1)), Seq(ns(0), ns(2)), Seq(ns(1), ns(2)), ns)
    val aggs = subsets.zipWithIndex.map { case (s, i) =>
      countDistinct(col(s.head), s.tail.map(col): _*).as(s"d$i")
    }
    val row = named.agg(aggs.head, aggs.tail: _*).head()
    val d: Map[Set[String], Long] =
      subsets.zipWithIndex.map { case (s, i) => s.toSet -> row.getLong(i) }.toMap
    val perms = ns.permutations.toSeq.map { p =>
      val r1 = d(Set(p(0)))
      val r2 = d(Set(p(0), p(1)))
      val r3 = d(p.toSet)
      (p.mkString(","), r1, r2, r3, r1 + r2 + r3)
    }
    val best = perms.minBy { case (k, _, _, _, t) => (t, k) }._1
    perms.toDF("sort_key", "runs_c1", "runs_c2", "runs_c3", "total_runs")
      .withColumn("is_best", col("sort_key") === lit(best))
  }

  /** Write `df` z-clustered on two bucketed dimensions: range-partition
    * + sort by the Morton key, so each output file covers a tight
    * rectangle of (a, b) space (gated in LayoutSpec by comparing
    * per-file bounding-box area against a one-column sort layout).
    */
  def writeZOrdered(df: DataFrame, a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column, path: String, nFiles: Int): Unit = {
    val z = zorder16(a, b)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, org.apache.spark.sql.functions.col("__z"))
      .sortWithinPartitions(org.apache.spark.sql.functions.col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
