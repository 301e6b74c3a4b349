package graft.engine

import org.apache.spark.sql.SparkSession

/** Session factory with scale-appropriate defaults.
  *
  * Local testing runs `local[32]`; on a real cluster the same settings
  * (AQE, skew-join handling, modest shuffle parallelism overridden by the
  * cluster submit) carry over. Reference behavior being reproduced:
  * vmware/hillview's engine never shuffles (sketch monoids merge at the
  * root); our Spark translation leans on AQE + partial aggregation to get
  * the same "bounded data to the driver" property.
  */
object Sessions {
  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // ObjectHashAggregate (TypedImperativeAggregate groupBys: bounded
      // postings, Misra-Gries) falls back to SORT-based aggregation after
      // only 128 distinct in-memory keys by default — a per-row serialize
      // + sort penalty on every many-key sketch aggregation. Our object
      // buffers are size-bounded by construction (that is their point),
      // so an 8k-key hash map is ≤ ~megabytes; past that the sort
      // fallback still protects memory.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "8192")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Interactive multi-user posture (the reference serves many
    * concurrent dashboard sessions): FAIR scheduling so one user's long
    * scan doesn't head-of-line-block another's sub-second histogram.
    * Queries opt into a pool via `inPool`. On a cluster the same two
    * settings apply — pools are per-SparkContext, independent of the
    * cluster manager's queues.
    */
  def interactive(cores: Int = 32, appName: String = "graft"): SparkSession = {
    // pre-check BEFORE the builder: getOrCreate on an existing session
    // would both ignore the FAIR setting (scheduler mode is frozen at
    // context creation) and apply the modifiable SQL configs below to
    // the existing session — silently changing e.g. shuffle.partitions
    // for every other user of that session. getOrCreate prefers the
    // thread-local ACTIVE session over the default one, so an
    // active-but-not-default session must be checked too or it slips
    // past the guard and still takes the config overwrite
    (SparkSession.getActiveSession.toSeq ++ SparkSession.getDefaultSession)
      .foreach { existing =>
        val mode = existing.sparkContext.getConf.get("spark.scheduler.mode", "FIFO")
        require(mode.equalsIgnoreCase("FAIR"),
          s"Sessions.interactive found an existing SparkContext with scheduler mode $mode; " +
            "FAIR scheduling cannot be enabled after context creation — " +
            "create the interactive session before any other session")
      }
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "8192")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // scheduler mode is frozen at SparkContext creation: if another
    // session already exists, getOrCreate silently reuses it and the
    // FAIR config above is ignored — pools would be no-ops and the
    // isolation this API promises would silently not exist. Fail fast
    // instead: the interactive session must be created first.
    val mode = spark.sparkContext.getConf.get("spark.scheduler.mode", "FIFO")
    require(mode.equalsIgnoreCase("FAIR"),
      s"Sessions.interactive reused an existing SparkContext with scheduler mode $mode; " +
        "FAIR scheduling cannot be enabled after context creation — " +
        "create the interactive session before any other session")
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Run `body`'s jobs in the named FAIR pool (per-thread property, the
    * unit of isolation between concurrent interactive users). The
    * PREVIOUS pool assignment is restored on exit — nulling it would
    * silently drop an outer per-user pool after any nested use.
    */
  def inPool[T](spark: SparkSession, pool: String)(body: => T): T = {
    val prev = spark.sparkContext.getLocalProperty("spark.scheduler.pool")
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
    try body
    finally spark.sparkContext.setLocalProperty("spark.scheduler.pool", prev)
  }
}

/** Loaders for the driver-generated TPC-H-ish test tables (TESTDATA.md).
  * Thin wrappers over `spark.read.parquet` — Catalyst column pruning and
  * filter pushdown reach the scan because nothing here materializes.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String) = {
    // The generated tables store timestamps as parquet TIMESTAMP(MICROS)
    // with isAdjustedToUTC=false, which Spark 4 infers as TIMESTAMP_NTZ
    // by default. NTZ breaks streaming watermarks and unix_millis, and
    // the whole engine (+ the DuckDB oracle compare) is pinned to
    // UTC-session TIMESTAMP semantics, so force classic inference. This
    // is a runtime-modifiable conf; setting it here covers sessions we
    // didn't build (same pattern as the nanosAsLong handling below).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def lineitem(spark: SparkSession, dir: String)   = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String)     = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String)   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String)   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String)       = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String)     = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String)     = table(spark, dir, "region")
  /** events.parquet carries TIMESTAMP(NANOS) which Spark 4 rejects by
    * default; read nanos as long and convert to a microsecond timestamp
    * (floor division — matches DuckDB's ns→µs truncation).
    */
  def events(spark: SparkSession, dir: String) = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => df
    }
  }
  def documents(spark: SparkSession, dir: String)  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String) = table(spark, dir, "embeddings")
}
