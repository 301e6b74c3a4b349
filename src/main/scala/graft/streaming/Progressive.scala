package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Progressive result refinement — the reference's signature interaction
  * model (dataset/api/PartialResult.java, ParallelDataSet.java:133-173:
  * every sketch streams monotonically improving partials to the UI).
  *
  * Spark translation: tag rows with spark_partition_id(), run the same
  * aggregation over growing partition prefixes, and emit each partial.
  * Because all our aggregations are monoid-shaped (partial+final
  * HashAggregate), each step is a correct partial result and the last
  * step equals the one-shot answer. Cancellation = cancelJobGroup.
  */
object Progressive {

  final case class Partial[T](fractionDone: Double, value: T)

  /** Run `agg` over increasing partition prefixes in `steps` chunks,
    * invoking `emit` with each partial. Returns the final full result.
    */
  def run(df: DataFrame, steps: Int)(
      agg: DataFrame => DataFrame)(
      emit: Partial[Array[org.apache.spark.sql.Row]] => Unit): Array[org.apache.spark.sql.Row] = {
    val nParts = df.rdd.getNumPartitions
    val tagged = df.withColumn("__pid", spark_partition_id())
    val cuts = (1 to steps).map(i => math.max(1, nParts * i / steps)).distinct
    var last: Array[org.apache.spark.sql.Row] = Array.empty
    cuts.foreach { cut =>
      last = agg(tagged.filter(col("__pid") < cut).drop("__pid")).collect()
      emit(Partial(cut.toDouble / nParts, last))
    }
    last
  }

  /** True incremental progressive execution — the faithful analog of the
    * reference's sketch protocol (ISketch.create per leaf + monoid add up
    * the tree, PartialResult streamed per completed leaf): every
    * partition is aggregated exactly ONCE via `runJob` over partition
    * ranges, per-partition buffers are merged into a running monoid
    * accumulator, and a partial is emitted after each chunk. Cumulative
    * cost = one full pass over the data (unlike `run`, which re-reads
    * each prefix), so progressive mode costs the same as one-shot mode
    * plus `steps` job launches.
    *
    * `zero` is a thunk so mutable buffers are never shared across
    * partitions; `seqOp`/`merge` mirror ISketch.increment/add.
    */
  def runIncremental[B: scala.reflect.ClassTag, R](
      df: DataFrame, steps: Int, jobGroup: String = "graft-progressive")(
      zero: () => B,
      seqOp: (B, org.apache.spark.sql.Row) => B,
      merge: (B, B) => B,
      finish: B => R)(
      emit: Partial[R] => Unit): R = {
    val rdd = df.rdd
    val n = math.max(rdd.getNumPartitions, 1)
    val sc = df.sparkSession.sparkContext
    sc.setJobGroup(jobGroup, s"progressive over $n partitions", interruptOnCancel = true)
    try {
      val cuts = (1 to steps).map(i => math.max(1, n * i / steps)).distinct
      var acc = zero()
      var done = 0
      cuts.foreach { cut =>
        val parts = (done until cut).toArray
        if (parts.nonEmpty) {
          val bufs = sc.runJob(rdd,
            (it: Iterator[org.apache.spark.sql.Row]) => it.foldLeft(zero())(seqOp),
            parts.toIndexedSeq)
          acc = bufs.foldLeft(acc)(merge)
          done = cut
        }
        emit(Partial(done.toDouble / n, finish(acc)))
      }
      finish(acc)
    } finally sc.clearJobGroup()
  }

  /** Time-bounded partial emission — the reference's latency contract
    * (ParallelDataSet.java:133-173: partial results are BUNDLED and
    * flushed at most once per bundling window, 300 ms by default, so a
    * fast source cannot flood the consumer). Chunks are still
    * aggregated exactly once ([[runIncremental]] underneath); `emit`
    * fires for the first partial, then only when at least `bundleMs`
    * has elapsed since the previous flush — except the FINAL partial,
    * which always flushes so the consumer ends at fractionDone = 1 with
    * the exact result. A slow consumer therefore sees
    * O(runtime / bundleMs) callbacks regardless of partition count.
    */
  def runBundled[B: scala.reflect.ClassTag, R](
      df: DataFrame, steps: Int, bundleMs: Long = 300L,
      jobGroup: String = "graft-progressive")(
      zero: () => B,
      seqOp: (B, org.apache.spark.sql.Row) => B,
      merge: (B, B) => B,
      finish: B => R)(
      emit: Partial[R] => Unit): R = {
    var lastFlush = Long.MinValue
    runIncremental(df, steps, jobGroup)(zero, seqOp, merge, finish) { p =>
      val now = System.nanoTime()
      if (p.fractionDone >= 1.0 || lastFlush == Long.MinValue ||
          now - lastFlush >= bundleMs * 1000000L) {
        emit(p)
        lastFlush = now
      }
    }
  }

  /** Progressive grouped count (the histogram shape) over any bucket
    * column — partials stream in as partitions complete, final result
    * equals the one-shot `groupBy(bucket).count()`.
    */
  def groupedCount(df: DataFrame, bucket: String, steps: Int)(
      emit: Partial[Map[Any, Long]] => Unit): Map[Any, Long] = {
    runIncremental[scala.collection.mutable.Map[Any, Long], Map[Any, Long]](
      df.select(bucket), steps)(
      () => scala.collection.mutable.Map.empty[Any, Long],
      (m, r) => { val k = r.get(0); m.update(k, m.getOrElse(k, 0L) + 1L); m },
      (a, b) => { b.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0L) + v) }; a },
      _.toMap)(emit)
  }

  /** Cancel a running progressive computation (RemoteDataSet
    * unsubscribe → here Spark job-group cancellation).
    */
  def cancel(spark: SparkSession, group: String): Unit =
    spark.sparkContext.cancelJobGroup(group)
}

/** Result memoization keyed by canonicalized plan — the Spark analog of
  * HillviewServer's MemoizedResults (dataset/remoting/HillviewServer
  * .java:105-120, MemoizedResults.java:31-90): repeated gestures over the
  * same view hit the cache instead of the cluster.
  */
object Memo {
  private final case class Entry(rows: Array[org.apache.spark.sql.Row],
      bytes: Long)
  // LinkedHashMap in ACCESS order (hits reinsert): head = LRU victim.
  // The reference's MemoizedResults is unbounded and relies on purge
  // RPCs; a long interactive session here would accumulate collected
  // row arrays without bound, so retention is byte-budgeted — an entry
  // is charged rows × estimated row size and the least-recently-USED
  // entries fall off when the budget overflows.
  private val cache = mutable.LinkedHashMap.empty[String, Entry]
  private var totalBytes = 0L
  private var hitCount = 0L
  @volatile private var budget: Long = 64L << 20 // 64 MB of sketch results
  // SetMemoization (management/SetMemoization.java): a disabled cache
  // passes collects straight through WITHOUT recording — existing
  // entries are kept (and still served once re-enabled) exactly like
  // the reference, which toggles lookup, not retention.
  @volatile private var enabled = true

  def fingerprint(df: DataFrame): String =
    df.queryExecution.optimizedPlan.canonicalized.toString

  // sampled estimate (first 32 rows extrapolated): JVM object overheads
  // approximated, not measured — the budget bounds growth, it is not an
  // accounting ledger
  private def rowBytes(r: org.apache.spark.sql.Row): Long = {
    var b = 16L; var i = 0
    while (i < r.length) {
      b += (r.get(i) match {
        case null => 4L
        case s: String => 40L + 2L * s.length
        case a: Array[Byte] => 24L + a.length
        case q: scala.collection.Seq[_] => 24L + 16L * q.length
        case _ => 16L
      })
      i += 1
    }
    b
  }
  private def estimateBytes(rows: Array[org.apache.spark.sql.Row]): Long =
    if (rows.isEmpty) 64L
    else {
      val sample = rows.take(32)
      64L + sample.map(rowBytes).sum / sample.length * rows.length
    }

  def collectMemoized(df: DataFrame): Array[org.apache.spark.sql.Row] = {
    if (!enabled) return df.collect()
    val key = fingerprint(df)
    cache.synchronized {
      cache.remove(key) match {
        case Some(e) => // LRU touch: reinsert at the tail
          cache.update(key, e); hitCount += 1; return e.rows
        case None => ()
      }
    }
    val r = df.collect() // OUTSIDE the lock: a slow job must not block hits
    val bytes = estimateBytes(r)
    cache.synchronized {
      // an entry alone bigger than the whole budget is not cached at
      // all (it would evict everything and then be evicted next); a
      // racing identical collect keeps the first entry
      if (bytes <= budget && !cache.contains(key)) {
        cache.update(key, Entry(r, bytes))
        totalBytes += bytes
        while (totalBytes > budget && cache.size > 1) {
          val (k0, e0) = cache.head
          cache.remove(k0); totalBytes -= e0.bytes
        }
      }
    }
    r
  }

  def setEnabled(on: Boolean): Unit = enabled = on
  def isEnabled: Boolean = enabled
  /** Retention budget in bytes (estimated); shrinking it evicts LRU-first. */
  def setBudget(bytes: Long): Unit = cache.synchronized {
    budget = math.max(bytes, 1L)
    while (totalBytes > budget && cache.nonEmpty) {
      val (k0, e0) = cache.head
      cache.remove(k0); totalBytes -= e0.bytes
    }
  }
  def budgetBytes: Long = budget
  def usedBytes: Long = cache.synchronized(totalBytes)

  def clear(): Unit = cache.synchronized {
    cache.clear(); totalBytes = 0L; hitCount = 0L
  }
  def size: Int = cache.synchronized(cache.size)
  /** Cache hits since the last clear — gesture-replay observability
    * (MemoizedResults records the same). */
  def hits: Long = cache.synchronized(hitCount)
}
