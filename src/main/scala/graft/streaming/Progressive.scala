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
  private val cache = mutable.Map.empty[String, Array[org.apache.spark.sql.Row]]

  def fingerprint(df: DataFrame): String =
    df.queryExecution.optimizedPlan.canonicalized.toString

  def collectMemoized(df: DataFrame): Array[org.apache.spark.sql.Row] =
    cache.synchronized {
      cache.getOrElseUpdate(fingerprint(df), df.collect())
    }

  def clear(): Unit = cache.synchronized(cache.clear())
  def size: Int = cache.synchronized(cache.size)
}
