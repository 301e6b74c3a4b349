package graft.engine

import graft.operators.NextK
import graft.streaming.Memo
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import scala.collection.mutable

/** The interactive target/session layer — the reference's actual product
  * shape (web/.../RpcTarget.java:431-450, TableTarget.java:78-746,
  * InitialObjectTarget): every RPC target is a registered object holding
  * a dataset; each user gesture either
  *   (a) runs a *map* and registers the result as a child target
  *       (filter / project / new column / set op), or
  *   (b) runs a *sketch* over the target and returns a bounded result,
  *       served from the memoization cache when the identical gesture
  *       replays (HillviewServer.java:105-120, MemoizedResults.java).
  *
  * Spark translation: a target = an id + a lazy DataFrame + lineage
  * (parent id and the gesture string that produced it). Maps stay lazy —
  * registering a child costs nothing; sketches collect through
  * [[Memo]], so gesture replay is a cache hit keyed by the canonicalized
  * optimized plan (stronger than the reference's operation-bytes key:
  * two textually different but plan-equal gestures share an entry).
  */
class TargetRegistry(val spark: SparkSession) {

  final case class Target(id: String, df: DataFrame,
      parent: Option[String], gesture: String)

  private val targets = mutable.Map.empty[String, Target]
  private var nextId = 0

  private def register(df: DataFrame, parent: Option[String], gesture: String): Target =
    synchronized {
      val t = Target(s"t$nextId", df, parent, gesture)
      nextId += 1
      targets.update(t.id, t)
      t
    }

  def get(id: String): Target = synchronized(targets(id))
  def size: Int = synchronized(targets.size)

  /** Gesture chain from the root load to this target (RpcTarget ids let
    * the UI reconstruct any view; this is that lineage, newest last).
    */
  def lineage(id: String): Seq[String] = {
    val t = get(id)
    t.parent.map(lineage).getOrElse(Seq.empty) :+ t.gesture
  }

  // ── root targets (InitialObjectTarget.loadTable → TableTarget) ──────
  def load(name: String, df: DataFrame): Target =
    register(df, None, s"load:$name")

  def loadTable(dir: String, table: String): Target =
    load(table, Tables.table(spark, dir, table))

  // ── map gestures → child targets (FilterMap, ProjectMap, …) ─────────
  def filter(id: String, pred: Column): Target =
    register(get(id).df.filter(pred), Some(id), s"filter:$pred")

  def project(id: String, cols: Seq[String]): Target =
    register(get(id).df.select(cols.map(org.apache.spark.sql.functions.col): _*),
      Some(id), s"project:${cols.mkString(",")}")

  def withColumn(id: String, name: String, c: Column): Target =
    register(get(id).df.withColumn(name, c), Some(id), s"col:$name=$c")

  // ── sketch gestures → memoized bounded results (runSketch) ──────────
  /** Generic sketch: any bounded-result aggregation of the target's
    * frame, collected through the memo cache.
    */
  def sketch(id: String)(agg: DataFrame => DataFrame): Array[Row] =
    Memo.collectMemoized(agg(get(id).df))

  /** Entry-point B's gesture (TableTarget.getNextK). */
  def nextK(id: String, order: Seq[NextK.Order], k: Int,
      pivot: Option[Seq[Any]] = None,
      aggs: Seq[NextK.AggSpec] = Seq.empty): Array[Row] =
    sketch(id)(df => NextK.nextK(df, order, k, pivot, aggs))

  /** Entry-point C's first phase (getDataQuantiles → bucket bounds). */
  def dataRange(id: String, column: String): Array[Row] =
    sketch(id)(df => graft.operators.Stats.dataRange(df, column))

  /** Entry-point C's second phase (histogramAndCDF). */
  def histogramCdf(id: String, bucket: Column): Array[Row] =
    sketch(id)(df => graft.operators.Histograms.histogramWithCdf(df, bucket))

  def summary(id: String): Array[Row] =
    sketch(id)(df => graft.operators.Stats.rowCount(df))
}
