package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Per-key top-K as a mergeable bounded-heap Aggregator.
  *
  * The window formulation (`row_number().over(partitionBy(key).orderBy
  * (score))`) shuffles and SORTS every key's full candidate set before
  * discarding all but K. This Aggregator keeps a K-element min-heap per
  * key with map-side partial aggregation: each partition ships at most
  * K candidates per key to the shuffle — the same bounded-state monoid
  * discipline as hillview's per-leaf top-K (sketches/results/
  * IntTreeTopK.java, MonoidTopK.java). At 100 TB the window sorts
  * ~everything; this ships O(keys·K).
  */
object TopKByKey {

  final class HeapBuf(val q: mutable.PriorityQueue[(Double, Long)])
      extends Serializable
  // min-heap by score: head = weakest entry (lowest score, ties: higher id)
  private val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)](t => (-t._1, t._2))

  /** Input rows: (key, score, id) — key ignored inside the aggregator
    * (the groupByKey supplies it).
    */
  class TopKAgg(k: Int)
      extends Aggregator[(Long, Double, Long), HeapBuf, Seq[(Double, Long)]] {
    override def zero: HeapBuf = new HeapBuf(mutable.PriorityQueue.empty(ord))

    private def add(b: HeapBuf, score: Double, id: Long): Unit = {
      if (b.q.size < k) b.q.enqueue((score, id))
      else {
        val worst = b.q.head
        if (score > worst._1 || (score == worst._1 && id < worst._2)) {
          b.q.dequeue(); b.q.enqueue((score, id))
        }
      }
    }

    override def reduce(b: HeapBuf, v: (Long, Double, Long)): HeapBuf = {
      add(b, v._2, v._3); b
    }
    override def merge(a: HeapBuf, b: HeapBuf): HeapBuf = {
      b.q.foreach(t => add(a, t._1, t._2)); a
    }
    /** Descending score, ties by ascending id. */
    override def finish(r: HeapBuf): Seq[(Double, Long)] =
      r.q.toSeq.sortBy(t => (-t._1, t._2))
    override def bufferEncoder: Encoder[HeapBuf] = Encoders.kryo[HeapBuf]
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** String-keyed twin of [[TopKAgg]] (per-source / per-domain
    * capping) — same heap, same tie discipline, delegated. */
  class TopKAggStr(k: Int)
      extends Aggregator[(String, Double, Long), HeapBuf, Seq[(Double, Long)]] {
    private val agg = new TopKAgg(k)
    override def zero: HeapBuf = agg.zero
    override def reduce(b: HeapBuf, v: (String, Double, Long)): HeapBuf =
      agg.reduce(b, (0L, v._2, v._3))
    override def merge(a: HeapBuf, b: HeapBuf): HeapBuf = agg.merge(a, b)
    override def finish(r: HeapBuf): Seq[(Double, Long)] = agg.finish(r)
    override def bufferEncoder: Encoder[HeapBuf] = agg.bufferEncoder
    override def outputEncoder: Encoder[Seq[(Double, Long)]] = agg.outputEncoder
  }

  /** [[topKPerKey]] for string keys: df(keyCol, scoreCol, idCol) →
    * (key, rank, id, score), rank 1-based by (score desc, id asc). */
  def topKPerStrKey(df: DataFrame, keyCol: String, scoreCol: String,
      idCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"), col(scoreCol).cast("double"),
        col(idCol).cast("long"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .agg(new TopKAggStr(k).toColumn.name("topk"))
      .toDF("key", "topk")
      .select(col("key"), posexplode(col("topk")).as(Seq("pos", "entry")))
      .select(col("key"),
        (col("pos") + 1).cast("int").as("rank"),
        col("entry._2").as("id"),
        col("entry._1").as("score"))
  }

  /** df(keyCol, scoreCol, idCol) → (key, rank, id, score): top-K rows
    * per key, rank 1-based by descending score.
    */
  def topKPerKey(df: DataFrame, keyCol: String, scoreCol: String, idCol: String,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long"), col(scoreCol).cast("double"),
        col(idCol).cast("long"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .agg(new TopKAgg(k).toColumn.name("topk"))
      .toDF("key", "topk")
      .select(col("key"), posexplode(col("topk")).as(Seq("pos", "entry")))
      .select(col("key"),
        (col("pos") + 1).cast("int").as("rank"),
        col("entry._2").as("id"),
        col("entry._1").as("score"))
  }
}
