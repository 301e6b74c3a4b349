package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Misra-Gries heavy-hitter summary as a Spark typed Aggregator —
  * re-expression of hillview's MGFreqKSketch
  * (sketches/MGFreqKSketch.java:49-175; merge at 110-125, Agarwal et al.
  * "Mergeable Summaries", TODS). The buffer is a bounded k-entry map;
  * `reduce` is the streaming MG update, `merge` is the mergeable-summary
  * combine (add counts, then subtract the (k+1)-th largest and drop
  * non-positives). Bounded state per partition + commutative merge =
  * exactly Spark's partial/final aggregation contract, so this scales to
  * any number of executors with O(k) driver result.
  */
object MisraGries {

  final case class MGBuffer(counts: Map[String, Long])

  class MGAggregator(k: Int) extends Aggregator[String, MGBuffer, Map[String, Long]] {
    override def zero: MGBuffer = MGBuffer(Map.empty)

    override def reduce(b: MGBuffer, v: String): MGBuffer = {
      val m = mutable.Map[String, Long](b.counts.toSeq: _*)
      if (m.contains(v)) m(v) += 1L
      else if (m.size < k) m(v) = 1L
      else {
        // decrement-all step; drop zeros
        val dead = mutable.ArrayBuffer[String]()
        m.keys.foreach { key =>
          m(key) -= 1L
          if (m(key) <= 0L) dead += key
        }
        dead.foreach(m.remove)
      }
      MGBuffer(m.toMap)
    }

    override def merge(a: MGBuffer, b: MGBuffer): MGBuffer = {
      val m = mutable.Map[String, Long](a.counts.toSeq: _*)
      b.counts.foreach { case (key, c) => m(key) = m.getOrElse(key, 0L) + c }
      if (m.size > k) {
        // subtract the (k+1)-th largest count from all, keep positives
        val cut = m.values.toSeq.sorted(Ordering[Long].reverse)(k)
        val kept = m.collect { case (key, c) if c - cut > 0 => key -> (c - cut) }
        MGBuffer(kept.toMap)
      } else MGBuffer(m.toMap)
    }

    override def finish(r: MGBuffer): Map[String, Long] = r.counts
    override def bufferEncoder: Encoder[MGBuffer] = Encoders.product[MGBuffer]
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Run MG over a string key column; returns candidate keys (≤ k). */
  def run(df: DataFrame, keyCol: String, k: Int): Seq[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new MGAggregator(k).toColumn
    df.select(keyCol).as[String].select(agg).head().keys.toSeq
  }
}
