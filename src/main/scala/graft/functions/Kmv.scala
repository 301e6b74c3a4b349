package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values / bottom-k) sketch over 60-bit hashes — the
  * mergeable distinct-value signature behind cross-source Jaccard
  * estimation (Bar-Yossef et al. 2002; Beyer et al. 2007 for the
  * union/intersection estimator). Buffer = the k SMALLEST DISTINCT
  * hash values seen, kept in a capped sorted set, so partial
  * aggregation ships at most k longs per (partition, key) and merges
  * are exact unions — any shard order yields the identical signature
  * (the storable-state discipline: lm_model_incremental for counts,
  * this for distinct sketches).
  *
  * Determinism: the "sample" is selected by hash VALUE, not by RNG or
  * arrival order — engine-portable and SQL-replayable (the md5-60bit
  * house hash), so signature-derived estimates are value-oracled.
  */
object Kmv {

  final class KmvBuf(val s: mutable.TreeSet[Long]) extends Serializable

  class KmvAgg(k: Int) extends Aggregator[(String, Long), KmvBuf, Seq[Long]] {
    override def zero: KmvBuf = new KmvBuf(mutable.TreeSet.empty[Long])

    private def add(b: KmvBuf, h: Long): Unit =
      if (b.s.size < k) b.s += h
      else if (h < b.s.last && !b.s.contains(h)) { b.s -= b.s.last; b.s += h }

    override def reduce(b: KmvBuf, v: (String, Long)): KmvBuf = {
      add(b, v._2); b
    }
    override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = {
      b.s.foreach(add(a, _)); a
    }
    override def finish(b: KmvBuf): Seq[Long] = b.s.toSeq // ascending
    override def bufferEncoder: Encoder[KmvBuf] = Encoders.kryo[KmvBuf]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** df(keyCol: string, hashCol: long) → (key, sig: array<long> asc):
    * the bottom-k distinct-hash signature per key, one pass, map-side
    * partial heaps — never a per-key distinct or sort of the data.
    */
  def kmvPerStrKey(df: DataFrame, keyCol: String, hashCol: String,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"), col(hashCol).cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .agg(new KmvAgg(k).toColumn.name("sig"))
      .toDF("key", "sig")
  }
}
