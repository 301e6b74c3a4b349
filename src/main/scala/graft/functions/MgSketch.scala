package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import scala.collection.mutable

/** Storable Misra-Gries heavy-hitter sketches as binary columns — the
  * second member of the persistable-sketch surface next to
  * [[HllSketch]] (reference: MGFreqKSketch; merge per Agarwal et al.
  * "Mergeable Summaries"). Build a ≤cap-entry summary per source or
  * partition in one scan, persist the kilobyte blob, and combine any
  * subset later with `mg_merge` — the merged summary keeps the MG
  * guarantee (every key with true count > N/(cap+1) over the UNION is
  * present, counts are lower bounds with deficit ≤ N/(cap+1)), so a
  * candidates → exact-verify pass on top of merged sketches yields
  * exact heavy hitters without ever rescanning the full corpus history.
  *
  * Unlike HLL registers, an MG summary depends on processing order, so
  * sketch BYTES are not canonical — only the guarantee is. Queries must
  * consume candidates via exact verification (the heavy_mg pattern),
  * never the raw counts.
  *
  * Blob layout: [n:int][len:int key-utf8 count:long]*n.
  */
object MgSketch {
  def mg_build(c: Column, cap: Int): Column =
    graftshim.exprToColumn(
      MgBuildAgg(graftshim.columnToExpr(c), cap).toAggregateExpression())

  def mg_merge(c: Column, cap: Int): Column =
    graftshim.exprToColumn(
      MgMergeAgg(graftshim.columnToExpr(c), cap).toAggregateExpression())

  def mg_entries(c: Column): Column =
    graftshim.exprToColumn(MgEntries(graftshim.columnToExpr(c)))

  private[functions] def serialize(m: mutable.HashMap[String, Long]): Array[Byte] = {
    val keys = m.iterator.map { case (k, c) =>
      (k.getBytes(StandardCharsets.UTF_8), c)
    }.toArray
    val bb = java.nio.ByteBuffer.allocate(
      4 + keys.map(_._1.length + 12).sum)
    bb.putInt(keys.length)
    keys.foreach { case (k, c) => bb.putInt(k.length); bb.put(k); bb.putLong(c) }
    bb.array()
  }

  private[graft] def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val k = new Array[Byte](len)
      bb.get(k)
      m.update(new String(k, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    m
  }

  /** Streaming MG update (bounded map, decrement-all on overflow). */
  private[functions] def add(m: mutable.HashMap[String, Long], v: String, cap: Int): Unit =
    m.get(v) match {
      case Some(c)              => m.update(v, c + 1L)
      case None if m.size < cap => m.update(v, 1L)
      case None =>
        val it = m.iterator.toArray
        it.foreach { case (key, c) =>
          if (c <= 1L) m.remove(key) else m.update(key, c - 1L)
        }
    }

  /** Mergeable-summaries combine: add counts, subtract the (cap+1)-th
    * largest, keep positives.
    */
  private[functions] def combine(
      a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long],
      cap: Int): mutable.HashMap[String, Long] = {
    b.foreach { case (key, c) => a.update(key, a.getOrElse(key, 0L) + c) }
    if (a.size > cap) {
      val cut = a.values.toArray.sorted(Ordering[Long].reverse).apply(cap)
      val dead = mutable.ArrayBuffer[String]()
      a.foreach { case (key, c) =>
        if (c - cut <= 0L) dead += key else a.update(key, c - cut)
      }
      dead.foreach(a.remove)
    }
    a
  }
}

/** `mg_build(key, cap)`: aggregate string keys into a ≤cap-entry MG
  * summary blob.
  */
case class MgBuildAgg(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(cap >= 1, s"mg cap=$cap must be positive")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) MgSketch.add(buf, v.toString, cap)
    buf
  }

  override def merge(
      a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] =
    MgSketch.combine(a, b, cap)

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    MgSketch.serialize(buf)
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] =
    MgSketch.serialize(buf)
  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] =
    MgSketch.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "mg_build"

  override def withNewMutableAggBufferOffset(newOffset: Int): MgBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MgBuildAgg =
    copy(child = newChild)
}

/** `mg_merge(sketch, cap)`: combine already-built MG summary blobs. */
case class MgMergeAgg(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else MgSketch.combine(buf, MgSketch.deserialize(v.asInstanceOf[Array[Byte]]), cap)
  }

  override def merge(
      a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] =
    MgSketch.combine(a, b, cap)

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    MgSketch.serialize(buf)
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] =
    MgSketch.serialize(buf)
  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] =
    MgSketch.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "mg_merge"

  override def withNewMutableAggBufferOffset(newOffset: Int): MgMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MgMergeAgg =
    copy(child = newChild)
}

/** `mg_entries(sketch)` → array<struct<key string, lower_count long>>,
  * sorted by key for a stable row order. CodegenFallback: runs on
  * sketch-sized frames only.
  */
case class MgEntries(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", StringType), StructField("lower_count", LongType))),
    containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val m = MgSketch.deserialize(v.asInstanceOf[Array[Byte]])
    new GenericArrayData(
      m.toArray.sortBy(_._1).map { case (k, c) =>
        InternalRow(UTF8String.fromString(k), c)
      }.toArray[Any])
  }

  override def prettyName: String = "mg_entries"
  override protected def withNewChildInternal(newChild: Expression): MgEntries =
    copy(child = newChild)
}
