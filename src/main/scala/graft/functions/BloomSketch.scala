package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, DoubleType}

/** Persistable mergeable BLOOM FILTER — the membership member of the
  * storable-sketch family (HLL: distinct counts; MG: heavy hitters;
  * KLL: quantiles; theta: set cardinality algebra; Bloom: "have we
  * seen exactly this value?"). The decontamination/dedup question the
  * others cannot answer from stored state: theta estimates |A∩B|, but
  * only a Bloom answers per-VALUE membership without rescanning A —
  * the broadcast-Bloom decontamination pass
  * ([[graft.text.TextAnalysis]] contaminationBloom) builds one ad hoc;
  * this makes the same structure a STORED, mergeable blob, so the eval
  * set's filter is built once and shipped to every future crawl.
  *
  * Blob layout: [mBits:int][k:int][bitset bytes, mBits/8]. Merge is
  * bitwise OR — a commutative idempotent monoid, so partition-merge
  * equals the whole-corpus build BIT FOR BIT and re-merging shards is
  * harmless. Hashes: double hashing h1 + i·h2 (Kirsch-Mitzenmacher)
  * over xxhash64 seeds 41/43 — deterministic, no RNG state.
  * One-sided error: membership NEVER false-negative; false-positive
  * rate ≈ (1 − e^(−k·n/m))^k, property-gated.
  */
object BloomSketch {
  val DefaultBits = 1 << 16 // 8 KiB blob
  val DefaultK = 6

  def bloom_build(c: Column, mBits: Int = DefaultBits, k: Int = DefaultK): Column =
    graftshim.exprToColumn(
      BloomBuildAgg(graftshim.columnToExpr(c), mBits, k).toAggregateExpression())

  def bloom_merge(c: Column): Column =
    graftshim.exprToColumn(
      BloomMergeAgg(graftshim.columnToExpr(c)).toAggregateExpression())

  def bloom_might_contain(blob: Column, v: Column): Column =
    graftshim.exprToColumn(BloomMightContain(
      graftshim.columnToExpr(blob), graftshim.columnToExpr(v)))

  def bloom_fill(blob: Column): Column =
    graftshim.exprToColumn(BloomFill(graftshim.columnToExpr(blob)))

  // ── internals ──────────────────────────────────────────────────────

  private[graft] def empty(mBits: Int, k: Int): Array[Byte] = {
    require(mBits % 8 == 0 && mBits > 0, s"mBits must be a positive multiple of 8")
    require(k > 0, "k must be positive")
    val b = new Array[Byte](8 + mBits / 8)
    val bb = java.nio.ByteBuffer.wrap(b)
    bb.putInt(mBits).putInt(k)
    b
  }

  private[graft] def mBitsOf(b: Array[Byte]): Int =
    java.nio.ByteBuffer.wrap(b).getInt(0)
  private[graft] def kOf(b: Array[Byte]): Int =
    java.nio.ByteBuffer.wrap(b).getInt(4)

  /** Kirsch-Mitzenmacher positions from the TWO INDEPENDENT 32-bit
    * halves of the 64-bit hash: with a power-of-two m, (h1 + i·h2)
    * mod m reads only low bits — deriving h2 FROM h1 (the classic
    * shortcut h2 = c·h1 + 1) collapses the signature universe to
    * m distinct signatures and was measured at 3.7% FP where theory
    * says 0.002%; independent halves restore the 2⁶⁴ universe. */
  @inline private def pos(hash: Long, i: Int, m: Int): Int = {
    val h1 = hash & 0xffffffffL
    val h2 = (hash >>> 32) | 1L // odd ⇒ full-period step
    java.lang.Long.remainderUnsigned(h1 + i * h2, m).toInt
  }

  /** Set the k double-hashing bit positions of `hash` in place. */
  private[graft] def addHash(blob: Array[Byte], hash: Long): Unit = {
    val m = mBitsOf(blob); val k = kOf(blob)
    var i = 0
    while (i < k) {
      val bit = pos(hash, i, m)
      blob(8 + (bit >> 3)) = (blob(8 + (bit >> 3)) | (1 << (bit & 7))).toByte
      i += 1
    }
  }

  private[graft] def containsHash(blob: Array[Byte], hash: Long): Boolean = {
    val m = mBitsOf(blob); val k = kOf(blob)
    var i = 0
    while (i < k) {
      val bit = pos(hash, i, m)
      if ((blob(8 + (bit >> 3)) & (1 << (bit & 7))) == 0) return false
      i += 1
    }
    true
  }

  private[graft] def orInto(a: Array[Byte], b: Array[Byte]): Unit = {
    require(mBitsOf(a) == mBitsOf(b) && kOf(a) == kOf(b),
      s"cannot merge blooms with different geometry " +
        s"(${mBitsOf(a)}/${kOf(a)} vs ${mBitsOf(b)}/${kOf(b)})")
    var i = 8
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
  }

  private[graft] def valueHash(v: Any, dt: DataType): Long =
    XxHash64Function.hash(v, dt, 41L)

  /** Fraction of set bits — the load factor the FP formula reads. */
  private[graft] def fill(blob: Array[Byte]): Double = {
    var set = 0L
    var i = 8
    while (i < blob.length) {
      set += java.lang.Integer.bitCount(blob(i) & 0xff); i += 1
    }
    set.toDouble / mBitsOf(blob)
  }
}

/** `bloom_build(value[, mBits, k])`: aggregate rows into a Bloom blob. */
case class BloomBuildAgg(
    child: Expression, mBits: Int, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Byte] =
    BloomSketch.empty(mBits, k)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null)
      BloomSketch.addHash(buf, BloomSketch.valueHash(v, child.dataType))
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    BloomSketch.orInto(a, b); a
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_build"
  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBuildAgg =
    copy(child = newChild)
}

/** `bloom_merge(blob)`: OR already-built blobs (re-merge of stored
  * shards). Geometry is adopted from the first folded blob. */
case class BloomMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  // empty sentinel (length 0) adopts the first blob's geometry — the
  // same untouched-buffer discipline as ThetaMergeAgg's UntouchedK
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  private def fold(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (b.isEmpty) a
    else if (a.isEmpty) b.clone()
    else { BloomSketch.orInto(a, b); a }

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf else fold(buf, v.asInstanceOf[Array[Byte]])
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = fold(a, b)

  override def eval(buf: Array[Byte]): Any =
    if (buf.isEmpty) BloomSketch.empty(BloomSketch.DefaultBits, BloomSketch.DefaultK)
    else buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_merge"
  override def withNewMutableAggBufferOffset(newOffset: Int): BloomMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomMergeAgg =
    copy(child = newChild)
}

/** `bloom_might_contain(blob, value)`: one-sided membership. Evaluated
  * per probe row against a (usually broadcast) blob column. */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(blob: Any, v: Any): Any =
    BloomSketch.containsHash(blob.asInstanceOf[Array[Byte]],
      BloomSketch.valueHash(v, right.dataType))
  override def prettyName: String = "bloom_might_contain"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

/** `bloom_fill(blob)`: set-bit fraction (observability: the load the
  * FP formula reads). */
case class BloomFill(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    BloomSketch.fill(v.asInstanceOf[Array[Byte]])
  override def prettyName: String = "bloom_fill"
  override protected def withNewChildInternal(newChild: Expression): BloomFill =
    copy(child = newChild)
}
