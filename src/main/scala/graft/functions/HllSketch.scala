package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Persistable, mergeable HyperLogLog sketches as binary columns.
  *
  * The reference's HLogLog (platform/src/main/java/org/hillview/sketches/
  * HLogLog.java) lives only inside one sketch invocation: registers are
  * built per leaf, merged up the dataset tree, and the count is returned —
  * the sketch itself is never a value a user can store. At 100 TB the
  * storable form is the point: build per-partition/per-source register
  * arrays ONCE (one scan), persist them as ordinary binary cells next to
  * the partition metadata, and answer later "distinct across any subset /
  * after any new delta" queries by max-merging kilobyte sketches instead
  * of rescanning the corpus. This is the same partial-aggregate monoid
  * discipline Spark applies within a job, lifted to a cross-job surface.
  *
  * Layout: 2^p byte registers (dense; p ≤ 18 keeps a sketch ≤ 256 KB).
  * Register i holds max(ρ(w)) over hashed values routed to i by their top
  * p hash bits, ρ = leading-zero rank of the remaining 64-p bits. Merge =
  * elementwise max — associative, commutative, idempotent, so partition
  * order and duplicate deltas cannot change the result, and the estimate
  * is fully deterministic for a given input set (xxhash64, seed 42).
  * Estimator: classic HLL alpha correction with the linear-counting
  * small-range branch (Flajolet et al. 2007); rsd ≈ 1.04/√(2^p).
  */
object HllSketch {
  val DefaultP = 12

  def hll_build(c: Column, p: Int = DefaultP): Column =
    graftshim.exprToColumn(
      HllBuildAgg(graftshim.columnToExpr(c), p).toAggregateExpression())

  def hll_merge(c: Column): Column =
    graftshim.exprToColumn(
      HllMergeAgg(graftshim.columnToExpr(c)).toAggregateExpression())

  def hll_estimate(c: Column): Column =
    graftshim.exprToColumn(HllEstimate(graftshim.columnToExpr(c)))

  private[graft] def emptyRegisters(p: Int): Array[Byte] =
    new Array[Byte](1 << p)

  private[graft] def addHash(regs: Array[Byte], hash: Long): Unit = {
    val p = Integer.numberOfTrailingZeros(regs.length)
    val idx = (hash >>> (64 - p)).toInt
    val w = hash << p
    // rank of the first 1-bit in the suffix; all-zero suffix gets the max
    val rank = (if (w == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(w)) + 1
    val r = math.min(rank, 64 - p + 1).toByte
    if (r > regs(idx)) regs(idx) = r
  }

  private[graft] def maxMerge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length,
      s"cannot merge HLL sketches of different precision (${a.length} vs ${b.length} registers)")
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  private[graft] def estimate(regs: Array[Byte]): Double = {
    val m = regs.length
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = regs(i) & 0xff
      sum += java.lang.Math.scalb(1.0, -r) // 2^-r
      if (r == 0) zeros += 1
      i += 1
    }
    val e = alpha * m * m / sum
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
  }
}

/** `hll_build(value, p)`: aggregate rows into a 2^p-register sketch. */
case class HllBuildAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  require(p >= 4 && p <= 18, s"hll precision p=$p outside [4, 18]")

  override def createAggregationBuffer(): Array[Byte] =
    HllSketch.emptyRegisters(p)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      HllSketch.addHash(buf, XxHash64Function.hash(v, child.dataType, 42L))
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    HllSketch.maxMerge(a, b)

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_build"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllBuildAgg =
    copy(child = newChild)
}

/** `hll_merge(sketch)`: max-merge already-built binary sketches. */
case class HllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  // empty sentinel until the first sketch fixes the register count
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val sk = v.asInstanceOf[Array[Byte]]
      if (buf.isEmpty) sk.clone()
      else HllSketch.maxMerge(buf, sk)
    }
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (a.isEmpty) b else if (b.isEmpty) a else HllSketch.maxMerge(a, b)

  override def eval(buf: Array[Byte]): Any =
    if (buf.isEmpty) HllSketch.emptyRegisters(HllSketch.DefaultP) else buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_merge"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllMergeAgg =
    copy(child = newChild)
}

/** `hll_estimate(sketch)`: distinct-count estimate of a binary sketch.
  * CodegenFallback: evaluated on sketch-sized frames (one row per
  * source/partition), never in a corpus-width hot path.
  */
case class HllEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(v: Any): Any =
    HllSketch.estimate(v.asInstanceOf[Array[Byte]])

  override def prettyName: String = "hll_estimate"
  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
}
