package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Bounded posting-list collector for inverted-index candidate
  * generation (fuzzy dedup): per key, collect at most `cap + 1`
  * (id, len) entries and STOP GROWING past that — an over-full buffer
  * only ever means "this key is hot, drop it", so nothing beyond
  * cap + 1 elements is needed. This is the same bounded-state monoid
  * discipline as hillview's mergeable sketches (platform/src/main/java/
  * org/hillview/sketches/results/MonoidTopK.java): update and merge
  * both cap the buffer, so map-side partials ship O(cap) bytes per key
  * no matter how pathological the key ("the the the ..." shared by
  * millions of docs), where a plain `collect_list` + size filter would
  * materialize the full multi-million-entry list before dropping it.
  *
  * Compared to the two-pass df-cut used by the string-shingle path
  * (count per key → hot list → left-anti join: two shuffles over the
  * full index), this applies the cut inside the SAME single
  * aggregation shuffle.
  *
  * Determinism: a buffer that never exceeds the cap holds exactly its
  * key's complete posting list (sorted by id in eval()); an over-cap
  * buffer's contents depend on merge order, but callers only consume
  * its SIZE (> cap ⇒ drop the key), which is order-independent.
  *
  * Implemented as a native [[TypedImperativeAggregate]] (the same shape
  * as Spark's own collect_list) rather than a typed Dataset
  * `Aggregator`: the typed path pays a row↔tuple conversion per input
  * row plus a Kryo round-trip per partial buffer, measured ~2× on this
  * aggregation at sf0.1.
  */
object BoundedCollect {

  /** `bounded_postings(id, len, cap)` as a Column aggregate; result is
    * array<struct<doc_id: long, len: int>>, sorted by (len, doc_id)
    * when the list is complete (size ≤ cap) — length order lets the
    * pair generator apply the length prefilter as a one-sided bound
    * inside the lambda — arbitrary (cap+1)-sized otherwise.
    */
  def boundedPostings(id: Column, len: Column, cap: Int): Column =
    graftshim.exprToColumn(
      BoundedPostingsAgg(
        graftshim.columnToExpr(id), graftshim.columnToExpr(len), cap)
        .toAggregateExpression())

  /** `posting_pairs(ds, maxDist)` — the row-local length-prefiltered
    * pair generator over a sorted posting list (see [[PostingPairs]]). */
  def postingPairs(ds: Column, maxDist: Int): Column =
    graftshim.exprToColumn(PostingPairs(graftshim.columnToExpr(ds), maxDist))
}

case class BoundedPostingsAgg(
    left: Expression,
    right: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Long, Int)]]
  with BinaryLike[Expression] {

  private val limit = cap + 1

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Long, Int)] =
    mutable.ArrayBuffer.empty

  override def update(
      buf: mutable.ArrayBuffer[(Long, Int)],
      input: InternalRow): mutable.ArrayBuffer[(Long, Int)] = {
    if (buf.size < limit) {
      val id = left.eval(input)
      val ln = right.eval(input)
      if (id != null && ln != null) {
        buf += ((id.asInstanceOf[Long], ln.asInstanceOf[Int]))
      }
    }
    buf
  }

  override def merge(
      a: mutable.ArrayBuffer[(Long, Int)],
      b: mutable.ArrayBuffer[(Long, Int)]): mutable.ArrayBuffer[(Long, Int)] = {
    val room = limit - a.size
    if (room > 0) a ++= b.take(room)
    a
  }

  override def eval(buf: mutable.ArrayBuffer[(Long, Int)]): Any = {
    val xs = if (buf.size >= limit) buf
      else buf.sortBy { case (id, ln) => (ln, id) }
    new GenericArrayData(xs.map { case (id, ln) =>
      InternalRow(id, ln)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.ArrayBuffer[(Long, Int)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 12)
    bb.putInt(buf.size)
    buf.foreach { case (id, ln) => bb.putLong(id); bb.putInt(ln) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Long, Int)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new mutable.ArrayBuffer[(Long, Int)](n)
    var i = 0
    while (i < n) { buf += ((bb.getLong, bb.getInt)); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("doc_id", LongType), StructField("len", IntegerType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_postings"

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedPostingsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedPostingsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedPostingsAgg =
    copy(left = newLeft, right = newRight)
}

/** Length-prefiltered candidate pairs of one posting list (the row-local
  * kernel behind the fuzzy-dedup pair generation). Input is a
  * [[BoundedPostingsAgg]] list — array<struct<doc_id, len>> sorted by
  * (len, doc_id) — output is array<struct<id_a, id_b>> with id_a <
  * id_b, one entry per (i, j) with i < j and len_j − len_i ≤ maxDist
  * (|len| difference > maxDist already implies edit distance > maxDist,
  * so these pairs are exactly the ones the interpreted
  * flatten(transform(filter(slice(...)))) lambda forest emitted — in
  * the same order). Two wins over the lambda form it replaces: the
  * loop is ONE compiled walk instead of per-element interpreted
  * Catalyst lambdas allocating a sub-array per anchor (measured: the
  * pair-generation stage was ~0.5 s of task CPU at sf0.1), and the
  * (len, doc_id) sort order turns the length filter into an EARLY
  * BREAK — the lambda filter scanned every suffix element even after
  * the bound failed, and at corpus scale a cap-sized hot list makes
  * that O(cap²) scans vs the break's output-sized work.
  */
case class PostingPairs(child: Expression, maxDist: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id_a", LongType, nullable = false),
      StructField("id_b", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(Array(
        StructField(_, LongType, _, _), StructField(_, IntegerType, _, _))), _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "posting_pairs expects array<struct<bigint,int>> (a sorted " +
            s"posting list), got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val ds = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = ds.numElements()
    val ids = new Array[Long](n)
    val lens = new Array[Int](n)
    var i = 0
    while (i < n) {
      val r = ds.getStruct(i, 2)
      ids(i) = r.getLong(0); lens(i) = r.getInt(1)
      i += 1
    }
    val out = new mutable.ArrayBuffer[InternalRow]()
    i = 0
    while (i < n) {
      var j = i + 1
      // lens is non-decreasing (collector sorts by (len, doc_id)), so
      // the first out-of-band j ends the row — same surviving set as
      // the full-suffix filter, without scanning it
      while (j < n && lens(j) - lens(i) <= maxDist) {
        val a = ids(i); val b = ids(j)
        out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](math.min(a, b), math.max(a, b)))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def prettyName: String = "posting_pairs"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
