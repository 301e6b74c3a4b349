package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** k-function MinHash signature of a token array's n-gram shingle set,
  * computed row-locally in one pass.
  *
  * The relational formulation (explode shingles → groupBy doc → k min
  * aggregates) shuffles every shingle of every document just to reduce
  * them back to k longs per doc. Since the reduction is per-row, it
  * needs no shuffle at all: this expression walks the token array once,
  * hashes each shingle, and folds k seeded remixes into k running
  * minima — O(shingles·k) local work, zero exchange. At 100 TB this
  * turns the index-build stage from a full-corpus shuffle into a narrow
  * map.
  *
  * Hash: base = Murmur-style avalanche of the shingle string's bytes;
  * variant i = avalanche(base ^ seed_i) — the standard trick giving k
  * effectively-independent hash functions from one string hash.
  */
case class MinHashSig(child: Expression, n: Int, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def avalanche(x0: Long): Long = {
    // xxhash64-style finalizer (public mixing constants)
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val m = words.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Long])
    // Each word's bytes are hashed exactly once (a word participates in n
    // shingles — re-hashing per shingle plus the String materialization
    // was ~10× the arithmetic cost); a shingle hash is then an
    // avalanche-fold of its n word hashes, order-sensitive.
    val wh = new Array[Long](m)
    var wi = 0
    while (wi < m) {
      val bytes = words.getUTF8String(wi).getBytes
      var h = 0xcbf29ce484222325L // FNV-1a over bytes
      var bi = 0
      while (bi < bytes.length) { h = (h ^ bytes(bi)) * 0x100000001b3L; bi += 1 }
      wh(wi) = avalanche(h)
      wi += 1
    }
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i <= m - n) {
      // fold from a seed so EVERY step is avalanche(prev)^word — a plain
      // first-step XOR would be symmetric in the first two words and
      // collide transposed bigrams
      var base = 0x9e3779b97f4a7c15L
      var j = 0
      while (j < n) { base = avalanche(base ^ wh(i + j)); j += 1 }
      var f = 0
      while (f < k) {
        val h = avalanche(base ^ (0x9e3779b97f4a7c15L * (f + 1)))
        if (h < mins(f)) mins(f) = h
        f += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sorted distinct n-gram shingle-hash set of a token array, computed
  * row-locally (same word-hash + fold scheme as MinHashSig, so the two
  * expressions see the same shingle universe). Lets exact-Jaccard
  * verification run as `array_intersect` on two per-doc arrays — one
  * narrow map per doc instead of an explode + distinct + per-shingle
  * join dataflow.
  */
case class ShingleHashSet(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def avalanche(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val m = words.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Long])
    val wh = new Array[Long](m)
    var wi = 0
    while (wi < m) {
      val bytes = words.getUTF8String(wi).getBytes
      var h = 0xcbf29ce484222325L
      var bi = 0
      while (bi < bytes.length) { h = (h ^ bytes(bi)) * 0x100000001b3L; bi += 1 }
      wh(wi) = avalanche(h)
      wi += 1
    }
    val out = new Array[Long](m - n + 1)
    var i = 0
    while (i <= m - n) {
      // seeded fold — see MinHashSig: keeps word order significant
      var base = 0x9e3779b97f4a7c15L
      var j = 0
      while (j < n) { base = avalanche(base ^ wh(i + j)); j += 1 }
      out(i) = base
      i += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedup of the sorted array
    var w = 0
    var r = 1
    while (r < out.length) {
      if (out(r) != out(w)) { w += 1; out(w) = out(r) }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w + 1))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** |A ∩ B| of two SORTED deduped long arrays (ShingleHashSet output) by
  * two-pointer merge: O(|A|+|B|), zero allocation. Spark's
  * `array_intersect` hash-builds a set per row pair — on the exact-
  * verify hot path of the LSH dedups (every candidate pair) the merge
  * is both cheaper and allocation-free. Inputs MUST be sorted sets;
  * ShingleHashSet guarantees it by construction.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  // type validation matters: this is registered as the SQL function
  // sorted_intersect_size, and without it an array<int> argument
  // passes analysis but getLong() then reads 8 bytes per 4-byte
  // element in codegen — silent garbage instead of an analysis error
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def isLongArray(t: DataType): Boolean = t match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "sorted_intersect_size expects two array<bigint> arguments " +
          s"(sorted sets), got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  // this runs once per CANDIDATE PAIR (the verify join's volume at
  // corpus scale), so it gets a primitive codegen loop like FloatVecDot
  // rather than the single-call CodegenFallback of the per-DOC kernels
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("ia"); val j = ctx.freshName("jb")
      val c = ctx.freshName("cnt")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("xv"); val y = ctx.freshName("yv")
      s"""
         |int $i = 0, $j = 0, $c = 0;
         |int $na = $a.numElements(), $nb = $b.numElements();
         |while ($i < $na && $j < $nb) {
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x == $y) { $c++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MinHashExpression {
  import org.apache.spark.sql.graftshim.{exprToColumn, columnToExpr}
  def minhash_sig(words: Column, n: Int, k: Int): Column =
    exprToColumn(MinHashSig(columnToExpr(words), n, k))
  def shingle_set(words: Column, n: Int): Column =
    exprToColumn(ShingleHashSet(columnToExpr(words), n))
  def sorted_intersect_size(a: Column, b: Column): Column =
    exprToColumn(SortedIntersectSize(columnToExpr(a), columnToExpr(b)))
}
