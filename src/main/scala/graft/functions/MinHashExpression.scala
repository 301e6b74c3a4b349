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
    val mins = Array.fill(k)(Long.MaxValue)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= m - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words.getUTF8String(i + j).toString)
        j += 1
      }
      val s = sb.toString
      var base = 0xcbf29ce484222325L // FNV offset as string seed
      var c = 0
      while (c < s.length) { base = (base ^ s.charAt(c)) * 0x100000001b3L; c += 1 }
      base = avalanche(base)
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

object MinHashExpression {
  import org.apache.spark.sql.graftshim.{exprToColumn, columnToExpr}
  def minhash_sig(words: Column, n: Int, k: Int): Column =
    exprToColumn(MinHashSig(columnToExpr(words), n, k))
}
