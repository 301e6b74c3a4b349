package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit SimHash of a whitespace-tokenized string, as one expression.
  *
  * The pure-Column formulation needs 60 interpreted `aggregate()` passes
  * over the token array per row; this expression does one pass per row
  * in plain JVM code (CodegenFallback — a single virtual call per row,
  * with the whole token loop inside). Token hash = first 15 hex chars of
  * md5 parsed as a 60-bit integer, identical to the portable SQL form
  * used elsewhere (see dedup.SimHash.tokenHash).
  */
case class SimHash60(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString.toLowerCase
    val md = java.security.MessageDigest.getInstance("MD5")
    val sums = new Array[Int](60)
    var start = 0
    val n = text.length
    // `start <= n` so a trailing space yields the trailing empty token —
    // split(" ") and DuckDB string_split both keep it
    while (start <= n) {
      var end = text.indexOf(' ', start)
      if (end < 0) end = n
      if (end >= start) { // split(" ") keeps empty tokens; match that
        val tok = text.substring(start, end)
        md.reset()
        val digest = md.digest(tok.getBytes("UTF-8"))
        // first 15 hex chars = high 7.5 bytes → 60 bits
        var h = 0L
        var i = 0
        while (i < 7) { h = (h << 8) | (digest(i) & 0xffL); i += 1 }
        h = (h << 4) | ((digest(7) & 0xf0L) >> 4)
        var j = 0
        while (j < 60) {
          if (((h >> j) & 1L) == 1L) sums(j) += 1 else sums(j) -= 1
          j += 1
        }
      }
      start = end + 1
    }
    var fp = 0L
    var j = 0
    while (j < 60) { if (sums(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All pigeonhole band keys of a 60-bit SimHash fingerprint as one
  * array: the fingerprint is cut into `nChunks` contiguous chunks
  * (first `60 % nChunks` chunks one bit wider) and element i is a
  * 64-bit mix of the i-th `chunksPerKey`-combination's chunk values.
  *
  * One expression replaces a C(nChunks, chunksPerKey)-column projection
  * — at (12, 4) that projection is 495 generated expressions, which
  * overflows Janino's 64 KB method limit and drops the whole stage out
  * of codegen; here the combination loop is plain JVM code per row.
  */
case class SimHashBandKeys(child: Expression, nChunks: Int, chunksPerKey: Int)
    extends UnaryExpression with CodegenFallback {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  private val Bits = 60
  @transient private lazy val widths: Array[Int] = {
    val base = Bits / nChunks; val rem = Bits % nChunks
    Array.tabulate(nChunks)(i => if (i < rem) base + 1 else base)
  }
  @transient private lazy val offsets: Array[Int] = widths.scanLeft(0)(_ + _)
  @transient private lazy val combos: Array[Array[Int]] =
    (0 until nChunks).combinations(chunksPerKey).map(_.toArray).toArray

  private def avalanche(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  override def nullSafeEval(input: Any): Any = {
    val fp = input.asInstanceOf[Long]
    val chunks = new Array[Long](nChunks)
    var i = 0
    while (i < nChunks) {
      chunks(i) = (fp >>> offsets(i)) & ((1L << widths(i)) - 1)
      i += 1
    }
    val out = new Array[Long](combos.length)
    var b = 0
    while (b < combos.length) {
      val c = combos(b)
      var h = 0x9e3779b97f4a7c15L
      var j = 0
      while (j < c.length) { h = avalanche(h ^ chunks(c(j))); j += 1 }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashExpression {
  import org.apache.spark.sql.graftshim.{exprToColumn => column, columnToExpr => expression}
  def simhash60(text: Column): Column = column(SimHash60(expression(text)))
  def bandKeys(fp: Column, nChunks: Int, chunksPerKey: Int): Column =
    column(SimHashBandKeys(expression(fp), nChunks, chunksPerKey))
}
