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
    while (start < n) {
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

object SimHashExpression {
  import org.apache.spark.sql.graftshim.{exprToColumn => column, columnToExpr => expression}
  def simhash60(text: Column): Column = column(SimHash60(expression(text)))
}
