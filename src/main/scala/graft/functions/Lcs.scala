package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Longest-common-subsequence length over two token arrays — the core
  * of ROUGE-L, the near-duplicate metric instruction-tuning pipelines
  * (Self-Instruct / Alpaca) filter new instructions with: a candidate
  * is dropped when its ROUGE-L F1 against any pool instruction exceeds
  * a threshold. Reference scope: hillview has no sequence-similarity
  * operator; this is the training-data layer of the brief.
  *
  * Classic O(n·m) DP with a rolling 1-D row (O(min-side) memory). The
  * right side is expected to be the SHORT pool instruction (≤ a few
  * dozen tokens), so per-pair cost is tokens(left)·tokens(right) with a
  * tiny constant — a narrow map over (candidate × pool) pairs where the
  * pool side broadcasts. Token equality is raw UTF8String byte
  * equality (callers lowercase first), identical to a SQL oracle's
  * string `=`. Result is exact and an integer, so the downstream F1
  * 2·lcs/(n+m) rides the exact 1e-4 grid.
  */
case class LcsTokens(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    if (n == 0 || m == 0) return 0L
    val ys = new Array[UTF8String](m)
    var j = 0
    while (j < m) { ys(j) = y.getUTF8String(j); j += 1 }
    val dp = new Array[Int](m + 1)
    var i = 0
    while (i < n) {
      val xi = x.getUTF8String(i)
      var prevDiag = 0
      var jj = 1
      while (jj <= m) {
        val tmp = dp(jj)
        if (xi != null && xi.equals(ys(jj - 1))) dp(jj) = prevDiag + 1
        else if (dp(jj - 1) > dp(jj)) dp(jj) = dp(jj - 1)
        prevDiag = tmp
        jj += 1
      }
      i += 1
    }
    dp(m).toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val dp = ctx.freshName("dp")
      val ys = ctx.freshName("ys")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val xi = ctx.freshName("xi")
      val prevDiag = ctx.freshName("prevDiag")
      val tmp = ctx.freshName("tmp")
      val u8 = "org.apache.spark.unsafe.types.UTF8String"
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |${ev.value} = 0L;
         |if ($n > 0 && $m > 0) {
         |  $u8[] $ys = new $u8[$m];
         |  for (int $j = 0; $j < $m; $j++) { $ys[$j] = $b.getUTF8String($j); }
         |  int[] $dp = new int[$m + 1];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $u8 $xi = $a.getUTF8String($i);
         |    int $prevDiag = 0;
         |    for (int $j = 1; $j <= $m; $j++) {
         |      int $tmp = $dp[$j];
         |      if ($xi != null && $xi.equals($ys[$j - 1])) { $dp[$j] = $prevDiag + 1; }
         |      else if ($dp[$j - 1] > $dp[$j]) { $dp[$j] = $dp[$j - 1]; }
         |      $prevDiag = $tmp;
         |    }
         |  }
         |  ${ev.value} = (long) $dp[$m];
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
