package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) Viterbi segmentation under a
  * SHIPPED piece vocabulary — the third major subword algorithm next
  * to greedy longest-match ([[BpeTokenizer]]) and true merge-order BPE
  * ([[graft.text.BpeTrainer]]). Each word takes the segmentation
  * minimizing total piece cost (= maximizing unigram log-probability;
  * costs are EXACT INTEGERS — the bit-length surrogate family — so
  * the DP is bit-stable and fully SQL-replayable through unrolled
  * per-position stages).
  *
  * Determinism contract (must match the oracle's stage algebra
  * exactly): at every position the DP keeps the candidate with
  * (1) minimum cost, then (2) minimum '|'-joined segmentation string
  * in BINARY order. The vocabulary and the input words are restricted
  * to ASCII (enforced at construction / null at eval), where Java's
  * UTF-16 string order and DuckDB's UTF-8 binary `min(varchar)`
  * agree. Words longer than `maxLen` return null (the oracle unrolls
  * exactly `maxLen` stages), as do words with any position no piece
  * covers.
  *
  * Scale posture: evaluated once per DISTINCT word (the
  * [[graft.text.BpeTrainer.mergeOrderTokenStats]] train/serve split —
  * the distinct-word table is vocabulary-sized, then broadcast-joined
  * back to the corpus), so the interpreted per-word DP never touches
  * corpus-sized data.
  */
object UnigramTokenizer {

  def unigram_segment(word: Column, vocab: Seq[(String, Long)],
      maxLen: Int): Column =
    graftshim.exprToColumn(
      UnigramSegment(graftshim.columnToExpr(word), vocab, maxLen))
}

case class UnigramSegment(child: Expression, vocab: Seq[(String, Long)],
    maxLen: Int) extends UnaryExpression with CodegenFallback {
  require(vocab.nonEmpty && vocab.forall { case (p, c) =>
    p.nonEmpty && p.forall(_ < 128) && c >= 0 },
    "unigram vocab must be nonempty ASCII pieces with nonnegative costs")
  require(vocab.map(_._1).distinct.size == vocab.size, "duplicate pieces")

  // OOV/too-long words yield null regardless of the child's nullability
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("n_pieces", LongType),
    StructField("cost", LongType),
    StructField("seg", StringType)))

  @transient private lazy val costOf: Map[String, Long] = vocab.toMap
  @transient private lazy val maxPiece: Int = vocab.map(_._1.length).max

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n == 0 || n > maxLen || s.exists(_ >= 128)) return null
    // dp(i) = best (cost, seg) over the first i chars; ties break on
    // the smaller seg string — identical to the oracle's min(seg)
    val cost = new Array[Long](n + 1)
    val seg = new Array[String](n + 1)
    java.util.Arrays.fill(cost, -1L)
    cost(0) = 0L; seg(0) = ""
    var i = 1
    while (i <= n) {
      var l = 1
      val lMax = math.min(i, maxPiece)
      while (l <= lMax) {
        val j = i - l
        if (cost(j) >= 0) {
          costOf.get(s.substring(j, i)) match {
            case Some(pc) =>
              val c2 = cost(j) + pc
              val s2 = if (j == 0) s.substring(j, i)
                else seg(j) + "|" + s.substring(j, i)
              if (cost(i) < 0 || c2 < cost(i) ||
                  (c2 == cost(i) && s2.compareTo(seg(i)) < 0)) {
                cost(i) = c2; seg(i) = s2
              }
            case None => ()
          }
        }
        l += 1
      }
      i += 1
    }
    if (cost(n) < 0) null
    else InternalRow(
      (seg(n).count(_ == '|') + 1).toLong, cost(n),
      UTF8String.fromString(seg(n)))
  }

  override def prettyName: String = "unigram_segment"
  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)
}
