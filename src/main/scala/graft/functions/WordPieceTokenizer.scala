package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece segmentation (the BERT tokenizer): greedy
  * LONGEST-MATCH-FIRST, restarting after each consumed piece, with
  * `##`-prefixed continuation pieces for every non-initial position
  * and a whole-word `[UNK]` fallback when any position has no match —
  * NO backtracking, exactly the published algorithm (Devlin et al.
  * 2019 §4.1 / the WordpieceTokenizer every BERT implementation
  * ships). The third major subword family next to merge-order BPE
  * ([[graft.text.BpeTrainer]] / [[BpeTokenizer]]) and unigram-LM
  * Viterbi ([[UnigramTokenizer]]).
  *
  * Determinism contract (matched by the oracle's unrolled greedy
  * stages): at each position take the single longest vocabulary piece
  * matching there (initial pieces at position 0, `##` continuations
  * after) — a piece's text at a fixed (position, length) is unique,
  * so there are never ties. Words longer than `maxLen` or containing
  * non-ASCII become `[UNK]` (1 piece), as does any word greedy cannot
  * cover; the fallback is TOTAL, never null. Because greedy does not
  * backtrack, a vocabulary can cover a word and greedy still UNK it
  * (longest prefix leads into a dead end) — that trap is part of the
  * contract and pinned by the fixture vocabulary.
  *
  * Scale posture: evaluated once per DISTINCT word (the
  * train/serve split shared with [[UnigramTokenizer]] — the distinct
  * word frame is vocabulary-sized and broadcast-joins back to the
  * corpus), so the per-word loop never touches corpus-sized data; the
  * piece lookup is a hash probe per (position, candidate length),
  * ≤ maxPiece probes per consumed piece.
  */
object WordPieceTokenizer {

  def wordpiece_segment(word: Column, vocab: Seq[String],
      maxLen: Int): Column =
    graftshim.exprToColumn(
      WordPieceSegment(graftshim.columnToExpr(word), vocab, maxLen))
}

case class WordPieceSegment(child: Expression, vocab: Seq[String],
    maxLen: Int) extends UnaryExpression with CodegenFallback {
  require(vocab.nonEmpty && vocab.forall { p =>
    val body = if (p.startsWith("##")) p.drop(2) else p
    body.nonEmpty && body.forall(_ < 128)
  }, "wordpiece vocab must be nonempty ASCII pieces ('##' continuations)")
  require(vocab.distinct.size == vocab.size, "duplicate pieces")

  override def nullable: Boolean = child.nullable
  override def dataType: DataType = StructType(Seq(
    StructField("n_pieces", LongType),
    StructField("is_unk", BooleanType),
    StructField("seg", StringType)))

  @transient private lazy val initial: Set[String] =
    vocab.filterNot(_.startsWith("##")).toSet
  @transient private lazy val continuation: Set[String] =
    vocab.filter(_.startsWith("##")).map(_.drop(2)).toSet
  @transient private lazy val maxPiece: Int =
    (initial.map(_.length) ++ continuation.map(_.length)).max

  private def unk: InternalRow =
    InternalRow(1L, true, UTF8String.fromString("[UNK]"))

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n == 0 || n > maxLen || s.exists(_ >= 128)) return unk
    val sb = new java.lang.StringBuilder
    var pos = 0
    var pieces = 0L
    while (pos < n) {
      val table = if (pos == 0) initial else continuation
      var l = math.min(n - pos, maxPiece)
      var hit = -1
      while (l >= 1 && hit < 0) {
        if (table.contains(s.substring(pos, pos + l))) hit = l
        l -= 1
      }
      if (hit < 0) return unk
      if (pos == 0) sb.append(s, 0, hit)
      else sb.append("|##").append(s, pos, pos + hit)
      pos += hit
      pieces += 1L
    }
    InternalRow(pieces, false, UTF8String.fromString(sb.toString))
  }

  override def prettyName: String = "wordpiece_segment"
  override protected def withNewChildInternal(newChild: Expression): WordPieceSegment =
    copy(child = newChild)
}
