package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Subword tokenization as the token-budget currency.
  *
  * Every token-budget operator in the pipeline layer (`packSequences`,
  * `corpusMix`, temperature mixing) previously budgeted in WHITESPACE
  * tokens; real training pipelines budget in subword tokens (BPE —
  * Sennrich et al. 2016; WordPiece — Wu et al. 2016), which differ from
  * word counts by 1.3–1.8× on English text and far more on code or
  * non-Latin scripts. This module provides the deterministic encoder:
  * greedy longest-match against a LITERAL bounded vocabulary (the
  * inference-time algorithm of WordPiece; the trained merge list is an
  * input, not something the engine learns), with unmatched characters
  * falling back to one token each (the byte-fallback convention).
  *
  * Execution model follows the FloatVecDot/Int8Quantize pattern: a
  * custom codegen expression whose per-row work is ONE primitive trie
  * walk over the string — no per-token lambda, no array
  * materialization, no boxed higher-order functions. The vocabulary
  * rides along as a broadcast-sized reference object (kilobytes) inside
  * the generated code's references array, so a 100 TB scan pays one
  * virtual call per row.
  *
  * Semantics contract (replayed exactly by the DuckDB oracle through a
  * recursive CTE over the same literal vocab):
  *  - input is matched within whitespace-separated words (vocab entries
  *    never contain spaces; the walk stops at ' ');
  *  - at each position the LONGEST vocab prefix wins; on no match the
  *    single character is one token (advance 1);
  *  - empty words (consecutive spaces) contribute nothing.
  */
object BpeTokenizer {

  /** Literal default vocabulary: whole high-frequency words plus
    * subword fragments, so common corpus words tokenize to 1 token and
    * the rest split into 2–4 — including overlapping entries ("join"
    * vs "jo"/"in", "order" vs "or"/"der") so greedy longest-match is
    * actually exercised, not vacuous. ~50 entries ≈ a merge table
    * truncated to the corpus domain; production swaps in its trained
    * list (the algorithm is vocabulary-agnostic).
    */
  val defaultVocab: Seq[String] = Seq(
    // whole words (win by longest-match over their fragments)
    "the", "data", "join", "hash", "order", "table", "stream",
    "query", "value", "column", "filter", "window", "customer",
    // prefixes / suffixes / fragments
    "a", "agg", "an", "at", "ba", "big", "ch", "co", "der", "er",
    "fa", "gro", "in", "jo", "key", "li", "line", "lumn", "me", "mer",
    "ne", "or", "ow", "part", "qu", "row", "scan", "sl", "small",
    "sort", "st", "tch", "up", "ue", "val", "vec", "wind")

  /** `bpe_count(text)`: subword-token count of a string column under
    * the vocab — the budget-currency column expression. */
  def bpe_count(text: Column, vocab: Seq[String] = defaultVocab): Column =
    org.apache.spark.sql.graftshim.exprToColumn(
      BpeCountTokens(org.apache.spark.sql.graftshim.columnToExpr(text), vocab))

  /** `bpe_encode(text)`: the token-ID array (`input_ids`) — vocab match
    * → its index, unmatched char c → vocab.size + codepoint(c) (the
    * byte-fallback block). `size(bpe_encode(t)) == bpe_count(t)`. */
  def bpe_encode(text: Column, vocab: Seq[String] = defaultVocab): Column =
    org.apache.spark.sql.graftshim.exprToColumn(
      BpeEncodeTokens(org.apache.spark.sql.graftshim.columnToExpr(text), vocab))

  /** `bpe_decode(ids)`: id array → text. Inverse of [[bpe_encode]] up
    * to word boundaries (encode drops spaces): every matched token
    * decodes to its literal entry and every fallback id to its
    * character, so `bpe_decode(bpe_encode(t)) == t minus spaces` —
    * exactly, for any input (the invertibility oracle). */
  def bpe_decode(ids: Column, vocab: Seq[String] = defaultVocab): Column =
    org.apache.spark.sql.graftshim.exprToColumn(
      BpeDecodeTokens(org.apache.spark.sql.graftshim.columnToExpr(ids), vocab))

  /** The DuckDB literal list for the same vocab — interpolated into
    * oracle SQL so engine and oracle can never desynchronize. Single
    * quotes are SQL-doubled: a trained vocab may carry apostrophes
    * (e.g. a learned "n't" merge). */
  def vocabSqlList(vocab: Seq[String] = defaultVocab): String =
    vocab.map(v => "'" + v.replace("'", "''") + "'").mkString("[", ", ", "]")
}

/** ASCII trie for greedy longest-match: flat int array of child links
  * (node*128 + char), terminal flags per node. Built once on the
  * driver, shipped in the expression; kilobytes for any literal vocab.
  */
final class BpeTrie(val vocab: Array[String]) extends Serializable {
  private val cap = vocab.map(_.length).sum + 1
  private val children = Array.fill(cap * 128)(-1)
  // terminal marker = vocab index + 1 (0 = not a vocab entry)
  private val term = new Array[Int](cap)
  private var nNodes = 1
  vocab.zipWithIndex.foreach { case (v, vi) =>
    require(v.nonEmpty, "empty vocab entry")
    var node = 0
    var i = 0
    while (i < v.length) {
      val c = v.charAt(i)
      require(c < 128 && c != ' ', s"vocab must be ASCII and space-free: '$v'")
      var nxt = children(node * 128 + c)
      if (nxt == -1) { nxt = nNodes; nNodes += 1; children(node * 128 + c) = nxt }
      node = nxt
      i += 1
    }
    term(node) = vi + 1
  }

  def countTokens(s: UTF8String): Long = count(s.toString)

  /** One pass over the string: spaces delimit words for free (vocab is
    * space-free so a match can never cross a boundary). */
  def count(str: String): Long = {
    var n = 0L
    var i = 0
    val len = str.length
    while (i < len) {
      if (str.charAt(i) == ' ') i += 1
      else {
        i += math.max(matchLen(str, i), 1) // no match: 1 char = 1 token
        n += 1L
      }
    }
    n
  }

  /** Length of the longest vocab prefix at `i` (0 = none). */
  private def matchLen(str: String, i: Int): Int = {
    var node = 0
    var j = i
    var best = 0
    val len = str.length
    var walking = true
    while (walking && j < len) {
      val ch = str.charAt(j)
      if (ch >= 128 || ch == ' ') walking = false
      else {
        val nxt = children(node * 128 + ch)
        if (nxt == -1) walking = false
        else {
          node = nxt
          j += 1
          if (term(node) > 0) best = j - i
        }
      }
    }
    best
  }

  def encodeIds(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(encode(s.toString))

  /** Greedy longest-match token IDS: vocab match → its index; fallback
    * char c → vocab.length + codepoint(c) (the byte-fallback id block).
    * `count(s) == encode(s).length` by construction. */
  def encode(str: String): Array[Int] = {
    val out = new scala.collection.mutable.ArrayBuffer[Int](str.length / 3 + 4)
    var i = 0
    val len = str.length
    while (i < len) {
      val c = str.charAt(i)
      if (c == ' ') i += 1
      else {
        val m = matchLen(str, i)
        if (m > 0) {
          // the id: walk again is avoided — matchLen's best node is the
          // entry of length m at i; re-derive its index via the trie
          var node = 0
          var j = i
          while (j < i + m) { node = children(node * 128 + str.charAt(j)); j += 1 }
          out += term(node) - 1
          i += m
        } else {
          out += vocab.length + c.toInt
          i += 1
        }
      }
    }
    out.toArray
  }
}

/** Codegen expression: subword-token count of a string under a literal
  * vocab. The trie is rebuilt lazily per JVM (transient) and referenced
  * from the generated code — the hot path is one call into a primitive
  * char loop, fully inside whole-stage codegen like FloatVecDot.
  */
case class BpeCountTokens(child: Expression, vocab: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = LongType

  @transient private lazy val trie = new BpeTrie(vocab.toArray)

  override def nullSafeEval(v: Any): Any =
    trie.countTokens(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTrie", trie, classOf[BpeTrie].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.countTokens($c);")
  }

  override def prettyName: String = "bpe_count"
  override protected def withNewChildInternal(newChild: Expression): BpeCountTokens =
    copy(child = newChild)
}

/** Token ids → text (inverse of [[BpeEncodeTokens]] up to the spaces
  * encode drops): vocab ids decode to their literal entries, byte-
  * fallback ids to their characters. Unknown ids (negative, or past
  * the fallback block) yield null — a corrupted sequence should be
  * visible, not silently skipped.
  */
case class BpeDecodeTokens(child: Expression, vocab: Seq[String])
    extends UnaryExpression with CodegenFallback {
  // CodegenFallback on purpose: decode is an inspection/debug surface
  // (look inside a packed batch), never a corpus-width hot path
  override def dataType: DataType = org.apache.spark.sql.types.StringType

  @transient private lazy val entries: Array[UTF8String] =
    vocab.map(UTF8String.fromString).toArray

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val in = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val sb = new java.lang.StringBuilder
    var i = 0
    val n = in.numElements()
    while (i < n) {
      val id = in.getInt(i)
      if (id >= 0 && id < entries.length) sb.append(entries(id).toString)
      else if (id >= entries.length && id < entries.length + 0x110000)
        sb.appendCodePoint(id - entries.length)
      else return null
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override def prettyName: String = "bpe_decode"
  override protected def withNewChildInternal(newChild: Expression): BpeDecodeTokens =
    copy(child = newChild)
}

/** One BPE merge step applied to a symbol array: left-to-right
  * non-overlapping replacement of adjacent (a, b) with a+b — the inner
  * map of BPE training. Codegen (one primitive loop per word), not an
  * interpreted aggregate() fold: training runs this once per word per
  * merge step over the vocabulary table.
  */
case class BpeMergeApply(child: Expression, a: String, b: String)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val in = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    BpeMergeApply.merge(in, UTF8String.fromString(a), UTF8String.fromString(b))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ua = ctx.addReferenceObj("mergeA", UTF8String.fromString(a),
      classOf[UTF8String].getName)
    val ub = ctx.addReferenceObj("mergeB", UTF8String.fromString(b),
      classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeMergeApply.merge($c, $ua, $ub);")
  }

  override def prettyName: String = "bpe_merge_apply"
  override protected def withNewChildInternal(newChild: Expression): BpeMergeApply =
    copy(child = newChild)
}

object BpeMergeApply {
  def apply_merge(syms: Column, a: String, b: String): Column =
    org.apache.spark.sql.graftshim.exprToColumn(
      BpeMergeApply(org.apache.spark.sql.graftshim.columnToExpr(syms), a, b))

  /** Static so generated code can call it: left-to-right scan, merged
    * element never re-merges within the same step. */
  def merge(in: org.apache.spark.sql.catalyst.util.ArrayData,
      a: UTF8String, b: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = in.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val x = in.getUTF8String(i)
      if (i + 1 < n && x.equals(a) && in.getUTF8String(i + 1).equals(b)) {
        out.add(UTF8String.concat(a, b))
        i += 2
      } else {
        out.add(x)
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[AnyRef](out.size())))
  }
}

/** Codegen expression: the token-ID array of a string under a literal
  * vocab — `input_ids` materialization for sequence packing. Same trie
  * walk as [[BpeCountTokens]], emitting ids instead of a count.
  */
case class BpeEncodeTokens(child: Expression, vocab: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)

  @transient private lazy val trie = new BpeTrie(vocab.toArray)

  override def nullSafeEval(v: Any): Any =
    trie.encodeIds(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTrie", trie, classOf[BpeTrie].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encodeIds($c);")
  }

  override def prettyName: String = "bpe_encode"
  override protected def withNewChildInternal(newChild: Expression): BpeEncodeTokens =
    copy(child = newChild)
}
