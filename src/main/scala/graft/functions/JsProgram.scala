package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Full-PROGRAM tier of the reference's JavaScript gestures
  * (web/.../maps/CreateColumnJSMap.java:39-56, which evaluates an
  * arbitrary user `function map(row) {...}` per row via GraalVM, and
  * table/filters/JSFilterDescription.java:30-80 for filters).
  *
  * [[JsGesture]] compiles the straight-line JS SUBSET to Catalyst
  * Columns — codegen'd, pushdown-friendly, the fast path. Programs the
  * subset cannot express — mutable locals with reassignment, `for` /
  * `while` loops with `break`/`continue`, user-defined helper functions
  * (including recursion), array literals/indexing — land here: the
  * program is parsed ONCE on the driver into a slot-resolved AST and
  * evaluated per row by [[JsProgramEval]], a deterministic Catalyst
  * expression whose children are exactly the row fields the program
  * references, so column pruning still reaches the scan (the reference's
  * Graal context is equally opaque per row, but also reads whole rows).
  *
  * Scale posture: a narrow per-row map — no shuffle, no driver loop; the
  * AST ships once per task via the serialized expression. A fuel counter
  * (1M steps/row) and a call-depth cap bound adversarial programs, so a
  * runaway `while(true)` fails fast with a clear error instead of
  * wedging an executor.
  *
  * Semantics deliberately match the compiled subset where the two
  * overlap (the JsProgramSpec parity fuzz holds tier 2 to tier 1 on
  * every subset program): IEEE-double numbers, SQL-style null
  * propagation through arithmetic/comparisons, Kleene three-valued
  * `&&`/`||` TRUTH TABLE with JS short-circuit EVALUATION — a decided
  * LHS (false for `&&`, true for `||`) skips the RHS, preserving JS
  * side-effect order (`cond && arr.push(x)`); only a null LHS still
  * evaluates the RHS, for Kleene null-propagation (GraalVM would treat
  * null as falsy and skip — the documented divergence), `Number("")` =
  * NaN, fall-off-the-end returns null. Strict `===`/`!==` are
  * JS-faithful runtime-tag comparisons WITHOUT coercion: cross-type is
  * false, `x === null` is a real boolean null check (null does not
  * propagate), arrays compare by reference; NaN === NaN is true (the
  * Java/Spark total order used everywhere here; JS says false). The
  * compiled tier rejects `===`/`!==` at parse time (static Column
  * types cannot carry runtime tags), so strict-equality programs
  * always land in this tier. Beyond the subset: JS truthiness
  * decides `if`/`while`/ternary conditions and filter verdicts
  * (null/false/0/NaN/"" are falsy; arrays always truthy), `var`s are
  * function-scoped (JS `var` hoisting; `let`/`const` accepted as
  * synonyms), strings index per UTF-16 code unit exactly as JS
  * (`charCodeAt` returns the code unit, NaN out of range), and
  * `Array.prototype.join` renders null elements as "" (JS). Regex
  * literals (`/pattern/flags`, flags `g`/`i`) support `test`, string
  * `match`/`search`/`replace`/`split`, and the `$&`/`$1..$9`/`$$`
  * replacement dialect; the pattern dialect is the Java-compatible
  * subset of JS regex (classes, greedy/lazy quantifiers, anchors,
  * `\b`, groups, alternation — also the RE2 subset DuckDB oracles can
  * replay). Lookbehind/named groups/unicode-property escapes are
  * outside the subset and fail at parse time.
  *
  * Date RUNTIME (the reference's row proxy hands gestures a real JS
  * Date — JSVirtualRowSnapshot.java:52-58): date/timestamp fields
  * arrive as [[JsProgram.JsDate]] objects with the calendar getters
  * (`getTime`/`getFullYear`/`getMonth`/`getDate`/`getDay`/`getHours`
  * …/`getTimezoneOffset`/`toISOString`, each with its getUTC* alias —
  * identical because sessions pin UTC), `new Date(millis)` /
  * `new Date(y, m, d, …)` construction (lenient month overflow, years
  * 0–99 → 1900+y, JS semantics) and `Date.UTC(…)`; arithmetic and
  * ordered comparisons coerce through `valueOf` → millis, `===` is
  * object identity. `new Date()` (wall clock) is REJECTED at parse
  * time — gestures must be deterministic. Documented deviations:
  * string rendering is the `toISOString` form, and loose `==` against
  * a number compares millis (JS stringifies the Date first).
  *
  * Objects and exceptions (r12): object literals `{a: 1, 'b': x}` with
  * property get/set (`o.a`, `o['a']`, compound assignment, `++`/`--`),
  * `hasOwnProperty`, `Object.keys`/`Object.values`; plain objects are
  * reference values (`===` and loose `==` between two objects are
  * IDENTITY, stringification is "[object Object]", numeric coercion is
  * NaN). `throw`/`try`/`catch`/`finally` run with the JS completion
  * rules (finally overrides abrupt outcomes; catch may rethrow; an
  * uncaught throw kills the gesture with a readable message). ONE
  * documented deviation: only user `throw` values are catchable —
  * engine errors (fuel, call depth, unsupported operations) stay
  * fatal, so a gesture's catch block can never swallow the
  * runaway-loop protection (GraalVM surfaces its TypeErrors as
  * catchable; ours are the uncatchable engine kind).
  *
  * Closures (r13): anonymous `function (a, b) { ... }` expressions are
  * first-class values — assignable, passable, returnable, callable
  * through locals/array elements/object properties, with LEXICAL
  * capture by shared binding (an inner write mutates the defining
  * frame, visible to siblings) through any nesting depth; top-level
  * declared functions referenced without parens are values too. Array
  * higher-order methods take callbacks: map/filter/forEach/reduce
  * (with and without seed)/some/every/sort (comparator or JS default
  * stringify order). Function values have identity `===`, stringify
  * as "function", coerce to NaN. Fuel/call-depth guards apply through
  * closure calls, so callback-driven loops stay bounded.
  *
  * Objects (r14): the gesture boundary is CLOSED — method calls bind
  * `this` through a dedicated frame slot, object literals may declare
  * getter/setter accessors (routed through every read/write form), and
  * prototypes work in full: `new Ctor(args)` with the constructor-return
  * rule, auto-vivified live `.prototype` chains, own-property shadowing,
  * inherited accessors, wholesale prototype replacement. Nothing of the
  * reference's GraalVM gesture surface remains unsupported.
  */
object JsProgram {

  // ── AST ────────────────────────────────────────────────────────────
  // Runtime values: null | java.lang.Double | String | java.lang.Boolean
  // | scala.collection.mutable.ArrayBuffer[Any] (JS array)
  sealed trait E extends Serializable
  final case class ENum(v: Double) extends E
  final case class EStr(v: String) extends E
  final case class EBool(v: Boolean) extends E
  case object ENull extends E
  /** Local variable / parameter, slot-resolved at parse time. */
  final case class ELocal(slot: Int) extends E
  /** Row-field read; `ix` indexes the bound field-value array (resolved
    * against the referenced-field list at parse time). */
  final case class ERow(ix: Int) extends E
  final case class EUn(op: String, e: E) extends E
  final case class EBin(op: String, a: E, b: E) extends E
  final case class ETern(c: E, t: E, f: E) extends E
  /** Property read on a receiver (.length, object fields) — parenless
    * member access; also the node assignment re-reads as an LProp. */
  final case class EMeth(recv: E, name: String, args: Seq[E]) extends E
  /** EXPLICIT method call `recv.name(args)` (parens present) — distinct
    * from the property read so a zero-arg call is a CALL: on objects it
    * resolves the member (through a getter if one is defined) and calls
    * it with `this` bound to the receiver; on built-in receivers it
    * dispatches to the built-in method table. */
  final case class EMethCall(recv: E, name: String, args: Seq[E]) extends E
  /** `this` — bound by method calls (`o.f()` sets it to `o`); null (JS
    * strict-mode undefined) in plain calls and at the gesture top level. */
  case object EThis extends E
  final case class EMath(name: String, args: Seq[E]) extends E
  /** Global builtins: Number, String, isNaN, String.fromCharCode. */
  final case class EGlobal(name: String, args: Seq[E]) extends E
  final case class ECall(fnIx: Int, args: Seq[E]) extends E
  /** Enclosing-function variable (closure upvalue): `level` = how many
    * function boundaries out the binding lives (1 = the defining
    * function of this closure). Reads/writes go through the captured
    * frame CHAIN, so mutation is shared with the defining scope — the
    * JS binding semantics, not a copy. */
  final case class EUp(level: Int, slot: Int) extends E
  /** Top-level function referenced as a VALUE (no call parens). */
  final case class EFuncRef(fnIx: Int) extends E
  /** Anonymous `function (params) { body }` expression — evaluates to
    * a [[JsFunc]] closing over the current frame chain. */
  final case class EFuncExpr(fnIx: Int) extends E
  /** Call through a function VALUE (local, upvalue, array element,
    * object property, or another call's result). */
  final case class ECallV(fn: E, args: Seq[E]) extends E
  final case class EArr(elems: Seq[E]) extends E
  final case class EIndex(arr: E, ix: E) extends E
  /** Regex literal, compiled once at parse time on the driver. */
  final case class ERegex(re: JsRegex) extends E
  /** `new Ctor(args)` — constructor invocation: a fresh object whose
    * prototype is the constructor's `.prototype`, the body run with
    * `this` bound to it; an explicit OBJECT return overrides (the JS
    * constructor-return rule), anything else yields the new object. */
  final case class ENew(ctor: E, args: Seq[E]) extends E

  /** Compiled JS regex literal value (`/pattern/flags`). The dialect is
    * the Java-compatible subset of JS regex syntax — character classes,
    * quantifiers (greedy + lazy), anchors, `\b`, groups, alternation —
    * which is also the RE2 subset the DuckDB oracles replay. Flags: `g`
    * (drives match-all / replace-all) and `i` (case-insensitive).
    */
  final case class JsRegex(p: java.util.regex.Pattern, global: Boolean) {
    override def toString: String =
      "/" + p.pattern + "/" + (if (global) "g" else "") +
        (if ((p.flags & java.util.regex.Pattern.CASE_INSENSITIVE) != 0) "i" else "")
  }

  /** `new Date(...)` — 1 arg = epoch millis, 2..7 args = Y/M/D/h/m/s/ms
    * (lenient overflow, JS normalization). */
  final case class ENewDate(args: Seq[E]) extends E

  /** JS Date runtime value — the reference's row proxy hands gestures a
    * real Date (`JSVirtualRowSnapshot.java:52-58` evals
    * `new Date(millis)`), so date/timestamp fields arrive here as Date
    * OBJECTS with the calendar getters, not bare numbers. The engine
    * pins sessions to UTC, so local-time getters equal the getUTC*
    * forms and `getTimezoneOffset()` is 0 — faithful to a GraalVM
    * context running in a UTC JVM. Plain `class`: JS object identity
    * (two Dates with equal millis are `!==`). Documented deviations:
    * string rendering is `toISOString` form (GraalVM's `toString` is a
    * locale-formatted local-time string), and loose `==` against a
    * number compares by millis (JS stringifies the Date first). */
  final class JsDate(val millis: Double) extends Serializable {
    override def toString: String =
      if (millis.isNaN) "Invalid Date"
      else java.time.Instant.ofEpochMilli(millis.toLong)
        .atZone(java.time.ZoneOffset.UTC)
        .format(IsoMillis)
  }
  private val IsoMillis =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")

  /** Object literal `{a: 1, 'b': x}` — fields evaluate in source
    * order into an insertion-ordered map. `getters`/`setters` carry
    * accessor properties (`get x() {…}` / `set x(v) {…}`) as compiled
    * function indexes; they close over the defining frame chain exactly
    * like [[EFuncExpr]]. */
  final case class EObj(fields: Seq[(String, E)],
    getters: Seq[(String, Int)] = Nil,
    setters: Seq[(String, Int)] = Nil) extends E

  /** JS plain-object runtime value: insertion-ordered string-keyed
    * mutable map. Plain `class`: object identity (two structurally
    * equal objects are `!==`), exactly the array story. Stringifies
    * as "[object Object]"; numeric coercion is NaN. Loose `==`
    * between two objects compares IDENTITY (the JS rule); ordered
    * comparisons between two objects are rejected-by-unspecified
    * (JS would compare "[object Object]" strings — never meaningful
    * in a gesture). */
  final class JsObj(val m: scala.collection.mutable.LinkedHashMap[String, Any])
    extends Serializable {
    /** accessor properties (null when none — the overwhelmingly common
      * case pays zero allocation): name → JsFunc, invoked with `this`
      * bound to this object */
    var getters: scala.collection.mutable.LinkedHashMap[String, Any] = null
    var setters: scala.collection.mutable.LinkedHashMap[String, Any] = null
    /** prototype link, fixed at creation (`new Ctor` instances). There
      * is no `__proto__` accessor, so chains are creation-time DAGs —
      * acyclic by construction (a defensive depth cap guards anyway). */
    var proto: JsObj = null
    override def toString: String = "[object Object]"
  }

  /** JS function runtime value: the compiled function index plus the
    * captured frame chain (innermost defining frame first). Identity
    * semantics like arrays/objects/Dates; stringifies as "function",
    * numeric coercion NaN. */
  final class JsFunc(val fnIx: Int, val env: Array[Array[Any]])
    extends Serializable {
    /** `.prototype` object, auto-vivified on first access; per-row
      * function identity (top-level refs memoize per evaluation) keeps
      * mutations visible across all references WITHIN a row and
      * isolated BETWEEN rows. */
    var prototype: JsObj = null
    override def toString: String = "function"
  }

  /** A user `throw` in flight. Only THIS is catchable by `try`/`catch`
    * — engine errors (fuel, depth, unsupported operations) stay fatal,
    * so runaway-loop protection cannot be swallowed by a gesture's
    * catch block (documented deviation: GraalVM surfaces engine
    * TypeErrors as catchable JS errors). Stackless: control flow, not
    * diagnostics. */
  final case class JsThrown(v: Any)
    extends RuntimeException(null, null, false, false)

  sealed trait LV extends Serializable
  final case class LVar(slot: Int) extends LV
  final case class LUp(level: Int, slot: Int) extends LV
  final case class LIndex(arr: E, ix: E) extends LV
  final case class LProp(obj: E, name: String) extends LV

  sealed trait S extends Serializable
  final case class SExpr(e: E) extends S
  final case class SAssign(target: LV, op: String, value: E) extends S
  final case class SIncDec(target: LV, delta: Double) extends S
  final case class SIf(c: E, t: Vector[S], f: Vector[S]) extends S
  /** `while` (update empty) and `for` (update runs after body AND after
    * `continue` — not a naive while-desugar). */
  final case class SLoop(cond: Option[E], body: Vector[S], update: Vector[S]) extends S
  final case class SReturn(e: Option[E]) extends S
  case object SBreak extends S
  case object SContinue extends S
  final case class SThrow(e: E) extends S
  /** `try`/`catch`/`finally`. `catchSlot` = −1 means no catch clause
    * (try/finally); a parameterless `catch {}` gets a slot that simply
    * goes unread. The finally block runs on every exit path and its
    * own abrupt completion (return/break/continue) overrides the
    * try/catch outcome — the JS completion-value rules. */
  final case class STry(body: Vector[S], catchSlot: Int,
    catchBody: Vector[S], fin: Vector[S]) extends S

  final case class Fn(name: String, nParams: Int, nSlots: Int, body: Vector[S])
    extends Serializable
  final case class Program(fns: Vector[Fn], entryIx: Int,
      rowFields: Vector[String]) extends Serializable

  /** True when the source needs this tier (a cheap syntactic probe used
    * only for diagnostics; dispatch actually tries tier 1 first). */
  def looksLikeProgram(src: String): Boolean =
    Seq("while", "for", "function ").exists(src.contains)

  // ── parser ─────────────────────────────────────────────────────────
  private final class P(src: String) {
    var i = 0
    def ws(): Unit = {
      var go = true
      while (go) {
        while (i < src.length && src(i).isWhitespace) i += 1
        if (src.startsWith("//", i)) {
          while (i < src.length && src(i) != '\n') i += 1
        } else if (src.startsWith("/*", i)) {
          val e = src.indexOf("*/", i + 2)
          if (e < 0) fail("unterminated comment")
          i = e + 2
        } else go = false
      }
    }
    def peek(s: String): Boolean = { ws(); src.startsWith(s, i) }
    /** Word-boundary peek for keywords (so `format` ≠ `for`). */
    def peekKw(s: String): Boolean = {
      ws()
      src.startsWith(s, i) && {
        val j = i + s.length
        j >= src.length || !isIdent(src(j))
      }
    }
    def eat(s: String): Boolean = if (peek(s)) { i += s.length; true } else false
    def eatKw(s: String): Boolean = if (peekKw(s)) { i += s.length; true } else false
    def expect(s: String): Unit = if (!eat(s)) fail(s"expected '$s'")
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"JS program parse error at $i: $msg " +
        s"(near '${src.slice(i, math.min(src.length, i + 24))}')")
    def done: Boolean = { ws(); i >= src.length }
    private def isIdentStart(c: Char) = c.isLetter || c == '_' || c == '$'
    def isIdent(c: Char) = c.isLetterOrDigit || c == '_' || c == '$'
    def ident(): String = {
      ws()
      if (i >= src.length || !isIdentStart(src(i))) fail("expected identifier")
      val s0 = i
      while (i < src.length && isIdent(src(i))) i += 1
      src.substring(s0, i)
    }
    def stringLit(q: Char): String = {
      val sb = new StringBuilder
      i += 1
      while (i < src.length && src(i) != q) {
        if (src(i) == '\\' && i + 1 < src.length) {
          sb += (src(i + 1) match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case c => c
          })
          i += 2
        } else { sb += src(i); i += 1 }
      }
      if (i >= src.length) fail("unterminated string")
      i += 1
      sb.result()
    }
    def number(): Double = {
      ws(); val s0 = i
      while (i < src.length && (src(i).isDigit || src(i) == '.')) i += 1
      if (s0 == i) fail("expected number")
      src.substring(s0, i).toDouble
    }
    def peekChar: Option[Char] = { ws(); if (i < src.length) Some(src(i)) else None }
    /** JS regex literal `/pattern/flags` — caller has peeked the '/'.
      * A '/' inside a [...] class or after a backslash doesn't
      * terminate (JS lexing). Returns (pattern, flags). */
    def regexLit(): (String, String) = {
      i += 1
      val s0 = i
      var inClass = false
      var closed = false
      while (i < src.length && !closed) {
        src(i) match {
          case '\\' => i += 2
          case '[' => inClass = true; i += 1
          case ']' => inClass = false; i += 1
          case '/' if !inClass => closed = true
          case '\n' => fail("unterminated regex literal")
          case _ => i += 1
        }
      }
      if (!closed) fail("unterminated regex literal")
      val pat = src.substring(s0, i)
      i += 1
      val f0 = i
      while (i < src.length && src(i).isLetter) i += 1
      (pat, src.substring(f0, i))
    }
  }

  /** JS replacement-string dialect → Java's: `$$` is a literal dollar,
    * `$&` is the whole match (Java `$0`), `$1`..`$9` pass through;
    * backslashes and stray dollars are escaped (Java treats both as
    * metacharacters where JS does not). */
  private[functions] def javaReplacement(js: String): String = {
    val sb = new StringBuilder(js.length + 4)
    var i = 0
    while (i < js.length) {
      val c = js.charAt(i)
      if (c == '\\') { sb.append("\\\\"); i += 1 }
      else if (c == '$' && i + 1 < js.length && js.charAt(i + 1) == '$') {
        sb.append("\\$"); i += 2
      } else if (c == '$' && i + 1 < js.length && js.charAt(i + 1) == '&') {
        sb.append("$0"); i += 2
      } else if (c == '$' && i + 1 < js.length && js.charAt(i + 1).isDigit) {
        sb.append('$').append(js.charAt(i + 1)); i += 2
      } else if (c == '$') { sb.append("\\$"); i += 1 }
      else { sb.append(c); i += 1 }
    }
    sb.result()
  }

  private val Keywords = Set("function", "var", "let", "const", "if", "else",
    "while", "for", "return", "break", "continue", "true", "false", "null",
    "Math", "Number", "String", "isNaN", "throw", "try", "catch", "finally",
    "new", "this")

  /** Per-function parse scope: slot table + the row parameter name (the
    * entry's single parameter; helpers have no row access — fields flow
    * in as plain arguments, which keeps the referenced-field set
    * static for column pruning). */
  private final class Scope(val rowParam: Option[String],
      val parent: Option[Scope] = None) {
    val slots = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def slotOf(n: String): Option[Int] = slots.get(n)
    def declare(n: String): Int = slots.getOrElseUpdate(n, slots.size)
    /** (level, slot): level 0 = this frame, k = k-th enclosing one. */
    def resolve(n: String): Option[(Int, Int)] =
      slots.get(n).map((0, _)).orElse(
        parent.flatMap(_.resolve(n)).map { case (l, sl) => (l + 1, sl) })
    /** The entry's row param, visible through closures unless shadowed
      * by a local/param of the same name. */
    def rowVisible(n: String): Boolean =
      if (rowParam.contains(n)) true
      else if (slots.contains(n)) false
      else parent.exists(_.rowVisible(n))
  }

  private final class Builder {
    val fnNames = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val fnArity = scala.collection.mutable.ArrayBuffer.empty[Int]
    val rowFields = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def fieldIx(n: String): Int = rowFields.getOrElseUpdate(n, rowFields.size)
    /** Anonymous function expressions, appended after the top-level
      * declarations in the program's fn table. */
    var nTop = 0
    val innerFns = scala.collection.mutable.ArrayBuffer.empty[Fn]
    def addInner(fn: Fn): Int = { innerFns += fn; nTop + innerFns.size - 1 }
  }

  def parse(src: String): Program = {
    val p = new P(src)
    val b = new Builder
    // Pass 1: find declarations (name + arity) so forward calls resolve.
    // A bare expression / single anonymous body is wrapped as the entry.
    val decls = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[String], Int)]
    if (!p.peekKw("function")) {
      // bare expression over `row`
      b.nTop = 1
      val body = Vector[S](SReturn(Some(parseExprTop(p, b, new Scope(Some("row"))))))
      if (!p.done) p.fail("trailing input")
      return Program(Vector(Fn("map", 1, 1, body)) ++ b.innerFns, 0,
        b.rowFields.keys.toVector)
    }
    // scan function headers and bodies textually (bodies re-parsed below
    // with full scopes once all names/arities are known)
    val headerPositions = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (!p.done) {
      p.ws()
      headerPositions += p.i
      p.expect("function")
      val name = p.ident()
      p.expect("(")
      val params = scala.collection.mutable.ArrayBuffer.empty[String]
      if (!p.peek(")")) {
        params += p.ident()
        while (p.eat(",")) params += p.ident()
      }
      p.expect(")")
      p.expect("{")
      var depth = 1
      while (depth > 0) {
        p.peekChar match {
          case None => p.fail("unterminated function body")
          case Some('{') => p.i += 1; depth += 1
          case Some('}') => p.i += 1; depth -= 1
          case Some(q @ ('\'' | '"')) => p.stringLit(q)
          case Some(_) => p.i += 1
        }
      }
      if (b.fnNames.contains(name)) p.fail(s"duplicate function '$name'")
      b.fnNames(name) = decls.size
      b.fnArity += params.size
      decls += ((name, params.toSeq, headerPositions.last))
    }
    val entryIx = b.fnNames.get("map").orElse(b.fnNames.get("filter"))
      .getOrElse(decls.size - 1)
    if (decls(entryIx)._2.size != 1)
      p.fail(s"entry function '${decls(entryIx)._1}' must take exactly one (row) parameter")
    // Pass 2: parse each body with its scope
    b.nTop = decls.size
    val fns = decls.zipWithIndex.map { case ((name, params, pos), ix) =>
      val p2 = new P(src)
      p2.i = pos
      p2.expect("function"); p2.ident(); p2.expect("(")
      if (params.nonEmpty) { p2.ident(); params.tail.foreach { _ => p2.expect(","); p2.ident() } }
      p2.expect(")"); p2.expect("{")
      val scope = new Scope(if (ix == entryIx) Some(params.head) else None)
      // params occupy the first slots (the entry's row param slot is
      // reserved but never read — fields go through ERow)
      params.foreach(scope.declare(_))
      val body = parseStmts(p2, b, scope)
      p2.expect("}")
      Fn(name, params.size, scope.slots.size, body)
    }.toVector
    Program(fns ++ b.innerFns, entryIx, b.rowFields.keys.toVector)
  }

  private def parseExprTop(p: P, b: Builder, sc: Scope): E = {
    val e = parseExpr(p, b, sc)
    e
  }

  private def parseStmts(p: P, b: Builder, sc: Scope): Vector[S] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[S]
    while (!p.peek("}") && !p.done) out += parseStmt(p, b, sc)
    out.toVector
  }

  private def parseBlock(p: P, b: Builder, sc: Scope): Vector[S] =
    if (p.eat("{")) { val s = parseStmts(p, b, sc); p.expect("}"); s }
    else Vector(parseStmt(p, b, sc))

  private def parseStmt(p: P, b: Builder, sc: Scope): S = {
    if (p.eatKw("return")) {
      val e = if (p.peek(";") || p.peek("}")) None else Some(parseExpr(p, b, sc))
      p.eat(";")
      SReturn(e)
    } else if (p.eatKw("var") || p.eatKw("let") || p.eatKw("const")) {
      val n = p.ident()
      if (Keywords(n)) p.fail(s"cannot declare '$n'")
      val slot = sc.declare(n)
      val init = if (p.eat("=")) parseExpr(p, b, sc) else ENull
      p.eat(";")
      SAssign(LVar(slot), "=", init)
    } else if (p.peekKw("if")) {
      parseIf(p, b, sc)
    } else if (p.eatKw("while")) {
      p.expect("(")
      val c = parseExpr(p, b, sc)
      p.expect(")")
      SLoop(Some(c), parseBlock(p, b, sc), Vector.empty)
    } else if (p.eatKw("for")) {
      p.expect("(")
      val init =
        if (p.peek(";")) Vector.empty[S]
        else Vector(parseStmt(p, b, sc)) // var decl or assignment (eats its ';')
      if (init.isEmpty) p.expect(";")
      val cond = if (p.peek(";")) None else Some(parseExpr(p, b, sc))
      p.expect(";")
      val update =
        if (p.peek(")")) Vector.empty[S]
        else Vector(parseSimpleStmt(p, b, sc))
      p.expect(")")
      val body = parseBlock(p, b, sc)
      // init runs once; SLoop runs update after body and after continue
      val loop = SLoop(cond, body, update)
      if (init.isEmpty) loop else SIf(EBool(true), init :+ loop, Vector.empty)
    } else if (p.eatKw("break")) { p.eat(";"); SBreak }
    else if (p.eatKw("continue")) { p.eat(";"); SContinue }
    else if (p.eatKw("throw")) {
      val e = parseExpr(p, b, sc); p.eat(";"); SThrow(e)
    } else if (p.eatKw("try")) {
      p.expect("{"); val body = parseStmts(p, b, sc); p.expect("}")
      var catchSlot = -1
      var catchBody = Vector.empty[S]
      var fin = Vector.empty[S]
      if (p.eatKw("catch")) {
        if (p.eat("(")) {
          val n = p.ident()
          if (Keywords(n)) p.fail(s"cannot bind catch parameter '$n'")
          catchSlot = sc.declare(n)
          p.expect(")")
        } else catchSlot = sc.declare("__catch_unbound")
        p.expect("{"); catchBody = parseStmts(p, b, sc); p.expect("}")
      }
      if (p.eatKw("finally")) {
        p.expect("{"); fin = parseStmts(p, b, sc); p.expect("}")
      }
      if (catchSlot < 0 && fin.isEmpty)
        p.fail("try requires a catch or finally clause")
      STry(body, catchSlot, catchBody, fin)
    } else {
      val s = parseSimpleStmt(p, b, sc)
      p.eat(";")
      s
    }
  }

  private def parseIf(p: P, b: Builder, sc: Scope): S = {
    p.expect("if"); p.expect("(")
    val c = parseExpr(p, b, sc)
    p.expect(")")
    val t = parseBlock(p, b, sc)
    val f = if (p.eatKw("else"))
      (if (p.peekKw("if")) Vector(parseIf(p, b, sc)) else parseBlock(p, b, sc))
    else Vector.empty[S]
    SIf(c, t, f)
  }

  /** Assignment / ++ / -- / bare expression (no trailing ';' eaten —
    * usable as a for-update). */
  private def parseSimpleStmt(p: P, b: Builder, sc: Scope): S = {
    val mark = p.i
    val e = parseExpr(p, b, sc)
    def lvalueOf(e0: E): LV = e0 match {
      case ELocal(s) => LVar(s)
      case EUp(l, sl) => LUp(l, sl)
      case EIndex(a, ix) => LIndex(a, ix)
      // `obj.prop = v` parses as a no-arg method node; assignment
      // re-reads it as a property target (eval rejects non-objects)
      case EMeth(r, name, Seq()) => LProp(r, name)
      case _ => p.fail("invalid assignment target")
    }
    p.ws()
    if (p.eat("+=")) SAssign(lvalueOf(e), "+", parseExpr(p, b, sc))
    else if (p.eat("-=")) SAssign(lvalueOf(e), "-", parseExpr(p, b, sc))
    else if (p.eat("*=")) SAssign(lvalueOf(e), "*", parseExpr(p, b, sc))
    else if (p.eat("/=")) SAssign(lvalueOf(e), "/", parseExpr(p, b, sc))
    else if (p.eat("%=")) SAssign(lvalueOf(e), "%", parseExpr(p, b, sc))
    else if (p.eat("++")) SIncDec(lvalueOf(e), 1.0)
    else if (p.eat("--")) SIncDec(lvalueOf(e), -1.0)
    else if (!p.peek("==") && p.eat("=")) SAssign(lvalueOf(e), "=", parseExpr(p, b, sc))
    else { val _ = mark; SExpr(e) }
  }

  // expression grammar mirrors JsGesture's (ternary → || → && → eq →
  // rel → add → mul → unary → postfix → primary)
  private def parseExpr(p: P, b: Builder, sc: Scope): E = {
    val c = parseOr(p, b, sc)
    if (p.eat("?")) {
      val t = parseExpr(p, b, sc); p.expect(":")
      ETern(c, t, parseExpr(p, b, sc))
    } else c
  }
  private def parseOr(p: P, b: Builder, sc: Scope): E = {
    var a = parseAnd(p, b, sc)
    while (p.eat("||")) a = EBin("||", a, parseAnd(p, b, sc))
    a
  }
  private def parseAnd(p: P, b: Builder, sc: Scope): E = {
    var a = parseEq(p, b, sc)
    while (p.eat("&&")) a = EBin("&&", a, parseEq(p, b, sc))
    a
  }
  private def parseEq(p: P, b: Builder, sc: Scope): E = {
    var a = parseRel(p, b, sc)
    var go = true
    while (go) {
      if (p.eat("===")) a = EBin("===", a, parseRel(p, b, sc))
      else if (p.eat("==")) a = EBin("==", a, parseRel(p, b, sc))
      else if (p.eat("!==")) a = EBin("!==", a, parseRel(p, b, sc))
      else if (p.eat("!=")) a = EBin("!=", a, parseRel(p, b, sc))
      else go = false
    }
    a
  }
  private def parseRel(p: P, b: Builder, sc: Scope): E = {
    var a = parseAdd(p, b, sc)
    var go = true
    while (go) {
      if (p.eat("<=")) a = EBin("<=", a, parseAdd(p, b, sc))
      else if (p.eat(">=")) a = EBin(">=", a, parseAdd(p, b, sc))
      else if (p.eat("<")) a = EBin("<", a, parseAdd(p, b, sc))
      else if (p.eat(">")) a = EBin(">", a, parseAdd(p, b, sc))
      else go = false
    }
    a
  }
  private def parseAdd(p: P, b: Builder, sc: Scope): E = {
    var a = parseMul(p, b, sc)
    var go = true
    while (go) {
      p.ws()
      if (p.peek("++") || p.peek("+=")) go = false
      else if (p.eat("+")) a = EBin("+", a, parseMul(p, b, sc))
      else if (p.peek("--") || p.peek("-=")) go = false
      else if (p.eat("-")) a = EBin("-", a, parseMul(p, b, sc))
      else go = false
    }
    a
  }
  private def parseMul(p: P, b: Builder, sc: Scope): E = {
    var a = parseUnary(p, b, sc)
    var go = true
    while (go) {
      p.ws()
      if (p.peek("*=") || p.peek("/=") || p.peek("%=")) go = false
      else if (p.eat("*")) a = EBin("*", a, parseUnary(p, b, sc))
      else if (p.eat("/")) a = EBin("/", a, parseUnary(p, b, sc))
      else if (p.eat("%")) a = EBin("%", a, parseUnary(p, b, sc))
      else go = false
    }
    a
  }
  private def parseUnary(p: P, b: Builder, sc: Scope): E =
    if (p.peek("!=")) parsePostfix(p, b, sc)
    else if (p.eat("!")) EUn("!", parseUnary(p, b, sc))
    else if (p.eat("-")) EUn("-", parseUnary(p, b, sc))
    else parsePostfix(p, b, sc)

  /** Sentinel for the entry's row parameter before member access. */
  private case object RowMarker extends E

  private def parsePostfix(p: P, b: Builder, sc: Scope): E = {
    var a = parsePrimary(p, b, sc)
    var go = true
    while (go) {
      if (p.eat(".")) {
        val m = p.ident()
        if (p.eat("(")) {
          val args = scala.collection.mutable.ArrayBuffer.empty[E]
          if (!p.peek(")")) {
            args += parseExpr(p, b, sc)
            while (p.eat(",")) args += parseExpr(p, b, sc)
          }
          p.expect(")")
          a = a match {
            case RowMarker => p.fail("row has no methods; use row.field")
            // parens present ⇒ an explicit CALL node, so zero-arg method
            // calls are distinguishable from property reads and `this`
            // binds to the receiver on object members
            case r => EMethCall(r, m, args.toSeq)
          }
        } else a = a match {
          case RowMarker => ERow(b.fieldIx(m))
          case r => EMeth(r, m, Seq.empty) // property (.length)
        }
      } else if (p.eat("[")) {
        a match {
          case RowMarker =>
            val q = p.peekChar.getOrElse(p.fail("expected subscript"))
            if (q != '\'' && q != '"') p.fail("row subscripts must be string literals")
            val f = p.stringLit(q)
            p.expect("]")
            a = ERow(b.fieldIx(f))
          case r =>
            val ix = parseExpr(p, b, sc)
            p.expect("]")
            a = EIndex(r, ix)
        }
      } else if (p.peek("(") && (a match {
          // call-through-value: only on nodes that can hold a function
          // (locals, upvalues, array/object reads, other call results,
          // function literals) — keeps `(a+b)(c)`-style accidents out
          case _: ELocal | _: EUp | _: EIndex | _: ECallV |
               _: EFuncExpr | _: EFuncRef | _: ECall => true
          case _ => false
        })) {
        p.expect("(")
        val args = scala.collection.mutable.ArrayBuffer.empty[E]
        if (!p.peek(")")) {
          args += parseExpr(p, b, sc)
          while (p.eat(",")) args += parseExpr(p, b, sc)
        }
        p.expect(")")
        a = ECallV(a, args.toSeq)
      } else go = false
    }
    a
  }

  private def parsePrimary(p: P, b: Builder, sc: Scope): E = {
    p.peekChar match {
      case Some('(') => p.expect("("); val e = parseExpr(p, b, sc); p.expect(")"); e
      case Some('[') =>
        p.expect("[")
        val elems = scala.collection.mutable.ArrayBuffer.empty[E]
        if (!p.peek("]")) {
          elems += parseExpr(p, b, sc)
          while (p.eat(",")) elems += parseExpr(p, b, sc)
        }
        p.expect("]")
        EArr(elems.toSeq)
      case Some('{') =>
        // object literal: {key: expr, 'key': expr, get k() {…},
        // set k(v) {…}, ...} — get/set are CONTEXTUAL: `{get: 1}` is a
        // plain field, `{get x() {…}}` an accessor
        p.expect("{")
        val fields = scala.collection.mutable.ArrayBuffer.empty[(String, E)]
        val getters = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
        val setters = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
        if (!p.peek("}")) {
          def accessor(kind: String): Unit = {
            val name = p.peekChar match {
              case Some('\'') => p.stringLit('\'')
              case Some('"') => p.stringLit('"')
              case _ => p.ident()
            }
            p.expect("(")
            val params = scala.collection.mutable.ArrayBuffer.empty[String]
            if (kind == "set") params += p.ident()
            p.expect(")")
            p.expect("{")
            // accessor bodies are ordinary inner functions: same closure
            // capture as EFuncExpr, `this` bound at invocation
            val inner = new Scope(None, Some(sc))
            params.foreach(inner.declare(_))
            val body = parseStmts(p, b, inner)
            p.expect("}")
            val ix = b.addInner(
              Fn(s"<$kind ${name}>", params.size, inner.slots.size, body))
            if (kind == "get") getters += name -> ix else setters += name -> ix
          }
          def field(): Unit = {
            val k = p.peekChar match {
              case Some('\'') => p.stringLit('\'')
              case Some('"') => p.stringLit('"')
              case _ => p.ident()
            }
            if ((k == "get" || k == "set") && !p.peek(":")) accessor(k)
            else { p.expect(":"); fields += k -> parseExpr(p, b, sc) }
          }
          field()
          while (p.eat(",")) field()
        }
        p.expect("}")
        EObj(fields.toSeq, getters.toSeq, setters.toSeq)
      case Some('\'') => EStr(p.stringLit('\''))
      case Some('"') => EStr(p.stringLit('"'))
      case Some('/') =>
        // primary position: '/' can't be division here, so it lexes as
        // a regex literal (the same disambiguation rule JS uses)
        val (pat, flags) = p.regexLit()
        val bad = flags.filterNot(c => c == 'g' || c == 'i')
        if (bad.nonEmpty) p.fail(s"unsupported regex flags: $bad")
        val jflags =
          if (flags.contains('i')) java.util.regex.Pattern.CASE_INSENSITIVE else 0
        val pattern =
          try java.util.regex.Pattern.compile(pat, jflags)
          catch {
            case e: java.util.regex.PatternSyntaxException =>
              p.fail(s"bad regex: ${e.getMessage}")
          }
        ERegex(JsRegex(pattern, flags.contains('g')))
      case Some(c) if c.isDigit => ENum(p.number())
      case _ =>
        val id = p.ident()
        id match {
          case "true" => EBool(true)
          case "false" => EBool(false)
          case "null" | "undefined" => ENull
          case "Math" =>
            p.expect("."); val f = p.ident(); p.expect("(")
            val args = scala.collection.mutable.ArrayBuffer.empty[E]
            if (!p.peek(")")) {
              args += parseExpr(p, b, sc)
              while (p.eat(",")) args += parseExpr(p, b, sc)
            }
            p.expect(")")
            EMath(f, args.toSeq)
          case "String" if p.peek(".") =>
            p.expect("."); val f = p.ident()
            if (f != "fromCharCode") p.fail(s"unsupported String.$f")
            p.expect("(")
            val a0 = parseExpr(p, b, sc)
            p.expect(")")
            EGlobal("fromCharCode", Seq(a0))
          case "Number" | "String" | "isNaN" =>
            p.expect("(")
            val a0 = parseExpr(p, b, sc)
            p.expect(")")
            EGlobal(id, Seq(a0))
          case "Object" if p.peek(".") =>
            p.expect("."); val f = p.ident()
            if (f != "keys" && f != "values")
              p.fail(s"unsupported Object.$f")
            p.expect("(")
            val a0 = parseExpr(p, b, sc)
            p.expect(")")
            EGlobal(if (f == "keys") "ObjectKeys" else "ObjectValues", Seq(a0))
          case "new" =>
            val ctor = p.ident()
            p.expect("(")
            val args = scala.collection.mutable.ArrayBuffer.empty[E]
            if (!p.peek(")")) {
              args += parseExpr(p, b, sc)
              while (p.eat(",")) args += parseExpr(p, b, sc)
            }
            p.expect(")")
            if (ctor == "Date") {
              if (args.isEmpty) p.fail(
                "new Date() reads the wall clock — gestures must be " +
                  "deterministic; pass epoch millis or Y/M/D components")
              if (args.size > 7) p.fail("new Date: too many arguments")
              ENewDate(args.toSeq)
            } else {
              // user constructor: the name resolves exactly like any
              // identifier (local, upvalue, or top-level function)
              val ctorE: E =
                if (sc.resolve(ctor).isDefined) sc.resolve(ctor).get match {
                  case (0, slot) => ELocal(slot)
                  case (lvl, slot) => EUp(lvl, slot)
                }
                else if (b.fnNames.contains(ctor)) EFuncRef(b.fnNames(ctor))
                else p.fail(s"unknown constructor 'new $ctor'")
              ENew(ctorE, args.toSeq)
            }
          case "Date" if p.peek(".") =>
            p.expect("."); val f = p.ident()
            if (f != "UTC") p.fail(s"unsupported Date.$f")
            p.expect("(")
            val args = scala.collection.mutable.ArrayBuffer.empty[E]
            args += parseExpr(p, b, sc)
            while (p.eat(",")) args += parseExpr(p, b, sc)
            p.expect(")")
            if (args.size > 7) p.fail("Date.UTC: too many arguments")
            EGlobal("DateUTC", args.toSeq)
          case "this" => EThis
          case "function" =>
            // anonymous function EXPRESSION — the closure tier: body
            // compiles into the shared fn table; free identifiers
            // resolve through the parent scope chain into EUp upvalues
            p.expect("(")
            val params = scala.collection.mutable.ArrayBuffer.empty[String]
            if (!p.peek(")")) {
              params += p.ident()
              while (p.eat(",")) params += p.ident()
            }
            p.expect(")")
            p.expect("{")
            val inner = new Scope(None, Some(sc))
            params.foreach(inner.declare(_))
            val body = parseStmts(p, b, inner)
            p.expect("}")
            EFuncExpr(b.addInner(
              Fn("<anon>", params.size, inner.slots.size, body)))
          case n if sc.rowVisible(n) => RowMarker
          case n if sc.resolve(n).isDefined =>
            sc.resolve(n).get match {
              case (0, slot) => ELocal(slot)
              case (lvl, slot) => EUp(lvl, slot)
            }
          case n if b.fnNames.contains(n) =>
            val ix = b.fnNames(n)
            if (!p.peek("(")) EFuncRef(ix) // top-level function as a value
            else {
              p.expect("(")
              val args = scala.collection.mutable.ArrayBuffer.empty[E]
              if (!p.peek(")")) {
                args += parseExpr(p, b, sc)
                while (p.eat(",")) args += parseExpr(p, b, sc)
              }
              p.expect(")")
              if (args.size != b.fnArity(ix))
                p.fail(s"'$n' takes ${b.fnArity(ix)} argument(s), got ${args.size}")
              ECall(ix, args.toSeq)
            }
          case n => p.fail(s"unknown identifier '$n'")
        }
    }
  }

  // ── interpreter ────────────────────────────────────────────────────
  private val MaxFuel = 1000000
  private val MaxDepth = 256

  /** Y/M/D[/h/m/s/ms] → epoch millis, JS constructor semantics: month
    * is 0-based with lenient overflow normalization (month 12 = next
    * January), years 0–99 map to 1900+y, fractional components truncate
    * toward zero, any null/NaN component poisons the date to NaN. The
    * calendar is UTC (the session-pinned zone — see [[JsDate]]). */
  private def dateFromComponents(comps: Seq[java.lang.Double]): Double = {
    if (comps.exists(c => c == null || c.isNaN)) return Double.NaN
    val v = comps.map(_.doubleValue.toLong)
    def at(i: Int, dflt: Long) = if (v.size > i) v(i) else dflt
    var year = at(0, 0)
    if (year >= 0 && year <= 99) year += 1900
    val cal = new java.util.GregorianCalendar(
      java.util.TimeZone.getTimeZone("UTC"))
    cal.setLenient(true)
    cal.clear()
    cal.set(java.util.Calendar.YEAR, year.toInt)
    cal.set(java.util.Calendar.MONTH, at(1, 0).toInt)
    cal.set(java.util.Calendar.DAY_OF_MONTH, at(2, 1).toInt)
    cal.set(java.util.Calendar.HOUR_OF_DAY, at(3, 0).toInt)
    cal.set(java.util.Calendar.MINUTE, at(4, 0).toInt)
    cal.set(java.util.Calendar.SECOND, at(5, 0).toInt)
    cal.set(java.util.Calendar.MILLISECOND, at(6, 0).toInt)
    cal.getTimeInMillis.toDouble
  }

  private sealed trait Sig
  private case object SigNormal extends Sig
  private case object SigBreak extends Sig
  private case object SigContinue extends Sig
  private final case class SigReturn(v: Any) extends Sig

  /** Run the program's entry over one row's referenced-field values
    * (aligned with `prog.rowFields`). */
  def run(prog: Program, fieldValues: Array[Any]): Any = {
    var fuel = MaxFuel
    def burn(): Unit = {
      fuel -= 1
      if (fuel <= 0) throw new IllegalStateException(
        s"JS gesture exceeded $MaxFuel steps on one row (non-terminating loop?)")
    }
    def d(v: Any): java.lang.Double = v match {
      case null => null
      case x: java.lang.Double => x
      case s: String => try s.toDouble catch { case _: Exception => Double.NaN }
      case b: java.lang.Boolean => if (b) 1.0 else 0.0
      case _: scala.collection.mutable.ArrayBuffer[_] => Double.NaN
      case _: JsRegex => Double.NaN // JS Number(/x/) is NaN
      case _: JsObj => Double.NaN // JS Number({}) is NaN
      case _: JsFunc => Double.NaN // JS Number(function) is NaN
      case dt: JsDate => dt.millis // Date.prototype.valueOf
      case other => sys.error(s"not numeric: $other")
    }
    def s(v: Any): String = v match {
      case null => null
      case x: java.lang.Double =>
        val xd = x.doubleValue
        if (xd == math.floor(xd) && !xd.isInfinite && math.abs(xd) < 1e15)
          xd.toLong.toString else xd.toString
      case a: scala.collection.mutable.ArrayBuffer[_] =>
        a.map(e => if (e == null) "" else s(e)).mkString(",")
      case other => other.toString
    }
    def truthy(v: Any): Boolean = v match {
      case null => false
      case b: java.lang.Boolean => b
      case x: java.lang.Double => !x.isNaN && x.doubleValue != 0.0
      case st: String => st.nonEmpty
      case _ => true // arrays (JS objects are always truthy)
    }
    def cmp(a: Any, bv: Any): Option[Int] = (a, bv) match {
      case (null, _) | (_, null) => None
      // loose == between two plain objects is IDENTITY in JS (no
      // ToPrimitive); the non-zero result makes ordered comparisons
      // between two objects always-false rather than meaningful
      case (x: JsObj, y: JsObj) => Some(if (x eq y) 0 else 1)
      case (x: String, y: String) => Some(x.compareTo(y))
      case (x: java.lang.Boolean, y: java.lang.Boolean) =>
        Some(x.compareTo(y))
      case (x, y) =>
        // arrays stringify first (so ['1'] == 1 coerces numerically via
        // the string, as in JS); mixed string-vs-number coerces both
        // sides numerically — same rule as the compiled subset
        val xv = x match { case ab: scala.collection.mutable.ArrayBuffer[_] => s(ab); case v => v }
        val yv = y match { case ab: scala.collection.mutable.ArrayBuffer[_] => s(ab); case v => v }
        (xv, yv) match {
          case (xs: String, ys: String) => Some(xs.compareTo(ys))
          case (x2, y2) =>
            val (dx, dy) = (d(x2), d(y2))
            if (dx == null || dy == null) None
            // Double.compare is the Java/Spark TOTAL order (NaN equals
            // itself and sorts greatest) — the documented tier-1 deviation
            else Some(java.lang.Double.compare(dx, dy))
        }
    }
    def kleene(a: Any, bv: Any, and: Boolean): Any = {
      val ta = if (a == null) null else java.lang.Boolean.valueOf(truthy(a))
      val tb = if (bv == null) null else java.lang.Boolean.valueOf(truthy(bv))
      if (and) (ta, tb) match {
        case (java.lang.Boolean.FALSE, _) | (_, java.lang.Boolean.FALSE) => false
        case (null, _) | (_, null) => null
        case _ => true
      } else (ta, tb) match {
        case (java.lang.Boolean.TRUE, _) | (_, java.lang.Boolean.TRUE) => true
        case (null, _) | (_, null) => null
        case _ => false
      }
    }
    // JS strict equality: NO coercion — different runtime types are
    // simply unequal. Unlike ==, null does NOT propagate: `x === null`
    // is THE JS null check and must return a real boolean (GraalVM
    // parity; SQL NULL arrives in JS as null). Arrays compare by
    // REFERENCE (JS object identity: [1] === [1] is false). The one
    // deviation: NaN === NaN is true here (the Java/Spark total order
    // every comparison in both tiers uses; JS says false).
    def strictEq(a: Any, bv: Any): Boolean = (a, bv) match {
      case (null, null) => true
      case (null, _) | (_, null) => false
      case (x: String, y: String) => x == y
      case (x: java.lang.Boolean, y: java.lang.Boolean) => x.booleanValue == y.booleanValue
      case (x: java.lang.Double, y: java.lang.Double) =>
        java.lang.Double.compare(x.doubleValue, y.doubleValue) == 0
      case (x: scala.collection.mutable.ArrayBuffer[_],
            y: scala.collection.mutable.ArrayBuffer[_]) => x eq y
      // Dates and objects: identity, not value (JS `d1 === d2`)
      case (x: JsDate, y: JsDate) => x eq y
      case (x: JsObj, y: JsObj) => x eq y
      case (x: JsFunc, y: JsFunc) => x eq y
      case _ => false
    }
    def toIdx(v: Any): Int = {
      val x = d(v)
      if (x == null) 0
      else if (x.isNaN) 0
      else if (x >= Int.MaxValue.toDouble) Int.MaxValue - 8
      else if (x <= Int.MinValue.toDouble) Int.MinValue + 8
      else x.toInt
    }

    // closure environment chain rides in ONE trailing frame slot (past
    // nSlots, so no local can collide) — threading a separate parameter
    // through every ev/exec call site would buy nothing
    val EmptyEnv = Array.empty[Array[Any]]
    def envOf(frame: Array[Any]): Array[Array[Any]] =
      frame(frame.length - 1).asInstanceOf[Array[Array[Any]]]
    // `this` rides in the second trailing frame slot (env is the last):
    // no local can collide (slots stop before), no extra parameter
    // threads through every ev/exec site
    def thisOf(frame: Array[Any]): Any = frame(frame.length - 2)

    // top-level function VALUES memoize per ROW evaluation: every
    // reference to a declared function is the same object (GraalVM
    // semantics — `F.prototype` mutations are visible through all refs
    // within the row), and the per-row array keeps prototype state
    // strictly row-isolated. Function EXPRESSIONS stay fresh per eval
    // (each evaluation of a literal is a new object in JS too).
    val fnVals = new Array[JsFunc](prog.fns.length)
    def fnValOf(ix: Int): JsFunc = {
      if (fnVals(ix) == null) fnVals(ix) = new JsFunc(ix, EmptyEnv)
      fnVals(ix)
    }
    def protoOf(jf: JsFunc): JsObj = {
      if (jf.prototype == null)
        jf.prototype = new JsObj(
          scala.collection.mutable.LinkedHashMap.empty[String, Any])
      jf.prototype
    }

    def callFn(ix: Int, args: Array[Any], depth: Int,
        env: Array[Array[Any]], thisv: Any = null): Any = {
      if (depth > MaxDepth)
        throw new IllegalStateException(s"JS gesture exceeded call depth $MaxDepth")
      val fn = prog.fns(ix)
      val frame = new Array[Any](fn.nSlots + 2)
      frame(fn.nSlots) = thisv
      frame(fn.nSlots + 1) = env
      System.arraycopy(args, 0, frame, 0, math.min(args.length, fn.nParams))
      exec(fn.body, frame, depth) match {
        case SigReturn(v) => v
        case _ => null // fall off the end: JS undefined → null
      }
    }

    /** Call a function VALUE (closure or top-level ref); missing args
      * are JS undefined → null, extras ignored. `thisv` binds `this`
      * for method-style invocations (null = plain call, the strict-mode
      * undefined). */
    def callValue(f: Any, args: Array[Any], depth: Int,
        thisv: Any = null): Any = f match {
      case jf: JsFunc => callFn(jf.fnIx, args, depth + 1, jf.env, thisv)
      // calling null/undefined (a typo'd property, a missing callback) is
      // a TypeError, not a silent undefined — GraalVM throws "x is not a
      // function" here, and masking it as null hides gesture bugs
      case null => sys.error("null is not a function")
      case other => sys.error(s"$other is not a function")
    }

    /** Object property READ: own getter → own data → up the prototype
      * chain (proto getters run with `this` = the ORIGINAL receiver —
      * the JS receiver rule). Chains are acyclic by construction (no
      * `__proto__` accessor); the cap is defensive only. */
    def objGet(o: JsObj, k: String, depth: Int): Any = {
      var cur = o
      var hops = 0
      while (cur != null) {
        if (hops > 64) sys.error("prototype chain too deep")
        if (cur.getters != null && cur.getters.contains(k))
          return callValue(cur.getters(k), Array.empty[Any], depth, o)
        if (cur.m.contains(k)) return cur.m(k)
        cur = cur.proto; hops += 1
      }
      null
    }

    /** Object property WRITE: an own or INHERITED setter intercepts
      * (running with `this` = the receiver); an own or inherited
      * getter-only accessor swallows the write (the JS sloppy-mode
      * no-op); otherwise the write creates/updates an OWN data property
      * — inherited data properties are shadowed, never mutated. */
    def objSet(o: JsObj, k: String, v: Any, depth: Int): Unit = {
      var cur = o
      var hops = 0
      while (cur != null) {
        if (hops > 64) sys.error("prototype chain too deep")
        if (cur.setters != null && cur.setters.contains(k)) {
          callValue(cur.setters(k), Array[Any](v), depth, o); return
        }
        if (cur.getters != null && cur.getters.contains(k)) return
        // an own DATA property stops the accessor search (it shadows
        // anything inherited); inherited data properties do not
        if ((cur eq o) && cur.m.contains(k)) { cur.m(k) = v; return }
        cur = cur.proto; hops += 1
      }
      o.m(k) = v
    }

    def exec(stmts: Vector[S], frame: Array[Any], depth: Int): Sig = {
      var i = 0
      while (i < stmts.length) {
        burn()
        stmts(i) match {
          case SExpr(e) => ev(e, frame, depth); ()
          case SAssign(LVar(slot), op, value) =>
            val v = ev(value, frame, depth)
            frame(slot) = if (op == "=") v else binOp(op, frame(slot), v)
          case SAssign(LUp(level, slot), op, value) =>
            // writes through the captured chain mutate the DEFINING
            // frame — JS shared-binding semantics
            val up = envOf(frame)(level - 1)
            val v = ev(value, frame, depth)
            up(slot) = if (op == "=") v else binOp(op, up(slot), v)
          case SAssign(LIndex(arrE, ixE), op, value) =>
            ev(arrE, frame, depth) match {
              case a: scala.collection.mutable.ArrayBuffer[_] =>
                val ab = a.asInstanceOf[scala.collection.mutable.ArrayBuffer[Any]]
                val ix = toIdx(ev(ixE, frame, depth))
                val v = ev(value, frame, depth)
                if (ix >= 0) {
                  while (ab.size <= ix) ab += null // JS sparse-extend
                  ab(ix) = if (op == "=") v else binOp(op, ab(ix), v)
                }
              case o: JsObj =>
                // obj['k'] = v — computed property assignment; the key
                // stringifies, exactly the JS property-key coercion;
                // reads/writes route through accessors when defined
                val k = s(ev(ixE, frame, depth))
                val v = ev(value, frame, depth)
                if (k != null)
                  objSet(o, k,
                    if (op == "=") v else binOp(op, objGet(o, k, depth), v),
                    depth)
              case null => () // null target: SQL propagation, no-op
              case other => sys.error(s"cannot index-assign into $other")
            }
          case SAssign(LProp(objE, name), op, value) =>
            ev(objE, frame, depth) match {
              case o: JsObj =>
                val v = ev(value, frame, depth)
                objSet(o, name,
                  if (op == "=") v else binOp(op, objGet(o, name, depth), v),
                  depth)
              case jf: JsFunc if name == "prototype" && op == "=" =>
                ev(value, frame, depth) match {
                  // wholesale prototype replacement: future `new F`
                  // instances link to the new object; existing instances
                  // keep their creation-time chain (the JS rule)
                  case po: JsObj => jf.prototype = po
                  case other => sys.error(s"F.prototype must be an object, got $other")
                }
              case null => () // null target: SQL propagation, no-op
              case other => sys.error(s"cannot set property .$name on $other")
            }
          case SIncDec(LProp(objE, name), delta) =>
            ev(objE, frame, depth) match {
              case o: JsObj =>
                val x = d(objGet(o, name, depth))
                objSet(o, name, if (x == null) null
                  else java.lang.Double.valueOf(x.doubleValue + delta), depth)
              case _ => ()
            }
          case SThrow(e) => throw JsThrown(ev(e, frame, depth))
          case STry(body, catchSlot, catchBody, fin) =>
            var out: Sig = SigNormal
            var pending: Throwable = null
            try out = exec(body, frame, depth)
            catch {
              case t: JsThrown =>
                if (catchSlot >= 0) {
                  frame(catchSlot) = t.v
                  // a rethrow from the catch block propagates (after
                  // the finally) — the JS completion rules
                  try out = exec(catchBody, frame, depth)
                  catch { case t2: JsThrown => pending = t2 }
                } else pending = t // try/finally without catch
            }
            val fsig = exec(fin, frame, depth)
            if (fsig != SigNormal) { pending = null; out = fsig }
            if (pending != null) throw pending
            out match {
              case SigNormal => ()
              case sig => return sig
            }
          case SIncDec(LVar(slot), delta) =>
            val x = d(frame(slot))
            frame(slot) = if (x == null) null
              else java.lang.Double.valueOf(x.doubleValue + delta)
          case SIncDec(LUp(level, slot), delta) =>
            val up = envOf(frame)(level - 1)
            val x = d(up(slot))
            up(slot) = if (x == null) null
              else java.lang.Double.valueOf(x.doubleValue + delta)
          case SIncDec(LIndex(arrE, ixE), delta) =>
            ev(arrE, frame, depth) match {
              case a: scala.collection.mutable.ArrayBuffer[_] =>
                val ab = a.asInstanceOf[scala.collection.mutable.ArrayBuffer[Any]]
                val ix = toIdx(ev(ixE, frame, depth))
                if (ix >= 0 && ix < ab.size) {
                  val x = d(ab(ix))
                  ab(ix) = if (x == null) null
                    else java.lang.Double.valueOf(x.doubleValue + delta)
                }
              case o: JsObj =>
                val k = s(ev(ixE, frame, depth))
                if (k != null) {
                  val x = d(objGet(o, k, depth))
                  objSet(o, k, if (x == null) null
                    else java.lang.Double.valueOf(x.doubleValue + delta), depth)
                }
              case _ => ()
            }
          case SIf(c, t, f) =>
            val branch = if (truthy(ev(c, frame, depth))) t else f
            exec(branch, frame, depth) match {
              case SigNormal => ()
              case sig => return sig
            }
          case SLoop(cond, body, update) =>
            var looping = true
            while (looping) {
              burn()
              if (cond.forall(c => truthy(ev(c, frame, depth)))) {
                exec(body, frame, depth) match {
                  case SigNormal | SigContinue =>
                    exec(update, frame, depth) match {
                      case SigNormal => ()
                      case sig => return sig // update can't break/continue
                    }
                  case SigBreak => looping = false
                  case ret: SigReturn => return ret
                }
              } else looping = false
            }
          case SReturn(e) =>
            return SigReturn(e.map(ev(_, frame, depth)).orNull)
          case SBreak => return SigBreak
          case SContinue => return SigContinue
        }
        i += 1
      }
      SigNormal
    }

    def binOp(op: String, a: Any, bv: Any): Any = op match {
      case "+" =>
        // string concat when either side renders as a string or array
        // (runtime-tagged — tier 1 decides from the schema, same result)
        (a, bv) match {
          case (null, _) | (_, null) => null
          case (x: String, y) => x + s(y)
          case (x, y: String) => s(x) + y
          case (x: scala.collection.mutable.ArrayBuffer[_], y) => s(x) + s(y)
          case (x, y: scala.collection.mutable.ArrayBuffer[_]) => s(x) + s(y)
          case (x, y) =>
            val (dx, dy) = (d(x), d(y))
            if (dx == null || dy == null) null
            else java.lang.Double.valueOf(dx + dy)
        }
      case "-" | "*" | "/" | "%" =>
        val (dx, dy) = (d(a), d(bv))
        if (dx == null || dy == null) null
        else java.lang.Double.valueOf(op match {
          case "-" => dx - dy
          case "*" => dx * dy
          case "/" => dx / dy
          case _ => dx % dy
        })
      case _ => sys.error(s"binOp $op")
    }

    def ev(e: E, frame: Array[Any], depth: Int): Any = {
      burn()
      e match {
        case ENum(v) => java.lang.Double.valueOf(v)
        case EStr(v) => v
        case EBool(v) => java.lang.Boolean.valueOf(v)
        case ERegex(re) => re
        case ENull => null
        case ELocal(slot) => frame(slot)
        case ERow(ix) => fieldValues(ix)
        case EUn("!", a) => ev(a, frame, depth) match {
          case null => null
          case v => java.lang.Boolean.valueOf(!truthy(v))
        }
        case EUn("-", a) =>
          val x = d(ev(a, frame, depth))
          if (x == null) null else java.lang.Double.valueOf(-x.doubleValue)
        case EUn(op, _) => sys.error(s"op $op")
        case EBin("&&", a, bv) =>
          // short-circuit: a decided LHS skips the RHS entirely, so JS
          // side-effect order holds (`cond && arr.push(x)` must not
          // push when cond is false). A null LHS still evaluates the
          // RHS for Kleene null-propagation (null && false == false) —
          // the one divergence from GraalVM, where null is plain falsy
          // and the RHS would be skipped; documented in the header.
          val l = ev(a, frame, depth)
          if (l != null && !truthy(l)) java.lang.Boolean.FALSE
          else kleene(l, ev(bv, frame, depth), and = true)
        case EBin("||", a, bv) =>
          val l = ev(a, frame, depth)
          if (l != null && truthy(l)) java.lang.Boolean.TRUE
          else kleene(l, ev(bv, frame, depth), and = false)
        case EBin("===", a, bv) =>
          java.lang.Boolean.valueOf(strictEq(ev(a, frame, depth), ev(bv, frame, depth)))
        case EBin("!==", a, bv) =>
          java.lang.Boolean.valueOf(!strictEq(ev(a, frame, depth), ev(bv, frame, depth)))
        case EBin("==", a, bv) =>
          cmp(ev(a, frame, depth), ev(bv, frame, depth))
            .map(c => java.lang.Boolean.valueOf(c == 0)).orNull
        case EBin("!=", a, bv) =>
          cmp(ev(a, frame, depth), ev(bv, frame, depth))
            .map(c => java.lang.Boolean.valueOf(c != 0)).orNull
        case EBin("<", a, bv) =>
          cmpOrdered(ev(a, frame, depth), ev(bv, frame, depth), c => c < 0)
        case EBin("<=", a, bv) =>
          cmpOrdered(ev(a, frame, depth), ev(bv, frame, depth), c => c <= 0)
        case EBin(">", a, bv) =>
          cmpOrdered(ev(a, frame, depth), ev(bv, frame, depth), c => c > 0)
        case EBin(">=", a, bv) =>
          cmpOrdered(ev(a, frame, depth), ev(bv, frame, depth), c => c >= 0)
        case EBin(op, a, bv) =>
          binOp(op, ev(a, frame, depth), ev(bv, frame, depth))
        case ETern(c, t, f) =>
          if (truthy(ev(c, frame, depth))) ev(t, frame, depth)
          else ev(f, frame, depth)
        case EArr(elems) =>
          val ab = new scala.collection.mutable.ArrayBuffer[Any](elems.size)
          elems.foreach(x => ab += ev(x, frame, depth))
          ab
        case EObj(fields, gets, sets) =>
          val m = scala.collection.mutable.LinkedHashMap.empty[String, Any]
          fields.foreach { case (k, v) => m(k) = ev(v, frame, depth) }
          val o = new JsObj(m)
          if (gets.nonEmpty) {
            o.getters = scala.collection.mutable.LinkedHashMap.empty[String, Any]
            gets.foreach { case (k, ix) =>
              o.getters(k) = new JsFunc(ix, frame +: envOf(frame)) }
          }
          if (sets.nonEmpty) {
            o.setters = scala.collection.mutable.LinkedHashMap.empty[String, Any]
            sets.foreach { case (k, ix) =>
              o.setters(k) = new JsFunc(ix, frame +: envOf(frame)) }
          }
          o
        case EIndex(arrE, ixE) =>
          // base evaluates BEFORE the subscript (JS order); the
          // subscript coerces per receiver — integer for arrays and
          // strings, property-key string for objects
          val base = ev(arrE, frame, depth)
          base match {
            case null => ev(ixE, frame, depth); null
            case o: JsObj =>
              val k = s(ev(ixE, frame, depth))
              if (k == null) null else objGet(o, k, depth)
            case a: scala.collection.mutable.ArrayBuffer[_] =>
              val ix = toIdx(ev(ixE, frame, depth))
              if (ix >= 0 && ix < a.size) a(ix) else null
            case st: String =>
              val ix = toIdx(ev(ixE, frame, depth))
              if (ix >= 0 && ix < st.length) st.charAt(ix).toString else null
            case other => sys.error(s"cannot index $other")
          }
        case ECall(ix, args) =>
          val vs = new Array[Any](args.size)
          var i = 0
          while (i < args.size) { vs(i) = ev(args(i), frame, depth); i += 1 }
          callFn(ix, vs, depth + 1, EmptyEnv)
        case ECallV(fnE, args) =>
          val f = ev(fnE, frame, depth)
          val vs = new Array[Any](args.size)
          var i = 0
          while (i < args.size) { vs(i) = ev(args(i), frame, depth); i += 1 }
          callValue(f, vs, depth)
        case EUp(level, slot) => envOf(frame)(level - 1)(slot)
        case EThis => thisOf(frame)
        case EFuncRef(ix) => fnValOf(ix)
        case EFuncExpr(ix) => new JsFunc(ix, frame +: envOf(frame))
        case ENew(ctorE, args) =>
          ev(ctorE, frame, depth) match {
            case jf: JsFunc =>
              val o = new JsObj(
                scala.collection.mutable.LinkedHashMap.empty[String, Any])
              o.proto = protoOf(jf)
              val vs = new Array[Any](args.size)
              var i = 0
              while (i < args.size) { vs(i) = ev(args(i), frame, depth); i += 1 }
              callFn(jf.fnIx, vs, depth + 1, jf.env, o) match {
                // the JS constructor-return rule: an explicit OBJECT
                // return overrides; primitives/undefined yield the new
                // instance
                case ro: JsObj => ro
                case _ => o
              }
            case other => sys.error(s"$other is not a constructor")
          }
        case EMeth(recvE, name, args) =>
          val recv = ev(recvE, frame, depth)
          evalMethod(recv, name, args, frame, depth)
        case EMethCall(recvE, name, args) =>
          val recv = ev(recvE, frame, depth)
          recv match {
            case o: JsObj if name == "hasOwnProperty" =>
              val k = s(ev(args.head, frame, depth))
              java.lang.Boolean.valueOf(k != null && (o.m.contains(k) ||
                (o.getters != null && o.getters.contains(k)) ||
                (o.setters != null && o.setters.contains(k))))
            case o: JsObj =>
              // resolve the member (through a getter if defined), then
              // call with `this` = the receiver — JS method invocation
              val f = objGet(o, name, depth)
              val vs = new Array[Any](args.size)
              var i = 0
              while (i < args.size) { vs(i) = ev(args(i), frame, depth); i += 1 }
              callValue(f, vs, depth, o)
            case jf: JsFunc if name == "prototype" =>
              // F.prototype(x): resolve the member like a read would
              // (auto-vivifies, same as the parenless path), then fail
              // the CALL — prototype objects are not callable, and
              // falling through to the property-read path would silently
              // discard the arguments instead of raising the TypeError
              // every other non-callable call gets
              protoOf(jf)
              sys.error("prototype object is not a function")
            // built-in receivers (arrays, strings, regex, dates) keep
            // the built-in method table
            case other => evalMethod(other, name, args, frame, depth)
          }
        case EMath(name, args) =>
          val vs = args.map(a => d(ev(a, frame, depth)))
          if (vs.exists(_ == null)) null
          else java.lang.Double.valueOf(name match {
            case "abs" => math.abs(vs.head.doubleValue)
            case "floor" => math.floor(vs.head.doubleValue)
            case "ceil" => math.ceil(vs.head.doubleValue)
            case "sqrt" => math.sqrt(vs.head.doubleValue)
            case "round" => math.floor(vs.head.doubleValue + 0.5)
            case "pow" => math.pow(vs.head.doubleValue, vs(1).doubleValue)
            case "min" => vs.map(_.doubleValue).min
            case "max" => vs.map(_.doubleValue).max
            case other => sys.error(s"unsupported Math.$other")
          })
        case EGlobal("Number", Seq(a)) =>
          ev(a, frame, depth) match { case null => null; case v => d(v) }
        case EGlobal("String", Seq(a)) =>
          ev(a, frame, depth) match { case null => null; case v => s(v) }
        case EGlobal("isNaN", Seq(a)) =>
          ev(a, frame, depth) match {
            case null => null
            case v => java.lang.Boolean.valueOf({ val x = d(v); x != null && x.isNaN })
          }
        case EGlobal("fromCharCode", Seq(a)) =>
          ev(a, frame, depth) match {
            case null => null
            case v =>
              val code = toIdx(v)
              if (code < 0 || code > Char.MaxValue.toInt) "�"
              else code.toChar.toString
          }
        case EGlobal("ObjectKeys", Seq(x)) =>
          ev(x, frame, depth) match {
            case o: JsObj =>
              val ab = new scala.collection.mutable.ArrayBuffer[Any](o.m.size)
              o.m.keysIterator.foreach(ab += _)
              ab
            case other => sys.error(s"Object.keys on non-object $other")
          }
        case EGlobal("ObjectValues", Seq(x)) =>
          ev(x, frame, depth) match {
            case o: JsObj =>
              val ab = new scala.collection.mutable.ArrayBuffer[Any](o.m.size)
              o.m.valuesIterator.foreach(ab += _)
              ab
            case other => sys.error(s"Object.values on non-object $other")
          }
        case EGlobal("DateUTC", args) =>
          java.lang.Double.valueOf(
            dateFromComponents(args.map(x => d(ev(x, frame, depth)))))
        case ENewDate(args) =>
          if (args.size == 1) {
            // JS new Date(v): ToNumber(v) — null coerces to epoch 0,
            // NaN/unparseable yields an Invalid Date
            val x = d(ev(args.head, frame, depth))
            new JsDate(if (x == null) 0.0 else x.doubleValue)
          } else
            new JsDate(dateFromComponents(args.map(x => d(ev(x, frame, depth)))))
        case EGlobal(g, _) => sys.error(s"unsupported global $g")
        case RowMarker => sys.error("bare row parameter")
      }
    }

    def cmpOrdered(a: Any, bv: Any, f: Int => Boolean): Any = {
      // ordered comparisons: NaN uses Java/Spark total order (documented
      // deviation shared with tier 1), so route through the double path
      (a, bv) match {
        case (null, _) | (_, null) => null
        case (x: String, y: String) => java.lang.Boolean.valueOf(f(x.compareTo(y)))
        case (x, y) =>
          val (dx, dy) = (d(x), d(y))
          if (dx == null || dy == null) null
          else java.lang.Boolean.valueOf(f(java.lang.Double.compare(dx, dy)))
      }
    }

    def evalMethod(recv: Any, name: String, args: Seq[E],
        frame: Array[Any], depth: Int): Any = {
      recv match {
        case null => null
        case o: JsObj =>
          // parenful calls route through EMethCall (which binds `this`);
          // this path only ever sees parenless PROPERTY READS — through
          // a getter when one is defined
          objGet(o, name, depth)
        case jf: JsFunc if name == "prototype" =>
          // F.prototype — auto-vivified; mutations through it are what
          // build the method table `new F` instances inherit
          protoOf(jf)
        case re: JsRegex =>
          name match {
            case "test" =>
              // JS RegExp.test: partial match anywhere (Matcher.find)
              val v = ev(args.head, frame, depth)
              if (v == null) null
              else java.lang.Boolean.valueOf(re.p.matcher(s(v)).find())
            case other => sys.error(s"unsupported regex method .$other")
          }
        case a: scala.collection.mutable.ArrayBuffer[_] =>
          val ab = a.asInstanceOf[scala.collection.mutable.ArrayBuffer[Any]]
          name match {
            case "length" => java.lang.Double.valueOf(ab.size.toDouble)
            case "push" =>
              args.foreach(x => ab += ev(x, frame, depth))
              java.lang.Double.valueOf(ab.size.toDouble)
            case "pop" =>
              if (ab.isEmpty) null else ab.remove(ab.size - 1)
            case "join" =>
              val sep = if (args.isEmpty) "," else {
                val v = ev(args.head, frame, depth)
                if (v == null) "," else s(v)
              }
              ab.map(x => if (x == null) "" else s(x)).mkString(sep)
            case "indexOf" =>
              val target = ev(args.head, frame, depth)
              java.lang.Double.valueOf(
                ab.indexWhere(x => cmp(x, target).contains(0)).toDouble)
            case "slice" =>
              val lo0 = if (args.nonEmpty) toIdx(ev(args.head, frame, depth)) else 0
              val hi0 = if (args.size > 1) toIdx(ev(args(1), frame, depth)) else ab.size
              def norm(i0: Int) = if (i0 < 0) math.max(0, ab.size + i0) else math.min(i0, ab.size)
              val lo = norm(lo0); val hi = math.max(lo, norm(hi0))
              val out = new scala.collection.mutable.ArrayBuffer[Any](hi - lo)
              var i = lo
              while (i < hi) { out += ab(i); i += 1 }
              out
            case "map" =>
              val f = ev(args.head, frame, depth)
              val out = new scala.collection.mutable.ArrayBuffer[Any](ab.size)
              var i = 0
              while (i < ab.size) {
                out += callValue(f, Array[Any](ab(i),
                  java.lang.Double.valueOf(i.toDouble)), depth)
                i += 1
              }
              out
            case "filter" =>
              val f = ev(args.head, frame, depth)
              val out = new scala.collection.mutable.ArrayBuffer[Any]()
              var i = 0
              while (i < ab.size) {
                if (truthy(callValue(f, Array[Any](ab(i),
                  java.lang.Double.valueOf(i.toDouble)), depth))) out += ab(i)
                i += 1
              }
              out
            case "forEach" =>
              val f = ev(args.head, frame, depth)
              var i = 0
              while (i < ab.size) {
                callValue(f, Array[Any](ab(i),
                  java.lang.Double.valueOf(i.toDouble)), depth)
                i += 1
              }
              null
            case "reduce" =>
              val f = ev(args.head, frame, depth)
              var acc: Any = null
              var i = 0
              if (args.size > 1) acc = ev(args(1), frame, depth)
              else {
                if (ab.isEmpty)
                  sys.error("reduce of empty array with no initial value")
                acc = ab(0); i = 1
              }
              while (i < ab.size) {
                acc = callValue(f, Array[Any](acc, ab(i),
                  java.lang.Double.valueOf(i.toDouble)), depth)
                i += 1
              }
              acc
            case "some" | "every" =>
              val f = ev(args.head, frame, depth)
              var i = 0
              var short = false
              val someWanted = name == "some"
              while (i < ab.size && !short) {
                val hit = truthy(callValue(f, Array[Any](ab(i),
                  java.lang.Double.valueOf(i.toDouble)), depth))
                if (hit == someWanted) short = true
                i += 1
              }
              java.lang.Boolean.valueOf(if (someWanted) short else !short)
            case "sort" =>
              // comparator form when a callback is given, else the JS
              // default stringify order; mutates AND returns (JS)
              val sorted =
                if (args.isEmpty)
                  ab.sortWith((x, y) => {
                    val sx = if (x == null) "null" else s(x)
                    val sy = if (y == null) "null" else s(y)
                    sx.compareTo(sy) < 0
                  })
                else {
                  val f = ev(args.head, frame, depth)
                  ab.sortWith((x, y) => {
                    val c = d(callValue(f, Array[Any](x, y), depth))
                    c != null && !c.isNaN && c.doubleValue < 0
                  })
                }
              ab.clear(); ab ++= sorted
              ab
            case other => sys.error(s"unsupported array method .$other")
          }
        case dt: JsDate =>
          // calendar getters in UTC — identical to the getUTC* forms
          // because the engine pins sessions to UTC (see JsDate)
          def field(f: java.time.ZonedDateTime => Int): java.lang.Double =
            if (dt.millis.isNaN) java.lang.Double.valueOf(Double.NaN)
            else java.lang.Double.valueOf(
              f(java.time.Instant.ofEpochMilli(dt.millis.toLong)
                .atZone(java.time.ZoneOffset.UTC)).toDouble)
          name match {
            case "getTime" | "valueOf" => java.lang.Double.valueOf(dt.millis)
            case "getFullYear" | "getUTCFullYear" => field(_.getYear)
            case "getMonth" | "getUTCMonth" => field(_.getMonthValue - 1)
            case "getDate" | "getUTCDate" => field(_.getDayOfMonth)
            // JS day-of-week: 0 = Sunday; ISO: 1 = Monday .. 7 = Sunday
            case "getDay" | "getUTCDay" => field(_.getDayOfWeek.getValue % 7)
            case "getHours" | "getUTCHours" => field(_.getHour)
            case "getMinutes" | "getUTCMinutes" => field(_.getMinute)
            case "getSeconds" | "getUTCSeconds" => field(_.getSecond)
            case "getMilliseconds" | "getUTCMilliseconds" =>
              field(z => (z.getNano / 1000000))
            case "getTimezoneOffset" => java.lang.Double.valueOf(0.0)
            case "toISOString" =>
              if (dt.millis.isNaN) sys.error("toISOString on Invalid Date")
              else dt.toString
            case other => sys.error(s"unsupported Date method .$other")
          }
        case _ =>
          // string methods (non-string receivers stringify, as tier 1)
          val str = s(recv)
          name match {
            case "toLowerCase" => str.toLowerCase
            case "toUpperCase" => str.toUpperCase
            case "trim" => str.trim
            case "length" => java.lang.Double.valueOf(str.length.toDouble)
            case "charAt" =>
              val i = toIdx(ev(args.head, frame, depth))
              if (i < 0 || i >= str.length) "" else str.charAt(i).toString
            case "charCodeAt" =>
              val i = toIdx(ev(args.head, frame, depth))
              java.lang.Double.valueOf(
                if (i < 0 || i >= str.length) Double.NaN else str.charAt(i).toDouble)
            case "indexOf" =>
              val v = ev(args.head, frame, depth)
              if (v == null) null
              else java.lang.Double.valueOf(str.indexOf(s(v)).toDouble)
            case "includes" =>
              val v = ev(args.head, frame, depth)
              if (v == null) null else java.lang.Boolean.valueOf(str.contains(s(v)))
            case "startsWith" =>
              val v = ev(args.head, frame, depth)
              if (v == null) null else java.lang.Boolean.valueOf(str.startsWith(s(v)))
            case "endsWith" =>
              val v = ev(args.head, frame, depth)
              if (v == null) null else java.lang.Boolean.valueOf(str.endsWith(s(v)))
            case "substring" =>
              val a0 = toIdx(ev(args.head, frame, depth))
              val b0 = if (args.size > 1) toIdx(ev(args(1), frame, depth)) else str.length
              val lo = math.max(0, math.min(a0, str.length))
              val hi = math.max(lo, math.min(b0, str.length))
              str.substring(lo, hi)
            case "replace" =>
              val from = ev(args.head, frame, depth)
              val to = ev(args(1), frame, depth)
              if (from == null || to == null) null
              else from match {
                case re: JsRegex =>
                  // /g replaces all; otherwise first only (JS). The JS
                  // replacement dialect ($&, $1..$9, $$) converts to
                  // Java's ($0, $1..$9, escaped $)
                  val m = re.p.matcher(str)
                  val rep = javaReplacement(s(to))
                  if (re.global) m.replaceAll(rep) else m.replaceFirst(rep)
                case _ =>
                  val fs = s(from); val ts = s(to)
                  val p0 = str.indexOf(fs)
                  if (p0 < 0) str
                  else str.substring(0, p0) + ts + str.substring(p0 + fs.length)
              }
            case "match" =>
              ev(args.head, frame, depth) match {
                case null => null
                case re: JsRegex =>
                  val m = re.p.matcher(str)
                  if (re.global) {
                    // /g: array of all full-match strings, null if none
                    val out = new scala.collection.mutable.ArrayBuffer[Any]()
                    while (m.find()) out += m.group()
                    if (out.isEmpty) null else out
                  } else {
                    // no /g: [full, group1, ...] of the first match
                    if (!m.find()) null
                    else {
                      val out = new scala.collection.mutable.ArrayBuffer[Any](
                        m.groupCount() + 1)
                      out += m.group()
                      var g = 1
                      while (g <= m.groupCount()) { out += m.group(g); g += 1 }
                      out
                    }
                  }
                case other => sys.error(s".match expects a regex, got $other")
              }
            case "search" =>
              ev(args.head, frame, depth) match {
                case null => null
                case re: JsRegex =>
                  val m = re.p.matcher(str)
                  java.lang.Double.valueOf(if (m.find()) m.start().toDouble else -1.0)
                case other => sys.error(s".search expects a regex, got $other")
              }
            case "split" =>
              val v = ev(args.head, frame, depth)
              if (v == null) null
              else {
                val parts: Array[String] = v match {
                  case re: JsRegex => re.p.split(str, -1)
                  case _ =>
                    val sep = s(v)
                    if (sep.isEmpty) str.toCharArray.map(_.toString)
                    else str.split(java.util.regex.Pattern.quote(sep), -1)
                }
                val out = new scala.collection.mutable.ArrayBuffer[Any](parts.length)
                parts.foreach(out += _)
                out
              }
            case "repeat" =>
              val n = toIdx(ev(args.head, frame, depth))
              if (n < 0) sys.error("repeat: negative count")
              else str * math.min(n, 1 << 20)
            case other => sys.error(s"unsupported method .$other on string")
          }
      }
    }

    // the entry's single parameter is the row object, which is never a
    // runtime value (all field reads were rewritten to ERow at parse
    // time) — its slot stays null
    try callFn(prog.entryIx, new Array[Any](1), 0, EmptyEnv)
    catch {
      // an uncaught user `throw` kills the GESTURE with a readable
      // message (GraalVM parity: the script error propagates to the
      // host), never escapes as bare control flow
      case t: JsThrown => throw new IllegalStateException(
        s"uncaught JS exception: ${if (t.v == null) "null" else s(t.v)}")
    }
  }

  // ── Spark value bridging ───────────────────────────────────────────
  private[functions] def fromSpark(v: Any, dt: DataType): Any = dt match {
    // dates/timestamps arrive in JS as real Date OBJECTS, exactly the
    // reference's row proxy (JSVirtualRowSnapshot.java:52-58 evals
    // `new Date(millis)`): calendar getters work, arithmetic still
    // coerces through valueOf → millis, so `row.t - row.d` stays the
    // interval-in-millis it was under the earlier number substitution
    case DateType => v match {
      case null => null
      case i: java.lang.Integer => new JsDate(i.doubleValue * 86400000.0)
      case other => sys.error(s"unexpected date value $other")
    }
    case _: TimestampType | TimestampNTZType => v match {
      case null => null
      case l: java.lang.Long => new JsDate(l.doubleValue / 1000.0)
      case other => sys.error(s"unexpected timestamp value $other")
    }
    case _ => v match {
      case null => null
      case u: UTF8String => u.toString
      case d: java.lang.Double => d
      case f: java.lang.Float => java.lang.Double.valueOf(f.doubleValue)
      case i: java.lang.Integer => java.lang.Double.valueOf(i.doubleValue)
      case l: java.lang.Long => java.lang.Double.valueOf(l.doubleValue)
      case s: java.lang.Short => java.lang.Double.valueOf(s.doubleValue)
      case b: java.lang.Byte => java.lang.Double.valueOf(b.doubleValue)
      case b: java.lang.Boolean => b
      case dec: org.apache.spark.sql.types.Decimal =>
        java.lang.Double.valueOf(dec.toDouble)
      case other =>
        sys.error(s"unsupported JS gesture input type $dt ($other)")
    }
  }

  /** Render a JS value into the declared output type. Strings use the
    * JS rendering (integral doubles drop the ".0"); doubles coerce via
    * JS Number (unparseable → NaN, null stays null); booleans use JS
    * truthiness (never null — the filter verdict). */
  private[functions] def toSpark(v: Any, dt: DataType): Any = dt match {
    case StringType =>
      v match {
        case null => null
        case x: java.lang.Double =>
          val xd = x.doubleValue
          UTF8String.fromString(
            if (xd == math.floor(xd) && !xd.isInfinite && math.abs(xd) < 1e15)
              xd.toLong.toString else xd.toString)
        case st: String => UTF8String.fromString(st)
        case b: java.lang.Boolean => UTF8String.fromString(if (b) "true" else "false")
        case a: scala.collection.mutable.ArrayBuffer[_] =>
          UTF8String.fromString(a.map {
            case null => ""
            case x: java.lang.Double =>
              val xd = x.doubleValue
              if (xd == math.floor(xd) && !xd.isInfinite && math.abs(xd) < 1e15)
                xd.toLong.toString else xd.toString
            case other => other.toString
          }.mkString(","))
        case other => UTF8String.fromString(other.toString)
      }
    case DoubleType =>
      v match {
        case null => null
        case x: java.lang.Double => x
        case st: String =>
          try java.lang.Double.valueOf(st.toDouble)
          catch { case _: Exception => java.lang.Double.valueOf(Double.NaN) }
        case b: java.lang.Boolean => java.lang.Double.valueOf(if (b) 1.0 else 0.0)
        // a returned Date lands in a numeric column as epoch millis —
        // the reference's Date-kind conversion (invokeMember("getTime"))
        case jd: JsDate => java.lang.Double.valueOf(jd.millis)
        case _ => java.lang.Double.valueOf(Double.NaN)
      }
    case BooleanType =>
      v match {
        case null => java.lang.Boolean.FALSE
        case b: java.lang.Boolean => b
        case x: java.lang.Double =>
          java.lang.Boolean.valueOf(!x.isNaN && x.doubleValue != 0.0)
        case st: String => java.lang.Boolean.valueOf(st.nonEmpty)
        case _ => java.lang.Boolean.TRUE
      }
    case other => sys.error(s"unsupported JS gesture output type $other")
  }

  /** Build the gesture Column for a frame: children are exactly the
    * referenced fields (column pruning reaches the scan). */
  def columnFor(js: String, df: DataFrame, out: DataType): Column = {
    val prog = parse(js)
    val schema = df.schema.fields.map(f => f.name).toSet
    prog.rowFields.foreach { f =>
      require(schema.contains(f), s"no such column: $f")
    }
    val children = prog.rowFields.map(f =>
      org.apache.spark.sql.graftshim.columnToExpr(df.col(f)))
    org.apache.spark.sql.graftshim.exprToColumn(
      JsProgramEval(prog, out, children))
  }
}

/** Per-row evaluation of a parsed JS gesture program. Deterministic,
  * interpreted (CodegenFallback — the dynamic-program tier trades
  * codegen for generality, exactly the reference's per-row Graal
  * evaluation, minus the process-global context). Children are the
  * referenced row fields only. */
case class JsProgramEval(prog: JsProgram.Program, out: DataType,
    children: Seq[Expression])
  extends Expression with CodegenFallback {

  override def nullable: Boolean = true
  override def dataType: DataType = out

  override def eval(input: InternalRow): Any = {
    val vals = new Array[Any](children.length)
    var i = 0
    while (i < children.length) {
      vals(i) = JsProgram.fromSpark(children(i).eval(input), children(i).dataType)
      i += 1
    }
    JsProgram.toSpark(JsProgram.run(prog, vals), out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
