package graft

import graft.functions.{JsGesture, JsProgram}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DoubleType, StringType}

/** Full-program JS gestures (loops, reassignment, user functions,
  * arrays) — the tier the compiled-Column subset can't express.
  * Includes the tier-parity fuzz: every subset program must evaluate
  * identically through the tier-2 interpreter.
  */
class JsProgramSpec extends SparkSpec {

  import spark.implicits._

  private lazy val frame = {
    val words = Seq("alpha", "Bravo Chad", " delta ", "echo1", "fox trot")
    val tags = Seq("RED", "green", "Blue")
    (0 until 60).map(i =>
      (i.toDouble, (i % 7).toDouble, words(i % 5), tags(i % 3)))
      .toDF("d", "q", "m", "f")
  }

  test("for loop with charCodeAt: positional checksum matches hand computation") {
    val js = """function map(row) {
      var c = row.m;
      var acc = 0;
      for (var i = 0; i < c.length; i++) {
        acc = (acc + (i + 1) * c.charCodeAt(i)) % 1000003;
      }
      return acc;
    }"""
    val got = JsGesture.withJsColumnTyped(frame, "acc", js, DoubleType)
      .select(col("d"), col("acc")).collect()
      .map(r => r.getDouble(0).toInt -> r.getDouble(1)).toMap
    val words = Seq("alpha", "Bravo Chad", " delta ", "echo1", "fox trot")
    (0 until 60).foreach { i =>
      val w = words(i % 5)
      val expect = w.zipWithIndex.map { case (ch, j) => (j + 1L) * ch.toLong }
        .sum % 1000003L
      assert(got(i) == expect.toDouble, s"i=$i")
    }
  }

  test("while loop with break/continue and compound assignment") {
    val js = """function map(row) {
      var n = row.d;
      var steps = 0;
      while (true) {
        if (n <= 1) break;
        if (n % 2 == 0) { n /= 2; steps += 1; continue; }
        n = 3 * n + 1;
        steps += 1;
      }
      return steps;
    }"""
    val got = JsGesture.withJsColumnTyped(frame, "steps", js, DoubleType)
      .select(col("d"), col("steps")).collect()
      .map(r => r.getDouble(0).toInt -> r.getDouble(1)).toMap
    def collatz(n0: Long): Long = {
      var n = n0; var s = 0L
      while (n > 1) { if (n % 2 == 0) n /= 2 else n = 3 * n + 1; s += 1 }
      s
    }
    (0 until 60).foreach(i => assert(got(i) == collatz(i).toDouble, s"i=$i"))
  }

  test("user functions: helpers and recursion") {
    val js = """function digits(n) {
      if (n < 10) return 1;
      return 1 + digits(Math.floor(n / 10));
    }
    function sq(x) { return x * x; }
    function map(row) { return digits(row.d + 1) * 1000 + sq(row.q); }"""
    val got = JsGesture.withJsColumnTyped(frame, "x", js, DoubleType)
      .select(col("d"), col("x")).collect()
      .map(r => r.getDouble(0).toInt -> r.getDouble(1)).toMap
    (0 until 60).foreach { i =>
      val expect = (i + 1).toString.length * 1000 + math.pow(i % 7, 2)
      assert(got(i) == expect, s"i=$i got=${got(i)}")
    }
  }

  test("arrays: split, push, indexOf, join, index assignment, slice") {
    val js = """function map(row) {
      var ws = row.m.split(' ');
      var lens = [];
      for (var i = 0; i < ws.length; i++) { lens.push(ws[i].length); }
      var best = 0;
      for (var j = 0; j < lens.length; j++) {
        if (lens[j] > best) best = lens[j];
      }
      lens[0] = best;
      return ws.length + ':' + best + ':' + lens.join('-') +
        ':' + ws.indexOf('trot') + ':' + ws.slice(0, 1).join('|');
    }"""
    val got = JsGesture.withJsColumn(frame, "x", js)
      .select(col("d"), col("x")).collect()
      .map(r => r.getDouble(0).toInt -> r.getString(1)).toMap
    val words = Seq("alpha", "Bravo Chad", " delta ", "echo1", "fox trot")
    (0 until 60).foreach { i =>
      val ws = words(i % 5).split(java.util.regex.Pattern.quote(" "), -1).toSeq
      val lens = ws.map(_.length)
      val best = lens.max
      val lens2 = best +: lens.tail
      val expect = s"${ws.length}:$best:${lens2.mkString("-")}:" +
        s"${ws.indexOf("trot")}:${ws.take(1).mkString("|")}"
      assert(got(i) == expect, s"i=$i got=${got(i)} expect=$expect")
    }
  }

  test("filter gesture: while-loop digit sum, JS truthiness verdict") {
    val js = """function filter(row) {
      var n = row.d;
      var s = 0;
      while (n > 0) { s = s + n % 10; n = Math.floor(n / 10); }
      return s % 3 == 0;
    }"""
    val kept = JsGesture.jsFilter(frame, js).select(col("d")).collect()
      .map(_.getDouble(0).toInt).toSet
    // digit sum divisible by 3 ⇔ n divisible by 3 (casting out threes);
    // n=0 has digit sum 0 via an unentered loop
    assert(kept == (0 until 60).filter(_ % 3 == 0).toSet)
  }

  test("fall-off-the-end returns null; fuel bounds runaway loops") {
    val js = "function map(row) { if (row.d < 0) return 'neg'; }"
    val out = JsGesture.withJsColumn(frame, "x", js).select(col("x")).collect()
    assert(out.forall(_.isNullAt(0)))

    val runaway = "function map(row) { while (true) { } return 1; }"
    val err = intercept[Exception] {
      JsGesture.withJsColumnTyped(frame, "x", runaway, DoubleType)
        .select(col("x")).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(err).exists(_.getMessage != null) &&
      causes(err).exists(c => c.getMessage != null && c.getMessage.contains("exceeded")))
  }

  test("program expression reads only referenced fields (column pruning)") {
    val li = graft.engine.Tables.lineitem(spark, sf)
    val js = """function map(row) {
      var acc = 0;
      for (var i = 0; i < 3; i++) { acc += row.l_quantity * (i + 1); }
      return acc;
    }"""
    val plan = JsGesture.withJsColumnTyped(li, "acc", js, DoubleType)
      .select(col("acc")).queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<l_quantity:double>"), plan)
  }

  test("tier dispatch: subset programs still compile to Columns (codegen path)") {
    // a subset gesture must NOT go through JsProgramEval
    val subsetJs = "function map(row) { return row.q * 2 + 1; }"
    val c = JsGesture.withJsColumnTyped(frame, "x", subsetJs, DoubleType)
    val exprStr = c.select(col("x")).queryExecution.analyzed.toString
    assert(!exprStr.contains("JsProgramEval"), exprStr)
    // and a loop gesture MUST
    val loopJs = "function map(row) { var a = 0; while (a < row.q) { a++; } return a; }"
    val c2 = JsGesture.withJsColumnTyped(frame, "x", loopJs, DoubleType)
    val exprStr2 = c2.select(col("x")).queryExecution.analyzed.toString
    assert(exprStr2.toLowerCase.contains("jsprogrameval"), exprStr2)
  }

  test("tier parity fuzz: every subset program evaluates identically in tier 2") {
    val rnd = new scala.util.Random(20260815L)
    val strLits = Seq("a", "lp", "ox", "e", "ree", "a b")
    val numLits = Seq(0.0, 1.0, 2.0, 3.5, 7.0, 10.25)
    def renderNum(d: Double): String =
      if (d == math.floor(d)) d.toLong.toString else d.toString
    def genNum(depth: Int): String =
      if (depth <= 0) rnd.nextInt(3) match {
        case 0 => renderNum(numLits(rnd.nextInt(numLits.size)))
        case 1 => "row.d"
        case _ => "row.q"
      } else rnd.nextInt(11) match {
        case 0 => s"(${genNum(depth - 1)} + ${genNum(depth - 1)})"
        case 1 => s"(${genNum(depth - 1)} - ${genNum(depth - 1)})"
        case 2 => s"(${genNum(depth - 1)} * ${genNum(depth - 1)})"
        case 3 => s"(${genNum(depth - 1)} / (Math.abs(${genNum(depth - 1)}) + 1))"
        case 4 => s"(-${genNum(depth - 1)})"
        case 5 => s"Math.floor(${genNum(depth - 1)})"
        case 6 => s"Math.min(${genNum(depth - 1)}, ${genNum(depth - 1)})"
        case 7 => s"${genStr(depth - 1)}.length"
        case 8 => s"(${genBool(depth - 1)} ? ${genNum(depth - 1)} : ${genNum(depth - 1)})"
        case 9 => s"(row.m * ${genNum(depth - 1)})"
        case _ => s"Math.round(${genNum(depth - 1)})"
      }
    def genStr(depth: Int): String =
      if (depth <= 0) rnd.nextInt(3) match {
        case 0 => s"'${strLits(rnd.nextInt(strLits.size))}'"
        case 1 => "row.m"
        case _ => "row.f"
      } else rnd.nextInt(11) match {
        case 0 => s"(${genStr(depth - 1)} + ${genStr(depth - 1)})"
        case 1 => s"(${genStr(depth - 1)} + ${genNum(depth - 1)})"
        case 2 => s"${genStr(depth - 1)}.toLowerCase()"
        case 3 => s"${genStr(depth - 1)}.toUpperCase()"
        case 4 => s"${genStr(depth - 1)}.trim()"
        case 5 =>
          val a = if (rnd.nextInt(3) == 0) genStr(0) else rnd.nextInt(3).toString
          s"${genStr(depth - 1)}.substring($a, ${2 + rnd.nextInt(4)})"
        case 6 => s"${genStr(depth - 1)}.replace(${genStr(0)}, ${genStr(0)})"
        case 7 => s"(${genStr(depth - 1)} + ${genBool(depth - 1)})"
        case 8 =>
          val lo = rnd.nextInt(5) - 2
          s"${genStr(depth - 1)}.substring($lo, ${lo + rnd.nextInt(5)})"
        case 9 =>
          val i = if (rnd.nextInt(3) == 0) genStr(0) else (rnd.nextInt(6) - 2).toString
          s"${genStr(depth - 1)}.charAt($i)"
        case _ => s"(${genBool(depth - 1)} ? ${genStr(depth - 1)} : ${genStr(depth - 1)})"
      }
    def genBool(depth: Int): String =
      if (depth <= 0) (if (rnd.nextBoolean()) "true" else "false")
      else rnd.nextInt(9) match {
        case 0 => s"(${genNum(depth - 1)} < ${genNum(depth - 1)})"
        case 1 => s"(${genNum(depth - 1)} >= ${genNum(depth - 1)})"
        case 2 => s"(${genStr(depth - 1)} == ${genStr(depth - 1)})"
        case 3 => s"(${genBool(depth - 1)} && ${genBool(depth - 1)})"
        case 4 => s"(${genBool(depth - 1)} || ${genBool(depth - 1)})"
        case 5 => s"(!${genBool(depth - 1)})"
        case 6 => s"${genStr(depth - 1)}.includes(${genStr(0)})"
        case 7 => s"(${genStr(depth - 1)} <= ${genNum(depth - 1)})"
        case _ => s"${genStr(depth - 1)}.startsWith(${genStr(0)})"
      }
    def genProgram(): String = rnd.nextInt(3) match {
      case 0 => genNum(3)
      case 1 => genStr(3)
      case _ =>
        s"""function map(row) {
           |  var t = ${genNum(2)};
           |  if (${genBool(2)}) return ${genStr(2)};
           |  if (t > ${rnd.nextInt(5)}) { return ${genStr(1)} + t; }
           |  return ${genStr(2)};
           |}""".stripMargin
    }
    val schema = frame.schema.fields.map(f => f.name -> f.dataType).toMap
    val rows = frame.collect().map(r => Map[String, Any](
      "d" -> r.getDouble(0), "q" -> r.getDouble(1),
      "m" -> r.getString(2), "f" -> r.getString(3)))
    (0 until 80).foreach { trial =>
      val src = genProgram()
      val t1ast = JsGesture.parse(src)
      val prog = JsProgram.parse(src)
      rows.zipWithIndex.foreach { case (row, ri) =>
        val tier1 = JsGesture.interpret(t1ast, row, schema)
        val fields = prog.rowFields.map(row(_): Any).toArray
        val tier2 = JsProgram.run(prog, fields)
        val ok = (tier1, tier2) match {
          case (null, null) => true
          case (a: Double, b: java.lang.Double) =>
            (a.isNaN && b.isNaN) || a == b.doubleValue ||
              math.abs(a - b.doubleValue) <= 1e-9 * math.max(math.abs(a), math.abs(b))
          case (a: java.lang.Double, b: java.lang.Double) =>
            (a.isNaN && b.isNaN) || a.doubleValue == b.doubleValue
          case (a, b) => a == b
        }
        assert(ok, s"trial $trial row $ri: tier1=$tier1 tier2=$tier2\n$src")
      }
    }
  }

  test("metamorphic fuzz: loop/array/helper-wrapped programs equal the original") {
    // Each random straight-line program is rewritten into semantically
    // equivalent forms that exercise the tier-2-only machinery — a
    // single-iteration for loop, a while with continue, an array
    // round-trip of every return value, and a helper-function hop —
    // and all variants must evaluate exactly like tier 1 on the
    // original. This fuzzes loops/arrays/calls against the proven
    // subset oracle instead of only hand-written cases.
    val rnd = new scala.util.Random(20260816L)
    val numLits = Seq(0.0, 1.0, 2.5, 7.0)
    def genNum(depth: Int): String =
      if (depth <= 0) rnd.nextInt(3) match {
        case 0 => { val v = numLits(rnd.nextInt(numLits.size))
          if (v == math.floor(v)) v.toLong.toString else v.toString }
        case 1 => "row.d"
        case _ => "row.q"
      } else rnd.nextInt(6) match {
        case 0 => s"(${genNum(depth - 1)} + ${genNum(depth - 1)})"
        case 1 => s"(${genNum(depth - 1)} * ${genNum(depth - 1)})"
        case 2 => s"Math.floor(${genNum(depth - 1)})"
        case 3 => s"(${genNum(depth - 1)} - ${genNum(depth - 1)})"
        case 4 => s"${genStr(depth - 1)}.length"
        case _ => s"Math.max(${genNum(depth - 1)}, ${genNum(depth - 1)})"
      }
    def genStr(depth: Int): String =
      if (depth <= 0) (if (rnd.nextBoolean()) "row.m" else "row.f")
      else rnd.nextInt(4) match {
        case 0 => s"(${genStr(depth - 1)} + ${genNum(depth - 1)})"
        case 1 => s"${genStr(depth - 1)}.toUpperCase()"
        case 2 => s"${genStr(depth - 1)}.substring(1, ${2 + rnd.nextInt(4)})"
        case _ => s"(${genStr(depth - 1)} + ${genStr(depth - 1)})"
      }
    def genBool(): String = rnd.nextInt(3) match {
      case 0 => s"(${genNum(1)} < ${genNum(1)})"
      case 1 => s"${genStr(1)}.includes('a')"
      case _ => s"(${genStr(1)} == ${genStr(1)})"
    }
    val schema = frame.schema.fields.map(f => f.name -> f.dataType).toMap
    val rows = frame.collect().map(r => Map[String, Any](
      "d" -> r.getDouble(0), "q" -> r.getDouble(1),
      "m" -> r.getString(2), "f" -> r.getString(3)))
    (0 until 40).foreach { trial =>
      val retA = genStr(2)
      val retB = genStr(1)
      val cond = genBool()
      val tInit = genNum(2)
      val body =
        s"""  var t = $tInit;
           |  if ($cond) return $retA;
           |  return $retB + t;""".stripMargin
      val original = s"function map(row) {\n$body\n}"
      val variants = Seq(
        // single-iteration for loop around the body
        s"function map(row) {\n  for (var __i = 0; __i < 1; __i++) {\n$body\n  }\n}",
        // while + continue: only the LAST iteration runs the body
        s"""function map(row) {
           |  var __k = 3;
           |  while (__k > 0) {
           |    __k--;
           |    if (__k > 0) continue;
           |$body
           |  }
           |}""".stripMargin,
        // array round-trip of every returned value (+ reassignment)
        s"""function map(row) {
           |  var __a = [];
           |  var t = 0;
           |  t = $tInit;
           |  if ($cond) { __a.push($retA); return __a[0]; }
           |  __a.push($retB + t);
           |  return __a[__a.length - 1];
           |}""".stripMargin,
        // helper-function hop for every return value
        s"""function __h(v) { return v; }
           |function map(row) {
           |  var t = $tInit;
           |  if ($cond) return __h($retA);
           |  return __h($retB + t);
           |}""".stripMargin)
      val t1ast = JsGesture.parse(original)
      rows.zipWithIndex.foreach { case (row, ri) =>
        val expect = JsGesture.interpret(t1ast, row, schema)
        variants.zipWithIndex.foreach { case (src, vi) =>
          val prog = JsProgram.parse(src)
          val fields = prog.rowFields.map(row(_): Any).toArray
          val got = JsProgram.run(prog, fields)
          val ok = (expect, got) match {
            case (null, null) => true
            case (a: Double, b: java.lang.Double) =>
              (a.isNaN && b.doubleValue.isNaN) || a == b.doubleValue
            case (a, b) => a == b
          }
          assert(ok, s"trial $trial variant $vi row $ri: expect=$expect got=$got\n$src")
        }
      }
    }
  }

  test("date and timestamp fields are JS Date objects: getters, valueOf arithmetic") {
    // the reference's JS row proxy hands gestures a real Date
    // (JSVirtualRowSnapshot evals `new Date(millis)`); getters run in
    // UTC (the session zone) and arithmetic coerces through valueOf
    val df = Seq(("2024-03-01", "2024-03-01 12:30:00"))
      .toDF("ds", "ts")
      .select(to_date(col("ds")).as("d8"), to_timestamp(col("ts")).as("t8"))
    // interval arithmetic unchanged from the number-substitution days
    val js = """function map(row) {
      var h = 0;
      while (h < 1) { h++; }
      return (row.t8 - row.d8) / 3600000 * h;
    }"""
    val out = JsGesture.withJsColumnTyped(df, "hours", js, DoubleType)
      .select(col("hours")).collect()
    assert(out.head.getDouble(0) == 12.5, out.head.getDouble(0))
    // ...and WITHOUT the loop: a straight-line date gesture must route
    // to this tier too (a static Column cannot carry the Date object)
    val straight = JsGesture.withJsColumnTyped(df, "hours",
      "function map(row) { return (row.t8 - row.d8) / 3600000; }", DoubleType)
      .select(col("hours")).collect()
    assert(straight.head.getDouble(0) == 12.5)
    // calendar getters: 2024-03-01 is a Friday (day 5, JS 0=Sunday)
    val g = """function map(row) {
      var d = row.t8;
      return d.getFullYear() * 10000000 + (d.getMonth() + 1) * 100000 +
        d.getDate() * 1000 + d.getDay() * 100 + d.getHours();
    }"""
    val gv = JsGesture.withJsColumnTyped(df, "g", g, DoubleType)
      .select(col("g")).collect().head.getDouble(0)
    assert(gv == 2024L * 10000000 + 3 * 100000 + 1 * 1000 + 5 * 100 + 12, gv)
    // construction: new Date(millis) round-trips getTime; Y/M/D form is
    // UTC with JS 0-based months; Date.UTC returns plain millis
    val ctor = """function map(row) {
      var a = new Date(row.t8.getTime());
      var b = new Date(2024, 2, 1, 12, 30, 0);
      var c = Date.UTC(2024, 2, 1, 12, 30, 0);
      var iso = a.toISOString() == '2024-03-01T12:30:00.000Z' ? 1 : 0;
      var tz = a.getTimezoneOffset() == 0 ? 1 : 0;
      return (a.getTime() == b.getTime() ? 1 : 0) +
        (b.getTime() == c ? 10 : 0) + iso * 100 + tz * 1000;
    }"""
    val cv = JsGesture.withJsColumnTyped(df, "c", ctor, DoubleType)
      .select(col("c")).collect().head.getDouble(0)
    assert(cv == 1111.0, cv)
    // object identity: equal-millis Dates are !==, a Date is === itself
    val ident = """function map(row) {
      var a = new Date(0); var b = new Date(0); var r = a;
      return (a === b ? 10 : 0) + (a === r ? 1 : 0);
    }"""
    assert(JsGesture.withJsColumnTyped(df, "i", ident, DoubleType)
      .select(col("i")).collect().head.getDouble(0) == 1.0)
    // month overflow normalizes (month 12 = next January) and a NaN
    // component poisons: isNaN(getTime) — both JS constructor semantics
    val lenient = """function map(row) {
      var x = new Date(2023, 12, 1);
      var bad = new Date(2023, 0 / 0, 1);
      return (x.getFullYear() == 2024 && x.getMonth() == 0 ? 1 : 0) +
        (isNaN(bad.getTime()) ? 10 : 0);
    }"""
    assert(JsGesture.withJsColumnTyped(df, "l", lenient, DoubleType)
      .select(col("l")).collect().head.getDouble(0) == 11.0)
  }

  test("object literals: properties, computed keys, Object.keys, identity") {
    val js = """function map(row) {
      var o = {count: 0, 'first word': null, tag: row.f};
      var ws = row.m.split(' ');
      for (var i = 0; i < ws.length; i++) {
        o.count++;
        if (o['first word'] === null && ws[i] != '') { o['first word'] = ws[i]; }
      }
      o.nested = {depth: 1};
      o.nested.depth += 41;
      var k = Object.keys(o);
      var idcheck = ({a: 1} === {a: 1} ? 100 : 0) + ({a: 1} == {a: 2} ? 10 : 0)
        + (o.nested === o.nested ? 1 : 0);
      return '' + o.count + '|' + o['first word'] + '|' + o.tag + '|' +
        o.nested.depth + '|' + k.join('-') + '|' + idcheck + '|' +
        (o.hasOwnProperty('tag') ? 1 : 0) + (o.hasOwnProperty('zz') ? 9 : 0) +
        '|' + (o.missing === null ? 'null' : 'set') + '|' +
        Object.values(o.nested).join('');
    }"""
    val got = JsGesture.withJsColumnTyped(frame, "r", js, StringType)
      .select(col("d"), col("r")).collect()
      .map(r => r.getDouble(0).toInt -> r.getString(1)).toMap
    // row 0: m = "alpha" (1 word), f = "RED"
    assert(got(0) == "1|alpha|RED|42|count-first word-tag-nested|1|10|null|42",
      got(0))
    // row 1: m = "Bravo Chad" (2 words), f = "green"
    assert(got(1) == "2|Bravo|green|42|count-first word-tag-nested|1|10|null|42",
      got(1))
    // an object rendered to a string column is "[object Object]"
    val render = JsGesture.withJsColumnTyped(frame, "o",
      "function map(row) { return {a: 1}; }", StringType)
      .select(col("o")).head().getString(0)
    assert(render == "[object Object]")
  }

  test("throw/try/catch/finally: completion rules, rethrow, uncatchable engine errors") {
    val js = """function check(q) {
      if (q >= 5) { throw {code: q, msg: 'too big'}; }
      return q * 10;
    }
    function map(row) {
      var log = '';
      var v = -1;
      try {
        v = check(row.q);
        log = log + 'ok';
      } catch (e) {
        log = log + 'caught:' + e.code + ':' + e.msg;
      } finally {
        log = log + '|fin';
      }
      // finally overriding an abrupt outcome: the return in try is
      // superseded by the return in finally
      var w = 0;
      try { w = 1; throw 'boom'; } catch (e2) { w = 2; } finally { w = w + 10; }
      return log + '|' + v + '|' + w;
    }"""
    val got = JsGesture.withJsColumnTyped(frame, "r", js, StringType)
      .select(col("q"), col("r")).collect()
      .map(r => r.getDouble(0).toInt -> r.getString(1)).toMap
    assert(got(3) == "ok|fin|30|12", got(3))
    assert(got(6) == "caught:6:too big|fin|-1|12", got(6))
    // catch rethrow propagates after finally; uncaught throw is a
    // readable gesture error, not silent null
    val rethrow = """function map(row) {
      try { throw 'inner'; } catch (e) { throw 'outer:' + e; }
      return 1;
    }"""
    val err = intercept[Exception] {
      JsGesture.withJsColumnTyped(frame, "r", rethrow, StringType)
        .select(col("r")).collect()
    }
    assert(err.getMessage != null && err.getMessage.contains("outer:inner")
      || err.getCause != null && err.getCause.getMessage.contains("outer:inner"))
    // fuel exhaustion is an ENGINE error: catch must NOT swallow it
    val runaway = """function map(row) {
      try { while (true) { var x = 1; } } catch (e) { return 'swallowed'; }
      return 'done';
    }"""
    val err2 = intercept[Exception] {
      JsGesture.withJsColumnTyped(frame.limit(1), "r", runaway, StringType)
        .select(col("r")).collect()
    }
    val m2 = Option(err2.getMessage).getOrElse("") +
      Option(err2.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(m2.contains("steps") && !m2.contains("swallowed"), m2)
    // try/finally without catch: the throw survives the finally
    val tf = """function map(row) {
      var t = 0;
      try { throw 'up'; } finally { t = 1; }
      return t;
    }"""
    val err3 = intercept[Exception] {
      JsGesture.withJsColumnTyped(frame.limit(1), "r", tf, StringType)
        .select(col("r")).collect()
    }
    val m3 = Option(err3.getMessage).getOrElse("") +
      Option(err3.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(m3.contains("uncaught JS exception"), m3)
  }

  test("typed output coercion and boolean truthiness output") {
    val js = "function map(row) { return row.m; }" // string through double out
    // tier-1 path with cast: unparseable strings under TRY... use tier-2:
    val js2 = "function map(row) { var x = row.m; while (false) { } return x; }"
    val out = JsGesture.withJsColumnTyped(frame, "x", js2, DoubleType)
      .select(col("x")).collect().map(r => r.getDouble(0))
    assert(out.forall(_.isNaN)) // words are unparseable → JS Number → NaN

    val js3 = "function map(row) { var s = row.m; while (false) { } return s.length; }"
    val outB = JsGesture.withJsColumnTyped(frame, "x", js3, BooleanType)
      .select(col("x")).collect().map(_.getBoolean(0))
    assert(outB.forall(_ == true)) // nonzero lengths are truthy
    val _ = js
  }

  test("strict ===/!==: no coercion, real null check, array reference identity") {
    // tier 1 rejects ===/!== at parse time, so this straight-line
    // program exercises the dispatch fallback into the interpreter tier
    val df = frame.withColumn("nl", when(col("q") === 1.0, col("m")))
    val js = """function map(row) {
      var out = '';
      if (row.d === 3) out += 'n3';
      if (row.m === 'alpha') out += ',ma';
      if ('5' === 5) out += ',BAD1';
      if (row.q !== '1') out += ',q';
      if (row.nl === null) out += ',nul';
      var a = [1]; var b = [1];
      if (a === b) out += ',BAD2';
      if (a === a) out += ',self';
      return out;
    }"""
    val got = JsGesture.withJsColumn(df, "x", js)
      .select(col("d"), col("q"), col("x")).collect()
      .map(r => r.getDouble(0).toInt -> r.getString(2)).toMap
    (0 until 60).foreach { i =>
      val sb = new StringBuilder
      if (i == 3) sb.append("n3")
      if (i % 5 == 0) sb.append(",ma")
      sb.append(",q") // number !== string: strict inequality, no coercion
      if (i % 7 != 1) sb.append(",nul")
      sb.append(",self")
      assert(got(i) == sb.toString, s"i=$i got=${got(i)} expect=$sb")
    }
  }

  test("&&/|| short-circuit: a decided LHS skips RHS side effects") {
    val js = """function map(row) {
      var arr = [];
      var v1 = (row.q > 3) && arr.push('x');
      var v2 = (row.q <= 3) || arr.push('y');
      return arr.length;
    }"""
    val got = JsGesture.withJsColumnTyped(frame, "n", js, DoubleType)
      .select(col("q"), col("n")).collect()
      .map(r => (r.getDouble(0).toInt, r.getDouble(1).toInt))
    // q > 3: both pushes run (LHS doesn't decide the ||) → 2 elements;
    // q <= 3: both RHS are skipped → 0 elements
    got.foreach { case (q, n) =>
      assert(n == (if (q > 3) 2 else 0), s"q=$q n=$n")
    }
  }

  test("Kleene null-propagation survives short-circuit: null && false is false") {
    val df = frame.withColumn("nl", when(col("q") === 1.0, col("m")))
    // (row.nl == 'x') is SQL-null when nl is null; Kleene null && false
    // must still be false, so the strict check against false returns 1
    val js = """function map(row) {
      var v = (row.nl == 'x') && false;
      if (v === false) return 1;
      return 0;
    }"""
    val got = JsGesture.withJsColumnTyped(df, "r", js, DoubleType)
      .select(col("r")).collect().map(_.getDouble(0))
    assert(got.forall(_ == 1.0))
  }

  test("regex literals: test, match, search, replace ($&/$1/$$), split, /g and /i") {
    val js = """function map(row) {
      var t = row.m;
      var out = '';
      if (/o/.test(t)) out += 'T';
      if (/BRAVO/i.test(t)) out += 'I';
      var m = t.match(/([a-z]+)/);
      out += ':' + (m === null ? 'nil' : m[0] + '|' + m[1]);
      var all = t.match(/[a-z]+/g);
      out += ':' + (all === null ? 0 : all.length);
      out += ':' + t.search(/ /);
      out += ':' + t.replace(/[aeiou]/g, '.');
      out += ':' + t.replace(/([a-z])o/, '<$&,$1,$$>');
      out += ':' + t.split(/\s+/).length;
      return out;
    }"""
    val got = JsGesture.withJsColumn(frame, "x", js)
      .select(col("m"), col("x")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // hand-computed per fixture word (JS semantics: /g match array,
    // search index, first-occurrence replace with $-dialect, regex split)
    assert(got("alpha") == ":alpha|alpha:1:-1:.lph.:alpha:1", got("alpha"))
    assert(got("Bravo Chad") == "TI:ravo|ravo:2:5:Br.v. Ch.d:Bra<vo,v,$> Chad:2",
      got("Bravo Chad"))
    assert(got(" delta ") == ":delta|delta:1:0: d.lt. : delta :3", got(" delta "))
    assert(got("echo1") == "T:echo|echo:1:-1:.ch.1:ec<ho,h,$>1:1", got("echo1"))
    assert(got("fox trot") == "T:fox|fox:2:3:f.x tr.t:<fo,f,$>x trot:2",
      got("fox trot"))
  }

  test("closures: capture, shared-binding mutation, nesting, HOFs") {
    val js = """function map(row) {
      var base = row.q;
      // closure captures base by BINDING: the later base change is seen
      var addBase = function (x) { return x + base; };
      var sum = 0;
      var bump = function () { sum += 1; return sum; };
      bump(); bump();           // sum mutated through the closure
      base = base * 10;         // addBase must see 10*q now
      // nested closure reaching TWO levels out (base) and one (k)
      var mk = function (k) {
        return function (x) { return x * k + base; };
      };
      var lin = mk(3);
      var arr = [3, 1, 2];
      var doubled = arr.map(function (x) { return x * 2; });
      var odds = arr.filter(function (x) { return x % 2 === 1; });
      var tot = arr.reduce(function (a, x) { return a + x; }, 100);
      var tot2 = arr.reduce(function (a, x) { return a + x; });
      var sorted = arr.sort(function (a, b) { return a - b; });
      var any2 = arr.some(function (x) { return x === 2; });
      var all5 = arr.every(function (x) { return x < 5; });
      return '' + addBase(1) + ':' + sum + ':' + lin(2) + ':' +
        doubled.join('-') + ':' + odds.join('-') + ':' + tot + ':' +
        tot2 + ':' + sorted.join('-') + ':' + any2 + ':' + all5;
    }"""
    val got = JsGesture.withJsColumnTyped(frame, "r", js, StringType)
      .select(col("q"), col("r")).collect()
      .map(r => r.getDouble(0).toInt -> r.getString(1)).toMap
    (0 to 6).foreach { q =>
      val expect = s"${1 + 10 * q}:2:${6 + 10 * q}:6-2-4:3-1:106:6:1-2-3:true:true"
      assert(got(q) == expect, s"q=$q got=${got(q)}")
    }
  }

  test("closures: top-level function as value, callable object property") {
    val js = """function twice(x) { return x * 2; }
    function map(row) {
      var f = twice;               // declared function as a VALUE
      var o = {op: f, name: 'dbl'};
      var viaLocal = f(row.q);
      var viaProp = o.op(row.q + 1);
      var picked = [twice, function (x) { return x + 100; }][1](row.q);
      return viaLocal + ':' + viaProp + ':' + picked;
    }"""
    val got = JsGesture.withJsColumnTyped(frame, "r", js, StringType)
      .select(col("q"), col("r")).collect()
      .map(r => r.getDouble(0).toInt -> r.getString(1)).toMap
    (0 to 6).foreach { q =>
      assert(got(q) == s"${2 * q}:${2 * (q + 1)}:${q + 100}", s"q=$q")
    }
  }

  test("closures: identity ===, NaN coercion, row visible inside callbacks") {
    val js = """function map(row) {
      var f = function (x) { return x; };
      var g = f;
      var h = function (x) { return x; };
      var viaRow = [1].map(function (i) { return row.q + i; })[0];
      return '' + (f === g) + ':' + (f === h) + ':' +
        isNaN(Number(f)) + ':' + viaRow;
    }"""
    val got = JsGesture.withJsColumnTyped(frame, "r", js, StringType)
      .select(col("q"), col("r")).collect()
      .map(r => r.getDouble(0).toInt -> r.getString(1)).toMap
    (0 to 6).foreach { q =>
      assert(got(q) == s"true:false:true:${q + 1}", s"q=$q got=${got(q)}")
    }
  }

  test("this: method calls bind the receiver; plain calls get null") {
    val js = """function map(row) {
      var c = {
        n: 0,
        bump: function (k) { this.n += k; return this.n; }
      };
      c.bump(2); c.bump(3);
      var zero = c.bump(0);             // zero-arg-ish call still a CALL
      var f = function () { return this === null; };
      return '' + c.n + ':' + zero + ':' + f();
    }"""
    val got = JsGesture.withJsColumnTyped(frame.limit(1), "r", js, StringType)
      .select(col("r")).head().getString(0)
    assert(got == "5:5:true", got)
  }

  test("this: getters and setters run with the receiver, accessors close over scope") {
    val js = """function map(row) {
      var base = 10;
      var o = {
        total: 0,
        get doubled() { return this.total * 2 + base; },
        set clamp(v) { if (this.total > v) this.total = v; }
      };
      o.total = 7;
      var a = o.doubled;      // getter: 7*2+10 = 24
      o.clamp = 5;            // setter: total -> 5
      var b = o.doubled;      // 5*2+10 = 20
      o['clamp'] = 3;         // computed-key write routes the setter too
      var c = o['doubled'];   // computed-key read routes the getter
      return '' + a + ':' + b + ':' + c + ':' + o.total;
    }"""
    val got = JsGesture.withJsColumnTyped(frame.limit(1), "r", js, StringType)
      .select(col("r")).head().getString(0)
    assert(got == "24:20:16:3", got)
  }

  test("this: getter-only property swallows writes (sloppy-mode no-op), compound ops route accessors") {
    val js = """function map(row) {
      var o = {
        x: 4,
        get ro() { return this.x * 10; },
        set bump(v) { this.x += v; }
      };
      o.ro = 99;              // no setter: write is a NO-OP, not a shadow
      var a = o.ro;           // still 40
      o.bump = 6;             // x -> 10
      o.x += 5;               // plain data compound: x -> 15
      var has = o.hasOwnProperty('ro') && o.hasOwnProperty('bump');
      return '' + a + ':' + o.x + ':' + has;
    }"""
    val got = JsGesture.withJsColumnTyped(frame.limit(1), "r", js, StringType)
      .select(col("r")).head().getString(0)
    assert(got == "40:15:true", got)
  }

  test("this: calling a missing method is a TypeError, {get: 1} stays a plain field") {
    val js = """function map(row) {
      var o = {get: 1, set: 2};
      return o.get + o.set;
    }"""
    val got = JsGesture.withJsColumnTyped(frame.limit(1), "r", js, DoubleType)
      .select(col("r")).head().getDouble(0)
    assert(got == 3.0)
    val bad = """function map(row) {
      var o = {a: 1};
      return o.nope(3);
    }"""
    val e = intercept[Exception] {
      JsGesture.withJsColumnTyped(frame.limit(1), "r", bad, DoubleType)
        .select(col("r")).collect()
    }
    assert(e.getMessage != null) // "null is not a function" — engine-fatal
  }

  test("prototypes: F.prototype(x) is a TypeError, not a silent property read") {
    // r15 advisor fix: a parenful call on a function's prototype used to
    // route through the property-read path and RETURN the prototype
    // object, silently discarding the arguments — it must fail like
    // every other non-callable call (prototype objects are not callable)
    val js = """function F(v) { this.v = v; }
    function map(row) {
      F.prototype(3);
      return 1;
    }"""
    val e = intercept[Exception] {
      JsGesture.withJsColumnTyped(frame.limit(1), "r", js, DoubleType)
        .select(col("r")).collect()
    }
    assert(e.getMessage != null) // "prototype object is not a function"
    // the parenless read stays a live prototype handle
    val ok = """function G(v) { this.v = v; }
    function map(row) {
      G.prototype.dbl = function () { return this.v * 2; };
      var g = new G(21);
      return g.dbl();
    }"""
    val got = JsGesture.withJsColumnTyped(frame.limit(1), "r", ok, DoubleType)
      .select(col("r")).head().getDouble(0)
    assert(got == 42.0)
  }

  test("prototypes: constructor instances share live prototype methods") {
    val js = """function Counter(step) { this.step = step; this.n = 0; }
    function map(row) {
      Counter.prototype.bump = function () { this.n += this.step; return this.n; };
      var a = new Counter(2);
      var b = new Counter(5);
      a.bump(); a.bump(); b.bump();
      // method added AFTER construction is visible (live chain)
      Counter.prototype.peek = function () { return this.n * 10; };
      return '' + a.n + ':' + b.n + ':' + a.peek() + ':' + b.peek() +
        ':' + (Counter.prototype === Counter.prototype);
    }"""
    val got = JsGesture.withJsColumnTyped(frame.limit(1), "r", js, StringType)
      .select(col("r")).head().getString(0)
    assert(got == "4:5:40:50:true", got)
  }

  test("prototypes: own properties shadow, writes never mutate the prototype") {
    val js = """function T() {}
    function map(row) {
      T.prototype.x = 7;
      var a = new T();
      var b = new T();
      var before = a.x;       // inherited 7
      a.x = 99;               // own shadow on a ONLY
      return '' + before + ':' + a.x + ':' + b.x + ':' + T.prototype.x +
        ':' + a.hasOwnProperty('x') + ':' + b.hasOwnProperty('x');
    }"""
    val got = JsGesture.withJsColumnTyped(frame.limit(1), "r", js, StringType)
      .select(col("r")).head().getString(0)
    assert(got == "7:99:7:7:true:false", got)
  }

  test("prototypes: constructor object-return override, accessors on the chain") {
    val js = """function Boxed(v) { this.ignored = v; return {wrapped: v * 2}; }
    function Plain(v) { this.v = v; return v; }
    function P(v) { this.v = v; }
    function map(row) {
      P.prototype = {
        get dbl() { return this.v * 2; },
        set clamp(x) { if (this.v > x) this.v = x; }
      };
      var p = new P(9);
      var viaGetter = p.dbl;    // proto getter, this = instance: 18
      p.clamp = 4;              // proto setter intercepts: v -> 4
      return '' + new Boxed(3).wrapped + ':' + new Plain(8).v +
        ':' + viaGetter + ':' + p.v + ':' + p.dbl;
    }"""
    val got = JsGesture.withJsColumnTyped(frame.limit(1), "r", js, StringType)
      .select(col("r")).head().getString(0)
    assert(got == "6:8:18:4:8", got)
  }

  test("prototypes: mutations are row-isolated (fresh function identity per row)") {
    // appends to a prototype-held array: if prototype state leaked
    // across rows the length would grow row over row
    val js = """function K() {}
    function map(row) {
      if (!K.prototype.hasOwnProperty('log')) { K.prototype.log = []; }
      var k = new K();
      k.log.push(row.q);
      return k.log.length;
    }"""
    val got = JsGesture.withJsColumnTyped(frame, "r", js, DoubleType)
      .select(col("r")).collect().map(_.getDouble(0))
    assert(got.length == 60 && got.forall(_ == 1.0), got.take(5).toSeq.toString)
  }

  test("closures: runaway callback recursion stays engine-fatal") {
    val js = """function map(row) {
      var f = function (x) { return f(x + 1); }; // unbounded self-call
      try { return f(0); } catch (e) { return 'swallowed'; }
    }"""
    val e = intercept[Exception] {
      JsGesture.withJsColumnTyped(frame.limit(1), "r", js, StringType)
        .select(col("r")).collect()
    }
    // depth/fuel errors are the UNCATCHABLE engine kind — the gesture's
    // own catch must not swallow the runaway protection
    assert(e.getMessage != null)
  }
}
