package graft

import graft.functions.JsGesture
import org.apache.spark.sql.functions._

/** The JS-gesture lexical surface (CreateColumnJSMap /
  * JSFilterDescription parity): hand-written gesture programs plus a
  * differential fuzz battery holding the compiled Columns to an
  * independent plain-Scala interpreter of the same JS subset.
  */
class JsGestureSpec extends SparkSpec {

  import spark.implicits._

  private lazy val frame = {
    val words = Seq("alpha", "Bravo Chad", " delta ", "echo1", "fox trot")
    val tags = Seq("RED", "green", "Blue")
    (0 until 60).map(i =>
      (i.toDouble, (i % 7).toDouble, words(i % 5), tags(i % 3)))
      .toDF("d", "q", "m", "f")
  }

  test("function-form gestures: if/else chains, vars, row access forms") {
    val js = """function map(row) {
      var v = row.q * 2 + 1;
      if (v >= 11) return 'high';
      if (v >= 5) { return 'mid'; } else { return 'low:' + row['f']; }
    }"""
    val got = JsGesture.withJsColumn(frame, "band", js)
      .select(col("d"), col("band")).collect()
      .map(r => r.getDouble(0).toInt -> r.getString(1)).toMap
    (0 until 60).foreach { i =>
      val v = (i % 7) * 2 + 1
      val expect = if (v >= 11) "high" else if (v >= 5) "mid"
        else "low:" + Seq("RED", "green", "Blue")(i % 3)
      assert(got(i) == expect, s"i=$i")
    }
  }

  test("fall-through returns null (JS undefined -> missing cell)") {
    val js = "function map(row) { if (row.q > 3) return 'big'; }"
    val got = JsGesture.withJsColumn(frame, "x", js).select(col("q"), col("x"))
      .collect()
    got.foreach { r =>
      if (r.getDouble(0) > 3) assert(r.getString(1) == "big")
      else assert(r.isNullAt(1))
    }
  }

  test("filter gesture keeps JS-true rows; predicate pushes to the scan") {
    val js = "function filter(row) { return row.q >= 2 && row.f == 'green'; }"
    val kept = JsGesture.jsFilter(frame, js).count()
    val expect = frame.filter(col("q") >= 2 && col("f") === "green").count()
    assert(kept == expect && kept > 0)
    // against a parquet source the same gesture reaches the scan
    val li = graft.engine.Tables.lineitem(spark, sf)
    val plan = JsGesture.jsFilter(li,
      "function filter(row) { return row.l_quantity >= 45; }")
      .select(col("l_orderkey")).queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(l_quantity,45"), plan)
  }

  test("string methods and Math match JS semantics") {
    val js = """function map(row) {
      var s = row.m.trim().toUpperCase();
      return s.charAt(0) + ':' + s.length + ':' + row.m.indexOf('a') +
        ':' + Math.round(row.d / 7) + ':' + row.m.replace('a', '@');
    }"""
    val got = JsGesture.withJsColumn(frame, "x", js)
      .select(col("d"), col("x")).collect()
      .map(r => r.getDouble(0).toInt -> r.getString(1)).toMap
    val words = Seq("alpha", "Bravo Chad", " delta ", "echo1", "fox trot")
    (0 until 60).foreach { i =>
      val w = words(i % 5)
      val s = w.trim.toUpperCase
      val repl = { val p = w.indexOf("a")
        if (p < 0) w else w.substring(0, p) + "@" + w.substring(p + 1) }
      val expect = s"${s.charAt(0)}:${s.length}:${w.indexOf("a")}:" +
        s"${math.floor(i / 7.0 + 0.5).toLong}:$repl"
      assert(got(i) == expect, s"i=$i got=${got(i)} expect=$expect")
    }
  }

  test("differential fuzz: compiled Columns == plain-Scala interpreter") {
    val rnd = new scala.util.Random(20260814L)
    val strLits = Seq("a", "lp", "ox", "e", "ree", "a b")
    val numLits = Seq(0.0, 1.0, 2.0, 3.5, 7.0, 10.25)
    // generate (ast, source) pairs by rendering and re-parsing, so the
    // parser itself is inside the fuzz loop
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
        case 9 => s"(row.m * ${genNum(depth - 1)})" // string arithmetic → NaN
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
        case 5 => // start index occasionally a STRING expr (ToInteger:
          // parseable → its value, unparseable → NaN → 0)
          val a = if (rnd.nextInt(3) == 0) genStr(0) else rnd.nextInt(3).toString
          s"${genStr(depth - 1)}.substring($a, ${2 + rnd.nextInt(4)})"
        case 6 => s"${genStr(depth - 1)}.replace(${genStr(0)}, ${genStr(0)})"
        case 7 => s"(${genStr(depth - 1)} + ${genBool(depth - 1)})" // "true"/"false"
        case 8 => // negative/clamped indices (JS "" / clamp-to-0)
          val lo = rnd.nextInt(5) - 2
          s"${genStr(depth - 1)}.substring($lo, ${lo + rnd.nextInt(5)})"
        case 9 => // index occasionally a STRING expr (JS ToInteger)
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
        case 7 => // mixed string-vs-number compare: numeric coercion
          s"(${genStr(depth - 1)} <= ${genNum(depth - 1)})"
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
    (0 until 60).foreach { trial =>
      val src = genProgram()
      val ast = JsGesture.parse(src)
      val compiled = frame.select(JsGesture.compileColumn(ast, frame).as("x"))
        .collect().map(r => if (r.isNullAt(0)) null else r.get(0))
      val interpreted = rows.map(JsGesture.interpret(ast, _, schema))
      compiled.zip(interpreted).zipWithIndex.foreach { case ((c0, i0), ri) =>
        val ok = (c0, i0) match {
          case (null, null) => true
          case (a: Double, b: Double) =>
            (a.isNaN && b.isNaN) || a == b ||
              math.abs(a - b) <= 1e-9 * math.max(math.abs(a), math.abs(b))
          case (a, b) => a == b
        }
        assert(ok, s"trial $trial row $ri: compiled=$c0 interpreted=$i0\n$src")
      }
    }
  }
}
