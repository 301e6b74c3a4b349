package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for embedding math.
  *
  * The higher-order-function forms (zip_with + aggregate) are evaluated
  * interpreted — on an all-pairs near-duplicate join that's millions of
  * boxed lambda calls. These expressions generate a tight primitive Java
  * loop inside whole-stage codegen instead (~50× faster end-to-end on
  * the sf0.1 all-pairs query). Accumulation is left-to-right in double,
  * matching both the HOF forms and a SQL oracle's sequential loop, so
  * results are bit-identical.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("dotSum")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |double $s = 0.0;
         |int $n = Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product over two int arrays (the int8 quantized codes stay
  * integer end-to-end — no per-row float-array rematerialization).
  * Codes are ≤127 in magnitude, so every elementwise product ≤ 16129
  * and the long accumulator is exact for any realistic dim; the result
  * converts to double once, at the end.
  */
case class IntVecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getInt(i).toLong * y.getInt(i).toLong; i += 1 }
    s.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("dotSum")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |long $s = 0L;
         |int $n = Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (long) $a.getInt($i) * (long) $b.getInt($i);
         |}
         |${ev.value} = (double) $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** sqrt(Σ xᵢ²) over an int array — exact long accumulation, one
  * conversion to double at the sqrt.
  */
case class IntVecNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0L
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getInt(i).toLong; s += v * v; i += 1 }
    math.sqrt(s.toDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("normSum")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |long $s = 0L;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  long $v = (long) $a.getInt($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt((double) $s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** sqrt(Σ xᵢ²) over a float array — same codegen rationale as
  * [[FloatVecDot]].
  */
case class FloatVecNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("normSum")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $v = (double) $a.getFloat($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All `bands` hyperplane-LSH band keys of a float vector in one pass:
  * element b = the `planes` sign bits of the vector projected on band
  * b's hyperplanes. Hyperplane components reuse Similarity.lshBucket's
  * derivation (md5 of "seed:plane:dim", seed = band+1), so the keys
  * equal `lshBucket(v, dim, planes, seed = b+1)` for each band.
  *
  * One expression instead of bands×planes literal-array dot columns —
  * that projection blows Janino's 64 KB method limit out of codegen and
  * evaluates hundreds of interpreted dots per row; here the whole
  * projection is one primitive JVM loop per row (CodegenFallback: a
  * single virtual call).
  */
case class HyperplaneBandKeys(child: Expression, dim: Int, planes: Int, bands: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)

  // band-major flattened [bands*planes*dim] hyperplane matrix — served
  // from the JVM-wide cache (65k md5 derivations take ~0.5 s; per-task
  // lazy vals would pay that on every task)
  @transient private lazy val planesArr: Array[Float] =
    HyperplaneBandKeys.planeMatrix(dim, planes, bands)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    val vec = new Array[Double](n)
    var i = 0
    while (i < n) { vec(i) = v.getFloat(i).toDouble; i += 1 }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var p = 0
      while (p < planes) {
        val off = (b * planes + p) * dim
        var s = 0.0
        var d = 0
        while (d < n) { s += vec(d) * planesArr(off + d).toDouble; d += 1 }
        if (s > 0) key |= (1L << p)
        p += 1
      }
      out(b) = key
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBandKeys {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Float]]()

  /** Deterministic hyperplane matrix, derived once per JVM (executor)
    * and shared across tasks. Same md5 coefficient derivation as
    * Similarity.lshBucket with seed = band+1.
    */
  def planeMatrix(dim: Int, planes: Int, bands: Int): Array[Float] =
    cache.computeIfAbsent((dim, planes, bands), { _ =>
      val arr = new Array[Float](bands * planes * dim)
      val md = java.security.MessageDigest.getInstance("MD5")
      var idx = 0
      var b = 0
      while (b < bands) {
        var p = 0
        while (p < planes) {
          var d = 0
          while (d < dim) {
            md.reset()
            val dig = md.digest(s"${b + 1}:$p:$d".getBytes("UTF-8"))
            val x = java.nio.ByteBuffer.wrap(dig).getInt(0)
            arr(idx) = x.toFloat / Int.MaxValue.toFloat
            idx += 1; d += 1
          }
          p += 1
        }
        b += 1
      }
      arr
    })
}

/** Per-vector int8 scalar quantization as ONE codegen'd primitive loop:
  * scale = max|x|/127 (1.0 when the vector is all zeros), q_i =
  * floor(x_i/scale + 0.5). Bit-identical to the higher-order Column
  * form (`transform(emb, x -> floor(x/scale + 0.5))`), which evaluates
  * INTERPRETED — two boxed lambda dispatches per element; this replaces
  * ~2·dim dispatches per row with one call (measured on the quantized
  * ANN scan: the quantize stage was the dominant cost, not the dots).
  */
/** Fixed-grid 2^16 quantization: q_i = floor(f_i · 65536) — unlike the
  * per-vector-scaled [[Int8Quantize]], the grid is GLOBAL, so quantized
  * vectors from different rows can be summed/averaged EXACTLY (the
  * centroid of a label group is integer arithmetic end to end, and the
  * DuckDB replay `floor(CAST(x AS DOUBLE) * 65536)` is bit-identical:
  * float→double widening and the power-of-two multiply are both exact
  * IEEE ops). Assumes |f| < 32768 (embeddings are ~unit-scaled).
  */
case class FloatVecQ16(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = math.floor(x.getFloat(i).toDouble * 65536.0).toInt
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |int[] $out = new int[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = (int) Math.floor(((double) $a.getFloat($i)) * 65536.0);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override def prettyName: String = "vec_q16"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class Int8Quantize(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    var mx = 0.0f
    var i = 0
    while (i < n) { val a = math.abs(x.getFloat(i)); if (a > mx) mx = a; i += 1 }
    val scale = if (mx == 0.0f) 1.0 else mx.toDouble / 127.0
    val out = new Array[Int](n)
    i = 0
    while (i < n) {
      out(i) = math.floor(x.getFloat(i).toDouble / scale + 0.5).toInt
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val mx = ctx.freshName("mx")
      val sc = ctx.freshName("scale")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |float $mx = 0.0f;
         |for (int $i = 0; $i < $n; $i++) {
         |  float __v = Math.abs($a.getFloat($i));
         |  if (__v > $mx) $mx = __v;
         |}
         |double $sc = ($mx == 0.0f) ? 1.0 : ((double) $mx) / 127.0;
         |int[] $out = new int[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = (int) Math.floor(((double) $a.getFloat($i)) / $sc + 0.5);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Modular rolling hash over an int array — the text_rolling_fp
  * constant pair ((acc·1000003 + x) mod 2³¹−1), as one primitive loop:
  * the interpreted `aggregate` lambda costs ~1 µs/element boxed, which
  * on a 2M-token packed batch was the dominant cost of the whole
  * packed-sequence query. Modular step keeps ANSI long arithmetic
  * overflow-free; replayable in DuckDB with list_reduce.
  */
case class IntArrayRollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var cs = 0L
    var i = 0
    val n = x.numElements()
    while (i < n) { cs = (cs * 1000003L + x.getInt(i)) % 2147483647L; i += 1 }
    cs
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("rh")
      val i = ctx.freshName("i")
      s"""
         |long $s = 0L;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  $s = ($s * 1000003L + $a.getInt($i)) % 2147483647L;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `[0, c₀, c₀+c₁, …, total]` of a long count array, as int offsets —
  * a packed bin's `doc_offsets` boundary vector in ONE codegen pass
  * (replaces the O(n²) interpreted slice+aggregate fold, which also
  * copied the prefix array per element). Int is safe: the packing
  * budget bounds a bin's token total far below Int.MaxValue. */
case class LongArrayPrefixOffsets(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Int](n + 1)
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i); out(i + 1) = acc.toInt; i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |int[] $out = new int[$n + 1];
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i);
         |  $out[$i + 1] = (int) $acc;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All `w`-token window hashes of a token array in ONE pass: element i =
  * a 64-bit positional combine of the xxhash64 of tokens i..i+w-1. Each
  * token's bytes are hashed ONCE (n token hashes), then every window is
  * a w-term polynomial fold over them — replacing the interpreted
  * `transform(sequence(…), i -> xxhash64(slice(ws, i, w)))` lambda,
  * which allocated a sub-array per window and re-hashed every token w
  * times (the measured hot spot of the edit-dedup candidate build).
  * The hash values differ from the slice form — both are engine-internal
  * candidate keys only (oracles regenerate candidates from gram
  * strings); collisions are 64-bit-rare either way. CodegenFallback: a
  * single virtual call per row into one primitive JVM loop (the
  * HyperplaneBandKeys precedent).
  */
/** Exact 128-bit unsigned integer helpers for the squared-cosine
  * threshold check: products like dot² exceed a long (dot < 2^63 ⇒
  * dot² < 2^126), and Spark's decimal(38,0) route materializes a
  * java.math.BigDecimal PER PAIR on the dedup verify hot path (the
  * repo-measured decimal-past-precision-18 trap). Both sides of the
  * comparison fit comfortably in 128 bits, so two Math.multiplyHigh
  * products and an unsigned compare replace three BigDecimal
  * multiplications — bit-identical booleans (exact integer arithmetic
  * either way, and the DuckDB oracle computes the same check in
  * HUGEINT).
  */
object Int128 {
  // unsigned high word of a*b for a >= 0 (sign-correction term for b<0
  // only; callers pass non-negative a)
  private def umulHi(a: Long, b: Long): Long =
    Math.multiplyHigh(a, b) + ((a >> 63) & b) + ((b >> 63) & a)

  /** θd²·dot² >= θn²·qqa·qqb over non-negative longs, exactly.
    * Negative dot squares like the decimal form did (|dot|²). */
  def cos2Ge(dot: Long, qqa: Long, qqb: Long, tn2: Long, td2: Long): Boolean = {
    val d = math.abs(dot)
    // left = td2 * d * d
    var lHi = umulHi(d, d); var lLo = d * d
    var carry = umulHi(lLo, td2)
    lHi = lHi * td2 + carry; lLo = lLo * td2
    // right = tn2 * qqa * qqb
    var rHi = umulHi(qqa, qqb); var rLo = qqa * qqb
    carry = umulHi(rLo, tn2)
    rHi = rHi * tn2 + carry; rLo = rLo * tn2
    val c = java.lang.Long.compareUnsigned(lHi, rHi)
    c > 0 || (c == 0 && java.lang.Long.compareUnsigned(lLo, rLo) >= 0)
  }
}

/** `θd²·dot² >= θn²·qqa·qqb` as one codegen'd static call per pair —
  * see [[Int128]]. θ² factors are plan-time constants. */
case class Cos2ThresholdGe(first: Expression, second: Expression,
    third: Expression, thetaNum: Long, thetaDen: Long)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  require(thetaNum > 0 && thetaDen > 0 &&
    thetaNum <= 3037000499L && thetaDen <= 3037000499L,
    "theta factors must be positive and square into a long")
  private val tn2 = thetaNum * thetaNum
  private val td2 = thetaDen * thetaDen

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Seq(first, second, third).forall(_.dataType ==
        org.apache.spark.sql.types.LongType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "cos2_threshold_ge expects three bigint arguments, got (" +
          s"${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql})")

  override def nullSafeEval(dot: Any, qqa: Any, qqb: Any): Any =
    Int128.cos2Ge(dot.asInstanceOf[Long], qqa.asInstanceOf[Long],
      qqb.asInstanceOf[Long], tn2, td2)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (dot, qqa, qqb) =>
      s"${ev.value} = graft.functions.Int128.cos2Ge($dot, $qqa, $qqb, ${tn2}L, ${td2}L);")

  override def prettyName: String = "cos2_threshold_ge"
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Merge duplicated-window START positions into disjoint maximal
  * intervals — the shared tail of the dup-span family (dupSpans,
  * dupSpansMaximal, removeDupSpans, the padded decontamination cut).
  * Each start p covers [max(p − pad, 1), p + ext]; starts are sorted
  * and a touching/overlapping cover extends the open interval, else a
  * new one opens — exactly the `aggregate(array_sort(ps), …)` Catalyst
  * fold this replaces. That fold was interpreted (higher-order
  * functions are CodegenFallback) and re-built the accumulator array
  * per element (slice + concat): O(|starts|²) allocation per document,
  * worst exactly on the duplication-heavy documents the operator
  * exists for. One sorted walk, identical intervals, oracle unchanged.
  */
case class MergeWindowIntervals(child: Expression, pad: Int, ext: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(pad >= 0 && ext >= 0, s"pad/ext must be >= 0, got $pad/$ext")

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("e",
        org.apache.spark.sql.types.IntegerType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"merge_window_intervals expects array<int>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val ps = new Array[Int](n)
    var i = 0
    while (i < n) { ps(i) = arr.getInt(i); i += 1 }
    java.util.Arrays.sort(ps)
    val out = new scala.collection.mutable.ArrayBuffer[
      org.apache.spark.sql.catalyst.InternalRow]()
    var curS = 0; var curE = -2; var open = false
    i = 0
    while (i < n) {
      val p = ps(i)
      val s = math.max(p - pad, 1)
      val e = p + ext
      if (open && s <= curE + 1) { if (e > curE) curE = e }
      else {
        if (open) out += new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](curS, curE))
        curS = s; curE = e; open = true
      }
      i += 1
    }
    if (open) out += new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(Array[Any](curS, curE))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray[Any])
  }

  override def prettyName: String = "merge_window_intervals"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class TokenWindowHashes(child: Expression, w: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(w >= 1, s"window width must be >= 1, got $w")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < w) return new org.apache.spark.sql.catalyst.util.GenericArrayData(
      new Array[Long](0))
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      th(i) =
        if (t eq null) 0L
        else org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
      i += 1
    }
    val out = new Array[Long](n - w + 1)
    var s = 0
    while (s <= n - w) {
      var h = 0L
      var j = 0
      while (j < w) { h = h * 1099511628211L + th(s + j); j += 1 }
      out(s) = h
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused product-quantization encoder: nearest coarse cell (cosine,
  * when centroids are given) plus all `m` subspace codes (squared-L2
  * argmin) in ONE pass over the vector — output [cell, code_0, …,
  * code_{m−1}]. Bit-identical to the expression-tree form it replaces
  * (`1 − dot/(‖v‖·‖c‖)` cell scores, `‖c‖² − 2⟨sub,c⟩` code scores,
  * array_sort tie-break = lowest id, NaN sorts last): same double
  * arithmetic in the same order, with the per-centroid constants
  * (‖c‖, ‖c‖²) folded once at plan time instead of per row. The
  * expression-tree encode built 16 + m·ksub structs and ran m+1
  * array_sorts PER ROW — this is a straight JIT'd loop, called from
  * whole-stage codegen via one reference-object dispatch.
  */
case class PqEncode(child: Expression,
    cents: Option[Array[Array[Float]]],
    codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.{ArrayType, IntegerType}

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private val m = codebooks.length
  private val d = codebooks(0)(0).length
  // ‖c‖² per subspace code, folded with the SAME float→double
  // accumulation the driver-side literal used
  @transient private lazy val cb2: Array[Array[Double]] =
    codebooks.map(_.map { c =>
      var s = 0.0; c.foreach(x => s += x.toDouble * x); s
    })
  // ‖centroid‖ with FloatVecNorm's arithmetic (double squares, sqrt once)
  @transient private lazy val centNorms: Array[Double] =
    cents.map(_.map { c =>
      var s = 0.0; c.foreach(x => s += x.toDouble * x); math.sqrt(s)
    }).orNull

  // ascending-struct-sort "first" semantics: a beats b iff a < b, or a
  // is a number and b is NaN; ties keep the earlier (lower) id
  @inline private def beats(a: Double, b: Double): Boolean =
    a < b || (!java.lang.Double.isNaN(a) && java.lang.Double.isNaN(b))

  def encodeRow(a: Any): ArrayData = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Int](1 + m)
    cents match {
      case Some(cs) =>
        var nv = 0.0
        var i = 0
        while (i < n) { val x = v.getFloat(i).toDouble; nv += x * x; i += 1 }
        nv = math.sqrt(nv)
        var bestD = Double.NaN
        var best = 0
        var ci = 0
        while (ci < cs.length) {
          val c = cs(ci)
          val len = math.min(n, c.length)
          var s = 0.0
          var t = 0
          while (t < len) { s += v.getFloat(t).toDouble * c(t).toDouble; t += 1 }
          val dd = 1.0 - s / (nv * centNorms(ci))
          if (ci == 0 || beats(dd, bestD)) { bestD = dd; best = ci }
          ci += 1
        }
        out(0) = best
      case None => out(0) = 0
    }
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      val c2 = cb2(j)
      val off = j * d
      val len = math.max(0, math.min(d, n - off))
      var bestD = Double.NaN
      var best = 0
      var k = 0
      while (k < cb.length) {
        val c = cb(k)
        var s = 0.0
        var t = 0
        while (t < len) { s += v.getFloat(off + t).toDouble * c(t).toDouble; t += 1 }
        val dd = c2(k) - 2.0 * s
        if (k == 0 || beats(dd, bestD)) { bestD = dd; best = k }
        k += 1
      }
      out(1 + j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = encodeRow(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.encodeRow($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  import org.apache.spark.sql.graftshim.{exprToColumn => column, columnToExpr => expression}
  def vec_dot(a: Column, b: Column): Column =
    column(FloatVecDot(expression(a), expression(b)))
  def int_array_rolling_hash(a: Column): Column =
    column(IntArrayRollingHash(expression(a)))
  def long_array_prefix_offsets(a: Column): Column =
    column(LongArrayPrefixOffsets(expression(a)))
  def token_window_hashes(a: Column, w: Int): Column =
    column(TokenWindowHashes(expression(a), w))
  def merge_window_intervals(starts: Column, pad: Int, ext: Int): Column =
    column(MergeWindowIntervals(expression(starts), pad, ext))
  def vec_quantize_int8(a: Column): Column =
    column(Int8Quantize(expression(a)))
  def vec_q16(a: Column): Column =
    column(FloatVecQ16(expression(a)))
  def vec_norm(a: Column): Column = column(FloatVecNorm(expression(a)))
  def vec_dot_int(a: Column, b: Column): Column =
    column(IntVecDot(expression(a), expression(b)))
  def cos2_threshold_ge(dot: Column, qqa: Column, qqb: Column,
      thetaNum: Long, thetaDen: Long): Column =
    column(Cos2ThresholdGe(expression(dot), expression(qqa), expression(qqb),
      thetaNum, thetaDen))
  def vec_norm_int(a: Column): Column = column(IntVecNorm(expression(a)))
  def band_keys(v: Column, dim: Int, planes: Int, bands: Int): Column =
    column(HyperplaneBandKeys(expression(v), dim, planes, bands))
  def pq_encode(v: Column, cents: Option[Array[Array[Float]]],
      codebooks: Array[Array[Array[Float]]]): Column =
    column(PqEncode(expression(v), cents, codebooks))
}
