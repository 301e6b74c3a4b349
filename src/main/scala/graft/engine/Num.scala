package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Oracle-safe numeric helpers.
  *
  * Double summation is order-dependent across partitions, so a Spark sum
  * and a DuckDB sum of the same doubles can differ in the last ulp and
  * fail a hash compare. Money-like columns in the test data carry ≤2
  * decimals, so we sum them exactly as decimals and cast the (exact)
  * result back to double — bit-identical on both engines. This is also
  * the right call at 100 TB: decimal partial aggregation is still
  * map-side combined and codegen'd; no extra shuffle.
  */
object Num {
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact sum of a ≤2-decimal column, returned as double. */
  def sumExact(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Exact average of a ≤2-decimal column: exact decimal sum, then one
    * double division (deterministic given identical operands).
    */
  def avgExact(c: Column): Column =
    sum(dec2(c)).cast(DoubleType) / count(c).cast(DoubleType)

  /** A ≤2-decimal value as exact integer cents: floor(x·100 + 0.5) in
    * primitive double/long ops. The stored double sits ≪ 0.5 from the
    * true integer, so the half-up is exact; this replaces a per-row
    * decimal cast whose PRODUCTS would type decimal(38,4) — past the
    * compact-long ceiling, i.e. a java.math.BigDecimal allocation per
    * row (measured 3.3× on the revenue aggregate at sf0.1).
    */
  private def cents(c: Column): Column =
    floor(c.cast(DoubleType) * lit(100) + lit(0.5)).cast("long")

  /** Exact ×10^-4 de-scaling of an integer-scaled decimal sum: ONE
    * decimal division per group (the quotient has ≤4 decimals, so the
    * scale-11 division result is exact), then one cast — the double is
    * the nearest to the exact rational at ANY magnitude, exactly what
    * the oracle's direct decimal-sum cast produces. A double division by
    * 1e4 would instead double-round once the scaled sum crosses 2^53.
    */
  def descale4(scaledSum: Column): Column =
    (scaledSum / lit(10000)).cast(DoubleType)

  /** The ×10^4 integer-scaled exact revenue product as decimal(18,0) —
    * for conditional / compound aggregates (q8/q9/q14-style) that sum it
    * under `when(...)` or subtract other scaled products; pair every sum
    * with [[descale4]].
    */
  def revenueScaled(price: Column, discount: Column): Column =
    (cents(price) * (lit(100L) - cents(discount))).cast(DecimalType(18, 0))

  /** ×10^4-scaled exact product of two ≤2-decimal columns. */
  def productScaled(a: Column, b: Column): Column =
    (cents(a) * cents(b)).cast(DecimalType(18, 0))

  /** Exact revenue-style sum: sum(price * (1 - discount)). Products are
    * exact in long (|cents| ≤ ~1e9), the sum widens to decimal(28,0) for
    * corpus-scale exactness, and [[descale4]] turns the scaled sum back
    * into the bit-identical double of the decimal formulation — which is
    * why the DuckDB oracle SQL keeps its decimal form unchanged.
    */
  def sumRevenue(price: Column, discount: Column): Column =
    descale4(sum((cents(price) * (lit(100L) - cents(discount)))
      .cast(DecimalType(18, 0))))

  /** Exact sum of a product of two ≤2-decimal columns — same integer-
    * cents scheme as [[sumRevenue]]. Each FACTOR is snapped to its
    * integer cents (unambiguous — a stored 2-decimal value sits ~1e-13
    * from the grid, never near .005); snapping the double *product*
    * instead would round a genuinely 4-decimal value to 2 places from an
    * inexact double.
    */
  def sumProductExact(a: Column, b: Column): Column =
    descale4(sum((cents(a) * cents(b)).cast(DecimalType(18, 0))))
}
