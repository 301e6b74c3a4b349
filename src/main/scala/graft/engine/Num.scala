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

  /** Exact revenue-style sum: sum(price * (1 - discount)) with both
    * factors ≤2-decimal → product ≤4-decimal, summed exactly.
    */
  def sumRevenue(price: Column, discount: Column): Column =
    sum(dec2(price) * (lit(1) - dec2(discount))).cast(DoubleType)

  /** Exact sum of a product of two ≤2-decimal columns. Each FACTOR is
    * cast to decimal (unambiguous — a stored 2-decimal value sits ~1e-13
    * from its decimal, never near a .005 boundary), then multiplied
    * exactly in decimal. Casting the double *product* instead would
    * round a genuinely 4-decimal value to 2 places from an inexact
    * double — engines disagree on which side of .005 such doubles fall.
    */
  def sumProductExact(a: Column, b: Column): Column =
    sum(dec2(a) * dec2(b)).cast(DoubleType)
}
