package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval column semantics — the one hillview kind with genuinely
  * non-standard behavior (SURVEY.md §7.3; reference:
  * table/api/Interval.java, docs/userManual.md:187-213,
  * RangeFilterDescription.java:63-67, GroupBySketch.java:63-76).
  * Isolated here so every interval rule lives in one module:
  *
  *  - endpoints are unordered; normalize to (lo, hi)
  *  - missing if either endpoint is missing
  *  - range filter: BOTH endpoints must lie inside the query range
  *  - histogram: an interval contributes to EVERY bucket it overlaps
  *    (multi-bucket contribution — expressed as explode(sequence))
  */
object Intervals {

  /** Normalized interval from two (possibly unordered) endpoints. */
  def make(a: Column, b: Column): Column =
    when(a.isNull || b.isNull, lit(null))
      .otherwise(struct(least(a, b).as("lo"), greatest(a, b).as("hi")))

  def lo(iv: Column): Column = iv.getField("lo")
  def hi(iv: Column): Column = iv.getField("hi")

  /** Range filter: both endpoints inside [min, max]
    * (RangeFilterDescription.java:63-67).
    */
  def inRange(iv: Column, min: Double, max: Double,
      includeMissing: Boolean = false): Column = {
    val p = lo(iv) >= lit(min) && hi(iv) <= lit(max)
    if (includeMissing) p || iv.isNull else p
  }

  /** Comparison vs a scalar (ComparisonFilterDescription interval legs):
    * an interval is == v if v lies inside it; <, > compare the whole
    * interval against the point.
    */
  def comparedTo(iv: Column, op: String, v: Double): Column = op match {
    case "==" => lo(iv) <= lit(v) && hi(iv) >= lit(v)
    case "!=" => lo(iv) > lit(v) || hi(iv) < lit(v)
    case "<"  => hi(iv) < lit(v)
    case "<=" => hi(iv) <= lit(v)
    case ">"  => lo(iv) > lit(v)
    case ">=" => lo(iv) >= lit(v)
  }

  /** Equal-width bucket ids overlapped by the interval — the
    * multi-bucket histogram contribution (GroupBySketch.java:63-76).
    * Intervals fully outside the range contribute nothing; overlap is
    * clamped into [0, n).
    */
  def overlappedBuckets(iv: Column, min: Double, max: Double, n: Int): Column = {
    val bLo = Histograms.numericBucket(greatest(lo(iv), lit(min)), min, max, n)
    val bHi = Histograms.numericBucket(least(hi(iv), lit(max)), min, max, n)
    when(iv.isNull || hi(iv) < lit(min) || lo(iv) > lit(max),
      array().cast("array<int>"))
      .otherwise(sequence(bLo, bHi).cast("array<int>"))
  }

  /** Interval histogram: one count per overlapped bucket per row. */
  def histogram(df: DataFrame, iv: Column, min: Double, max: Double, n: Int): DataFrame =
    df.select(explode(overlappedBuckets(iv, min, max, n)).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"))
}
