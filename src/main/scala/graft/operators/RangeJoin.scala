package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim

/** Binned range join: point-in-interval matching without a cross product.
  *
  * Parity-plus over the reference (hillview joins are membership algebra
  * only, SURVEY.md §2.4); the shape every time-series enrichment needs —
  * "which promotion window / session / outage does this record fall in".
  *
  * Spark executes a bare `p.ts BETWEEN i.lo AND i.hi` join as
  * BroadcastNestedLoopJoin — O(|points|·|intervals|) comparisons, the
  * classic 100 TB killer. Here both sides are mapped onto fixed-width
  * bins of the join axis and equi-joined on the bin id first, so Catalyst
  * plans a plain shuffled/broadcast HASH join; the residual range
  * predicate then filters within each bin bucket:
  *
  *   points:    __bin = floor(t / w)                 (1 row per point)
  *   intervals: __bin = explode(floor(lo/w) .. floor((hi-1)/w))
  *   join on __bin && lo <= t < hi
  *
  * A point lives in exactly one bin and an interval covers that bin at
  * most once, so the equi-join emits each (point, interval) pair at most
  * once — no post-join dedup. Comparison cost drops from |P|·|I| to
  * sum over bins of |P_bin|·|I_bin|; pick `binWidth` near the typical
  * interval length so intervals replicate into O(1) bins each.
  */
object RangeJoin {

  /** Join `points` to the `intervals` rows whose [lo, hi) range contains
    * the point. `pointUs`, `loUs`, `hiUs` are on a common numeric axis
    * (e.g. epoch micros); `binWidth` in the same unit.
    */
  /** Exact floor-division bin id: subtract `pmod` (non-negative
    * remainder) so the numerator is the exact floor multiple, then
    * integral-divide. All-integer arithmetic — a double division here
    * misbins once the axis exceeds 2^53 (epoch *nanos* are ~1.7e18, well
    * past it), silently dropping matching pairs at bin boundaries.
    */
  private def binOf(c: Column, w: Long): Column = {
    val cl = graftshim.columnToExpr(c.cast("long") - pmod(c.cast("long"), lit(w)))
    graftshim.exprToColumn(
      new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        cl, graftshim.columnToExpr(lit(w))))
  }

  def pointInInterval(
      points: DataFrame, pointCol: Column,
      intervals: DataFrame, loCol: Column, hiCol: Column,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", binOf(pointCol, binWidth))
    // empty/inverted intervals ([lo, hi) with hi <= lo) match nothing by
    // definition; without the pre-filter, sequence(binLo, binHi) with
    // binHi < binLo generates a DESCENDING bin list — spurious rows at
    // best, a sequence-length blowup (hi << lo) at worst.
    val iv = intervals.filter(hiCol > loCol).withColumn("__bin",
      explode(sequence(binOf(loCol, binWidth), binOf(hiCol - lit(1), binWidth))))
    p.join(iv, p("__bin") === iv("__bin") && pointCol >= loCol && pointCol < hiCol)
      .drop("__bin")
  }

  /** Interval–interval OVERLAP join — the missing sibling of
    * [[pointInInterval]] (reservation conflicts, concurrent sessions,
    * co-occurring incidents): [aLo, aHi) overlaps [bLo, bHi) iff
    * aLo < bHi AND bLo < aHi. Both sides explode into their covering
    * bins and hash-join on the bin; a pair sharing several bins would
    * duplicate, so each pair is emitted ONLY from its canonical bin —
    * the later of the two start bins (the first bin where both
    * intervals are present) — an equality predicate, no distinct, no
    * second shuffle. Same scale posture as the point form: bin width
    * trades replication (interval span / width rows per side) against
    * per-bin join fan-in; empty/inverted intervals match nothing. */
  def intervalOverlap(
      a: DataFrame, aLo: Column, aHi: Column,
      b: DataFrame, bLo: Column, bHi: Column,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val av = a.filter(aHi > aLo).withColumn("__bina",
      explode(sequence(binOf(aLo, binWidth), binOf(aHi - lit(1), binWidth))))
    val bv = b.filter(bHi > bLo).withColumn("__binb",
      explode(sequence(binOf(bLo, binWidth), binOf(bHi - lit(1), binWidth))))
    av.join(bv,
        av("__bina") === bv("__binb") &&
          aLo < bHi && bLo < aHi &&
          av("__bina") === greatest(binOf(aLo, binWidth), binOf(bLo, binWidth)))
      .drop("__bina", "__binb")
  }

  /** Timestamp convenience: bins on epoch micros. */
  def pointInIntervalTs(
      points: DataFrame, pointTs: Column,
      intervals: DataFrame, loTs: Column, hiTs: Column,
      binWidthSeconds: Long): DataFrame =
    pointInInterval(
      points.withColumn("__t", unix_micros(pointTs.cast("timestamp"))), col("__t"),
      intervals
        .withColumn("__lo", unix_micros(loTs.cast("timestamp")))
        .withColumn("__hi", unix_micros(hiTs.cast("timestamp"))),
      col("__lo"), col("__hi"),
      binWidthSeconds * 1000000L)
      .drop("__t", "__lo", "__hi")
}
