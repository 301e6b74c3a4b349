package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Predicate algebra mirroring hillview's filter descriptions
  * (reference: platform/src/main/java/org/hillview/table/filters/ — the
  * *FilterDescription classes).
  *
  * Every filter is a pure `Column` expression, so Catalyst pushes it into
  * the parquet scan (`PushedFilters` in explain) — the Spark-native
  * equivalent of hillview's zero-copy membership sets
  * (table/api/IMembershipSet.java): no data is copied, only a view.
  */
object Filters {

  /** RangeFilterDescription.java:30-139 — closed range, optional
    * include-missing leg (hillview treats missing as a separate bucket).
    */
  def range(c: Column, lo: Any, hi: Any, includeMissing: Boolean = false): Column = {
    val p = c >= lit(lo) && c <= lit(hi)
    if (includeMissing) p || c.isNull else p
  }

  /** ComparisonFilterDescription.java:52-170 — `column <op> constant`. */
  def comparison(c: Column, op: String, v: Any): Column = op match {
    case "==" => c === lit(v)
    case "!=" => c =!= lit(v)
    case "<"  => c < lit(v)
    case ">"  => c > lit(v)
    case "<=" => c <= lit(v)
    case ">=" => c >= lit(v)
  }

  /** StringFilterFactory.java:30-113 — exact / substring / regex /
    * missing, case-(in)sensitive, complement.
    */
  def stringMatch(
      c: Column,
      pattern: String,
      kind: String = "substring",
      caseSensitive: Boolean = true,
      complement: Boolean = false): Column = {
    val (col0, pat) =
      if (caseSensitive) (c, pattern) else (lower(c), pattern.toLowerCase)
    val p = kind match {
      case "exact"     => col0 === lit(pat)
      case "substring" => col0.contains(lit(pat))
      case "regex"     => col0.rlike(pattern) // regex case handled by (?i) flag
      case "missing"   => c.isNull
    }
    if (complement) !p else p
  }

  /** StringColumnsFilterDescription.java — match if ANY of the columns
    * matches the pattern.
    */
  def anyColumnMatches(cols: Seq[Column], pattern: String): Column =
    cols.map(_.contains(lit(pattern))).reduce(_ || _)

  /** FilterListDescription.java — value ∈ explicit list. */
  def inList(c: Column, values: Seq[Any]): Column = c.isin(values: _*)

  /** RowComparisonFilterDescription.java — lexicographic comparison of the
    * sort-column tuple against a pivot row ("rows at or after this one").
    * Spark struct ordering is lexicographic, matching hillview's
    * RecordOrder semantics and SQL row-value comparison.
    */
  def rowSeek(sortCols: Seq[Column], pivot: Seq[Any]): Column =
    struct(sortCols: _*) >= struct(pivot.map(lit): _*)

  /** And/Or/Not combinators (table/filters/{And,Or,Not}Filter.java) are
    * Spark's native &&, ||, ! on Column — exposed for API completeness.
    */
  def and(ps: Column*): Column = ps.reduce(_ && _)
  def or(ps: Column*): Column  = ps.reduce(_ || _)
  def not(p: Column): Column   = !p
}
