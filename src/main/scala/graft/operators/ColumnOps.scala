package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level maps (maps/ProjectMap.java, RenameColumnMap.java,
  * ConvertColumnMap.java:28-56, ExtractValueFromKeyMap.java:33-60,
  * CreateIntervalColumnMap.java, LinearProjectionMap.java).
  * All are narrow transformations — no shuffle, fused into the scan by
  * whole-stage codegen.
  */
object ColumnOps {

  /** ProjectMap: keep a subset of columns (column pruning reaches the
    * parquet footer — ReadSchema shrinks).
    */
  def project(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*)

  /** RenameColumnMap. */
  def rename(df: DataFrame, from: String, to: String): DataFrame =
    df.withColumnRenamed(from, to)

  /** ConvertColumnMap: cast to a new kind, appended as a new column
    * (conversion matrix docs/userManual.md:215-252).
    */
  def convert(df: DataFrame, column: String, newName: String, toType: String): DataFrame =
    df.withColumn(newName, col(column).cast(toType))

  /** Date → formatted string conversion (the String leg of the matrix). */
  def dateToString(df: DataFrame, column: String, newName: String, fmt: String = "yyyy-MM-dd"): DataFrame =
    df.withColumn(newName, date_format(col(column), fmt))

  /** The `Time` kind (ContentsKind.java:25-35): time-of-day divorced
    * from the date, stored as ms-of-day in a LongType (SURVEY §1.2 —
    * Spark has no bare time type). Truncation to ms is floor, matching
    * integer epoch-ms division in any engine.
    */
  def timeOfDayMs(ts: Column): Column =
    pmod(unix_millis(ts), lit(86400000L))

  /** ms-of-day → "HH:mm:ss.SSS" (the String leg of the Time matrix).
    * Rendered from integer div/mod fields, NOT date_format over a
    * reconstructed timestamp: date_format uses the SESSION timezone, so
    * a non-UTC session would shift the string while [[timeOfDayMs]]
    * (unix_millis) stays timezone-independent. ms-of-day < 2^27, so the
    * double divisions under floor are exact.
    */
  def msOfDayToString(ms: Column): Column =
    concat(
      lpad(floor(ms / lit(3600000L)).cast("long").cast("string"), 2, "0"),
      lit(":"),
      lpad(pmod(floor(ms / lit(60000L)).cast("long"), lit(60L)).cast("string"), 2, "0"),
      lit(":"),
      lpad(pmod(floor(ms / lit(1000L)).cast("long"), lit(60L)).cast("string"), 2, "0"),
      lit("."),
      lpad(pmod(ms, lit(1000L)).cast("string"), 3, "0"))

  /** "HH:mm:ss.SSS" → ms-of-day (the parse leg): fixed-offset field
    * extraction recombined by place value — the exact inverse of
    * [[msOfDayToString]], no timestamp (and therefore no session
    * timezone) in the path.
    */
  def stringToMsOfDay(s: Column): Column =
    substring(s, 1, 2).cast("long") * lit(3600000L) +
      substring(s, 4, 2).cast("long") * lit(60000L) +
      substring(s, 7, 2).cast("long") * lit(1000L) +
      substring(s, 10, 3).cast("long")

  /** ExtractValueFromKeyMap: pull `key: value` out of a key-value string
    * column (log exploration). The reference matches key:"value"; our
    * test data uses JSON-ish {"k": 69}, same regex machinery.
    */
  def extractValue(df: DataFrame, column: String, key: String, newName: String): DataFrame =
    df.withColumn(newName,
      regexp_extract(col(column), "\"" + key + "\"\\s*:\\s*\"?([^,}\"]*)\"?", 1))

  /** CreateIntervalColumnMap: two numeric columns → interval. Hillview
    * intervals have unordered endpoints; we normalize to (lo, hi) with
    * least/greatest so downstream range semantics ("both endpoints in
    * range", RangeFilterDescription.java:63-67) are plain comparisons.
    */
  def makeInterval(df: DataFrame, startCol: String, endCol: String, name: String): DataFrame =
    df.withColumn(name,
      struct(
        least(col(startCol), col(endCol)).as("lo"),
        greatest(col(startCol), col(endCol)).as("hi")))

  /** LinearProjectionMap: new columns = matrix × numeric columns (PCA
    * projection). Pure expressions — codegen'd row-wise dot products.
    */
  def linearProjection(
      df: DataFrame, inputs: Seq[String], matrix: Seq[Seq[Double]],
      names: Seq[String]): DataFrame =
    matrix.zip(names).foldLeft(df) { case (d, (row, name)) =>
      d.withColumn(name,
        row.zip(inputs).map { case (w, c) => col(c) * lit(w) }.reduce(_ + _))
    }
}
