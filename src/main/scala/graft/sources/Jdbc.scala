package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Federated JDBC source (storage/jdbc/JdbcDatabase.java:68-368,
  * JdbcConnection.java, MySqlJdbcConnection.java:60-180).
  *
  * The reference pushes sketch-shaped SQL — row counts, distinct counts,
  * numeric ranges, bucketed histograms, heatmaps, frequent values, ordered
  * distinct strings — to the database so only O(buckets) rows cross the
  * wire. The Spark-first translation has three layers:
  *
  *   1. `Federation`: the same pushed-SQL surface, issued through Spark's
  *      JDBC `query` option. The database does the scan + aggregate; Spark
  *      receives a tiny DataFrame that composes with everything else
  *      (oracle-checkable, joinable, cacheable).
  *   2. `readPartitioned`: bulk table load split into `numPartitions`
  *      range-parallel JDBC reads — the 100 TB path for pulling a big
  *      table out of a database into the cluster (each executor opens its
  *      own connection for its stride; no driver funnel).
  *   3. `registerCatalog`: a DSv2 JDBCTableCatalog with aggregate/limit
  *      pushdown enabled, so plain `spark.sql` over `catalog.schema.table`
  *      lets Catalyst decide what to federate (plan shows
  *      `PushedAggregates`/`PushedFilters` when it does).
  *
  * Identifier convention: Spark's JDBC writer quotes column names (they
  * keep their exact case in the database) but passes the table name
  * unquoted (the database case-folds it — Derby/ANSI fold UP). Generated
  * SQL below follows the same convention so it round-trips with tables
  * `DataFrame.write.jdbc` created.
  */
object Jdbc {

  /** Embedded in-memory Derby URL — the offline test/bench fixture. */
  def derbyMemUrl(name: String): String = s"jdbc:derby:memory:$name;create=true"

  /** One embedded database per testdata dir, loaded with `customer` on
    * first use (the declared queries' fixture — stands in for the
    * reference's externally-managed MySQL/Impala/Greenplum instance).
    */
  private val fixtureDbs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  def customerDb(spark: SparkSession, dir: String): String =
    fixtureDbs.computeIfAbsent(dir, d => {
      val url = derbyMemUrl("graft_" + Integer.toHexString(d.hashCode))
      writeTable(spark.read.parquet(s"$d/customer.parquet"), url, "customer")
      url
    })

  /** Bulk load, split into range-parallel reads on `partCol` — each
    * partition issues its own `WHERE partCol BETWEEN …` query from its
    * executor (JdbcDatabase.readTable's lazy mode, distributed).
    */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partCol: String, lo: Long, hi: Long, numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partCol)
      .option("lowerBound", lo.toString)
      .option("upperBound", hi.toString)
      .option("numPartitions", numPartitions.toString)
      .load()

  /** Plain single-stream read (small dimension tables). */
  def readTable(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc").option("url", url).option("dbtable", table).load()

  /** DSv2 catalog with pushdown: `spark.sql("… FROM name.SCHEMA.TBL …")`
    * plans filters, aggregates, and limits into the database when the
    * dialect can express them.
    */
  def registerCatalog(spark: SparkSession, name: String, url: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.url", url)
    spark.conf.set(s"spark.sql.catalog.$name.pushDownAggregate", "true")
    spark.conf.set(s"spark.sql.catalog.$name.pushDownLimit", "true")
  }

  /** Write a DataFrame as a database table. String columns get VARCHAR
    * types (dialects default them to LOB types, which most databases
    * refuse to GROUP BY / compare — the federated sketches need both).
    */
  def writeTable(df: DataFrame, url: String, table: String,
      varcharLen: Int = 255): Unit = {
    val stringCols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(f => s"${f.name} VARCHAR($varcharLen)")
    val w = df.write.mode(SaveMode.Overwrite)
    val w2 = if (stringCols.isEmpty) w
             else w.option("createTableColumnTypes", stringCols.mkString(", "))
    w2.jdbc(url, table, new java.util.Properties())
  }

  /** SQL dialect descriptor — the matrix the reference ships as one
    * JdbcConnection subclass per engine (MySqlJdbcConnection.java,
    * ImpalaJdbcConnection.java, GreenplumJdbcConnection.java). The
    * sketch SQL differs only in identifier quoting and the integer cast
    * keyword, so one descriptor renders all of [[SketchSql]] for any
    * engine; Derby (the embedded fixture) is plain ANSI.
    */
  final case class Dialect(name: String, idQuote: String, intCast: String,
      bigintCast: String) {
    /** Quote an identifier (doubling any embedded quote char). */
    def q(ident: String): String =
      idQuote + ident.replace(idQuote, idQuote + idQuote) + idQuote
    def castInt(e: String): String = s"CAST($e AS $intCast)"
    def castBigint(e: String): String = s"CAST($e AS $bigintCast)"
  }
  object Dialect {
    val Ansi = Dialect("ansi", "\"", "INT", "BIGINT") // Derby + standard
    /** MySQL: backtick identifiers; CAST targets must be SIGNED (the
      * 64-bit integer cast keyword — MySQL rejects CAST(x AS INT)). */
    val MySql = Dialect("mysql", "`", "SIGNED", "SIGNED")
    val Postgres = Dialect("postgres", "\"", "INT", "BIGINT")
    /** Impala quotes with backticks like MySQL but casts ANSI-style. */
    val Impala = Dialect("impala", "`", "INT", "BIGINT")
    /** Greenplum is Postgres-compatible. */
    val Greenplum = Dialect("greenplum", "\"", "INT", "BIGINT")
    val All: Seq[Dialect] = Seq(Ansi, MySql, Postgres, Impala, Greenplum)
  }

  /** Per-column range predicate pushed into every federated query
    * (storage/ColumnLimits.java + MySqlJdbcConnection.getLimits).
    */
  final case class Limit(column: String, lo: String, hi: String, quoted: Boolean = false) {
    private def v(s: String) = if (quoted) s"'${s.replace("'", "''")}'" else s
    def sql(d: Dialect): String =
      s"(${d.q(column)} >= ${v(lo)} AND ${d.q(column)} <= ${v(hi)})"
  }

  /** Pure dialect-parameterized renderers for the pushed sketch SQL —
    * string-level testable without a live engine (the sandbox has no
    * MySQL/Postgres; the reference's dialect classes are likewise just
    * SQL text generators handed to a connection pool).
    */
  object SketchSql {

    private def where(d: Dialect, limits: Seq[Limit]): String =
      if (limits.isEmpty) "" else limits.map(_.sql(d)).mkString(" WHERE ", " AND ", "")

    /** getQueryToReadSize: total rows under limits. */
    def rowCount(d: Dialect, table: String, limits: Seq[Limit] = Nil): String =
      s"SELECT ${d.castBigint("COUNT(*)")} AS ${d.q("n_rows")} FROM $table${where(d, limits)}"

    /** getQueryForDistinctCount. */
    def distinctCount(d: Dialect, table: String, column: String,
        limits: Seq[Limit] = Nil): String =
      s"""SELECT ${d.castBigint(s"COUNT(DISTINCT ${d.q(column)})")} AS ${d.q("n_distinct")}
         |FROM $table${where(d, limits)}""".stripMargin

    /** numericDataRange: min/max/present/total in ONE pushed scan
      * (JdbcDatabase.java:308-326).
      */
    def numericRange(d: Dialect, table: String, column: String,
        limits: Seq[Limit] = Nil): String =
      s"""SELECT MIN(${d.q(column)}) AS ${d.q("min_v")}, MAX(${d.q(column)}) AS ${d.q("max_v")},
         |  ${d.castBigint(s"COUNT(${d.q(column)})")} AS ${d.q("nonnulls")},
         |  ${d.castBigint("COUNT(*)")} AS ${d.q("total")}
         |FROM $table${where(d, limits)}""".stripMargin

    /** Equal-width bucket index, last boundary folded into the final
      * bucket (JdbcDatabase.histogram's index==bucketCount fold, expressed
      * directly in the SQL since CASE is universal while LEAST is not).
      */
    private def bucketExpr(d: Dialect, column: String, lo: Double, hi: Double,
        n: Int): String = {
      val w = (hi - lo) / n
      val idx = d.castInt(s"FLOOR((${d.q(column)} - $lo) / $w)")
      s"""CASE WHEN $idx > ${n - 1}
         | THEN ${n - 1} ELSE $idx END""".stripMargin
    }

    /** getQueryForHistogram: bucket index + count, database-side. Rows
      * outside [lo, hi] are excluded by a pushed range limit, mirroring
      * the reference (its bucket search returns -1 for out-of-range rows).
      */
    def histogram(d: Dialect, table: String, column: String, lo: Double,
        hi: Double, n: Int, limits: Seq[Limit] = Nil): String = {
      val all = limits :+ Limit(column, lo.toString, hi.toString)
      // bucket computed in a subquery: ANSI dialects (Derby included)
      // accept GROUP BY only on column references
      s"""SELECT ${d.q("bucket")}, ${d.castBigint("COUNT(*)")} AS ${d.q("ct")} FROM (
         |  SELECT ${bucketExpr(d, column, lo, hi, n)} AS ${d.q("bucket")}
         |  FROM $table${where(d, all)}) b
         |GROUP BY ${d.q("bucket")}""".stripMargin
    }

    /** getQueryForHeatmap: two bucket indexes + count. The reference packs
      * (x,y) into one int (x<<16|y) for its transport; a DataFrame keeps
      * them as two columns.
      */
    def heatmap(d: Dialect, table: String, c0: String, lo0: Double, hi0: Double,
        n0: Int, c1: String, lo1: Double, hi1: Double, n1: Int,
        limits: Seq[Limit] = Nil): String = {
      val all = limits :+ Limit(c0, lo0.toString, hi0.toString) :+
        Limit(c1, lo1.toString, hi1.toString)
      val b0 = bucketExpr(d, c0, lo0, hi0, n0)
      val b1 = bucketExpr(d, c1, lo1, hi1, n1)
      s"""SELECT ${d.q("bucket_x")}, ${d.q("bucket_y")}, ${d.castBigint("COUNT(*)")} AS ${d.q("ct")} FROM (
         |  SELECT $b0 AS ${d.q("bucket_x")}, $b1 AS ${d.q("bucket_y")}
         |  FROM $table${where(d, all)}) b
         |GROUP BY ${d.q("bucket_x")}, ${d.q("bucket_y")}""".stripMargin
    }

    /** getQueryToComputeFreqValues (topFreq): group rows by `columns`,
      * keep groups with count >= minCount.
      */
    def topFreq(d: Dialect, table: String, columns: Seq[String], minCount: Long,
        limits: Seq[Limit] = Nil): String = {
      val cols = columns.map(d.q).mkString(", ")
      s"""SELECT $cols, ${d.castBigint("COUNT(*)")} AS ${d.q("ct")}
         |FROM $table${where(d, limits)}
         |GROUP BY $cols
         |HAVING COUNT(*) >= $minCount""".stripMargin
    }

    /** getQueryForDistinct (stringBuckets phase 1): ordered distinct
      * values; the caller samples boundary strings from it
      * (JdbcDatabase.stringBuckets:328-368 keeps every value when the
      * distinct count is under the sample budget).
      */
    def orderedDistinct(d: Dialect, table: String, column: String,
        limits: Seq[Limit] = Nil): String =
      s"SELECT DISTINCT ${d.q(column)} AS ${d.q("v")} FROM $table${where(d, limits)} ORDER BY ${d.q("v")}"
  }

  /** The federated sketch surface. Every method pushes [[SketchSql]]
    * rendered for this connection's dialect and returns the database's
    * answer as a DataFrame; the database scans, Spark gets O(result) rows.
    */
  final case class Federation(spark: SparkSession, url: String,
      dialect: Dialect = Dialect.Ansi) {

    /** Push one SQL statement; the result set becomes a DataFrame. */
    def sql(q: String): DataFrame =
      spark.read.format("jdbc").option("url", url).option("query", q).load()

    def rowCount(table: String, limits: Seq[Limit] = Nil): DataFrame =
      sql(SketchSql.rowCount(dialect, table, limits))

    def distinctCount(table: String, column: String, limits: Seq[Limit] = Nil): DataFrame =
      sql(SketchSql.distinctCount(dialect, table, column, limits))

    def numericRange(table: String, column: String, limits: Seq[Limit] = Nil): DataFrame =
      sql(SketchSql.numericRange(dialect, table, column, limits))

    def histogram(table: String, column: String, lo: Double, hi: Double, n: Int,
        limits: Seq[Limit] = Nil): DataFrame =
      sql(SketchSql.histogram(dialect, table, column, lo, hi, n, limits))

    def heatmap(table: String, c0: String, lo0: Double, hi0: Double, n0: Int,
        c1: String, lo1: Double, hi1: Double, n1: Int,
        limits: Seq[Limit] = Nil): DataFrame =
      sql(SketchSql.heatmap(dialect, table, c0, lo0, hi0, n0, c1, lo1, hi1, n1, limits))

    def topFreq(table: String, columns: Seq[String], minCount: Long,
        limits: Seq[Limit] = Nil): DataFrame =
      sql(SketchSql.topFreq(dialect, table, columns, minCount, limits))

    def orderedDistinct(table: String, column: String, limits: Seq[Limit] = Nil): DataFrame =
      sql(SketchSql.orderedDistinct(dialect, table, column, limits))
  }
}
