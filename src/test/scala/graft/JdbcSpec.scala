package graft

import graft.sources.Jdbc
import org.apache.spark.sql.functions._

/** Federated JDBC against an embedded in-memory Derby database — the
  * offline stand-in for the reference's MySQL/Impala/Greenplum targets
  * (storage/jdbc/JdbcDatabase.java). Every federated answer is checked
  * against Spark computing the same thing from the original DataFrame.
  */
class JdbcSpec extends SparkSpec {

  private lazy val url = Jdbc.derbyMemUrl("graft_spec")
  private lazy val customer = {
    val df = spark.read.parquet(s"$sf/customer.parquet")
    Jdbc.writeTable(df, url, "customer")
    df.cache()
  }
  private lazy val fed = Jdbc.Federation(spark, url)

  test("round-trip: write to database, read back, same bag of rows") {
    customer // force the fixture write
    val back = Jdbc.readTable(spark, url, "customer")
    assert(back.count() === customer.count())
    assert(back.columns.sorted === customer.columns.sorted)
    val a = customer.select(col("c_custkey"), col("c_acctbal")).except(
      back.select(col("c_custkey"), col("c_acctbal")))
    assert(a.count() === 0)
  }

  test("partitioned read splits into range-parallel queries") {
    val hi = customer.agg(max("c_custkey")).head.getLong(0)
    val part = Jdbc.readPartitioned(spark, url, "customer", "c_custkey", 0, hi + 1, 4)
    assert(part.rdd.getNumPartitions === 4)
    assert(part.count() === customer.count())
  }

  test("dialect matrix renders engine-correct pushdown SQL (string level)") {
    import Jdbc.{Dialect, Limit, SketchSql}
    // MySQL: backticked identifiers, SIGNED integer casts (MySQL rejects
    // CAST(x AS INT)) — the MySqlJdbcConnection surface at string level
    val myHist = SketchSql.histogram(Dialect.MySql, "customer", "c_acctbal", 0, 10000, 10)
    assert(myHist.contains("CAST(FLOOR((`c_acctbal` - 0.0) / 1000.0) AS SIGNED)"), myHist)
    assert(myHist.contains("CAST(COUNT(*) AS SIGNED) AS `ct`"), myHist)
    assert(!myHist.contains("\""), myHist)
    // Postgres/Greenplum: ANSI double quotes + BIGINT casts
    val pgCount = SketchSql.rowCount(Dialect.Postgres, "customer",
      Seq(Limit("c_mktsegment", "A", "B", quoted = true)))
    assert(pgCount == "SELECT CAST(COUNT(*) AS BIGINT) AS \"n_rows\" FROM customer" +
      " WHERE (\"c_mktsegment\" >= 'A' AND \"c_mktsegment\" <= 'B')", pgCount)
    assert(SketchSql.rowCount(Dialect.Greenplum, "t") == SketchSql.rowCount(Dialect.Postgres, "t"))
    // Impala: backticks like MySQL, ANSI casts unlike it
    val imp = SketchSql.orderedDistinct(Dialect.Impala, "t", "c")
    assert(imp == "SELECT DISTINCT `c` AS `v` FROM t ORDER BY `v`", imp)
    // quoted string limits escape embedded quotes; identifiers double
    // their quote char (injection hygiene at the generator)
    val esc = Limit("c", "O'Brien", "Z", quoted = true).sql(Dialect.Ansi)
    assert(esc.contains("'O''Brien'"), esc)
    assert(Dialect.MySql.q("we`ird") == "`we``ird`")
    // every dialect renders every sketch (no partial matrix)
    for (d <- Dialect.All) {
      assert(SketchSql.heatmap(d, "t", "x", 0, 1, 2, "y", 0, 1, 2).contains("GROUP BY"))
      assert(SketchSql.topFreq(d, "t", Seq("a", "b"), 3).contains("HAVING COUNT(*) >= 3"))
      assert(SketchSql.numericRange(d, "t", "c").contains("MIN("))
      assert(SketchSql.distinctCount(d, "t", "c").contains("COUNT(DISTINCT"))
    }
  }

  test("federated rowCount / distinctCount match Spark") {
    assert(fed.rowCount("customer").head.getLong(0) === customer.count())
    val d = fed.distinctCount("customer", "c_mktsegment").head.getLong(0)
    assert(d === customer.select("c_mktsegment").distinct().count())
  }

  test("federated rowCount honors column limits") {
    val n = fed.rowCount("customer",
      Seq(Jdbc.Limit("c_acctbal", "0", "5000"))).head.getLong(0)
    assert(n === customer.filter(col("c_acctbal").between(0, 5000)).count())
  }

  test("federated numericRange matches Spark min/max/counts") {
    val r = fed.numericRange("customer", "c_acctbal").head
    val e = customer.agg(min("c_acctbal"), max("c_acctbal"),
      count("c_acctbal"), count(lit(1))).head
    assert(r.getDouble(0) === e.getDouble(0))
    assert(r.getDouble(1) === e.getDouble(1))
    assert(r.getLong(2) === e.getLong(2))
    assert(r.getLong(3) === e.getLong(3))
  }

  test("federated histogram matches Spark bucket counts, last bucket folded") {
    val (lo, hi, n) = (-1000.0, 10000.0, 11)
    val got = fed.histogram("customer", "c_acctbal", lo, hi, n)
      .orderBy("bucket").collect().map(r => (r.getInt(0), r.getLong(1)))
    val w = (hi - lo) / n
    val exp = customer.filter(col("c_acctbal").between(lo, hi))
      .groupBy(least(floor((col("c_acctbal") - lo) / w), lit(n - 1)).cast("int").as("b"))
      .count().orderBy("b").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(got.toSeq === exp.toSeq)
  }

  test("federated heatmap matches Spark 2-D counts") {
    val got = fed.heatmap("customer", "c_acctbal", -1000.0, 10000.0, 4,
      "c_nationkey", 0.0, 25.0, 5)
      .orderBy("bucket_x", "bucket_y").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val exp = customer
      .filter(col("c_acctbal").between(-1000, 10000) && col("c_nationkey").between(0, 25))
      .groupBy(
        least(floor((col("c_acctbal") + 1000.0) / 2750.0), lit(3)).cast("int").as("x"),
        least(floor(col("c_nationkey") / 5.0), lit(4)).cast("int").as("y"))
      .count().orderBy("x", "y").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(got.toSeq === exp.toSeq)
  }

  test("federated topFreq returns exactly the groups above threshold") {
    val thr = customer.count() / 10
    val got = fed.topFreq("customer", Seq("c_mktsegment"), thr)
      .orderBy("c_mktsegment").collect().map(r => (r.getString(0), r.getLong(1)))
    val exp = customer.groupBy("c_mktsegment").count()
      .filter(col("count") >= thr).orderBy("c_mktsegment")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === exp.toSeq)
  }

  test("federated orderedDistinct is the sorted distinct set") {
    val got = fed.orderedDistinct("customer", "c_mktsegment").collect().map(_.getString(0))
    val exp = customer.select("c_mktsegment").distinct()
      .orderBy("c_mktsegment").collect().map(_.getString(0))
    assert(got.toSeq === exp.toSeq)
    assert(got.toSeq === got.toSeq.sorted)
  }

  test("DSv2 catalog pushes aggregates into the database") {
    customer // ensure table exists
    Jdbc.registerCatalog(spark, "graftdb", url)
    val df = spark.sql(
      """SELECT c_mktsegment, COUNT(*) AS ct
        |FROM graftdb.APP.CUSTOMER GROUP BY c_mktsegment""".stripMargin)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedAggregates"),
      s"expected aggregate pushdown into the database, got:\n$plan")
    val exp = customer.groupBy("c_mktsegment").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === exp)
  }
}
