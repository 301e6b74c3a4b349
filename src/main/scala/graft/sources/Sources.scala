package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File sources/sinks with hillview-compatible schema support
  * (storage/CsvFileLoader.java, JsonFileLoader.java, OrcFileLoader.java,
  * ParquetFileLoader.java; schema format table/Schema.java, example
  * data/ontime/short.schema). Thin declarative wrappers — Spark's
  * readers already do distributed splits, column pruning, and pushdown.
  */
object Sources {

  /** Hillview `.schema` file: JSON array of {name, kind}. Kind mapping
    * follows SURVEY.md §1.2 (ContentsKind → Spark type).
    */
  def kindToSparkType(kind: String): DataType = kind match {
    case "None"      => NullType
    case "String"    => StringType
    case "Json"      => StringType
    case "Integer"   => IntegerType
    case "Double"    => DoubleType
    case "Date"      => TimestampType
    case "LocalDate" => TimestampNTZType
    case "Time"      => LongType // ms-of-day
    case "Duration"  => DoubleType // ms
    case "Interval"  =>
      StructType(Seq(StructField("lo", DoubleType), StructField("hi", DoubleType)))
    case other => throw new IllegalArgumentException(s"unknown kind: $other")
  }

  def readSchemaFile(path: String): StructType = {
    import com.fasterxml.jackson.databind.ObjectMapper
    val mapper = new ObjectMapper()
    val root = mapper.readTree(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
    val fields = (0 until root.size()).map { i =>
      val f = root.get(i)
      StructField(f.get("name").asText(), kindToSparkType(f.get("kind").asText()))
    }
    StructType(fields)
  }

  /** Write a hillview `.schema` file for a DataFrame (inverse of
    * readSchemaFile; format per table/Schema.java).
    */
  def writeSchemaFile(schema: StructType, path: String): Unit = {
    def kindOf(dt: DataType): String = dt match {
      case NullType                    => "None"
      case StringType                  => "String"
      case IntegerType                 => "Integer"
      case LongType                    => "Integer"
      case DoubleType | FloatType      => "Double"
      case TimestampType               => "Date"
      case TimestampNTZType            => "LocalDate"
      case _: StructType               => "Interval"
      case other                       => "String"
    }
    val json = schema.fields
      .map(f => s"""{"name": "${f.name}", "kind": "${kindOf(f.dataType)}"}""")
      .mkString("[", ",\n ", "]")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
  }

  /** Numeric widening order of the evolution lattice. */
  private val integralRank = Map[DataType, Int](
    ByteType -> 1, ShortType -> 2, IntegerType -> 3, LongType -> 4)

  /** Least upper bound of two column types under SCHEMA EVOLUTION: a
    * narrower integral widens to the wider one, any integral/fractional
    * mix widens to Double (both exact: long→double only at |v|>2^53,
    * far beyond evolved id/measure columns; float→double is exact).
    * Anything else (string vs numeric, date vs numeric, …) THROWS —
    * silent stringification would hide a real schema break.
    */
  def widenedType(a: DataType, b: DataType): DataType =
    if (a == b) a
    else (integralRank.get(a), integralRank.get(b)) match {
      case (Some(x), Some(y)) => if (x >= y) a else b
      case _ =>
        def numeric(t: DataType) = integralRank.contains(t) ||
          t == FloatType || t == DoubleType
        if (numeric(a) && numeric(b)) DoubleType
        else throw new IllegalArgumentException(
          s"schema evolution cannot widen $a vs $b")
    }

  /** The widened target schema of a shard set: columns in first-seen
    * order across shards, each type the [[widenedType]] lub of every
    * shard that carries it, everything nullable (a column missing from
    * any shard null-fills there).
    */
  def widenedSchema(schemas: Seq[StructType]): StructType = {
    val order = scala.collection.mutable.LinkedHashMap[String, DataType]()
    for (sc <- schemas; f <- sc.fields)
      order(f.name) = order.get(f.name)
        .map(widenedType(_, f.dataType)).getOrElse(f.dataType)
    StructType(order.map { case (n, t) =>
      StructField(n, t, nullable = true) }.toSeq)
  }

  /** Read parquet shards written under EVOLVING schemas as one table —
    * the month-over-month ingest reality Spark's own `mergeSchema`
    * rejects (type conflicts throw there; here int→long / float→double
    * widen through [[widenedType]], and added columns null-fill).
    * Each shard keeps its own scan (schema read from its footer, casts
    * codegen'd per shard), so column pruning and partition pruning
    * still apply per shard at 100 TB; the driver pays one footer read
    * per shard, never a data pass.
    */
  def evolvedUnionRead(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val frames = paths.map(p => spark.read.parquet(p))
    val target = widenedSchema(frames.map(_.schema))
    frames.map { f =>
      val have = f.columns.toSet
      f.select(target.fields.toSeq.map { fd =>
        if (have(fd.name)) col(fd.name).cast(fd.dataType).as(fd.name)
        else lit(null).cast(fd.dataType).as(fd.name)
      }: _*)
    }.reduce(_ unionByName _)
  }

  /** CSV with optional hillview schema file; without one, Spark's
    * inference approximates the reference's None→Integer→Double→String
    * lattice (GuessSchema.java:74-137).
    */
  def readCsv(spark: SparkSession, path: String, schemaFile: Option[String] = None,
      header: Boolean = true): DataFrame = {
    val r = spark.read.option("header", header.toString)
    schemaFile match {
      case Some(sf) => r.schema(readSchemaFile(sf)).csv(path)
      case None     => r.option("inferSchema", "true").csv(path)
    }
  }

  /** Candidate date/datetime formats for the inference lattice, in the
    * reference's try-in-order style (utils/DateParsing.java:29 guesses
    * one format per column from a fixed list). `true` marks formats
    * carrying a time-of-day. Patterns are java.time (strict 2-digit
    * fields); an oracle engine's strptime may be laxer on 1-digit
    * values, so gated inputs should be zero-padded.
    */
  private val dateFormats: Seq[(String, Boolean)] = Seq(
    ("yyyy-MM-dd", false), ("yyyy/MM/dd", false), ("MM/dd/yyyy", false),
    ("yyyy-MM-dd HH:mm:ss", true), ("yyyy-MM-dd'T'HH:mm:ss", true))

  /** Cheap shape regex per format, NECESSARY for a strict java.time
    * parse to succeed (strict 2-digit fields; `yyyy` accepts ≥4
    * digits). Gates the expensive `try_to_timestamp` so numeric and
    * free-text columns — the vast majority — pay one rlike per format
    * instead of five full datetime parses per value (measured ~3× on
    * the inference scan).
    */
  private val dateShapeRes: Seq[String] = Seq(
    "^\\d{4,}-\\d{2}-\\d{2}$",
    "^\\d{4,}/\\d{2}/\\d{2}$",
    "^\\d{2}/\\d{2}/\\d{4,}$",
    "^\\d{4,}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}$",
    "^\\d{4,}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}$")

  /** Hillview's CSV type-inference lattice (GuessSchema.java:74-137):
    * None → Integer → Double → Date → String, promoted per column by
    * what all non-empty values can parse as. Date follows the
    * reference's single-format-per-column rule: some ONE format from
    * [[dateFormats]] must parse every value (a half-ISO, half-US column
    * stays String). One distributed aggregation pass over the string
    * table (every() of parse predicates per column).
    */
  def guessSchema(raw0: DataFrame, sampleRows: Int = 0): StructType = {
    // sampleRows > 0 infers from a bounded prefix (the reference's
    // GuessSchema samples too) — at corpus scale a limit() reads one
    // file split, the right cost for schema inference, and callers at
    // 100 TB should pass a bound. The DEFAULT is the full scan: a
    // silent prefix default gives a type that later rows contradict
    // (ints for 10k rows, "N/A" at 10001 → nulled-out values on the
    // typed read), and it desynchronizes from any full-scan oracle.
    val raw = if (sampleRows > 0) raw0.limit(sampleRows) else raw0
    val intRe = "^-?\\d{1,18}$"
    val dblRe = "^-?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$"
    val aggs = raw.columns.flatMap { c =>
      val v = col(c)
      val present = v.isNotNull && v =!= ""
      Seq(
        count(when(present, 1)).as(s"__n_$c"),
        count(when(present && !v.rlike(intRe), 1)).as(s"__notint_$c"),
        count(when(present && !v.rlike(dblRe), 1)).as(s"__notdbl_$c")) ++
        dateFormats.zipWithIndex.map { case ((fmt, _), i) =>
          // shape-gated: !rlike short-circuits the timestamp parse
          count(when(present && (!v.rlike(dateShapeRes(i)) ||
              try_to_timestamp(v, lit(fmt)).isNull), 1))
            .as(s"__notdate${i}_$c")
        }
    }
    val r = raw.agg(aggs.head, aggs.tail: _*).head()
    StructType(raw.columns.map { c =>
      val n = r.getAs[Long](s"__n_$c")
      lazy val dateHit = dateFormats.indices
        .find(i => r.getAs[Long](s"__notdate${i}_$c") == 0L)
      val t =
        if (n == 0L) NullType
        else if (r.getAs[Long](s"__notint_$c") == 0L) IntegerType
        else if (r.getAs[Long](s"__notdbl_$c") == 0L) DoubleType
        else dateHit match {
          case Some(i) if dateFormats(i)._2 => TimestampType
          case Some(_)                      => DateType
          case None                         => StringType
        }
      StructField(c, t, nullable = true)
    })
  }

  /** Newline-delimited JSON (JsonFileLoader). */
  def readJson(spark: SparkSession, path: String): DataFrame = spark.read.json(path)

  def readOrc(spark: SparkSession, path: String): DataFrame = spark.read.orc(path)
  def readParquet(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)

  /** Grok-ish log loader (storage/GrokLogs.java): text lines + regex
    * with named groups → typed columns. The pattern runs distributed per
    * line (regexp_extract is codegen'd).
    */
  def readLog(spark: SparkSession, path: String, pattern: String,
      groups: Seq[(String, Int)]): DataFrame = {
    val lines = spark.read.text(path)
    groups.foldLeft(lines) { case (df, (name, idx)) =>
      df.withColumn(name, regexp_extract(col("value"), pattern, idx))
    }
  }

  /** SaveAsFileSketch equivalents: distributed per-partition writers. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** FileSizeSketch (sketches/FileSizeSketch.java): count + total bytes
    * of the files a glob would load — a driver-side metadata operation,
    * like the reference's root-side glob.
    */
  def fileSizes(spark: SparkSession, pattern: String): (Long, Long) = {
    val path = new org.apache.hadoop.fs.Path(pattern)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statuses = Option(fs.globStatus(path)).getOrElse(Array.empty)
    (statuses.length.toLong, statuses.map(_.getLen).sum)
  }

  /** JDBC table load (LoadDatabaseTableMap / JdbcDatabase.java) — thin
    * wrapper; Spark's DSv2 JDBC already pushes filters/aggregates down,
    * covering the reference's federated histogram/distinct-count mode
    * for supported dialects. Untestable in this offline environment.
    */
  def readJdbc(spark: SparkSession, url: String, table: String,
      props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Fixed scratch directory per purpose (overwritten on reuse) — the
    * round-trip helpers run once per bench iteration, so per-invocation
    * fresh temp dirs would leak disk across long warm-run sweeps.
    *
    * The root is configurable via SPARK_GRAFT_RT_DIR because two very
    * different object classes live here: throwaway round-trip scratch
    * AND the engine's write-once ARTIFACTS (the dedup cluster map, the
    * PQ/IVF index). On a real cluster the artifacts are exactly the
    * objects that must live on the shared store (HDFS/S3 path via a
    * mounted filesystem) so every executor and every session serves the
    * same published model; the default driver-local tmpdir is only
    * right for single-node use. Artifact writers publish atomically
    * (data moved into a fingerprint-addressed dir first, marker written
    * last — see Dedup.publishArtifact), so a crash mid-write can never
    * leave a readable-but-partial artifact behind the marker.
    */
  def rtDir(name: String): String = {
    val root = sys.env.getOrElse("SPARK_GRAFT_RT_DIR",
      java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft_rt").toString)
    val p = java.nio.file.Paths.get(root, name)
    java.nio.file.Files.createDirectories(p)
    p.toString
  }

  /** SaveAsFileSketch round-trip: every worker writes its partition
    * (distributed sink — no driver funnel), then the result is re-read.
    * Returns the re-read DataFrame so the round-trip is checkable.
    */
  def saveRoundTrip(df: DataFrame, format: String = "parquet"): DataFrame = {
    val dir = rtDir(s"save_$format")
    df.write.mode("overwrite").format(format).save(dir)
    df.sparkSession.read.format(format).load(dir)
  }

  /** Hive-layout partitioned sink + re-read: `partitionBy(cols)` lays
    * the output out as `col=value/` directories so later reads prune
    * whole partitions at planning time — the layout every selective
    * re-read of a 100 TB corpus depends on (filter by lang/split/date
    * without touching the other partitions' files). Returns the re-read
    * frame; partition pruning on it is plan-asserted in PlanSpec.
    */
  def partitionedRoundTrip(df: DataFrame, cols: Seq[String]): DataFrame = {
    val dir = rtDir("partitioned_" + cols.mkString("_"))
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(dir)
    df.sparkSession.read.parquet(dir)
  }

  /** CSV round-trip through a hillview `.schema` file: write the frame
    * as headered CSV plus its schema JSON, then read it back with the
    * schema parsed from that file — exercises writer, schema
    * serialization, and the schema-directed CSV reader in one checkable
    * dataflow.
    */
  def csvRoundTrip(df: DataFrame): DataFrame = {
    val dir = rtDir("csv")
    writeCsv(df, s"$dir/data")
    writeSchemaFile(df.schema, s"$dir/table.schema")
    readCsv(df.sparkSession, s"$dir/data", Some(s"$dir/table.schema"))
  }

  /** Newline-delimited JSON round-trip (JsonFileLoader ↔ writer). */
  /** XML round-trip (Spark 4's built-in xml source — the donated
    * spark-xml): write with an explicit rowTag, read back with the
    * SAME schema pinned (XML carries no types — inference would
    * re-derive them, the CSV schema-file story). Exercises the one
    * self-describing-markup format the loader family lacked. */
  def xmlRoundTrip(df: DataFrame): DataFrame = {
    val dir = rtDir("xml")
    df.write.mode("overwrite").option("rowTag", "row").xml(dir)
    df.sparkSession.read.schema(df.schema).option("rowTag", "row").xml(dir)
  }

  /** Fixed-width text loader (the mainframe/teletype layout CSV tools
    * mis-split): one text scan, each column cut by its (start, width)
    * byte window and cast through the try-cast lattice (ANSI-safe —
    * malformed numerics become null, the PERMISSIVE convention).
    * Narrow, codegen substring/trim/cast chain — no UDFs. */
  def readFixedWidth(spark: SparkSession, path: String,
      cols: Seq[(String, Int, Int, String)]): DataFrame = {
    val raw = spark.read.text(path)
    raw.select(cols.map { case (name, start, width, typ) =>
      val cut = trim(substring(col("value"), start, width))
      val v = typ match {
        case "string" => cut
        case t =>
          org.apache.spark.sql.graftshim.exprToColumn(
            org.apache.spark.sql.catalyst.expressions.Cast(
              org.apache.spark.sql.graftshim.columnToExpr(cut),
              org.apache.spark.sql.types.DataType.fromDDL(t), None,
              org.apache.spark.sql.catalyst.expressions.EvalMode.TRY))
      }
      v.as(name)
    }: _*)
  }

  /** Fixed-width round-trip driver: caller renders each row into one
    * padded line (column `value`), this writes text and reads back
    * through [[readFixedWidth]]. */
  def fixedWidthRoundTrip(lines: DataFrame,
      cols: Seq[(String, Int, Int, String)]): DataFrame = {
    val dir = rtDir("fixedwidth")
    lines.write.mode("overwrite").text(dir)
    readFixedWidth(lines.sparkSession, dir, cols)
  }

  def jsonRoundTrip(df: DataFrame): DataFrame = {
    val dir = rtDir("json")
    df.write.mode("overwrite").json(dir)
    readJson(df.sparkSession, dir)
  }

  /** Inferred-schema frame as (col_name, kind) rows — the reference's
    * GuessSchema result surfaced as data so the lattice itself is
    * oracle-checkable against the same promotion rules in SQL.
    */
  def inferredKinds(raw: DataFrame): DataFrame = {
    val spark = raw.sparkSession
    import spark.implicits._
    val inferred = guessSchema(raw)
    inferred.fields.toSeq.map { f =>
      val kind = f.dataType match {
        case NullType                  => "None"
        case IntegerType               => "Integer"
        case DoubleType                => "Double"
        case DateType | TimestampType  => "Date"
        case _                         => "String"
      }
      (f.name, kind)
    }.toDF("col_name", "kind")
  }

  /** ParseErrorsSketch: count of corrupt records in a permissive read.
    * Spark disallows referencing only the corrupt-record column of a raw
    * file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache first, as the
    * error message itself prescribes.
    */
  def parseErrors(df: DataFrame): DataFrame =
    df.cache().agg(count(when(col("_corrupt_record").isNotNull, 1)).as("n_errors"))
}

/** Grok-style log parsing (storage/GrokLogs.java + resources/patterns):
  * a dictionary of named sub-patterns composed via `%{NAME:field}`
  * references, compiled once to a plain Java regex and run distributed
  * per line (regexp_extract is codegen'd). Timestamp-bounded reads
  * (storage/LogFiles.java's ts-range pruning) filter at the line level,
  * immediately after the parse — rows outside the range never leave the
  * scan stage.
  */
object Grok {

  /** The core of the reference's pattern dictionary. */
  val patterns: Map[String, String] = Map(
    "INT" -> "[+-]?\\d+",
    "NUMBER" -> "[+-]?\\d+(?:\\.\\d+)?",
    "WORD" -> "\\w+",
    "NOTSPACE" -> "\\S+",
    "DATA" -> ".*?",
    "GREEDYDATA" -> ".*",
    "IP" -> "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}",
    "LOGLEVEL" ->
      "(?:TRACE|DEBUG|INFO|NOTICE|WARN|WARNING|ERROR|SEVERE|FATAL|CRITICAL)",
    "TIMESTAMP_ISO8601" ->
      "\\d{4}-\\d{2}-\\d{2}[ T]\\d{2}:\\d{2}:\\d{2}(?:\\.\\d+)?",
    "SYSLOGTIMESTAMP" -> "[A-Z][a-z]{2} +\\d{1,2} \\d{2}:\\d{2}:\\d{2}",
    "HOSTNAME" -> "[a-zA-Z0-9._-]+",
    "USERNAME" -> "[a-zA-Z0-9._-]+")

  /** Compile a grok expression to (anchored regex, capture fields in
    * order). `%{NAME:field}` captures, `%{NAME}` matches without
    * capturing; literal text between references is regex-quoted.
    */
  def compile(grok: String): (String, Seq[String]) = {
    val ref = "%\\{(\\w+)(?::(\\w+))?\\}".r
    val sb = new StringBuilder("^")
    val fields = Seq.newBuilder[String]
    var last = 0
    ref.findAllMatchIn(grok).foreach { m =>
      if (m.start > last)
        sb.append(java.util.regex.Pattern.quote(grok.substring(last, m.start)))
      val pat = patterns.getOrElse(m.group(1),
        throw new IllegalArgumentException(s"unknown grok pattern %{${m.group(1)}}"))
      Option(m.group(2)) match {
        case Some(f) => fields += f; sb.append("(").append(pat).append(")")
        case None    => sb.append("(?:").append(pat).append(")")
      }
      last = m.end
    }
    if (last < grok.length)
      sb.append(java.util.regex.Pattern.quote(grok.substring(last)))
    (sb.append("$").toString, fields.result())
  }

  /** Read a text log through a grok pattern. Non-matching lines are
    * dropped (the reference counts them as parse errors — compose with
    * `Sources.parseErrors` for that). `types` casts named fields
    * ("long", "double", "timestamp" via `tsFormat`); `tsBounds` keeps
    * only rows with tsField in [lo, hi).
    */
  def readLog(spark: SparkSession, path: String, grok: String,
      types: Map[String, String] = Map.empty,
      tsFormat: String = "yyyy-MM-dd HH:mm:ss",
      tsBounds: Option[(String, String, String)] = None): DataFrame = {
    val (regex, fields) = compile(grok)
    val lines = spark.read.text(path).filter(col("value").rlike(regex))
    val parsed = fields.zipWithIndex.foldLeft(lines) { case (df, (f, i)) =>
      df.withColumn(f, regexp_extract(col("value"), regex, i + 1))
    }
    val typed = types.foldLeft(parsed) { case (df, (f, t)) =>
      df.withColumn(f,
        if (t == "timestamp") to_timestamp(col(f), tsFormat) else col(f).cast(t))
    }
    val bounded = tsBounds match {
      case Some((f, lo, hi)) =>
        typed.filter(col(f) >= lit(lo).cast("timestamp") &&
          col(f) < lit(hi).cast("timestamp"))
      case None => typed
    }
    bounded.drop("value")
  }
}
