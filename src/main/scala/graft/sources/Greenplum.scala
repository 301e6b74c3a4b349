package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Greenplum dump ingestion — the reference's MPP-database fast path
  * (web/.../targets/GreenplumTarget.java, bin/dump-greenplum.sh): instead
  * of dragging rows through one JDBC cursor, every Greenplum segment
  * dumps its shard as headerless CSV via a writable external web table
  * (`file<SEGMENT_ID>` split every 500k lines — dump-greenplum.sh:29),
  * and the engine's workers parse the local files. Columns load
  * INCREMENTALLY: the target starts with one column and attaches more
  * by POSITION as gestures need them (GreenplumTarget.ensureColumns /
  * LoadCsvColumnsSketch), because each dump carries only the new
  * columns in the same per-segment row order.
  *
  * Spark translation: the plain load is a schema'd headerless CSV scan
  * over `dir/file*` — distributed parsing for free. The positional
  * attach is the part Spark lacks natively: CSV scans give no stable
  * intra-file row position, so [[loadDumpAligned]] reads through
  * `TextInputFormat`, whose per-record KEY is the line's BYTE OFFSET
  * within its file — stable however the file is split across tasks —
  * and ranks offsets per file into a line index ((__seg, __pos) row
  * identity); [[attachColumns]] then joins a later column dump on
  * (__seg, __pos) — the same row identity the reference's per-segment
  * files encode implicitly. Unlike a `wholeTextFiles` read (one
  * ~100–500 MB string per task at production line widths, zero
  * intra-file parallelism), the splittable read keeps per-task memory
  * at split size and parses one file across many tasks; the per-file
  * index costs one bounded keyed shuffle (window partitions are ≤500k
  * rows by the dump script's split).
  *
  * Format contract: strictly line-per-row. Both loaders split on raw
  * newlines (TextInputFormat here, multiLine=false CSV in
  * [[loadDump]]), so embedded newlines cannot round-trip —
  * [[writeDump]] normalizes them to a space instead of silently
  * writing a row across two physical lines (which would misalign every
  * later position in the segment).
  */
object Greenplum {

  /** `file<seg><split>` → segment id (digits after the prefix). */
  private def segOf(name: String, prefix: String): Int = {
    val base = name.substring(name.lastIndexOf('/') + 1)
    val digits = base.stripPrefix(prefix).takeWhile(_.isDigit)
    require(digits.nonEmpty, s"no segment id in dump file name $base")
    digits.toInt
  }

  /** Plain distributed load of a segment dump directory: headerless
    * CSV files under the dump-greenplum.sh naming scheme, parsed with
    * the supplied schema (the reference always knows the schema — it
    * issued the dumping INSERT itself). */
  def loadDump(spark: SparkSession, dir: String, schema: StructType,
      prefix: String = "file"): DataFrame =
    // escape = quote: RFC-4180 doubled quotes inside quoted fields
    // (Spark's default backslash escape would leave them unparsed)
    spark.read.schema(schema).option("header", "false")
      .option("escape", "\"")
      .csv(s"$dir/$prefix*")

  /** The splittable line reader behind [[loadDumpAligned]]: every
    * record = (segment, file, byte offset in file, line). The byte
    * offset is TextInputFormat's record key — stable within a file no
    * matter how many tasks the file splits across, which is what makes
    * intra-file parallel reads position-safe. `maxSplitBytes > 0`
    * forces finer splits (tests; production uses the FS block size).
    * Interior empty lines are real records (a single-column dump of a
    * null value); only the trailing newline produces no record —
    * exactly the old whole-file semantics. */
  private[graft] def dumpLines(spark: SparkSession, dir: String,
      prefix: String, maxSplitBytes: Long): org.apache.spark.rdd.RDD[(Int, String, Long, String)] = {
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    if (maxSplitBytes > 0)
      conf.setLong("mapreduce.input.fileinputformat.split.maxsize", maxSplitBytes)
    spark.sparkContext.newAPIHadoopFile(
        s"$dir/$prefix*",
        classOf[org.apache.hadoop.mapreduce.lib.input.TextInputFormat],
        classOf[org.apache.hadoop.io.LongWritable],
        classOf[org.apache.hadoop.io.Text], conf)
      .asInstanceOf[org.apache.spark.rdd.NewHadoopRDD[
        org.apache.hadoop.io.LongWritable, org.apache.hadoop.io.Text]]
      .mapPartitionsWithInputSplit { (split, it) =>
        val fileSplit = split
          .asInstanceOf[org.apache.hadoop.mapreduce.lib.input.FileSplit]
        val name = fileSplit.getPath.toString
        val seg = segOf(name, prefix)
        // Writable objects are REUSED by the record reader: copy out
        it.map { case (off, text) => (seg, name, off.get, text.toString) }
      }
  }

  /** Load with stable per-segment row positions (__seg, __pos) for
    * column-incremental attach: byte offsets rank into per-file line
    * indices (one keyed shuffle, partitions bounded by the 500k-line
    * file split), then the metadata-sized per-file counts window turns
    * file-local indices into segment positions — files within a
    * segment ordered by name (aaa, aab, …), exactly the order
    * `cat file042*` would produce. */
  def loadDumpAligned(spark: SparkSession, dir: String, schema: StructType,
      prefix: String = "file", maxSplitBytes: Long = 0L): DataFrame = {
    import spark.implicits._
    val csvOpts = Map("escape" -> "\"") // RFC-4180 doubled quotes
    val raw0 = dumpLines(spark, dir, prefix, maxSplitBytes)
      .toDF("__seg", "__file", "__boff", "__line")
    // per-file line index = rank of the byte offset within the file
    val wf = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__file")).orderBy(col("__boff"))
    val raw = raw0
      .withColumn("__i", row_number().over(wf).cast("long") - 1L)
      .drop("__boff")
    // offsets of each file within its segment (files are ≤500k lines —
    // the per-file counts are metadata-sized): ordered by file name,
    // exactly the order `cat file042*` would produce
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__seg")).orderBy(col("__file"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offs = raw.groupBy(col("__seg"), col("__file"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(w), lit(0L)))
      .select(col("__seg").as("__seg2"), col("__file").as("__file2"),
        col("__off"))
    val parsed = raw
      .join(broadcast(offs),
        col("__seg") === col("__seg2") && col("__file") === col("__file2"))
      .select(col("__seg"), (col("__off") + col("__i")).as("__pos"),
        from_csv(col("__line"), schema, csvOpts).as("__r"))
    parsed.select(
      (Seq(col("__seg"), col("__pos")) ++
        schema.fieldNames.map(f => col(s"__r.$f"))): _*)
  }

  /** Column-incremental attach (GreenplumTarget.ensureColumns →
    * LoadCsvColumnsSketch): a later dump of ADDITIONAL columns for the
    * same table joins the loaded frame by per-segment position — the
    * row identity the dump files encode. `base` must come from
    * [[loadDumpAligned]] (carries __seg/__pos). */
  def attachColumns(base: DataFrame, spark: SparkSession, dir: String,
      schema: StructType, prefix: String = "file"): DataFrame = {
    val add = loadDumpAligned(spark, dir, schema, prefix)
    base.join(add, Seq("__seg", "__pos"))
  }

  /** Write a frame AS a segment dump (the test/dev stand-in for the
    * database's external-web-table writers; also a valid sink for
    * feeding a Greenplum `gpfdist` load). Deterministic: rows route to
    * `segments` files by hash of `keyCol`, ordered inside each segment
    * by `keyCol`. */
  def writeDump(df: DataFrame, dir: String, keyCols: Seq[String],
      segments: Int, prefix: String = "file",
      lineCols: Seq[String] = Seq.empty): Unit = {
    // lineCols: the columns actually serialized (a later incremental
    // dump carries ONLY the new columns — GreenplumTarget.writeColumns
    // dumps just what a gesture needs); keyCols still drive segment
    // routing + order so every dump of the table aligns by position
    val cols = if (lineCols.nonEmpty) lineCols.toArray else df.columns
    // the key must be UNIQUE for cross-dump positional alignment: two
    // dumps of different column subsets reproduce the same per-segment
    // row order only if the sort has no ties
    val seg = pmod(xxhash64(keyCols.map(col): _*), lit(segments.toLong)).cast("int")
    val withSeg = df.withColumn("__seg", seg)
    // one file per segment, rows in deterministic key order: the
    // repartition matches the per-segment writer of the web table
    // CSV field serialization: null → empty field (concat_ws would
    // silently SKIP nulls and misalign every later column), values
    // containing separator/quote/newline get RFC-4180 quoting with
    // doubled quotes (the web table's FORMAT 'CSV' does the same;
    // from_csv parses it back)
    def field(c: String): Column = {
      val v0 = col(c).cast("string")
      // line-per-row contract: BOTH loaders split on raw newlines
      // (TextInputFormat / multiLine=false CSV), so a field value
      // containing \n or \r cannot round-trip — quoting it (as a real
      // CSV web table would) writes one logical row across two
      // physical lines, the row parses to nulls and every later __pos
      // in the segment silently shifts. Normalize to a space at write
      // time instead; the restriction is documented on the object.
      val v = regexp_replace(v0, "[\\n\\r]", " ")
      when(v0.isNull, lit(""))
        .when(v.rlike("[,\"]"),
          concat(lit("\""), regexp_replace(v, "\"", "\"\""), lit("\"")))
        .otherwise(v)
    }
    val line = cols.map(field).reduceLeft((a, b) => concat(a, lit(","), b))
    // the newline→space normalization above is a silent data mutation:
    // count and surface it (one narrow job, dump path only — never on
    // the read/serve path)
    val nlRows = withSeg.filter(cols.map(c =>
      col(c).cast("string").rlike("[\\n\\r]")).reduce(_ || _)).count()
    if (nlRows > 0)
      System.err.println(s"[greenplum-dump] normalized embedded newlines " +
        s"to spaces in $nlRows row(s) written to $dir")
    withSeg
      .repartition(segments, col("__seg"))
      .sortWithinPartitions((col("__seg") +: keyCols.map(col)): _*)
      .select(col("__seg"), line.as("__line"))
      .write.partitionBy("__seg").mode("overwrite").text(s"$dir/__stage")
    // rename to the dump-greenplum.sh layout: file<seg>aaa
    val fs = new java.io.File(s"$dir/__stage")
    fs.listFiles().filter(_.getName.startsWith("__seg=")).foreach { d =>
      val seg = d.getName.stripPrefix("__seg=")
      d.listFiles().filter(f => f.getName.startsWith("part-")).zipWithIndex
        .foreach { case (f, i) =>
          val suffix = ('a' + i).toChar // single split per segment here
          val dest = new java.io.File(dir, s"$prefix${seg}aa$suffix")
          java.nio.file.Files.move(f.toPath, dest.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
    }
    org.apache.commons.io.FileUtils.deleteDirectory(fs)
  }
}
