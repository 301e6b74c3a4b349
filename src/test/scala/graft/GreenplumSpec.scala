package graft

import org.apache.spark.sql.functions._

/** Greenplum segment-dump ingestion: split-file alignment and the
  * column-incremental attach (GreenplumTarget / dump-greenplum.sh).
  */
class GreenplumSpec extends SparkSpec {

  test("greenplum dump: multi-split alignment, incremental column attach") {
    import org.apache.spark.sql.types._
    import graft.sources.Greenplum
    // hand-written dump with MULTIPLE split files per segment (the
    // dump-greenplum.sh `split -l` layout): per-segment position must
    // run across file boundaries in name order
    val dir = java.nio.file.Files.createTempDirectory("gp_spec").toString
    def write(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name),
        lines.mkString("\n").getBytes("UTF-8"))
    write("file0aaa", Seq("1,10.0", "2,20.0"))
    write("file0aab", Seq("3,30.0"))
    write("file1aaa", Seq("4,40.0"))
    val sch = StructType(Seq(StructField("k", LongType),
      StructField("v", DoubleType)))
    val loaded = Greenplum.loadDumpAligned(spark, dir, sch)
    val rows = loaded.orderBy("__seg", "__pos")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq((0, 0L, 1L), (0, 1L, 2L), (0, 2L, 3L), (1, 0L, 4L)))
    // incremental attach: a second dump of ONE new column, positions
    // aligned across the same segment/split layout
    val dir2 = java.nio.file.Files.createTempDirectory("gp_spec2").toString
    def write2(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(dir2, name),
        lines.mkString("\n").getBytes("UTF-8"))
    write2("file0aaa", Seq("a", "b"))
    write2("file0aab", Seq("c"))
    write2("file1aaa", Seq("d"))
    val sch2 = StructType(Seq(StructField("tag", StringType)))
    val joined = Greenplum.attachColumns(loaded, spark, dir2, sch2)
      .orderBy("k").collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("tag"))
    assert(joined.toSeq == Seq(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"))
    // plain load sees all rows without alignment metadata
    assert(Greenplum.loadDump(spark, dir, sch).count() == 4)
    // writeDump → loadDumpAligned round-trip preserves every row
    val df = spark.range(0, 100).selectExpr("id AS k", "CAST(id * 1.5 AS DOUBLE) AS v")
    val dir3 = java.nio.file.Files.createTempDirectory("gp_spec3").toString
    Greenplum.writeDump(df, dir3, Seq("k"), 4)
    val back = Greenplum.loadDumpAligned(spark, dir3, sch)
    assert(back.count() == 100)
    assert(back.agg(sum(col("v"))).head.getDouble(0) == (0 until 100).map(_ * 1.5).sum)
  }
}
