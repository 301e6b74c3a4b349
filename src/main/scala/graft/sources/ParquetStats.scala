package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet footer introspection: the row-group statistics parquet
  * already ships (per-column min / max / null count / value count per
  * row group) read STRAIGHT FROM FOOTERS — no data pages touched.
  *
  * This is the built-in form of the zone maps [[graft.engine.Skipping]]
  * stores explicitly: engines skip row groups whose footer range
  * excludes a predicate. Exposing the stats as a frame makes the
  * skipping evidence queryable ("which row groups would a filter on
  * l_quantity touch?") and lets the correctness gate prove the footers
  * agree with the data — the property every skipping optimization
  * silently relies on.
  *
  * Driver-side and metadata-sized (a footer per file), like the
  * shapefile feature parse; the corpus itself is never scanned.
  */
object ParquetStats {

  final case class ColStats(col_name: String, num_values: Long,
      null_count: Long, min_val: String, max_val: String)

  /** Per-column stats aggregated across every row group of every file
    * under `path`, computed from footers alone. Only columns in `cols`
    * are reported (callers pick columns whose min/max render
    * unambiguously — numerics and short strings; parquet may truncate
    * long binary stats). */
  def footerColumnStats(spark: SparkSession, path: String,
      cols: Seq[String]): DataFrame = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath)
          .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      else Array(p)
    val wanted = cols.toSet
    // (values, nulls, typed min, typed max) folded across row groups
    val acc = scala.collection.mutable.LinkedHashMap[String,
      (Long, Long, Comparable[Any], Comparable[Any])]()
    files.foreach { f =>
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
      try {
        rd.getFooter.getBlocks.asScala.foreach { blk =>
          blk.getColumns.asScala.foreach { c =>
            val name = c.getPath.toDotString
            if (wanted(name)) {
              val st = c.getStatistics
              require(st != null && !st.isEmpty,
                s"no statistics in footer for $name (stats disabled at write?)")
              // getNumNulls returns -1 when the writer recorded min/max
              // but not a null count — summing it would silently corrupt
              require(st.isNumNullsSet,
                s"footer for $name has min/max but no null count")
              val mn = st.genericGetMin.asInstanceOf[Comparable[Any]]
              val mx = st.genericGetMax.asInstanceOf[Comparable[Any]]
              acc.get(name) match {
                case None =>
                  acc(name) = (c.getValueCount, st.getNumNulls, mn, mx)
                case Some((v, n, omn, omx)) =>
                  acc(name) = (v + c.getValueCount, n + st.getNumNulls,
                    if (mn.compareTo(omn) < 0) mn else omn,
                    if (mx.compareTo(omx) > 0) mx else omx)
              }
            }
          }
        }
      } finally rd.close()
    }
    def render(v: Any): String = v match {
      case b: org.apache.parquet.io.api.Binary => b.toStringUsingUTF8
      case other => String.valueOf(other)
    }
    cols.flatMap(c => acc.get(c).map { case (v, n, mn, mx) =>
      ColStats(c, v, n, render(mn), render(mx))
    }).toDF().orderBy("col_name")
  }
}
