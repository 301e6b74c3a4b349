package graft.geo

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ESRI shapefile ingestion for the geo layer — the reference loads its
  * polygon features from real `.shp` feature sets with a property file
  * for names (geo/PolygonSet.java:20-27); here the same capability is a
  * pure-JVM parser of the PUBLIC shapefile spec (ESRI whitepaper, 1998):
  * no GIS library, byte inspection only, feeding the exact
  * `array<struct<x,y>>` frame [[Geo.polygonSet]] builds from inline
  * vertex lists — so every containment path (convex half-planes,
  * even-odd ray cast) runs unchanged on shapefile-loaded features.
  *
  * Scale posture: feature sets are metadata-sized (the reference holds
  * them at the root); parsing happens once on the driver and the frame
  * is broadcast by [[Geo.tagPoints]] — the 100 TB corpus side never
  * shuffles.
  *
  * Format notes (all offsets from the public spec):
  *  - `.shp` header: 100 bytes — file code 9994 (int32 BE at 0), file
  *    length in 16-bit words (BE at 24), version 1000 (LE at 28), shape
  *    type (LE at 32), bounding box (8 doubles LE from 36).
  *  - Polygon record: 8-byte header (record number, content length in
  *    words — both BE) then LE content: shape type 5, box (4 doubles),
  *    numParts, numPoints, part start indices, (x,y) doubles. Rings are
  *    closed (last vertex repeats the first); the reader drops the
  *    closing duplicate because [[Geo.containsPointRayCast]] wraps
  *    around itself.
  *  - `.dbf` (dBASE III): 32-byte header (0x03, date, record count LE,
  *    header/record sizes LE), 32-byte field descriptors, 0x0D
  *    terminator; records are a 0x20 deletion flag + space-padded field
  *    bytes. One character field `NAME` carries the feature name.
  */
object Shapefile {

  private val NameLen = 32

  /** Write (name, ring) features as a REAL `.shp` + `.dbf` pair at
    * `base` (extensions appended). One polygon record per feature; the
    * ring is closed on write per the spec. Intended for fixtures and as
    * the shapefile SINK — the reader below round-trips it.
    */
  def writePolygons(base: String, polys: Seq[(String, Seq[(Double, Double)])]): Unit =
    writeFeatures(base, polys.map { case (n, ring) => (n, Seq(ring)) })

  /** Write multi-ring features (one polygon RECORD per feature; ring 0
    * the outer boundary, later rings holes — the spec's numParts > 1
    * case) as a REAL `.shp` + `.dbf` pair at `base`. */
  def writeFeatures(base: String,
      polys: Seq[(String, Seq[Seq[(Double, Double)]])]): Unit = {
    // ── .shp ──
    val recs = polys.map { case (_, rings0) =>
      val rings = rings0.map { r =>
        if (r.nonEmpty && r.head != r.last) r :+ r.head else r
      }
      // content: type(4) + box(32) + numParts(4) + numPoints(4) +
      // parts(4·numParts) + points(16·n)
      val contentBytes = 44 + 4 * rings.length + 16 * rings.map(_.length).sum
      (rings, contentBytes)
    }
    val fileBytes = 100 + recs.map(8 + _._2).sum
    val shp = ByteBuffer.allocate(fileBytes)
    shp.order(ByteOrder.BIG_ENDIAN)
    shp.putInt(9994).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
    shp.putInt(fileBytes / 2) // length in 16-bit words
    shp.order(ByteOrder.LITTLE_ENDIAN)
    shp.putInt(1000).putInt(5) // version, polygon
    val xs = polys.flatMap(_._2.flatten.map(_._1))
    val ys = polys.flatMap(_._2.flatten.map(_._2))
    shp.putDouble(xs.minOption.getOrElse(0)).putDouble(ys.minOption.getOrElse(0))
    shp.putDouble(xs.maxOption.getOrElse(0)).putDouble(ys.maxOption.getOrElse(0))
    shp.putDouble(0).putDouble(0).putDouble(0).putDouble(0) // Z/M ranges
    recs.zipWithIndex.foreach { case ((rings, contentBytes), i) =>
      shp.order(ByteOrder.BIG_ENDIAN)
      shp.putInt(i + 1).putInt(contentBytes / 2) // record header
      shp.order(ByteOrder.LITTLE_ENDIAN)
      shp.putInt(5)
      val rxs = rings.flatten.map(_._1); val rys = rings.flatten.map(_._2)
      shp.putDouble(rxs.minOption.getOrElse(0))
      shp.putDouble(rys.minOption.getOrElse(0))
      shp.putDouble(rxs.maxOption.getOrElse(0))
      shp.putDouble(rys.maxOption.getOrElse(0))
      shp.putInt(rings.length).putInt(rings.map(_.length).sum)
      rings.scanLeft(0)(_ + _.length).init.foreach(shp.putInt) // part starts
      rings.flatten.foreach { case (x, y) => shp.putDouble(x).putDouble(y) }
    }
    Files.write(Paths.get(base + ".shp"), shp.array())
    // ── .dbf ──
    val headerSize = 32 + 32 + 1 // header + one field descriptor + 0x0D
    val recordSize = 1 + NameLen
    val dbf = ByteBuffer.allocate(headerSize + recordSize * polys.length + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    dbf.put(0x03.toByte).put(99.toByte).put(1.toByte).put(1.toByte) // version, Y/M/D
    dbf.putInt(polys.length)
    dbf.putShort(headerSize.toShort).putShort(recordSize.toShort)
    dbf.position(32) // remaining header bytes reserved (zero)
    val nameField = "NAME".getBytes("US-ASCII")
    dbf.put(java.util.Arrays.copyOf(nameField, 11)) // field name, NUL-padded
    dbf.put('C'.toByte).putInt(0).put(NameLen.toByte).put(0.toByte)
    dbf.position(32 + 32).put(0x0d.toByte)
    polys.foreach { case (name, _) =>
      dbf.put(0x20.toByte) // not deleted
      val b = name.getBytes("US-ASCII").take(NameLen)
      dbf.put(b)
      (b.length until NameLen).foreach(_ => dbf.put(' '.toByte))
    }
    dbf.put(0x1a.toByte) // EOF
    Files.write(Paths.get(base + ".dbf"), dbf.array())
  }

  /** Parse `.shp` polygon records (+ `.dbf` names when present) at
    * `base` into (name, ring) features: one entry per ring, closing
    * duplicate vertex dropped, any winding accepted (containment uses
    * the winding-agnostic ray cast). Unsupported shape types and
    * malformed records throw — a feature set is configuration, and a
    * silently half-loaded one mis-tags every row downstream.
    */
  def parsePolygons(base: String): Seq[(String, Seq[(Double, Double)])] =
    parseFeatures(base).flatMap { case (name, rings) =>
      rings.map(r => (name, r))
    }

  /** Grouped variant of [[parsePolygons]]: one entry per polygon RECORD
    * with all of its rings (outer + holes) together — feed
    * [[Geo.ringSet]]/[[Geo.containsPointEvenOdd]] for hole-aware
    * containment. */
  def parseFeatures(base: String): Seq[(String, Seq[Seq[(Double, Double)]])] = {
    val b = Files.readAllBytes(Paths.get(base + ".shp"))
    val buf = ByteBuffer.wrap(b)
    require(b.length >= 100 && buf.getInt(0) == 9994, "not a shapefile (bad file code)")
    val fileBytes = buf.getInt(24) * 2
    buf.order(ByteOrder.LITTLE_ENDIAN)
    require(buf.getInt(28) == 1000, "unsupported shapefile version")
    val names = readNames(base)
    val out = Seq.newBuilder[(String, Seq[Seq[(Double, Double)]])]
    var off = 100
    var rec = 0
    while (off + 8 <= math.min(fileBytes, b.length)) {
      buf.order(ByteOrder.BIG_ENDIAN)
      val contentBytes = buf.getInt(off + 4) * 2
      buf.order(ByteOrder.LITTLE_ENDIAN)
      val c = off + 8
      require(c + 4 <= b.length, "truncated record header")
      val shapeType = buf.getInt(c)
      if (shapeType != 0) { // type 0 = null shape placeholder, skipped
        require(shapeType == 5, s"unsupported shape type $shapeType (want polygon/5)")
        val numParts = buf.getInt(c + 36)
        val numPoints = buf.getInt(c + 40)
        require(numParts >= 1 && numPoints >= 0 &&
          c + 44 + 4 * numParts + 16 * numPoints <= b.length, "truncated polygon record")
        val parts = (0 until numParts).map(k => buf.getInt(c + 44 + 4 * k))
        val ptsOff = c + 44 + 4 * numParts
        val pts = (0 until numPoints).map { k =>
          (buf.getDouble(ptsOff + 16 * k), buf.getDouble(ptsOff + 16 * k + 8))
        }
        val name = if (rec < names.length) names(rec) else s"poly_${rec + 1}"
        val rings = (parts :+ numPoints).sliding(2).flatMap { case Seq(s, e) =>
          val ring = pts.slice(s, e)
          val open = if (ring.length >= 2 && ring.head == ring.last) ring.init else ring
          if (open.nonEmpty) Some(open) else None
        }.toSeq
        if (rings.nonEmpty) out += ((name, rings))
      }
      rec += 1
      off = c + contentBytes
    }
    out.result()
  }

  private def readNames(base: String): Seq[String] = {
    val p = Paths.get(base + ".dbf")
    if (!Files.exists(p)) return Seq.empty
    val b = Files.readAllBytes(p)
    if (b.length < 33 || (b(0) & 0x07) != 0x03) return Seq.empty
    val buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val n = buf.getInt(4)
    val headerSize = buf.getShort(8) & 0xffff
    val recordSize = buf.getShort(10) & 0xffff
    // name = the first character ('C') field's bytes in each record
    val fields = (32 until headerSize - 1 by 32).map { fo =>
      val len = b(fo + 16) & 0xff
      (b(fo + 11).toChar, len)
    }
    val firstChar = fields.indexWhere(_._1 == 'C')
    if (firstChar < 0) return Seq.empty
    val skip = 1 + fields.take(firstChar).map(_._2).sum
    val len = fields(firstChar)._2
    (0 until n).flatMap { r =>
      val ro = headerSize + r * recordSize
      if (ro + recordSize <= b.length && b(ro) != 0x2a) // 0x2a = deleted
        Some(new String(b, ro + skip, len, "US-ASCII").trim)
      else None
    }
  }

  /** Load a shapefile feature set as the standard polygon metadata frame
    * (`poly`, `verts: array<struct<x,y>>`) — drop-in wherever
    * [[Geo.polygonSet]] output goes.
    */
  def readPolygons(spark: SparkSession, base: String): DataFrame =
    Geo.polygonSet(spark, parsePolygons(base))

  /** Load a shapefile feature set with rings grouped per record (holes
    * intact) as the multi-ring frame (`poly`,
    * `rings: array<array<struct<x,y>>>`) for [[Geo.tagPointsRings]]. */
  def readFeatures(spark: SparkSession, base: String): DataFrame =
    Geo.ringSet(spark, parseFeatures(base))
}
