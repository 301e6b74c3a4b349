package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary
  * columns with typed metadata, processed per-partition in batches.
  *
  * Both layers are REAL byte codecs of public formats — no codec
  * library, no stub:
  *  - container headers: [[imageDims]] parses PNG IHDR, JPEG SOF, GIF
  *    logical-screen, and [[wavMeta]] walks RIFF chunks;
  *  - pixel/PCM content: [[decodePixels]] decodes BMP 24bpp (bottom-up
  *    rows, 4-byte row padding, BGR) and PPM P6 (ASCII header + RGB
  *    triples), [[decodePcm16]] decodes WAV 16-bit little-endian PCM
  *    samples — so [[extractFeatures]] emits TRUE pixel/amplitude
  *    statistics computed from the decoded content;
  *  - compressed codecs: [[decodePixelsCodec]] decodes PNG/GIF/JPEG/TIFF
  *    pixel content through the JDK's javax.imageio (DEFLATE/LZW/DCT
  *    entropy decode — still zero added dependencies).
  * [[syntheticImages]]/[[syntheticAudio]]/[[syntheticPixelMedia]] build
  * payloads with valid bytes from the documents table, so every
  * encode→decode round-trip is oracle-checkable from the source columns
  * alone. The pipeline shape — schema, batch iteration, partition-
  * parallel extraction, metadata propagation — is what a production
  * pipeline keeps when swapping in heavier codecs (JPEG entropy decode,
  * Opus, ...) behind the same mapPartitions seam.
  */
object Multimodal {

  final case class MediaRow(id: Long, kind: String, media: Array[Byte], width: Int, height: Int)
  final case class MediaFeatures(id: Long, kind: String, n_bytes: Int,
      feat0: Double, feat1: Double)

  /** Feature extraction over REAL decoded content: mapPartitions so a
    * heavier decoder could amortize per-batch codec initialization (the
    * Scala analog of mapInPandas batch processing). Narrow — no shuffle.
    *
    * Per payload, dispatched on magic bytes:
    *  - BMP / PPM → feat0 = mean channel intensity, feat1 = mean squared
    *    channel intensity (sums are exact longs; one double division at
    *    the end, so the statistics are reproducible bit-for-bit);
    *  - PNG / GIF / JPEG / TIFF → same intensity statistics over the
    *    ImageIO-decoded pixels ([[decodePixelsCodec]]);
    *  - WAV 16-bit PCM → feat0 = mean signed sample, feat1 = mean
    *    absolute sample (amplitude);
    *  - WAV G.711 µ-law (format tag 7) → the same amplitude statistics
    *    over [[muLawToLinear]]-expanded 16-bit samples.
    * Unrecognized payloads drop (a production pipeline routes them to a
    * quarantine split instead of failing the task).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val b = r.media
        decodePixels(b).orElse(decodePixelsCodec(b)).map { case (fmt, _, _, px) =>
          var s = 0L; var s2 = 0L; var i = 0
          while (i < px.length) { val v = px(i); s += v; s2 += v.toLong * v; i += 1 }
          val n = math.max(px.length, 1)
          MediaFeatures(r.id, fmt, b.length, s.toDouble / n, s2.toDouble / n)
        }.orElse {
          decodePcm16(b).map(("wav", _))
            .orElse(decodePcmMuLaw(b).map(("ulaw", _)))
            .orElse(decodePcm16Aiff(b).map(("aiff", _)))
            .map { case (kind, samples) =>
              var s = 0L; var sa = 0L; var k = 0
              while (k < samples.length) {
                val v = samples(k); s += v; sa += math.abs(v); k += 1
              }
              val n = math.max(samples.length, 1)
              MediaFeatures(r.id, kind, b.length, s.toDouble / n, sa.toDouble / n)
            }
        }
      }
    }
  }

  /** Frame sampling for video-like payloads: keep every k-th chunk of the
    * binary (stand-in for frame extraction); shows the explode/repartition
    * shape of a real frame pipeline.
    */
  def sampleChunks(media: Dataset[MediaRow], chunkSize: Int, everyK: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.media.grouped(chunkSize).zipWithIndex.collect {
        case (chunk, idx) if idx % everyK == 0 =>
          (r.id, idx, chunk.length, chunk.take(8).map("%02x".format(_)).mkString)
      }
    }.toDF("id", "chunk_idx", "chunk_len", "chunk_prefix")
  }

  /** Byte-stride subsample of the raw payload (cheap size-reduction for
    * opaque bytes; for true pixel resampling see [[resizePixels]]).
    * Narrow map, batch-amortizable like extractFeatures.
    */
  def resize(media: Dataset[MediaRow], stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.map { r =>
      var i = 0; var sum = 0L; var n = 0
      while (i < r.media.length) { sum += (r.media(i) & 0xff); n += 1; i += stride }
      (r.id, r.kind, r.media.length, n, sum)
    }.toDF("id", "kind", "n_bytes", "resized_len", "resized_sum")
  }

  // ── real container-header codecs (PNG / JPEG / GIF) ────────────────

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private val pngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  /** Parse (format, width, height) from an image payload's container
    * header — PNG (8-byte signature, IHDR width/height big-endian at
    * offsets 16/20), JPEG (marker walk to the first SOF0/1/2 frame
    * header: height/width big-endian after the precision byte), GIF
    * ("GIF87a"/"GIF89a", logical screen size little-endian at offset
    * 6). Pure byte inspection of public formats — no codec library —
    * and None for anything unrecognized (a real pipeline routes those
    * to a quarantine bucket rather than failing the task).
    */
  def imageDims(b: Array[Byte]): Option[(String, Int, Int)] = {
    if (b.length >= 24 && pngSig.indices.forall(i => b(i) == pngSig(i)) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      Some(("png", be32(b, 16), be32(b, 20)))
    } else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      // JPEG: walk FF-prefixed segments until a start-of-frame
      var i = 2
      while (i + 3 < b.length && (b(i) & 0xff) == 0xff) {
        val marker = b(i + 1) & 0xff
        if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
          if (i + 8 < b.length)
            return Some(("jpeg", be16(b, i + 7), be16(b, i + 5)))
          else return None
        } else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) {
          i += 2 // standalone marker, no length field
        } else if (marker == 0xd9 || marker == 0xda) {
          return None // end of image / start of scan without a SOF
        } else {
          i += 2 + be16(b, i + 2)
        }
      }
      None
    } else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      Some(("gif", le16(b, 6), le16(b, 8)))
    } else if (b.length >= 8 &&
        ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
         (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42))) {
      // TIFF: endianness from the magic, IFD offset at 4; walk the first
      // IFD's 12-byte entries for tags 256 (width) / 257 (height) —
      // SHORT or LONG values are inlined in the value field
      val le = b(0) == 'I'
      def u16(i: Int) = if (le) le16(b, i) else be16(b, i)
      def u32(i: Int) = if (le) le32(b, i) else be32(b, i) & 0xffffffffL
      val ifd = u32(4)
      if (ifd < 0 || ifd + 2 > b.length) None
      else {
        val n = u16(ifd.toInt)
        var w = 0; var h = 0
        var k = 0
        while (k < n && ifd + 2 + 12L * (k + 1) <= b.length) {
          val e = (ifd + 2 + 12 * k).toInt
          val tag = u16(e); val typ = u16(e + 2)
          val v = if (typ == 3) u16(e + 8) else u32(e + 8).toInt
          if (tag == 256) w = v else if (tag == 257) h = v
          k += 1
        }
        if (w > 0 && h > 0) Some(("tiff", w, h)) else None
      }
    } else None
  }

  /** Minimal valid-header payload builders (the inverse of
    * [[imageDims]] for test/synthetic data): a correct container header
    * followed by arbitrary payload bytes.
    */
  def pngPayload(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val hdr = java.nio.ByteBuffer.allocate(24)
    hdr.put(pngSig)
    hdr.putInt(13).put("IHDR".getBytes("US-ASCII")).putInt(w).putInt(h)
    hdr.array() ++ body
  }
  def jpegPayload(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    // SOI(2) + SOF0 marker(2) + segment(len 11: 2 len + 1 precision +
    // 2 height + 2 width + 1 ncomp + 3 component spec) = 15 bytes
    val hdr = java.nio.ByteBuffer.allocate(15)
    hdr.put(Array(0xff, 0xd8, 0xff, 0xc0).map(_.toByte)) // SOI + SOF0
    hdr.putShort(11.toShort).put(8.toByte)               // seg len, precision
    hdr.putShort(h.toShort).putShort(w.toShort)
    hdr.put(1.toByte).put(Array(1, 0x11, 0).map(_.toByte)) // 1 component
    hdr.array() ++ body
  }
  /** Minimal valid Exif APP1 segment (JEITA CP-3451 layout): the
    * "Exif\0\0" signature, a TIFF header in the CHOSEN byte order
    * ("II" little / "MM" big — real corpora carry both), and IFD0 with
    * three entries — Make (ASCII, stored through the offset area: the
    * part naive parsers get wrong), ImageWidth (LONG, inline) and
    * Orientation (SHORT, inline) — then a zero next-IFD pointer. */
  def exifApp1(make: String, width: Long, orientation: Int,
      bigEndian: Boolean): Array[Byte] = {
    val makeBytes = make.getBytes("US-ASCII") :+ 0.toByte
    // spec rule: values that FIT the 4-byte value field are stored
    // inline (left-justified, zero-padded); longer ones go through the
    // offset area — the branch naive writers/parsers get wrong
    val inlineMake = makeBytes.length <= 4
    // TIFF region: 8 hdr + 2 count + 3*12 entries + 4 next + make tail
    val tiffLen = 8 + 2 + 36 + 4 + (if (inlineMake) 0 else makeBytes.length)
    val t = java.nio.ByteBuffer.allocate(tiffLen)
      .order(if (bigEndian) java.nio.ByteOrder.BIG_ENDIAN
             else java.nio.ByteOrder.LITTLE_ENDIAN)
    t.put((if (bigEndian) "MM" else "II").getBytes("US-ASCII"))
    t.putShort(42.toShort)
    t.putInt(8) // IFD0 right after the header
    t.putShort(3.toShort)
    val makeOff = 8 + 2 + 36 + 4
    // entries MUST be ascending by tag (the spec's sorted-IFD rule)
    t.putShort(0x0100.toShort).putShort(4.toShort) // ImageWidth, LONG
      .putInt(1).putInt(width.toInt)
    t.putShort(0x010f.toShort).putShort(2.toShort) // Make, ASCII
      .putInt(makeBytes.length)
    if (inlineMake) t.put(java.util.Arrays.copyOf(makeBytes, 4))
    else t.putInt(makeOff)
    t.putShort(0x0112.toShort).putShort(3.toShort) // Orientation, SHORT
      .putInt(1).putShort(orientation.toShort).putShort(0.toShort)
    t.putInt(0) // next IFD
    if (!inlineMake) t.put(makeBytes)
    val tiff = t.array()
    val seg = java.nio.ByteBuffer.allocate(4 + 6 + tiff.length)
    seg.put(Array(0xff, 0xe1).map(_.toByte))
    seg.putShort((2 + 6 + tiff.length).toShort)
    seg.put("Exif\u0000\u0000".getBytes("US-ASCII"))
    seg.put(tiff)
    seg.array()
  }

  /** Insert an APP1 segment right after a JPEG's SOI marker. */
  def withExif(jpeg: Array[Byte], app1: Array[Byte]): Array[Byte] =
    jpeg.take(2) ++ app1 ++ jpeg.drop(2)

  final case class ExifMeta(id: Long, byte_order: String, make: String,
      exif_width: Long, orientation: Long)

  /** Parse the Exif APP1 out of a JPEG: segment walk from SOI to the
    * FFE1 marker, signature check, then a REAL TIFF-IFD walk in the
    * file's own byte order — inline SHORT/LONG values and
    * offset-stored ASCII both handled. Rows without a parseable APP1
    * quarantine-drop (the decoder convention). */
  def exifMeta(media: Dataset[MediaRow]): Dataset[ExifMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val b = r.media
        def u8(i: Int) = b(i) & 0xff
        if (b.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) None
        else {
          // segment walk: FF marker len(2, includes itself). Two marker
          // classes carry NO length field and must not have their next
          // two bytes misread as one: 0xFF fill bytes (any number of
          // padding FFs may precede a marker byte, ITU T.81 §B.1.1.2)
          // and the standalone markers TEM (0x01) / RST0-7 (0xD0-D7)
          var i = 2
          var app1 = -1
          var go = true
          while (go && i + 2 <= b.length && u8(i) == 0xff) {
            val marker = u8(i + 1)
            if (marker == 0xff) i += 1 // fill byte: next byte may be the marker
            else if (marker == 0xe1) { app1 = i; go = false }
            else if (marker == 0xd9 || marker == 0xda) go = false // EOI/SOS
            else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7))
              i += 2 // standalone: no length field follows
            else if (i + 4 <= b.length) {
              val len = (u8(i + 2) << 8) | u8(i + 3)
              i += 2 + len
            } else go = false // truncated length-bearing segment
          }
          if (app1 < 0 || app1 + 10 > b.length ||
              !"Exif".indices.forall(k => b(app1 + 4 + k) == "Exif".charAt(k).toByte))
            None
          else {
            val t0 = app1 + 10 // TIFF header start
            val big = u8(t0) == 'M'.toInt && u8(t0 + 1) == 'M'.toInt
            def u16(i2: Int) =
              if (big) (u8(i2) << 8) | u8(i2 + 1)
              else (u8(i2 + 1) << 8) | u8(i2)
            def u32(i2: Int): Long =
              if (big) ((u8(i2).toLong << 24) | (u8(i2 + 1).toLong << 16) |
                (u8(i2 + 2).toLong << 8) | u8(i2 + 3).toLong)
              else ((u8(i2 + 3).toLong << 24) | (u8(i2 + 2).toLong << 16) |
                (u8(i2 + 1).toLong << 8) | u8(i2).toLong)
            if (u16(t0 + 2) != 42) None
            else {
              val ifd = t0 + u32(t0 + 4).toInt
              val n = u16(ifd)
              var make = ""
              var width = -1L
              var orient = -1L
              (0 until n).foreach { e =>
                val at = ifd + 2 + 12 * e
                val tagId = u16(at)
                val typ = u16(at + 2)
                val cnt = u32(at + 4)
                tagId match {
                  case 0x0100 if typ == 4 => width = u32(at + 8)
                  case 0x0100 if typ == 3 => width = u16(at + 8).toLong
                  case 0x0112 if typ == 3 => orient = u16(at + 8).toLong
                  case 0x010f if typ == 2 =>
                    // ASCII: inline when <= 4 bytes, else offset-stored
                    val off = if (cnt <= 4) at + 8 else t0 + u32(at + 8).toInt
                    val strLen = math.max(0, cnt.toInt - 1) // drop NUL
                    if (off + strLen <= b.length)
                      make = new String(b, off, strLen, "US-ASCII")
                  case _ => ()
                }
              }
              Some(ExifMeta(r.id, if (big) "MM" else "II", make, width, orient))
            }
          }
        }
      }
    }
  }

  def gifPayload(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val hdr = java.nio.ByteBuffer.allocate(10)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    hdr.put("GIF89a".getBytes("US-ASCII"))
    hdr.putShort(w.toShort).putShort(h.toShort)
    hdr.array() ++ body
  }

  // ── real container-header codec (WAV / RIFF) ───────────────────────

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    s.indices.forall(k => b(i + k) == s.charAt(k).toByte)

  final case class WavMeta(channels: Int, sampleRate: Int,
      bitsPerSample: Int, nFrames: Long)

  /** Parse a WAV (RIFF/WAVE) container header: "RIFF" + size + "WAVE",
    * then a chunk walk — "fmt " carries channels/sample-rate/block-
    * align/bits (all little-endian, PCM layout), "data" carries the
    * payload size; frames = data size / block align. Chunks are
    * word-aligned (odd sizes pad one byte). Pure byte inspection of a
    * public format; None for anything unrecognized or truncated.
    */
  def wavMeta(b: Array[Byte]): Option[WavMeta] = {
    if (b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return None
    var channels = 0; var rate = 0; var bits = 0; var blockAlign = 0
    var dataSize = -1L; var haveFmt = false
    // Long cursor: a corrupt size field (up to 2^32-1, unsigned LE) cast
    // to Int goes negative and would walk the cursor BACKWARDS — an
    // infinite loop on adversarial bytes. As a Long the cursor is
    // monotone (+≥8 per chunk) and simply runs off the end.
    var i = 12L
    while (i + 8 <= b.length) {
      val c = i.toInt
      val sz = le32(b, c + 4)
      if (tag(b, c, "fmt ") && sz >= 16 && i + 8 + 16 <= b.length) {
        channels = le16(b, c + 10); rate = le32(b, c + 12).toInt
        blockAlign = le16(b, c + 20); bits = le16(b, c + 22)
        haveFmt = true
      } else if (tag(b, c, "data")) {
        dataSize = math.min(sz, (b.length - i - 8)) // tolerate truncation
      }
      i += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    if (haveFmt && dataSize >= 0 && blockAlign > 0)
      Some(WavMeta(channels, rate, bits, dataSize / blockAlign))
    else None
  }

  /** Minimal valid 44-byte PCM WAV header around arbitrary body bytes
    * (the inverse of [[wavMeta]] for synthetic data). */
  def wavPayload(channels: Int, sampleRate: Int, bitsPerSample: Int,
      body: Array[Byte]): Array[Byte] =
    wavPayload(1, channels, sampleRate, bitsPerSample, body)

  /** WAV header with an explicit format tag (1 = linear PCM, 7 = G.711
    * µ-law, ...). */
  def wavPayload(formatTag: Int, channels: Int, sampleRate: Int,
      bitsPerSample: Int, body: Array[Byte]): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val hdr = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    hdr.put("RIFF".getBytes("US-ASCII")).putInt(36 + body.length)
    hdr.put("WAVE".getBytes("US-ASCII"))
    hdr.put("fmt ".getBytes("US-ASCII")).putInt(16)
    hdr.putShort(formatTag.toShort).putShort(channels.toShort)
    hdr.putInt(sampleRate).putInt(sampleRate * blockAlign)
    hdr.putShort(blockAlign.toShort).putShort(bitsPerSample.toShort)
    hdr.put("data".getBytes("US-ASCII")).putInt(body.length)
    hdr.array() ++ body
  }

  /** Audio format tag from the fmt chunk (1 = PCM, 7 = µ-law), or -1. */
  private def wavFmtTag(b: Array[Byte]): Int = {
    if (b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return -1
    var i = 12L
    while (i + 8 <= b.length) {
      val c = i.toInt
      val sz = le32(b, c + 4)
      if (tag(b, c, "fmt ") && sz >= 16 && i + 8 + 16 <= b.length)
        return le16(b, c + 8)
      i += 8 + sz + (sz & 1)
    }
    -1
  }

  /** ITU-T G.711 µ-law expansion to 16-bit linear (canonical public
    * formula: complement, mantissa·8 + bias 0x84, shift by segment,
    * subtract bias, apply sign). Exact integer math. */
  def muLawToLinear(u: Int): Int = {
    val c = ~u & 0xff
    val t = (((c & 0x0f) << 3) + 0x84) << ((c & 0x70) >> 4)
    if ((c & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** Decode G.711 µ-law sample CONTENT (format tag 7, 8 bits/sample):
    * each data byte expands to a signed 16-bit linear sample. */
  def decodePcmMuLaw(b: Array[Byte]): Option[Array[Int]] =
    wavMeta(b).filter(m => m.bitsPerSample == 8 && wavFmtTag(b) == 7)
      .flatMap { _ =>
        wavDataRange(b).map { case (off, size) =>
          Array.tabulate(size.toInt)(k => muLawToLinear(b((off + k).toInt) & 0xff))
        }
      }

  /** Synthetic telephony-audio table: REAL G.711 µ-law WAV payloads
    * (mono 8 kHz, format tag 7, one µ-law byte per text byte) so the
    * companding expansion is oracle-checkable from the source columns
    * alone. */
  def syntheticUlawAudio(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        MediaRow(id, "ulaw",
          wavPayload(7, 1, 8000, 8, text.getBytes("UTF-8")), 0, 0)
      }
  }

  final case class ImageHashRow(id: Long, kind: String, width: Int,
      height: Int, ahash: Long, dhash: Long)

  /** Perceptual image hashes over DECODED pixels — the multimodal
    * member of the dedup family: aHash (8×8 samples thresholded by
    * their mean) and dHash (adjacent-column gradient signs on an 8×9
    * grid). The downsample is POINT sampling at (⌊i·h/8⌋, ⌊j·w/8⌋)
    * rather than box averaging, so every value is an exact integer and
    * the hash replays bit-for-bit in any engine (the oracle recomputes
    * it from source text; a float resize would not be hash-stable).
    * The mean threshold compares 64·s > Σs — integer, no division.
    * Narrow mapPartitions over any decodable payload (hand-rolled
    * BMP/PPM or ImageIO codec); undecodable payloads quarantine-drop.
    */
  def imageHashes(media: Dataset[MediaRow]): Dataset[ImageHashRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodePixels(r.media).orElse(decodePixelsCodec(r.media)).map {
          case (fmt, w, h, px) =>
            val bands = px.length / (w * h)
            def gray(y: Int, x: Int): Int = px(bands * (y * w + x))
            def sy(i: Int): Int = (i.toLong * h / 8).toInt
            def sx(j: Int, n: Int): Int = (j.toLong * w / n).toInt
            val s = Array.tabulate(64)(k => gray(sy(k / 8), sx(k % 8, 8)))
            var tot = 0L; s.foreach(tot += _)
            var ah = 0L
            var k = 0
            while (k < 64) { if (64L * s(k) > tot) ah |= 1L << k; k += 1 }
            var dh = 0L
            var i = 0
            while (i < 8) {
              var j = 0
              while (j < 8) {
                if (gray(sy(i), sx(j, 9)) > gray(sy(i), sx(j + 1, 9)))
                  dh |= 1L << (i * 8 + j)
                j += 1
              }
              i += 1
            }
            ImageHashRow(r.id, fmt, w, h, ah, dh)
        }
      }
    }
  }

  /** Image near-duplicate pairs by aHash Hamming distance ≤
    * `maxHamming` (≤ 3 by default). Candidates come from a 4×16-bit
    * band self-join — the pigeonhole guarantees RECALL 1 for distance
    * ≤ 3 (at most 3 differing bits cannot touch all 4 bands), so the
    * banded form equals the all-pairs oracle exactly while the join
    * only materializes band collisions (the minhash-LSH shape, never
    * all pairs). Verification is one codegen'd xor + bit_count.
    */
  def imageNearDupPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      "4x16-bit banding guarantees full recall only for hamming <= 3")
    val bandKeys = array((0 until 4).map(b =>
      shiftrightunsigned(col("ahash"), b * 16).bitwiseAND(lit(0xffffL))): _*)
    // materialize the (tiny: id + two longs) hash frame before the
    // self-join: the two banded sides are distinct subtrees after the
    // aliases, so without this BOTH re-run the upstream image DECODE —
    // at image-corpus scale decode dominates and doubling it is the
    // single largest avoidable cost in the family
    val banded = hashes.localCheckpoint(eager = false)
      .select(col("id"), col("ahash"), posexplode(bandKeys).as(Seq("band", "key")))
    val cand = banded.as("a").hint("shuffle_merge")
      .join(banded.as("b").hint("shuffle_merge"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.ahash").as("ha"), col("b.ahash").as("hb"))
      .distinct()
    cand
      .withColumn("hamming",
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  final case class AudioFrameRow(id: Long, frame_idx: Int, n_samples: Int,
      zero_crossings: Int, energy_mag: Int, checksum: Long)

  /** Frame-based audio fingerprint over DECODED PCM — the audio member
    * of the dedup family: non-overlapping 256-sample frames, each
    * summarized by its ZERO-CROSSING count (sign flips between
    * consecutive samples within the frame) and its energy MAGNITUDE
    * (bit length of Σ|s| — the same exact-integer log₂ bucket as
    * [[graft.text.TextAnalysis.unigramRarity]]). Both are exact
    * integers computed from the samples alone, so the fingerprint
    * replays bit-for-bit from source text in the oracle — float
    * spectral features (FFT bins) would not be engine-stable. This is
    * the classic cheap fingerprint basis (ZCR + energy envelope);
    * payloads decode through the real G.711/PCM/AIFF decoders.
    */
  def audioFingerprint(media: Dataset[MediaRow],
      frame: Int = 256): Dataset[AudioFrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodePcmMuLaw(r.media).orElse(decodePcm16(r.media))
          .orElse(decodePcm16Aiff(r.media)).toSeq.flatMap { pcm =>
            val nf = (pcm.length + frame - 1) / frame
            (0 until nf).map { f =>
              val lo = f * frame
              val hi = math.min(lo + frame, pcm.length)
              var zc = 0; var absum = 0L; var cs = 0L
              var k = lo
              while (k < hi) {
                absum += math.abs(pcm(k))
                // position-weighted checksum: order-sensitive, so two
                // frames agree only when their sample SEQUENCES do
                cs += pcm(k).toLong * (k - lo + 1)
                if (k + 1 < hi && ((pcm(k) < 0) != (pcm(k + 1) < 0))) zc += 1
                k += 1
              }
              AudioFrameRow(r.id, f, hi - lo, zc,
                java.lang.Long.toBinaryString(absum).length, cs)
            }
          }
      }
    }
  }

  /** Audio exact-duplicate pairs by fingerprint signature: per-doc
    * signature = Σ_f (cs_f·(f+1) + zc_f·131 + mag_f) over the frame
    * fingerprints — the position-weighted sample checksums make the
    * fold agree only for identical sample sequences (the zc/energy
    * summary alone is ~8 bits/frame and collides massively on
    * similar-statistics corpora — measured 18k false pairs on the
    * 500-doc fixture; with checksums the pairs are exactly the true
    * duplicate payloads). Docs pair on equal (frame count, signature):
    * one aggregation + one equality self-join on the tiny signature
    * table — never on payloads. */
  def audioDedupPairs(frames: DataFrame): DataFrame = {
    // same decode-once discipline as imageNearDupPairs: the signature
    // table is doc-count-sized; checkpoint it so the equality
    // self-join's two sides don't each re-run the PCM decode
    val sigs = frames.groupBy(col("id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(col("checksum") * (col("frame_idx") + 1L) +
          col("zero_crossings") * 131L + col("energy_mag")).as("sig"))
      .localCheckpoint(eager = false)
    sigs.as("a")
      .join(sigs.as("b"),
        col("a.n_frames") === col("b.n_frames") &&
          col("a.sig") === col("b.sig") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.n_frames").as("n_frames"), col("a.sig").as("sig"))
  }

  final case class ResizedFeatures(id: Long, kind: String, width: Int,
      height: Int, feat0: Double, feat1: Double)

  /** TRUE pixel resize: decode the payload (hand-rolled BMP/PPM or any
    * ImageIO codec), 2×2 box-average pool each band — edge boxes
    * average the 1 or 2 pixels actually present; per-box floor division
    * keeps every value an exact integer — and emit the resized
    * dimensions plus mean / mean-squared intensity of the RESIZED
    * image (exact integer sums, one double division). Narrow
    * mapPartitions; undecodable payloads quarantine-drop. */
  def resizePixels(media: Dataset[MediaRow]): Dataset[ResizedFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodePixels(r.media).orElse(decodePixelsCodec(r.media)).map {
          case (fmt, w, h, px) =>
            val bands = px.length / (w * h)
            val ow = (w + 1) / 2; val oh = (h + 1) / 2
            var s = 0L; var s2 = 0L
            var i = 0
            while (i < oh) {
              var j = 0
              while (j < ow) {
                var c = 0
                while (c < bands) {
                  var sum = 0; var cnt = 0
                  var di = 0
                  while (di < 2) {
                    val y = 2 * i + di
                    if (y < h) {
                      var dj = 0
                      while (dj < 2) {
                        val x = 2 * j + dj
                        if (x < w) { sum += px(bands * (y * w + x) + c); cnt += 1 }
                        dj += 1
                      }
                    }
                    di += 1
                  }
                  val v = sum / cnt
                  s += v; s2 += v.toLong * v
                  c += 1
                }
                j += 1
              }
              i += 1
            }
            val n = math.max(bands * ow * oh, 1)
            ResizedFeatures(r.id, fmt, ow, oh, s.toDouble / n, s2.toDouble / n)
        }
      }
    }
  }

  // ── real container codec (AIFF — big-endian IFF audio) ─────────────

  /** Parse an AIFF container: "FORM" + size + "AIFF", then an IFF chunk
    * walk — "COMM" carries channels / frame count / bits and the sample
    * rate as an 80-bit IEEE extended float (sign+15-bit exponent,
    * 64-bit explicit-1 mantissa: rate = mantissa >>> (16383+63−exp)),
    * all BIG-endian where WAV is little. Word-aligned chunks, monotone
    * Long cursor, None on anything unrecognized — the same discipline
    * as [[wavMeta]]. */
  def aiffMeta(b: Array[Byte]): Option[WavMeta] = {
    if (b.length < 12 || !tag(b, 0, "FORM") || !tag(b, 8, "AIFF")) return None
    var channels = 0; var bits = 0; var rate = 0L; var frames = -1L
    var haveComm = false
    var i = 12L
    while (i + 8 <= b.length) {
      val c = i.toInt
      val sz = be32(b, c + 4) & 0xffffffffL
      if (tag(b, c, "COMM") && sz >= 18 && i + 8 + 18 <= b.length) {
        channels = be16(b, c + 8)
        frames = be32(b, c + 10) & 0xffffffffL
        bits = be16(b, c + 14)
        val exp = be16(b, c + 16) & 0x7fff
        val mant = ((be32(b, c + 18).toLong & 0xffffffffL) << 32) |
          (be32(b, c + 22).toLong & 0xffffffffL)
        val shift = 16383 + 63 - exp
        rate = if (mant == 0L || shift < 0 || shift > 63) 0L else mant >>> shift
        haveComm = true
      }
      i += 8 + sz + (sz & 1) // IFF chunks are word-aligned
    }
    if (haveComm && channels > 0 && rate > 0)
      Some(WavMeta(channels, rate.toInt, bits, frames))
    else None
  }

  /** Minimal valid AIFF around big-endian PCM body bytes (the inverse of
    * [[aiffMeta]] for synthetic data): FORM/AIFF + COMM (with the 80-bit
    * extended sample rate) + SSND. */
  def aiffPayload(channels: Int, sampleRate: Int, bitsPerSample: Int,
      body: Array[Byte]): Array[Byte] = {
    val frames = body.length / (channels * bitsPerSample / 8)
    val log2 = 63 - java.lang.Long.numberOfLeadingZeros(sampleRate.toLong)
    val exp = 16383 + log2
    val mant = sampleRate.toLong << (63 - log2)
    val bb = java.nio.ByteBuffer.allocate(12 + 26 + 16 + body.length)
    bb.put("FORM".getBytes("US-ASCII")).putInt(12 + 26 + 16 + body.length - 8)
    bb.put("AIFF".getBytes("US-ASCII"))
    bb.put("COMM".getBytes("US-ASCII")).putInt(18)
    bb.putShort(channels.toShort).putInt(frames).putShort(bitsPerSample.toShort)
    bb.putShort(exp.toShort).putLong(mant) // 80-bit extended
    bb.put("SSND".getBytes("US-ASCII")).putInt(8 + body.length)
    bb.putInt(0).putInt(0) // offset, block size
    bb.put(body)
    bb.array()
  }

  /** Decode AIFF 16-bit PCM sample CONTENT: signed BIG-endian samples
    * from the SSND chunk (after its offset/blockSize preamble). */
  def decodePcm16Aiff(b: Array[Byte]): Option[Array[Int]] =
    aiffMeta(b).filter(_.bitsPerSample == 16).flatMap { _ =>
      var i = 12L
      var res: Option[Array[Int]] = None
      while (res.isEmpty && i + 8 <= b.length) {
        val c = i.toInt
        val sz = be32(b, c + 4) & 0xffffffffL
        if (tag(b, c, "SSND") && sz >= 8) {
          val off = i + 8 + 8 // skip offset + blockSize fields
          val size = math.min(sz - 8, b.length - off)
          if (size >= 0) {
            val n = (size / 2).toInt
            val out = new Array[Int](n)
            var k = 0
            while (k < n) {
              out(k) = be16(b, (off + 2L * k).toInt).toShort.toInt
              k += 1
            }
            res = Some(out)
          }
        }
        i += 8 + sz + (sz & 1)
      }
      res
    }

  // ── real container codec (MP4 / ISO base media file format) ────────

  private def be64(b: Array[Byte], i: Int): Long =
    ((be32(b, i) & 0xffffffffL) << 32) | (be32(b, i + 4) & 0xffffffffL)

  final case class Mp4Meta(brand: String, timescale: Long, duration: Long,
      durationMs: Long, nTracks: Int, width: Int, height: Int)

  /** Walk the box structure of an ISO BMFF (MP4) container — the public
    * video format the chunk/frame-sampling pipeline carries as opaque
    * bytes. Boxes are [32-bit BE size][4-char type][payload] with the
    * spec's two size escapes (1 → 64-bit largesize, 0 → to-end);
    * `ftyp` yields the major brand, `moov`/`trak` recurse (depth-bounded
    * against adversarial nesting), `mvhd` v0/v1 yields movie timescale
    * and duration, and the first `tkhd` with nonzero 16.16-fixed
    * width/height is taken as the video track. Monotone Long cursor for
    * the same adversarial-size reason as [[wavMeta]]; None for anything
    * unrecognized or truncated.
    */
  def mp4Meta(b: Array[Byte]): Option[Mp4Meta] = {
    if (b.length < 12 || !tag(b, 4, "ftyp")) return None
    var brand: String = null
    var timescale = 0L; var duration = -1L
    var nTracks = 0; var width = 0; var height = 0
    def walk(start: Long, end: Long, depth: Int): Unit = {
      var i = start
      var ok = true
      while (ok && i + 8 <= end) {
        val c = i.toInt
        var sz = be32(b, c) & 0xffffffffL
        var hdr = 8L
        if (sz == 1 && i + 16 <= end) { sz = be64(b, c + 8); hdr = 16 }
        else if (sz == 0) sz = end - i // final box extends to end
        if (sz < hdr) ok = false // corrupt size: stop, don't loop
        else {
          val p = i + hdr
          val pEnd = math.min(i + sz, end)
          if (tag(b, c + 4, "ftyp")) {
            if (p + 4 <= pEnd) brand = new String(b, p.toInt, 4, "US-ASCII")
          } else if (tag(b, c + 4, "moov") || tag(b, c + 4, "trak")) {
            if (depth < 4) walk(p, pEnd, depth + 1)
          } else if (tag(b, c + 4, "mvhd")) {
            val v = if (p < pEnd) b(p.toInt) & 0xff else -1
            if (v == 0 && p + 20 <= pEnd) {
              timescale = be32(b, p.toInt + 12) & 0xffffffffL
              duration = be32(b, p.toInt + 16) & 0xffffffffL
            } else if (v == 1 && p + 32 <= pEnd) {
              timescale = be32(b, p.toInt + 20) & 0xffffffffL
              duration = be64(b, p.toInt + 24)
            }
          } else if (tag(b, c + 4, "tkhd")) {
            nTracks += 1
            val v = if (p < pEnd) b(p.toInt) & 0xff else -1
            val wOff = if (v == 1) 88L else 76L // v1 widens 3 fields by 4
            if (v >= 0 && p + wOff + 8 <= pEnd) {
              val tw = be32(b, (p + wOff).toInt) >>> 16 // 16.16 fixed point
              val th = be32(b, (p + wOff + 4).toInt) >>> 16
              if (width == 0 && tw > 0 && th > 0) { width = tw; height = th }
            }
          }
          i += sz
        }
      }
    }
    walk(0L, b.length.toLong, 0)
    if (brand != null && timescale > 0 && duration >= 0)
      Some(Mp4Meta(brand, timescale, duration,
        duration * 1000 / timescale, nTracks, width, height))
    else None
  }

  /** Byte range (offset, length) of the top-level `mdat` body — the
    * media-data payload the frame sampler reads. Same box-walk rules as
    * [[mp4Meta]] (largesize escape, size-0 extends to EOF, corrupt
    * sizes stop instead of looping). */
  def mdatRange(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 12 || !tag(b, 4, "ftyp")) return None
    var i = 0L
    val end = b.length.toLong
    while (i + 8 <= end) {
      val c = i.toInt
      var sz = be32(b, c) & 0xffffffffL
      var hdr = 8L
      if (sz == 1 && i + 16 <= end) { sz = be64(b, c + 8); hdr = 16 }
      else if (sz == 0) sz = end - i
      if (sz < hdr) return None
      if (tag(b, c + 4, "mdat")) {
        val off = i + hdr
        val len = math.min(i + sz, end) - off
        return if (len >= 0) Some((off.toInt, len.toInt)) else None
      }
      i += sz
    }
    None
  }

  final case class VideoFrameRow(id: Long, frame_idx: Int, n_bytes: Int,
      checksum: Long)

  /** Video FRAME SAMPLING over the real container walk: the mdat body
    * (located by [[mdatRange]], never by guessing offsets) is treated
    * as fixed-stride frames, every `sampleEvery`-th frame is sampled,
    * and each sampled frame is summarized by a position-weighted byte
    * checksum — the frame-sample/fingerprint plumbing of a video dedup
    * pipeline with the codec-specific frame decode left as the
    * deterministic byte-block stand-in (real H.264 NAL parsing needs
    * codec libraries this container deliberately excludes; the
    * container walk, sampling schedule, and signature algebra are the
    * real, tested surface). Exact integers ⇒ fully oracle-replayable.
    */
  def videoFrameSignatures(media: Dataset[MediaRow], frameBytes: Int = 1024,
      sampleEvery: Int = 2): Dataset[VideoFrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        mdatRange(r.media).toSeq.flatMap { case (off, len) =>
          val nf = (len + frameBytes - 1) / frameBytes
          (0 until nf by sampleEvery).map { f =>
            val lo = f * frameBytes
            val hi = math.min(lo + frameBytes, len)
            var cs = 0L
            var k = lo
            while (k < hi) {
              cs += (r.media(off + k) & 0xff).toLong * (k - lo + 1)
              k += 1
            }
            VideoFrameRow(r.id, f, hi - lo, cs)
          }
        }
      }
    }
  }

  final case class VideoPixelFrameRow(id: Long, frame_idx: Int, w: Int,
      h: Int, checksum: Long)

  /** CONTENT-BASED video frame signatures — the MJPEG shape: each frame
    * inside the mdat is an independently-encoded image, demuxed by the
    * frame's own header (a self-delimiting BMP: 'BM' magic + the
    * little-endian byte count at offset 2 — the SOI..EOI walk of real
    * MJPEG, with the image codec swapped for the one this container
    * decodes bit-exactly), and every `sampleEvery`-th frame is DECODED
    * through [[decodePixels]] (bottom-up un-flip, row padding, BGR→RGB)
    * before signing. The signature is a position-weighted sum over the
    * decoded top-down pixel stream, so it depends on pixel CONTENT, not
    * container bytes: two containers storing the same pixels sign
    * identically, and a decode bug (flip, padding, channel order) is an
    * oracle mismatch, not a silent pass. [[videoFrameSignatures]] stays
    * as the raw-stride fallback for codecs without an in-engine decoder.
    */
  def videoFramePixelSignatures(media: Dataset[MediaRow],
      sampleEvery: Int = 2): Dataset[VideoPixelFrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        mdatRange(r.media).toSeq.flatMap { case (off, len) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[VideoPixelFrameRow]
          var i = off
          val end = off + len
          var fi = 0
          var ok = true
          while (ok && i + 54 <= end) {
            if (r.media(i) != 'B'.toByte || r.media(i + 1) != 'M'.toByte)
              ok = false // not a frame boundary: stop, don't resync blindly
            else {
              val sz = le32(r.media, i + 2).toInt
              if (sz < 54 || i + sz > end) ok = false
              else {
                if (fi % sampleEvery == 0) {
                  val frame = java.util.Arrays.copyOfRange(r.media, i, i + sz)
                  decodePixels(frame).foreach { case (_, w, h, px) =>
                    // modular rolling hash over the decoded stream (the
                    // text_rolling_fp pattern): position-sensitive AND
                    // spread over 2^31 — a plain weighted sum spans only
                    // ~2^24 here and produced 2 birthday-collision false
                    // pairs on 500 docs (measured); modular step also
                    // keeps ANSI long arithmetic overflow-free
                    var cs = 0L
                    var k = 0
                    while (k < px.length) {
                      cs = (cs * 1000003L + px(k)) % 2147483647L
                      k += 1
                    }
                    out += VideoPixelFrameRow(r.id, fi, w, h, cs)
                  }
                }
                i += sz
                fi += 1
              }
            }
          }
          out
        }
      }
    }
  }

  /** Synthetic MOTION video: a real MP4 container whose mdat is a
    * stream of REAL BMP frames (the MJPEG layout with the decodable
    * codec). Frame f's pixel p = text byte ((f + p·step) mod len) with
    * step = ⌈len/48⌉: each 48-pixel frame spans the whole text AND its
    * samples wrap past the end. (Two undersampling formulas were
    * measured first: reading bytes 0..115 paired every prefix-sharing
    * doc — 15 false pairs on 500 docs — and floor-step sampling never
    * reached the differing TAILS of the corpus's planted near-dups,
    * where one text is a 398-char prefix of the other; ceil-step
    * separates all docs at both verify scales.) Pure functions
    * of the source text, so the decoded-pixel signatures are
    * oracle-checkable from the documents table alone. Frame count
    * 3 + len mod 3 depends on TEXT only (the dedup fixture re-ids
    * planted copies; signatures must follow content, not ids). */
  def syntheticMotionVideo(docs: DataFrame, w: Int = 8, h: Int = 6)
      : Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val tb = text.getBytes("UTF-8")
        val len = tb.length
        val nf = 3 + (if (len > 0) len % 3 else 0)
        val step = math.max(1, (len + w * h - 1) / (w * h))
        val frames = (0 until nf).map { f =>
          bmpPayload(w, h,
            p => if (len == 0) 0 else tb((f + p * step) % len) & 0xff)
        }
        val body = frames.reduce(_ ++ _)
        MediaRow(id, "mp4", mp4Payload("isom", 600, nf.toLong * 40L,
          Seq((1, w, h)), body), w, h)
      }
  }

  /** Video duplicate pairs by sampled-frame signature (same fold shape
    * as [[audioDedupPairs]]): equal (sampled-frame count, signature) ⇒
    * byte-identical sampled frames. */
  def videoDedupPairs(frames: DataFrame): DataFrame = {
    // decode-once: see audioDedupPairs
    val sigs = frames.groupBy(col("id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(col("checksum") * (col("frame_idx") + 1L) + col("n_bytes"))
          .as("sig"))
      .localCheckpoint(eager = false)
    sigs.as("a")
      .join(sigs.as("b"),
        col("a.n_frames") === col("b.n_frames") &&
          col("a.sig") === col("b.sig") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.n_frames").as("n_frames"), col("a.sig").as("sig"))
  }

  /** Minimal valid MP4 around arbitrary mdat body bytes (the inverse of
    * [[mp4Meta]] for synthetic data): ftyp + moov(mvhd v0 + one trak
    * per (trackId, width, height), unity matrices) + mdat. */
  def mp4Payload(brand: String, timescale: Int, duration: Long,
      tracks: Seq[(Int, Int, Int)], body: Array[Byte]): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(8 + payload.length)
      buf.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      buf.array()
    }
    val ftyp = box("ftyp", java.nio.ByteBuffer.allocate(12)
      .put(brand.getBytes("US-ASCII")).putInt(0)
      .put("isom".getBytes("US-ASCII")).array())
    val unity = Array(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
    val mvhd = {
      val p = java.nio.ByteBuffer.allocate(100)
      p.putInt(0)                      // version 0 + flags
      p.putInt(0).putInt(0)            // creation, modification
      p.putInt(timescale).putInt(duration.toInt)
      p.putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, volume
      p.putInt(0).putInt(0)            // reserved
      unity.foreach(p.putInt)
      (0 until 6).foreach(_ => p.putInt(0)) // pre_defined
      p.putInt(tracks.size + 1)        // next_track_ID
      box("mvhd", p.array())
    }
    val traks = tracks.map { case (tid, w, h) =>
      val p = java.nio.ByteBuffer.allocate(84)
      p.putInt(7)                      // v0; enabled | in-movie | in-preview
      p.putInt(0).putInt(0)            // creation, modification
      p.putInt(tid).putInt(0).putInt(duration.toInt)
      p.putLong(0)                     // reserved
      p.putShort(0).putShort(0).putShort(0).putShort(0) // layer/group/volume
      unity.foreach(p.putInt)
      p.putInt(w << 16).putInt(h << 16) // 16.16 fixed
      box("trak", box("tkhd", p.array()))
    }
    ftyp ++ box("moov", (mvhd +: traks).reduce(_ ++ _)) ++ box("mdat", body)
  }

  final case class VideoMeta(id: Long, brand: String, timescale: Long,
      duration: Long, duration_ms: Long, n_tracks: Int, width: Int,
      height: Int)

  /** Container-metadata pass over video payloads — same narrow
    * mapPartitions batch shape as the image/audio decoders. */
  def decodeVideoMeta(media: Dataset[MediaRow]): Dataset[VideoMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        mp4Meta(r.media).map { m =>
          VideoMeta(r.id, m.brand, m.timescale, m.duration, m.durationMs,
            m.nTracks, m.width, m.height)
        }
      }
    }
  }

  /** Synthetic video table: REAL MP4 box structure (brand/timescale/
    * duration/track layout derived from doc_id and the text length,
    * text bytes as the mdat body) so the box walk is oracle-checkable
    * from the source columns alone. Odd ids add a second, dimensionless
    * (audio-like) track. */
  def syntheticVideo(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val body = text.getBytes("UTF-8")
        val len = body.length
        val brand = if (id % 2 == 0) "isom" else "mp42"
        val timescale = (id % 3) match {
          case 0 => 600; case 1 => 1000; case _ => 90000
        }
        val duration = 7L * len + 13
        val w = 16 * (1 + len % 80)
        val h = 16 * (1 + len % 45)
        val tracks = if (id % 2 == 0) Seq((1, w, h)) else Seq((1, w, h), (2, 0, 0))
        MediaRow(id, "mp4", mp4Payload(brand, timescale, duration, tracks, body), w, h)
      }
  }

  // ── real pixel/PCM content codecs (BMP 24bpp / PPM P6 / WAV PCM16) ──

  /** Encode a grayscale image as a REAL 24bpp BMP: 14-byte file header
    * ("BM", file size, pixel-array offset 54) + 40-byte
    * BITMAPINFOHEADER, then the pixel array bottom-up, rows padded to
    * 4-byte boundaries, channels in BGR order. `gray(p)` supplies the
    * intensity for pixel p in TOP-DOWN row-major order (p = y*w + x).
    */
  def bmpPayload(w: Int, h: Int, gray: Int => Int): Array[Byte] = {
    val rowSize = (3 * w + 3) / 4 * 4
    val dataSize = rowSize * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + dataSize).putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h) // positive height = bottom-up
    buf.putShort(1.toShort).putShort(24.toShort)
    buf.putInt(0).putInt(dataSize) // BI_RGB (uncompressed), image size
    buf.putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 dpi, palette
    var y = h - 1
    while (y >= 0) { // rows stored bottom-up
      var x = 0
      while (x < w) {
        val v = (gray(y * w + x) & 0xff).toByte
        buf.put(v).put(v).put(v) // B, G, R
        x += 1
      }
      var pad = 3 * w
      while (pad < rowSize) { buf.put(0.toByte); pad += 1 }
      y -= 1
    }
    buf.array()
  }

  /** Encode a grayscale image as a REAL binary PPM (P6): ASCII header
    * "P6\n{w} {h}\n255\n" followed by w·h RGB triples top-down
    * row-major. */
  def ppmPayload(w: Int, h: Int, gray: Int => Int): Array[Byte] = {
    val hdr = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](hdr.length + 3 * w * h)
    System.arraycopy(hdr, 0, out, 0, hdr.length)
    var p = 0
    while (p < w * h) {
      val v = (gray(p) & 0xff).toByte
      val o = hdr.length + 3 * p
      out(o) = v; out(o + 1) = v; out(o + 2) = v
      p += 1
    }
    out
  }

  /** Decode pixel CONTENT from a BMP (24bpp uncompressed, padded rows,
    * BGR; bottom-up by default, top-down when the header height is
    * negative per the BITMAPINFOHEADER spec), PPM (P6, maxval 255), or
    * PGM (P5 grayscale) payload: returns (format, width, height,
    * channel intensities 0–255 flattened top-down row-major — 3
    * channels for BMP/PPM, 1 for PGM), or None for anything else
    * (other bit depths, compressed BMPs, truncated pixel arrays). Pure
    * byte inspection of public formats.
    */
  def decodePixels(b: Array[Byte]): Option[(String, Int, Int, Array[Int])] = {
    if (b.length >= 54 && b(0) == 'B' && b(1) == 'M') {
      val off = le32(b, 10)
      val w = le32(b, 18).toInt
      val rawH = le32(b, 22).toInt
      val topDown = rawH < 0 // negative height = rows stored top-down
      val h = math.abs(rawH)
      val bpp = le16(b, 28)
      val comp = le32(b, 30)
      if (w <= 0 || h <= 0 || rawH == Int.MinValue || bpp != 24 || comp != 0L)
        return None
      val rowSize = (3 * w + 3) / 4 * 4
      if (off < 54 || off + rowSize.toLong * h > b.length) return None
      val out = new Array[Int](3 * w * h)
      var y = 0
      while (y < h) {
        val srcRow = if (topDown) y else h - 1 - y
        val src = off.toInt + srcRow * rowSize
        var x = 0
        while (x < w) {
          val i = src + 3 * x
          val o = 3 * (y * w + x)
          out(o) = b(i + 2) & 0xff // R (stored as BGR)
          out(o + 1) = b(i + 1) & 0xff
          out(o + 2) = b(i) & 0xff
          x += 1
        }
        y += 1
      }
      Some(("bmp", w, h, out))
    } else if (b.length >= 2 && b(0) == 'P' && b(1) == '5') {
      // PGM P5: same ASCII header as P6, one gray byte per pixel
      parseNetpbmHeader(b).flatMap { case (w, h, i) =>
        if (i.toLong + w.toLong * h > b.length) None
        else {
          val out = new Array[Int](w * h)
          var p = 0
          while (p < out.length) { out(p) = b(i + p) & 0xff; p += 1 }
          Some(("pgm", w, h, out))
        }
      }
    } else if (b.length >= 2 && b(0) == 'P' && b(1) == '6') {
      parseNetpbmHeader(b).flatMap { case (w, h, i) =>
        if (i.toLong + 3L * w * h > b.length) None
        else {
          val out = new Array[Int](3 * w * h)
          var p = 0
          while (p < out.length) { out(p) = b(i + p) & 0xff; p += 1 }
          Some(("ppm", w, h, out))
        }
      }
    } else None
  }

  /** Netpbm binary header ("P5"/"P6" + three whitespace-separated
    * decimal fields w, h, maxval; '#' comment lines are part of the
    * public spec): returns (w, h, raster start offset) when maxval is
    * 255 and dims are sane. */
  private def parseNetpbmHeader(b: Array[Byte]): Option[(Int, Int, Int)] = {
    var i = 2
    val vals = new Array[Int](3)
    var k = 0
    while (k < 3) {
      while (i < b.length && (b(i) == ' ' || b(i) == '\n' ||
        b(i) == '\r' || b(i) == '\t')) i += 1
      if (i < b.length && b(i) == '#') {
        while (i < b.length && b(i) != '\n') i += 1
      } else {
        var v = 0; var any = false
        while (i < b.length && b(i) >= '0' && b(i) <= '9' && v <= 0xffffff) {
          v = v * 10 + (b(i) - '0'); i += 1; any = true
        }
        if (!any) return None
        vals(k) = v; k += 1
      }
    }
    val w = vals(0); val h = vals(1)
    if (w <= 0 || h <= 0 || vals(2) != 255 || i >= b.length) None
    else Some((w, h, i + 1)) // one whitespace byte precedes the raster
  }

  /** Encode a grayscale image as a REAL binary PGM (P5): ASCII header +
    * w·h gray bytes top-down row-major (the single-channel sibling of
    * [[ppmPayload]]). */
  def pgmPayload(w: Int, h: Int, gray: Int => Int): Array[Byte] = {
    val hdr = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](hdr.length + w * h)
    System.arraycopy(hdr, 0, out, 0, hdr.length)
    var p = 0
    while (p < w * h) { out(hdr.length + p) = (gray(p) & 0xff).toByte; p += 1 }
    out
  }

  /** Locate the raw "data" chunk payload inside a RIFF/WAVE container:
    * (offset, usable size), truncation-tolerant, Long cursor for the
    * same adversarial-size reason as [[wavMeta]]. */
  private def wavDataRange(b: Array[Byte]): Option[(Long, Long)] = {
    if (b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return None
    var i = 12L
    while (i + 8 <= b.length) {
      val c = i.toInt
      val sz = le32(b, c + 4)
      if (tag(b, c, "data")) return Some((i + 8, math.min(sz, b.length - i - 8)))
      i += 8 + sz + (sz & 1)
    }
    None
  }

  /** Decode WAV 16-bit PCM sample CONTENT: signed little-endian samples
    * from the data chunk (channels interleaved — amplitude statistics
    * are channel-agnostic). None unless the header says PCM 16-bit. */
  def decodePcm16(b: Array[Byte]): Option[Array[Int]] =
    wavMeta(b).filter(m => m.bitsPerSample == 16 && wavFmtTag(b) == 1)
      .flatMap { _ =>
      wavDataRange(b).map { case (off, size) =>
        val n = (size / 2).toInt
        val out = new Array[Int](n)
        var k = 0
        while (k < n) {
          out(k) = le16(b, (off + 2L * k).toInt).toShort.toInt // sign-extend
          k += 1
        }
        out
      }
    }

  // ── commercial-codec pixel decode (PNG / GIF / JPEG / TIFF) ────────
  //
  // javax.imageio ships with Java SE (the java.desktop module) — zero
  // added dependencies — and carries full entropy decoders for the
  // compressed public formats the hand-rolled layer above deliberately
  // does not: PNG (DEFLATE), GIF (LZW), JPEG (DCT), TIFF. PNG/GIF/TIFF
  // are lossless, so (encodeImage ∘ decodePixelsCodec) is bit-exact and
  // the decoded-content statistics stay oracle-checkable from the source
  // column; JPEG is lossy by design and is spec-gated with a tolerance
  // instead.

  /** One-time per-JVM ImageIO setup: headless AWT (executor JVMs have no
    * display) and no disk-backed stream cache, so decode stays entirely
    * in-memory inside tasks. */
  private lazy val imageIoReady: Unit = {
    if (System.getProperty("java.awt.headless") == null)
      System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)
  }

  /** Magic-number dispatch for the ImageIO-decodable formats. Gating on
    * the signature keeps ImageIO (reader lookup + exception control
    * flow) off the hot path for payloads that cannot possibly match. */
  private def codecFormat(b: Array[Byte]): Option[String] = {
    if (b.length < 8) None
    else if (pngSig.indices.forall(i => b(i) == pngSig(i))) Some("png")
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') Some("gif")
    else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) Some("jpeg")
    else if ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
             (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42)) Some("tiff")
    else None
  }

  /** Decode pixel CONTENT from a PNG/GIF/JPEG/TIFF payload through the
    * JDK's ImageIO: returns (format, width, height, channel intensities
    * 0–255, alpha dropped, palette-indexed images mapped through their
    * color table so values are true intensities, not indices). None for
    * unrecognized magics or corrupt streams (quarantine-not-fail, like
    * [[decodePixels]]). */
  def decodePixelsCodec(b: Array[Byte]): Option[(String, Int, Int, Array[Int])] =
    codecFormat(b).flatMap { fmt =>
      imageIoReady
      scala.util.Try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
        if (img == null) None
        else {
          val w = img.getWidth; val h = img.getHeight
          val raster = img.getRaster
          val out = img.getColorModel match {
            case icm: java.awt.image.IndexColorModel =>
              // GIF / palette PNG: raster samples are palette INDICES
              val arr = new Array[Int](3 * w * h)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val idx = raster.getSample(x, y, 0)
                  val o = 3 * (y * w + x)
                  arr(o) = icm.getRed(idx)
                  arr(o + 1) = icm.getGreen(idx)
                  arr(o + 2) = icm.getBlue(idx)
                  x += 1
                }
                y += 1
              }
              arr
            case _ =>
              val bands = math.min(raster.getNumBands, 3) // drop alpha
              val arr = new Array[Int](bands * w * h)
              var k = 0; var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  var c = 0
                  while (c < bands) { arr(k) = raster.getSample(x, y, c); k += 1; c += 1 }
                  x += 1
                }
                y += 1
              }
              arr
          }
          Some((fmt, w, h, out))
        }
      }.toOption.flatten
    }

  /** Encode a grayscale image through a REAL ImageIO codec ("png",
    * "gif", "tiff", "jpg"): the compressed inverse of
    * [[decodePixelsCodec]] for synthetic data. `gray(p)` supplies pixel
    * p in top-down row-major order, like [[bmpPayload]]. */
  def encodeImage(fmt: String, w: Int, h: Int, gray: Int => Int): Array[Byte] = {
    imageIoReady
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { r.setSample(x, y, 0, gray(y * w + x) & 0xff); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, fmt, bos), s"no ImageIO writer for $fmt")
    bos.toByteArray
  }

  /** Encode a grayscale image as a REAL GIF89a stream by hand: 256-gray
    * global color table and the classic "uncompressed LZW" technique —
    * every pixel emitted as a 9-bit literal code, a CLEAR code injected
    * before the dictionary could force a code-width growth, END code,
    * 255-byte sub-blocks. Exists because the JDK's GIF *writer* corrupts
    * images with height 2–4 (rows shift; its *reader* is verified
    * correct on 1200 dimension combinations), so synthetic GIF content
    * is built here and entropy-decoded through ImageIO. */
  def gifPixelPayload(w: Int, h: Int, gray: Int => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.writeBytes("GIF89a".getBytes("US-ASCII"))
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(0xf7); out.write(0); out.write(0) // 256-entry GCT, bg 0
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    out.write(0x2c) // image descriptor at (0,0), full size
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(0) // no local table, not interlaced
    out.write(8) // LZW minimum code size (CLEAR=256, END=257)
    val data = new java.io.ByteArrayOutputStream()
    var acc = 0; var nbits = 0
    def emit(code: Int): Unit = {
      acc |= code << nbits; nbits += 9
      while (nbits >= 8) { data.write(acc & 0xff); acc >>= 8; nbits -= 8 }
    }
    var sinceClear = Int.MaxValue - 1
    var p = 0
    while (p < w * h) {
      // each literal grows the decoder dictionary; clear before code 512
      // would be reached so the stream stays at 9 bits throughout
      if (sinceClear >= 250) { emit(256); sinceClear = 0 }
      emit(gray(p) & 0xff); sinceClear += 1
      p += 1
    }
    emit(257)
    if (nbits > 0) data.write(acc & 0xff)
    val d = data.toByteArray
    var o = 0
    while (o < d.length) {
      val n = math.min(255, d.length - o)
      out.write(n); out.write(d, o, n)
      o += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  final case class CodecFeatures(id: Long, kind: String, width: Int,
      height: Int, feat0: Double, feat1: Double)

  /** Pixel statistics decoded through the commercial codecs: mean and
    * mean-squared channel intensity, like [[extractFeatures]], plus the
    * decoded dimensions. Payload SIZE is deliberately not a column —
    * compressed sizes are encoder-dependent — which is exactly why the
    * lossless formats stay hash-oracleable on content alone. Narrow
    * mapPartitions, no shuffle. */
  def extractCodecFeatures(media: Dataset[MediaRow]): Dataset[CodecFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodePixelsCodec(r.media).map { case (fmt, w, h, px) =>
          var s = 0L; var s2 = 0L; var i = 0
          while (i < px.length) { val v = px(i); s += v; s2 += v.toLong * v; i += 1 }
          val n = math.max(px.length, 1)
          CodecFeatures(r.id, fmt, w, h, s.toDouble / n, s2.toDouble / n)
        }
      }
    }
  }

  /** Synthetic media with REAL compressed payloads — PNG (id%3=0), GIF
    * (=1), TIFF (=2), all lossless — same deterministic gray pattern and
    * dimension formulas as [[syntheticPixelMedia]], so decoded-content
    * statistics are oracle-checkable from the source text even though
    * the payload BYTES are encoder-owned (DEFLATE/LZW streams). */
  def syntheticCodecMedia(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val t = text.getBytes("UTF-8")
        val len = math.max(t.length, 1)
        val w = 1 + (t.length % 32)
        val h = 1 + (t.length % 24)
        val gray = (p: Int) => if (t.isEmpty) 0 else t(p % len) & 0xff
        (id % 3) match {
          case 0 => MediaRow(id, "png", encodeImage("png", w, h, gray), w, h)
          // hand-rolled GIF stream: the JDK GIF writer mangles h∈{2,3,4}
          case 1 => MediaRow(id, "gif", gifPixelPayload(w, h, gray), w, h)
          case _ => MediaRow(id, "tiff", encodeImage("tiff", w, h, gray), w, h)
        }
      }
  }

  /** Synthetic AIFF table: REAL big-endian PCM16 payloads (mono, rate by
    * doc_id mod 3, sample k = (byte_k − 128)·256 — the same linear map
    * as the WAV twin but byte-swapped) so the big-endian decode path is
    * oracle-checkable from the source columns alone. */
  def syntheticAiffAudio(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val t = text.getBytes("UTF-8")
        val body = new Array[Byte](2 * t.length)
        var k = 0
        while (k < t.length) {
          val s = ((t(k) & 0xff) - 128) * 256
          body(2 * k) = ((s >> 8) & 0xff).toByte // big-endian
          body(2 * k + 1) = (s & 0xff).toByte
          k += 1
        }
        val rate = (id % 3) match {
          case 0 => 8000; case 1 => 22050; case _ => 48000
        }
        MediaRow(id, "aiff", aiffPayload(1, rate, 16, body), 0, 0)
      }
  }

  /** Synthetic JPEG media: real DCT-encoded streams (ImageIO writer)
    * over the same deterministic gray pattern as [[syntheticCodecMedia]].
    * JPEG is lossy by design, so the decode twin is spec-gated with a
    * tolerance (dims exact, mean intensity within a DC-preservation
    * band) instead of hash-oracled. */
  def syntheticJpegMedia(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val t = text.getBytes("UTF-8")
        val len = math.max(t.length, 1)
        val w = 1 + (t.length % 32)
        val h = 1 + (t.length % 24)
        val gray = (p: Int) => if (t.isEmpty) 0 else t(p % len) & 0xff
        MediaRow(id, "jpeg", encodeImage("jpg", w, h, gray), w, h)
      }
  }

  /** Synthetic media table with REAL pixel/PCM content, derived
    * deterministically from the documents table so the decode path is
    * oracle-checkable from the source columns alone:
    *  - even ids → grayscale image (BMP for id%4==0, else PPM),
    *    w = 1 + len%32, h = 1 + len%24, intensity of pixel p = byte
    *    (p mod len) of the UTF-8 text;
    *  - odd ids → mono 16 kHz WAV, one 16-bit sample per text byte,
    *    sample k = (byte_k − 128)·256.
    */
  def syntheticPixelMedia(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val t = text.getBytes("UTF-8")
        val len = math.max(t.length, 1)
        if (id % 2 == 0) {
          val w = 1 + (t.length % 32)
          val h = 1 + (t.length % 24)
          val gray = (p: Int) => if (t.isEmpty) 0 else t(p % len) & 0xff
          if (id % 4 == 0) MediaRow(id, "bmp", bmpPayload(w, h, gray), w, h)
          else MediaRow(id, "ppm", ppmPayload(w, h, gray), w, h)
        } else {
          val body = new Array[Byte](2 * t.length)
          var k = 0
          while (k < t.length) {
            val s = ((t(k) & 0xff) - 128) * 256
            body(2 * k) = (s & 0xff).toByte
            body(2 * k + 1) = ((s >> 8) & 0xff).toByte
            k += 1
          }
          MediaRow(id, "wav", wavPayload(1, 16000, 16, body), 0, 0)
        }
      }
  }

  final case class AudioMeta(id: Long, format: String, channels: Int,
      sample_rate: Int, bits_per_sample: Int, n_frames: Long,
      duration_ms: Long)

  /** Header-decode pass over audio payloads — same narrow mapPartitions
    * batch shape as [[decodeImageMeta]]; unparseable payloads drop. */
  def decodeAudioMeta(media: Dataset[MediaRow]): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        wavMeta(r.media).map { m =>
          AudioMeta(r.id, "wav", m.channels, m.sampleRate, m.bitsPerSample,
            m.nFrames, if (m.sampleRate > 0) m.nFrames * 1000L / m.sampleRate else 0L)
        }
      }
    }
  }

  /** Synthetic audio table: REAL PCM WAV headers (layout derived from
    * doc_id, body = text bytes) so the encode∘decode round-trip is
    * oracle-checkable from the source columns alone. */
  def syntheticAudio(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val body = text.getBytes("UTF-8")
        val channels = 1 + (id % 2).toInt
        val rate = (id % 3) match {
          case 0 => 8000; case 1 => 16000; case _ => 44100
        }
        val bits = 8 * (1 + ((id / 2) % 2).toInt)
        MediaRow(id, "audio", wavPayload(channels, rate, bits, body), 0, 0)
      }
  }

  final case class ImageMeta(id: Long, format: String, width: Int,
      height: Int, n_bytes: Int)

  /** Header-decode pass over a binary media column: mapPartitions (the
    * batch shape a pixel decoder would also use), narrow, no shuffle.
    * Unparseable payloads are dropped here; count them upstream via
    * `imageDims(...).isEmpty` if a quarantine split is needed.
    */
  def decodeImageMeta(media: Dataset[MediaRow]): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        imageDims(r.media).map { case (fmt, w, h) =>
          ImageMeta(r.id, fmt, w, h, r.media.length)
        }
      }
    }
  }

  /** Synthetic image table: REAL container headers (format by
    * doc_id mod 3, dimensions derived from the text length) wrapping
    * the text bytes as body — so header parsing is exercised on valid
    * bytes and the (encode ∘ decode) round-trip is oracle-checkable
    * from the source columns alone.
    */
  def syntheticImages(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val body = text.getBytes("UTF-8")
        val w = 1 + body.length % 640
        val h = 1 + body.length % 480
        val payload = id % 3 match {
          case 0 => pngPayload(w, h, body)
          case 1 => jpegPayload(w, h, body)
          case _ => gifPayload(w, h, body)
        }
        MediaRow(id, "image", payload, w, h)
      }
  }

  /** Build a synthetic media table from the documents table — binary
    * payloads derived from text so the pipeline has real (deterministic)
    * bytes to chew on in tests.
    */
  def syntheticMedia(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        MediaRow(id, if (id % 2 == 0) "image" else "audio", bytes,
          width = bytes.length % 640, height = bytes.length % 480)
      }
  }
}
