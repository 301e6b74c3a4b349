package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary
  * columns with typed metadata, processed per-partition in batches.
  *
  * The PIXEL codecs are NOT available in this environment, so pixel-
  * level features remain a clearly-marked deterministic stub — but the
  * container-header layer is REAL: [[imageDims]] parses PNG IHDR, JPEG
  * SOF, and GIF logical-screen headers (public byte formats) straight
  * off the binary column, and [[syntheticImages]] builds payloads with
  * valid headers so the encode→parse round-trip is oracled end-to-end.
  * Everything around the stub — schema, batch iteration, partition-
  * parallel extraction, metadata propagation — is the real Spark
  * plumbing a production pipeline would keep, swapping `decodeStub`
  * for a JNI/native pixel decoder.
  */
object Multimodal {

  final case class MediaRow(id: Long, kind: String, media: Array[Byte], width: Int, height: Int)
  final case class MediaFeatures(id: Long, kind: String, n_bytes: Int,
      checksum: Long, feat0: Double, feat1: Double)

  /** STUB decoder: a real implementation decodes image bytes and emits
    * pixel statistics. Here: deterministic features from the raw bytes so
    * the pipeline is testable end-to-end.
    */
  def decodeStub(bytes: Array[Byte]): (Double, Double) = {
    var s0 = 0.0; var s1 = 0.0; var i = 0
    while (i < bytes.length) { s0 += (bytes(i) & 0xff); s1 += ((bytes(i) & 0xff) * (i % 7)); i += 1 }
    val n = math.max(bytes.length, 1)
    (s0 / n, s1 / n)
  }

  /** Feature extraction: mapPartitions so a real decoder could amortize
    * per-batch model/codec initialization (the Scala analog of
    * mapInPandas batch processing). Narrow — no shuffle.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init of the (stub) decoder happens here
      rows.map { r =>
        val (f0, f1) = decodeStub(r.media)
        val crc = new java.util.zip.CRC32()
        crc.update(r.media)
        MediaFeatures(r.id, r.kind, r.media.length, crc.getValue, f0, f1)
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

  /** Resize stand-in: stride-sample the payload to a smaller one (a real
    * implementation decodes and bilinear-resamples pixels; the stub keeps
    * every `stride`-th byte) and emit the new payload's metadata. Narrow
    * map, batch-amortizable like extractFeatures.
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
      body: Array[Byte]): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val hdr = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    hdr.put("RIFF".getBytes("US-ASCII")).putInt(36 + body.length)
    hdr.put("WAVE".getBytes("US-ASCII"))
    hdr.put("fmt ".getBytes("US-ASCII")).putInt(16)
    hdr.putShort(1.toShort).putShort(channels.toShort) // PCM
    hdr.putInt(sampleRate).putInt(sampleRate * blockAlign)
    hdr.putShort(blockAlign.toShort).putShort(bitsPerSample.toShort)
    hdr.put("data".getBytes("US-ASCII")).putInt(body.length)
    hdr.array() ++ body
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
