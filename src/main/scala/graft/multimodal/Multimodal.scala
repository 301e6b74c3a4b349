package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary
  * columns with typed metadata, processed per-partition in batches.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode step is a clearly-marked deterministic stub; everything around
  * it — schema, batch iteration, partition-parallel feature extraction,
  * metadata propagation — is the real Spark plumbing a production
  * pipeline would keep, swapping `decodeStub` for a JNI/native decoder.
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
