package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection (Charikar random-hyperplane sketch
  * over token sets). 60-bit fingerprints from md5-derived token hashes —
  * fully deterministic, no library RNG.
  *
  * The fingerprint is computed row-locally (narrow, no shuffle); the
  * near-dup join uses chunk banding: two fingerprints within Hamming
  * distance d must share at least one of (d+1) equal-width chunks
  * (pigeonhole), so candidates come from an equi-join on chunks, never a
  * crossJoin — the same scale shape as MinHash-LSH.
  */
object SimHash {

  private val Bits = 60 // 15 hex chars of md5 → fits a signed long

  /** 60-bit token hash from md5 — reproducible on any engine. */
  private def tokenHash(tok: Column): Column =
    conv(substring(md5(tok.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Per-row SimHash over the token multiset: bit j of the fingerprint is
    * 1 iff the sum over tokens of ±1 (by token-hash bit j) is positive.
    * Implemented as a single custom expression (one JVM pass per row —
    * the 60-aggregate Column formulation is interpreted 60× per row and
    * ~40× slower; see graft.functions.SimHash60).
    */
  def simhash(text: Column): Column =
    graft.functions.SimHashExpression.simhash60(text)

  /** Column-only reference formulation (kept for cross-checking the
    * custom expression in tests; do not use on hot paths).
    */
  def simhashReference(text: Column): Column = {
    val hashes = transform(split(lower(text), " "), t => tokenHash(t))
    val bitSums = (0 until Bits).map { j =>
      aggregate(hashes, lit(0),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
    }
    bitSums.zipWithIndex.map { case (s, j) =>
      when(s > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), simhash(col("text")).as("simhash"))

  /** Near-dup pairs with Hamming distance ≤ maxDist, banded on
    * (maxDist+1) chunks of the fingerprint.
    */
  def nearDupPairs(docs: DataFrame, maxDist: Int = 8): DataFrame = {
    val fp = fingerprints(docs).cache()
    val chunks = maxDist / 15 + 1 // 15-bit chunks out of 60 bits
    val nChunks = math.min(4, math.max(2, chunks))
    val width = Bits / nChunks
    val chunkCols = (0 until nChunks).map { i =>
      shiftright(col("simhash"), i * width).bitwiseAND(lit((1L << width) - 1))
    }
    val banded = fp.select(
      col("doc_id"), col("simhash"),
      posexplode(array(chunkCols: _*)).as(Seq("chunk", "key")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
      .orderBy(col("id_a"), col("id_b"))
  }
}
