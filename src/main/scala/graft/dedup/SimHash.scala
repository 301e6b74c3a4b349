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

  /** 60-bit token hash from md5 — reproducible on any engine (one
    * kernel call; bit-identical to the conv/substring/md5 Column chain). */
  private def tokenHash(tok: Column): Column =
    graft.functions.SimHashExpression.md5Long60(tok)

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

  /** Near-dup pairs with Hamming distance ≤ maxDist — EXACT recall via
    * pigeonhole banding (Manku et al., WWW'07 scheme): the fingerprint is
    * split into `nChunks` contiguous chunks and each band key is the
    * concatenation of one `chunksPerKey`-sized chunk combination. A pair
    * within distance d has its differing bits in at most d chunks, so at
    * least `nChunks - d ≥ chunksPerKey` chunks agree and some enumerated
    * combination is fully clean — every qualifying pair collides on at
    * least one band. Requires `nChunks - chunksPerKey >= maxDist`.
    *
    * Defaults (maxDist+1 chunks, 1 chunk per key) give the minimum band
    * count (maxDist+1) with narrow keys (60/(d+1) bits). At corpus scale
    * narrow keys over-collide: raise both, e.g. nChunks=12,
    * chunksPerKey=4 for maxDist=8 → C(12,4)=495 bands of ~20-bit keys —
    * more explode volume but collision buckets shrink geometrically.
    * (For the common small-d web-dedup setting the combinatorics are
    * mild: d=3 over 60 bits → nChunks=6, q=3, 20 bands of 30 bits.)
    */
  def nearDupPairs(docs: DataFrame, maxDist: Int = 8,
      nChunks: Int = 0, chunksPerKey: Int = 1): DataFrame = {
    val m = if (nChunks > 0) nChunks else maxDist + 1
    val q = chunksPerKey
    require(m - q >= maxDist,
      s"pigeonhole guarantee needs nChunks - chunksPerKey >= maxDist (got $m - $q < $maxDist)")
    require(q >= 1 && m <= Bits)
    val fp = fingerprints(docs).cache()
    // all C(m,q) band keys from ONE row-local expression (long keys —
    // hash equality is implied by chunk equality, so no qualifying pair
    // is lost; a collision only adds a candidate the exact hamming
    // filter drops). A per-combination Column projection would generate
    // C(m,q) expressions and fall out of codegen past ~hundreds.
    val banded = fp.select(
      col("doc_id"), col("simhash"),
      posexplode(graft.functions.SimHashExpression.bandKeys(col("simhash"), m, q))
        .as(Seq("band", "key")))
    // shuffle-join hint: the sides are identical exploded corpora, so a
    // broadcast build (which Catalyst picks from the pre-explode size
    // estimate of the cached fingerprints) OOMs at corpus scale —
    // observed at 100k docs × C(12,4) bands
    banded.as("a").hint("shuffle_merge")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
