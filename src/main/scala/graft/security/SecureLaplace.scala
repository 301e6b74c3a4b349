package graft.security

import java.nio.ByteBuffer
import java.nio.file.{Files, Path}
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Cryptographically keyed Laplace noise for the DP sketches — the
  * reference's security substrate re-expressed
  * (platform/src/main/java/org/hillview/security/SecureLaplace.java:
  * noise is a PRF of the (column, interval) index, so repeated and
  * overlapping queries see CONSISTENT noise — the binary-mechanism
  * composition requirement — while anyone WITHOUT the key cannot
  * predict or subtract it; KeyLoader.java / PersistedKeyLoader.java:
  * the key loads from a file, generated once from SecureRandom).
  *
  * Design substitution, documented: the reference PRF is AES/CBC with
  * a cipher-chosen IV (SecureLaplace.java:30), which makes noise
  * consistent only within one server process; this engine needs noise
  * that is reproducible across executors AND sessions holding the same
  * key (a Spark job computes the same interval's noise on whichever
  * executor the row lands on), so the PRF here is HMAC-SHA256(key,
  * interval-tag) — the standard keyed PRF, deterministic per key, same
  * indistinguishability contract. The uniform→Laplace inverse-CDF map
  * is the reference's exactly (SecureLaplace.uniformToLaplace), with
  * the 53-bit mantissa normalization; like the reference, it inherits
  * the Mironov CCS'12 least-significant-bits caveat (noted there).
  */
object SecurePrf {
  private val Normalizer = math.pow(2.0, -53)

  /** HMAC-SHA256 PRF → uniform double in (0, 1): top 53 bits of the
    * MAC, with the zero cell nudged one ulp up so log(1-2|0.5-u|)
    * stays finite (the reference's [0,1) sampler can emit exactly 0
    * with probability 2⁻⁵³ and return -Inf — guarded here). */
  def uniform(key: Array[Byte], message: Array[Byte]): Double = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    val h = mac.doFinal(message)
    val bits = ByteBuffer.wrap(h).getLong >>> 11
    math.max(bits.toDouble * Normalizer, Normalizer)
  }

  /** Laplace(0, scale) from the PRF — SecureLaplace.sampleLaplace with
    * uniformToLaplace's exact branch structure. */
  def laplace(key: Array[Byte], scale: Double, message: Array[Byte]): Double = {
    val unif = uniform(key, message)
    val r = 0.5 - unif
    if (r < 0) -scale * math.log(1.0 - 2.0 * -r)
    else scale * math.log(1.0 - 2.0 * r)
  }

  def laplace(key: Array[Byte], scale: Double, message: String): Double =
    laplace(key, scale, message.getBytes("UTF-8"))
}

/** Key provider (KeyLoader.java): 32-byte PRF keys. */
trait KeyLoader {
  /** The 32-byte key; implementations must return a stable value. */
  def key: Array[Byte]
}

/** Load-or-create a persisted key (PersistedKeyLoader.java:21-41):
  * existing file wins; otherwise 32 SecureRandom bytes are hashed
  * through SHA-256 ("just in case we got an adversarial input", as the
  * reference comments) and written for every later session. */
class PersistedKeyLoader(path: Path) extends KeyLoader {
  lazy val key: Array[Byte] =
    if (Files.exists(path)) Files.readAllBytes(path)
    else {
      val raw = new Array[Byte](32)
      new java.security.SecureRandom().nextBytes(raw)
      val hashed = java.security.MessageDigest.getInstance("SHA-256").digest(raw)
      // atomic create, owner-only: two concurrent sessions must agree
      // on ONE key (noise consistency is advertised cross-session), and
      // a PRF key must not be world-readable under a default umask
      val tmp = Files.createTempFile(
        Option(path.getParent).getOrElse(Path.of(".")), ".gpkey", ".tmp")
      try {
        try Files.setPosixFilePermissions(tmp,
          java.nio.file.attribute.PosixFilePermissions.fromString("rw-------"))
        catch { case _: UnsupportedOperationException => () } // non-POSIX fs
        Files.write(tmp, hashed)
        try {
          // hard-link, not rename: POSIX rename silently REPLACES an
          // existing file, so a raced second writer would clobber the
          // first session's key; link() fails atomically instead
          Files.createLink(path, tmp)
          hashed
        } catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            Files.readAllBytes(path) // lost the race: their key wins
          case _: UnsupportedOperationException =>
            // no hard links on this fs: best-effort atomic rename
            Files.move(tmp, path, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            hashed
        }
      } finally Files.deleteIfExists(tmp)
    }
}

/** Deterministic test keys (TestKeyLoader.java): a fixed base plus an
  * index, hashed — reproducible specs, and `setIndex`-style families of
  * independent keys for averaging over randomness. */
case class TestKeyLoader(base: String = "graft-dp-test-key", index: Int = 0)
    extends KeyLoader {
  lazy val key: Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest((base + ":" + index).getBytes("UTF-8"))
}

/** `secure_laplace(tag)`: Laplace(0, scale) noise keyed by the loader's
  * key and the string tag (the interval/rectangle identity). Evaluated
  * on sketch-sized post-aggregation frames only (the noise tables are
  * O(buckets·log leaves) driver metadata), never in a corpus-width hot
  * path — CodegenFallback is fine there, exactly like ThetaEstimate. */
case class SecureLaplaceExpr(child: Expression, scale: Double,
    keyBytes: Array[Byte]) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    SecurePrf.laplace(keyBytes, scale, v.asInstanceOf[UTF8String].getBytes)
  override def prettyName: String = "secure_laplace"
  override protected def withNewChildInternal(newChild: Expression): SecureLaplaceExpr =
    copy(child = newChild)
}

object SecureLaplaceExpr {
  def noise(tag: Column, scale: Double, loader: KeyLoader): Column =
    graftshim.exprToColumn(
      SecureLaplaceExpr(graftshim.columnToExpr(tag), scale, loader.key))
}
