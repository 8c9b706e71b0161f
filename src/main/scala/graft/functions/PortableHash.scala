package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A 48-bit integer hash computable identically in Spark, DuckDB, and plain
  * Scala: the first 12 hex chars of MD5, parsed as an integer.
  *
  * This is what makes the MinHash / SimHash / fingerprint operators
  * oracle-checkable: both engines derive the exact same integer per string,
  * so signature arithmetic (mod-prime affine transforms, bit tests) agrees
  * bit-for-bit. For a production 100 TB path one would use Spark's codegen'd
  * `xxhash64` instead (same operator shape, cheaper hash); the MD5 form is
  * the cross-engine-verifiable variant.
  */
object PortableHash {

  /** Modulus for MinHash affine permutations (2^31 - 1, prime). Products
    * a*(h%P) stay below 2^62 for a < 2^31, so BIGINT math never overflows. */
  val P: Long = 2147483647L

  /** 48-bit hash as a Spark Column (stays inside whole-stage codegen). */
  def h48(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  /** DuckDB twin of [[h48]]. */
  def h48Sql(e: String): String =
    s"CAST('0x' || SUBSTR(MD5($e), 1, 12) AS BIGINT)"

  /** Pure-Scala twin (used to precompute deterministic constants like LSH
    * hyperplanes that are then injected as literals on BOTH sides). */
  def h48(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.take(6).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
  }
}
