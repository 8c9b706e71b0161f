package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bit-packed Bloom filter as a Spark-native build/probe pair — the
  * documented graduation path of `dedup_incremental`'s one-hash bucket
  * table (see that entry's scaladoc): past ~10⁸ history keys a 2^16-bucket
  * table saturates and an 8-byte-per-key long table stops shipping, while
  * a real Bloom filter at ~16 bits/key stays executor-resident (10⁹ keys
  * ≈ 2 GB of bits).
  *
  * Design:
  *   - BUILD is distributed: each key explodes into [[NumHashes]] bit
  *     positions (xxhash64 seeded by the hash index — the standard
  *     independent-hash construction), positions aggregate per 64-bit word
  *     with `bit_or`, and only the OCCUPIED words are collected — bounded
  *     by min(mBits/64, NumHashes·n) rows, never by corpus size.
  *   - PROBE is a pure projection: the word→bits map rides the plan as ONE
  *     map literal and membership is [[NumHashes]] masked lookups — no
  *     join at all, which beats even the bucket table's broadcast
  *     `left_anti` join (the probe side never shuffles and never waits on
  *     a build-side exchange).
  *   - The filter is INVISIBLE to results by construction: no false
  *     negatives (every inserted key's bits are set), and false positives
  *     are only ever passed onward to an exact confirm join — callers'
  *     outputs are identical with or without the prefilter.
  *
  * Sizing law ([[bitsFor]]): m = 16 bits/key rounded up to a power of two,
  * floored at 2^16. At k=3 hashes that bounds the false-positive rate at
  * (1−e^{−3/16})³ ≈ 0.5% when full. The literal-map form is capped at
  * [[MaxBits]] (2^22 bits = 64 Ki words ≈ 512 KB of plan literal — the
  * KMeans centroid-literal cap argument); beyond that, production keeps the
  * same words table as a broadcast relation and probes with the
  * `dedup_incremental` bucket-join shape, or sizes m down and accepts the
  * higher FP rate (exactness never depends on it). */
object BloomFilter {

  /** Independent hash functions per key. */
  val NumHashes = 3

  /** Sizing floor: below this the filter is so small it may as well be the
    * minimum (one long[1024] — trivially a plan literal). */
  val MinBits: Long = 1L << 16

  /** Literal-map cap — see the object scaladoc for the graduation path. */
  val MaxBits: Long = 1L << 22

  /** m = 16·n bits rounded up to a power of two, clamped to
    * [MinBits, MaxBits]. Derive n from a metadata-cheap upper bound (a
    * parquet row count) — oversizing only lowers the FP rate. */
  def bitsFor(nKeys: Long): Long = {
    // clamp before multiplying: 16·nKeys overflows past 2^59 keys, and any
    // count >= MaxBits/16 already saturates the cap
    if (nKeys >= MaxBits / 16) MaxBits
    else {
      val target = 16L * math.max(1L, nKeys)
      var m = MinBits
      while (m < target && m < MaxBits) m <<= 1L
      m
    }
  }

  private def positions(key: Column, mBits: Long): Seq[Column] =
    (0 until NumHashes).map(i => pmod(xxhash64(lit(i), key), lit(mBits)))

  /** pos → word index, ONE integer definition shared by build and probe
    * (IntegralDivide, `pos div 64`). The probe briefly computed
    * floor(p / 64) in IEEE doubles — value-equal under the [[MaxBits]]
    * cap, but a textually forked word law is exactly the build/probe
    * drift [[Built]] exists to prevent, so both sides now call this. */
  private def wordIndex(p: Column): Column =
    call_function("div", p, lit(64L))

  /** pos → single-bit mask within its word — the build/probe-shared other
    * half of the word law (positions are pmod results, hence ≥ 0, so
    * `pmod(p, 64)` and `p % 64` agree). */
  private def bitMask(p: Column): Column =
    call_function("shiftleft", lit(1L), pmod(p, lit(64L)).cast("int"))

  /** A built filter: the occupied words AND the modulus they were built
    * with, inseparable — probing with a different mBits than the build
    * remaps every position and silently produces FALSE NEGATIVES (the one
    * failure the no-false-negatives invariant cannot survive), so the
    * modulus is not a parameter the probe side may recompute. */
  final case class Built(words: Map[Long, Long], mBits: Long)

  /** Distributed build: returns the occupied 64-bit words as word→bits,
    * paired with mBits. One small shuffle (≤ mBits/64 groups), one bounded
    * collect. */
  def build(keys: DataFrame, keyCol: String, mBits: Long): Built = {
    require(mBits > 0 && mBits % 64 == 0 && mBits <= MaxBits,
      s"mBits=$mBits must be a positive multiple of 64 and <= $MaxBits " +
        "(the literal-map cap; see BloomFilter's scaladoc for larger filters)")
    val words = keys
      .select(explode(array(positions(col(keyCol), mBits): _*)).as("pos"))
      .select(wordIndex(col("pos")).as("word"), bitMask(col("pos")).as("mask"))
      .groupBy("word")
      .agg(expr("bit_or(mask)").as("bits"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    Built(words, mBits)
  }

  /** Membership as a pure projection: true iff every position's bit is set.
    * `try_element_at` (not `element_at`): under the pinned ANSI mode a
    * missing map key must read as "word empty" (NULL→0), not raise. */
  def mightContain(bloom: Built, key: Column): Column = {
    val words = typedlit(bloom.words)
    positions(key, bloom.mBits).map { p =>
      coalesce(try_element_at(words, wordIndex(p)), lit(0L))
        .bitwiseAND(bitMask(p)) =!= 0L
    }.reduce(_ && _)
  }
}
