package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Cross-engine deterministic hashing.
 *
 * Spark's native `hash()`/`xxhash64()` are Murmur3/xxHash with Spark-specific
 * seeds — excellent inside the engine, but impossible to replicate in an
 * external SQL oracle. For operators whose OUTPUT must be hash-verifiable
 * (minhash signatures, fingerprints), we derive a 60-bit integer hash from
 * the first 15 hex chars of MD5 — md5 is bit-identical in every engine.
 *
 * At 100 TB scale md5-per-shingle costs more than murmur3; the engine exposes
 * both: `stableHash60` (portable, verifiable) and Spark's `xxhash64` (fast
 * path) behind the same operator parameters.
 */
object Hashing {

  /** Portable 60-bit non-negative hash: first 15 hex chars of md5, base-16
    * → long. Compiled form since round 12
    * ([[graft.expressions.StableHash60]]): one digest per row, the 60-bit
    * value assembled from the raw digest bytes — the previous declarative
    * chain (`conv(substring(md5(c), 1, 15), 16, 10)::long`) hex-encoded a
    * 32-char string and re-parsed it per row. Bit-identical by
    * construction; HashingSpec pins the equality against both the chain
    * and the Scala twin. */
  def stableHash60(c: Column): Column =
    graft.expressions.StableHash60.column(c)

  /**
   * Seed-domain draw key — the ONE structural definition of the engine's
   * hash-threshold convention (VERDICT r9 ask 3). Two laws, both load-
   * bearing and both pinned by ContractSpec/SamplingSpec:
   *
   *  1. The seed PREFIXES the key, so every threshold draw lives in its
   *     own hash domain — composing a rate draw with a split assignment
   *     (or another draw) on the same key can never correlate. The
   *     hazard is real: an unsalted mod-10 draw upstream of a mod-10
   *     split starved val/test entirely on the cap_banded disk probe.
   *  2. The concat is NULL-PROPAGATING (`concat`, not `concat_ws`): a
   *     NULL key hashes NULL, so any `hash < threshold` test drops the
   *     row — exactly the oracle's null-propagating `||`.
   *
   * Every hash-threshold operator (PPS family, hashSample family, the
   * band-rate admission riding them) MUST build its draw through this
   * helper; the five formerly comment-enforced call sites in Sampling
   * now cannot drift.
   */
  def domain(seed: Long, key: Column): Column =
    stableHash60(concat(lit(s"$seed "), key.cast("string")))

  /** Plain-Scala twin of [[stableHash60]] — same value for the same string.
    * For code that hashes OUTSIDE a Column expression (streaming state
    * functions, driver-side draws); HashingSpec pins the equality. */
  def stableHash60Scala(s: String): Long =
    graft.expressions.StableHash60.computeBytes(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /**
   * Universal-hash family over stableHash60 for minhash:
   * h_i(x) = (a_i * h(x) + b_i) mod p, with p = 2^31 − 1 (Mersenne prime).
   * a,b < 2^31 and h < 2^60 would overflow 64-bit multiply, so the base hash
   * is first reduced mod p. All arithmetic stays < 2^62 — safe in both
   * Spark (Java long) and DuckDB (BIGINT, which errors on overflow).
   */
  val MersennePrime: Long = (1L << 31) - 1

  def universalHash(base: Column, a: Long, b: Long): Column =
    (lit(a) * (base % MersennePrime) + lit(b)) % MersennePrime

  /** Deterministic (a_i, b_i) coefficients for hash i — small primes powered, fixed seed. */
  def coeffs(i: Int): (Long, Long) = {
    // simple LCG on the index; constants from Numerical Recipes — public domain knowledge
    val a = (1664525L * (i + 1) + 1013904223L) % MersennePrime
    val b = (22695477L * (i + 1) + 1L) % MersennePrime
    (if (a == 0) 1L else a, b)
  }
}
