package graft.expressions

import graft.functions.Hashing
import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * HyperLogLog register accumulator (Flajolet et al. 2007, public
 * algorithm): 2^p registers, each holding the maximum "rank" (position of
 * the first 1-bit) observed among hashed items routed to that bucket.
 *
 * Completes the bounded-state sketch family: SpaceSaving answers "which
 * keys are heavy", CMS answers "how often is THIS key", HLL answers "how
 * many DISTINCT keys" — in 2^p small integers per group, independent of
 * cardinality (exact count(DISTINCT) holds one combiner per distinct key;
 * over raw 100 TB token/URL streams the distinct set IS the memory
 * problem). Registers merge by elementwise MAX — commutative and
 * idempotent — so like CMS (and unlike SpaceSaving) the whole register
 * table is BIT-IDENTICAL under any partitioning, replay, or merge order:
 * the gateable contract is the full sketch, and re-delivered rows cannot
 * corrupt it (max is idempotent where CMS addition is not — HLL is the
 * sketch you can feed at-least-once streams without a dedup stage).
 *
 * Bucket/rank derivation over the portable 60-bit hash
 * ([[Hashing.stableHash60]]): bucket = h mod 2^p (low p bits), value
 * v = h >> p (the remaining 60−p bits), rank = (60−p) − bitlength(v) + 1
 * (v = 0 → 60−p+1). Both pieces are plain integer arithmetic an external
 * SQL oracle reproduces exactly (DuckDB: `h % 2^p`, `55 − length(bin(v))`
 * at p = 6).
 *
 * 100 TB shape: fixed 4·2^p bytes of state per group on every combiner,
 * one reduction shuffle; estimates are O(2^p) against the finished
 * registers. The estimator ([[HllRegisterAgg.estimate]]) applies the
 * standard bias-corrected harmonic mean with the small-range
 * linear-counting fallback — floating point, engine-local, spec-gated;
 * the registers themselves are the oracle-able core.
 */
class HllRegisterAgg(p: Int) extends Aggregator[String, Array[Int], Seq[Int]] {
  require(p >= 2 && p <= 16, s"p must be in [2,16], got $p")
  private val m = 1 << p

  override def zero: Array[Int] = new Array[Int](m)

  override def reduce(b: Array[Int], a: String): Array[Int] = {
    if (a != null) {
      val h = Hashing.stableHash60Scala(a)
      val bucket = (h & (m - 1)).toInt
      val r = HllRegisterAgg.rank(h >>> p, 60 - p)
      if (r > b(bucket)) b(bucket) = r
    }
    b
  }

  override def merge(x: Array[Int], y: Array[Int]): Array[Int] = {
    var i = 0
    while (i < x.length) { if (y(i) > x(i)) x(i) = y(i); i += 1 }
    x
  }

  override def finish(b: Array[Int]): Seq[Int] = b.toSeq

  override def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Int]] = ExpressionEncoder()
}

object HllRegisterAgg {
  /** Rank of `v` within a `bits`-wide field: leading zeros + 1; v = 0 →
    * bits + 1. Plain-Scala twin of the Column arithmetic in
    * `Aggregates.hllRegisters` (spec pins the equality). */
  def rank(v: Long, bits: Int): Int =
    if (v == 0L) bits + 1
    else bits - (64 - java.lang.Long.numberOfLeadingZeros(v)) + 1

  /** array<int> of 2^p registers (bucket-indexed). */
  def registers(item: Column, p: Int): Column =
    udaf(new HllRegisterAgg(p)).apply(item)

  /**
   * Standard HLL distinct estimate from finished registers: harmonic-mean
   * raw estimate with alpha bias correction; linear counting below 2.5·m
   * when empty registers remain (the published small-range correction).
   * The 60-bit hash space makes the large-range (32-bit wraparound)
   * correction unnecessary at any realistic cardinality.
   */
  def estimate(registers: Seq[Int]): Double = {
    val m = registers.size
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    var invSum = 0.0
    var zeros = 0
    registers.foreach { r =>
      invSum += math.pow(2.0, -r)
      if (r == 0) zeros += 1
    }
    val raw = alpha * m * m / invSum
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else raw
  }
}
