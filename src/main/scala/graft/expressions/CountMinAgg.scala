package graft.expressions

import graft.functions.Hashing
import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * Count-min sketch (Cormode & Muthukrishnan 2005, public algorithm):
 * a depth×width counter grid; each item increments one counter per row
 * at a universal-hash position. Point estimates (min over rows) are
 * overcount-ONLY — never below the true frequency — with expected
 * overcount ≤ e·N/width under the standard analysis.
 *
 * Where it sits next to the other sketches: SpaceSaving answers "which
 * keys are heavy" under a k-counter bound; CMS answers "how often is
 * THIS key" for any later-arriving key, under a FIXED depth·width state
 * bound independent of cardinality. Unlike SpaceSaving (whose surviving
 * key set is merge-order dependent), CMS partials merge by elementwise
 * addition — the sketch is BIT-IDENTICAL under any partitioning
 * (TrainingOpsSpec pins it), so the gateable contract is the whole
 * sketch, not just bounds. Hash row i uses the shared universal family
 * over stableHash60 ([[Hashing.coeffs]]) — same public-knowledge
 * construction as the minhash path.
 *
 * 100 TB shape: fixed 8·depth·width bytes of state per group on every
 * combiner, one reduction shuffle; estimate lookups are driver-side
 * O(depth) against the broadcast sketch.
 */
class CountMinAgg(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Seq[Long]] {
  require(depth > 0 && width > 0, "depth and width must be positive")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(b: Array[Long], a: String): Array[Long] = {
    if (a != null) {
      var r = 0
      while (r < depth) {
        b(r * width + CountMinAgg.slot(r, a, width)) += 1L
        r += 1
      }
    }
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(b: Array[Long]): Seq[Long] = b.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object CountMinAgg {
  /** Counter slot of `s` in hash row `r`: the shared universal family
    * over the 60-bit base hash, reduced to the row width. */
  def slot(r: Int, s: String, width: Int): Int = {
    val (a, b) = Hashing.coeffs(r)
    val h = Hashing.stableHash60Scala(s) % Hashing.MersennePrime
    (((a * h + b) % Hashing.MersennePrime) % width).toInt
  }

  /** array<long> of depth·width counters (row-major). */
  def sketch(item: Column, depth: Int, width: Int): Column =
    udaf(new CountMinAgg(depth, width)).apply(item)

  /** Point estimate from a finished sketch: min over rows — ≥ the true
    * count of `s`, tight when the item dominates its collision sets. */
  def estimate(sk: Seq[Long], s: String, depth: Int, width: Int): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val v = sk(r * width + slot(r, s, width))
      if (v < best) best = v
      r += 1
    }
    best
  }
}
