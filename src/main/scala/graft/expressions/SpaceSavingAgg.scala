package graft.expressions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * SpaceSaving heavy hitters: approximate top frequencies under a HARD
 * k-counter state bound. Exact top-k by count (CorpusStats.topVocabulary)
 * carries one map-side combiner per DISTINCT key — fine for a closed
 * vocabulary, unbounded for open domains (URLs, user agents, raw n-grams
 * at 100 TB, where the distinct-key set itself outgrows an executor).
 * SpaceSaving keeps k counters: a known key increments; an unknown key at
 * a full buffer replaces the minimum counter and inherits its count
 * (Metwally et al. 2005; merge per Agarwal et al., "Mergeable Summaries").
 *
 * Guarantees that survive ANY partitioning/merge order (the spec gates
 * only these): estimates never undercount, overcount by at most the sum
 * of inherited minima (≤ n/k per merge level), and every key whose true
 * count exceeds that bound is present. WHICH borderline keys appear —
 * like the sketch internals of approx_percentile — is partition-order
 * dependent; callers needing byte-stable output use the exact operator.
 * With k ≥ distinct(keys) no eviction ever happens and the result is
 * exact counts regardless of order.
 *
 * Cost note: eviction scans the k counters for the minimum — O(k) per
 * unknown-key row once the buffer fills, so per-partition cost is
 * O(rows·k) in the worst (heavy-tailed) case. Keep k in the hundreds-to-
 * low-thousands per group; the classic Stream-Summary structure (count-
 * bucketed doubly-linked lists, O(1) eviction) is the drop-in refinement
 * if a profile ever shows this scan (tracked in NOTES next steps).
 */
class SpaceSavingAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(k > 0, "k must be positive")

  override def zero: Map[String, Long] = Map.empty

  private def offer(b: Map[String, Long], key: String, weight: Long): Map[String, Long] =
    b.get(key) match {
      case Some(c) => b.updated(key, c + weight)
      case None if b.size < k => b.updated(key, weight)
      case None =>
        // evict the minimum counter (deterministic tie-break: smallest
        // key) — the newcomer inherits its count, preserving the
        // overestimate-only invariant
        val (mk, mc) = b.minBy { case (key2, c) => (c, key2) }
        b.removed(mk).updated(key, mc + weight)
    }

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    if (a == null) b else offer(b, a, 1L)

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
    // keys offered in sorted order: merge is then a pure function of the
    // two maps (never of their internal iteration order)
    y.toSeq.sortBy { case (key, c) => (key, c) }
      .foldLeft(x) { case (b, (key, c)) => offer(b, key, c) }

  override def finish(b: Map[String, Long]): Seq[(String, Long)] =
    b.toSeq.sortBy { case (key, c) => (-c, key) }

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
}

object SpaceSavingAgg {
  /** array<struct<_1 item, _2 estimate>> of ≤ k heavy hitters, count-desc. */
  def heavyHitters(item: Column, k: Int): Column =
    udaf(new SpaceSavingAgg(k)).apply(item)
}
