package graft.expressions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One (document, position) occurrence of a span hash; `is_new` tags which
  * side of an incremental run it came from (constant 1 for batch ops). */
case class SpanOcc(id: Long, pos: Long, is_new: Int)

/**
 * Size-capped posting-list collection for the span-dedup family
 * (Dedup.duplicatedSpanRanges / duplicateSpanPairs and the streaming
 * ingest screen): collects at most cap+1 occurrences per span hash and
 * finishes to EMPTY once the group has overflowed the cap — exactly the
 * buckets the `size(occs) <= maxBucket` post-filter used to discard, but
 * without ever materializing the full posting list first. That matters
 * here more than anywhere else in the dedup family: the span stream is
 * the NON-deduplicated positional one, so a 20-token license header
 * appearing in millions of documents is ONE group whose collect_list
 * buffer would hold millions of structs before the cap could discard it.
 * With the capped buffer, partial (map-side) and merged states are
 * bounded by cap+1 no matter how hot the span — same guarantee
 * [[BoundedTopKAgg]] gives centroid assignment.
 *
 * Overflow detection is exact: buffers are truncated to cap+1 elements,
 * so "length > cap" survives reduce/merge in any order, and non-overflowed
 * groups keep every occurrence. Output is sorted by (id, pos) —
 * deterministic under partitioning, and the order [[Dedup]]'s
 * upper-triangle pair expansion expects.
 */
class BoundedCollectAgg(cap: Int)
    extends Aggregator[SpanOcc, Seq[SpanOcc], Seq[SpanOcc]] {

  // overflow-safe cap+1 (callers pass Int.MaxValue for "uncapped")
  private val lim: Int = if (cap >= Int.MaxValue) Int.MaxValue else cap + 1

  override def zero: Seq[SpanOcc] = Vector.empty

  override def reduce(b: Seq[SpanOcc], a: SpanOcc): Seq[SpanOcc] =
    if (b.length > cap) b else b :+ a

  override def merge(x: Seq[SpanOcc], y: Seq[SpanOcc]): Seq[SpanOcc] = {
    val c = x ++ y
    if (c.length > lim) c.take(lim) else c
  }

  override def finish(b: Seq[SpanOcc]): Seq[SpanOcc] =
    if (b.length > cap) Vector.empty
    else b.sortBy(o => (o.id, o.pos, o.is_new))

  override def bufferEncoder: Encoder[Seq[SpanOcc]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[SpanOcc]] = ExpressionEncoder()
}

object BoundedCollectAgg {
  /** Sorted, capped posting list of (id, pos, is_new) occurrence structs;
    * empty when the group exceeded `cap` occurrences. */
  def occsCapped(id: Column, pos: Column, isNew: Column, cap: Int): Column =
    udaf(new BoundedCollectAgg(cap)).apply(id, pos, isNew)
}
