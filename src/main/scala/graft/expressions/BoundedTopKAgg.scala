package graft.expressions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * Bounded top-k aggregation over (sortKey, id) pairs: keeps only the k
 * smallest keys seen (ties broken by smaller id), returning the ids in rank
 * order. The buffer never exceeds k entries, so partial (map-side) states
 * stay constant-size no matter how many rows feed a group — the property
 * `collect_list` + slice lacks (its partial state is the whole group, which
 * made multi-probe centroid assignment hold n·k structs in memory;
 * ScaleProbe measured the cliff at 80k×566).
 *
 * For "top-k by descending score" pass the negated score as the key
 * (deterministic: (−score, id) ascending ≡ score descending, smallest-id
 * tie-break).
 */
class BoundedTopKAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[Long]] {

  override def zero: Seq[(Double, Long)] = Seq.empty

  private def insert(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
    if (b.length < k || Ordering[(Double, Long)].lt(a, b.last))
      (b :+ a).sorted.take(k)
    else b

  override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
    insert(b, a)

  override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
    y.foldLeft(x)(insert)

  override def finish(b: Seq[(Double, Long)]): Seq[Long] = b.map(_._2)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object BoundedTopKAgg {
  /** ids of the k smallest (key, id) pairs, in rank order. */
  def topIdsByKey(key: Column, id: Column, k: Int): Column =
    udaf(new BoundedTopKAgg(k)).apply(key, id)
}
