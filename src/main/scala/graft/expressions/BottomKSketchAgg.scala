package graft.expressions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * Bottom-k (KMV) sample sketch for quantile estimation — the missing
 * member of the sketch family beside count frequency (CountMinAgg),
 * heavy hitters (SpaceSavingAgg) and distinct counts (HllRegisterAgg):
 * per group, keep the rows whose HASH ranks among the k smallest, and
 * read any quantile off the retained values. Computing an exact
 * percentile over 100 TB needs a global sort (or a per-group
 * `percentile` buffer holding the whole group); the bottom-k sketch
 * answers every quantile at once from a fixed-size state — the shape
 * that sets screen-band thresholds (e.g. a CCNet-style perplexity
 * tercile, Wenzek 2020) without ever sorting the corpus.
 *
 * Determinism discipline (the repo-wide contract): the retained set is
 * the k SMALLEST (hash, value) pairs of the group's multiset — a pure
 * set function, so the result is independent of partitioning, merge
 * order and engine; with `Hashing.stableHash60` keys the DuckDB oracle
 * re-derives the identical sample with one row_number. No RNG anywhere:
 * the "randomness" of the uniform sample is the hash, fixed and
 * auditable. Error: the classic KMV/bottom-k bound — the estimated
 * q-quantile's true rank deviates from q·n by O(n/√k) (Bar-Yossef 2002
 * sampling argument); SketchSpec pins the observed error on a fixture.
 *
 * Buffer is ≤ k pairs (map-side partial states stay constant-size no
 * matter the group cardinality — the same property BoundedTopKAgg adds
 * over collect_list), merge folds one bounded seq into another, and
 * `finish` returns the retained VALUES sorted ascending: the
 * quantile-ready artifact [[BottomKSketchAgg.quantileFromSample]] reads
 * with pure integer rank arithmetic.
 */
class BottomKSketchAgg(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[Long]] {

  override def zero: Seq[(Long, Long)] = Seq.empty

  private def insert(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] =
    if (b.length < k || Ordering[(Long, Long)].lt(a, b.last))
      (b :+ a).sorted.take(k)
    else b

  override def reduce(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] =
    insert(b, a)

  override def merge(x: Seq[(Long, Long)], y: Seq[(Long, Long)]): Seq[(Long, Long)] =
    y.foldLeft(x)(insert)

  override def finish(b: Seq[(Long, Long)]): Seq[Long] = b.map(_._2).sorted

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object BottomKSketchAgg {

  /** The group's bottom-k sample: values of the k smallest (hash, value)
    * pairs, sorted ascending. `hash` should be a uniform deterministic
    * key (convention: `Hashing.stableHash60` of the row id cast to
    * string — the split/sample/shuffle key discipline). */
  def sampleByHash(hash: Column, value: Column, k: Int): Column =
    udaf(new BottomKSketchAgg(k)).apply(hash, value)

  /** Nearest-rank-lower quantile `num/den` over a sorted sample of size
    * m: the element at 1-based rank ⌊(m−1)·num/den⌋ + 1 — exact integer
    * rank arithmetic, so engines agree at every m including m = 1 (any
    * quantile of a singleton is that value) and den-boundary quantiles
    * (num = den → the max). An EMPTY sample (m = 0 — possible when the
    * array arrives from a left join or a filter, not from a groupBy
    * output) yields NULL rather than a negative-rank error: at m = 0 the
    * "non-negative operands" premise of the floor arithmetic fails, so
    * the m > 0 branch guards it. */
  def quantileFromSample(sample: Column, num: Int, den: Int): Column = {
    require(num >= 0 && den > 0 && num <= den)
    // non-negative operands (guarded m > 0), so `div` after subtracting
    // pmod is an exact integer floor (the RangeJoin.floorDiv convention)
    val scaled = (size(sample) - lit(1)).cast("long") * lit(num.toLong)
    val rank = call_function("div",
      scaled - pmod(scaled, lit(den.toLong)), lit(den.toLong)) + lit(1L)
    when(size(sample) > 0, element_at(sample, rank.cast("int")))
  }
}
