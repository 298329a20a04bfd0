package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Batch interval/range join: every (fact, interval) pair with equal keys and
 * `start ≤ fact.time < end` — the training-data primitive for attaching
 * validity-windowed context (campaigns, sessions, price epochs) to events.
 * Extension-tier operator (no reference analog; the reference's only join is
 * latest-per-group, sql/create_tables.sql:194-218).
 *
 * Scale shape: a naive `ON key AND t BETWEEN start AND end` degrades to a
 * per-key cartesian (or, keyless, a full BNLJ) — the classic range-join
 * trap. Here both sides are TIME-BUCKETED: facts get their one containing
 * bucket, intervals explode to the buckets they overlap, and the join is a
 * plain equi-join on (keys, bucket) with the residual range predicate as a
 * post-filter. The fact side — the 100 TB side — is NEVER amplified; only
 * interval rows replicate, by ceil(span/bucketWidth) each, so pick
 * `bucketWidth` near the typical interval span (replication stays O(1) per
 * interval while buckets stay selective). Skewed keys ride the same
 * AQE/salting controls as any equi-join.
 *
 * Correctness of the bucketing: a fact lies in exactly one bucket and an
 * interval emits each overlapped bucket exactly once, so every qualifying
 * pair is produced exactly once — no dedup stage.
 *
 * Times are INTEGRAL (e.g. epoch seconds/nanos) — callers convert
 * timestamps first; integer bucket math is bit-identical across engines,
 * which the oracle gate requires.
 */
object RangeJoin {

  /** Exact integer floor division by a positive width, valid over the FULL
    * long range. `floor(col / w)` computes in IEEE double and is off by one
    * once |col| exceeds 2^53 (e.g. nanosecond-epoch intervals) — a silently
    * dropped or duplicated pair. `a − pmod(a, w)` is the largest multiple
    * of w ≤ a (pmod is non-negative for positive w), and dividing an exact
    * multiple with integral `div` is truncation-free. */
  private def floorDiv(c: Column, w: Long): Column = {
    val lc = c.cast("long")
    call_function("div", lc - pmod(lc, lit(w)), lit(w))
  }

  /**
   * @param keys     equality keys present on both sides (may be empty: the
   *                 join still runs as an equi-join on the bucket alone)
   * @param timeCol  fact-side numeric event time
   * @param startCol interval start (inclusive)
   * @param endCol   interval end (exclusive)
   * @param bucketWidth bucket size in time units, > 0
   */
  def joinByRange(facts: DataFrame, intervals: DataFrame, keys: Seq[String],
                  timeCol: String, startCol: String, endCol: String,
                  bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val f = facts.withColumn("__bucket", floorDiv(col(timeCol), bucketWidth))
    // empty intervals (end ≤ start) match nothing and are dropped BEFORE the
    // bucket expansion — sequence() would otherwise step backwards and emit
    // wrong buckets. end−1 = last instant an exclusive-end interval covers.
    val iv = intervals
      .where(col(endCol) > col(startCol))
      .withColumn("__bucket",
        explode(sequence(floorDiv(col(startCol), bucketWidth),
          floorDiv(col(endCol) - 1, bucketWidth))))
    f.join(iv, (keys :+ "__bucket").toSeq)
      .where(col(timeCol) >= col(startCol) && col(timeCol) < col(endCol))
      .drop("__bucket")
  }

  /**
   * Interval×interval OVERLAP join: every (a, b) pair with equal keys
   * whose half-open intervals intersect — `a.start < b.end AND b.start <
   * a.end` (touching intervals do NOT overlap). The segment-alignment
   * primitive: media segments × transcript spans, sessions × incident
   * windows, validity epochs × validity epochs.
   *
   * Scale shape: BOTH sides bucket-explode (each interval replicates
   * ceil(span/bucketWidth) times) and the join is a plain equi-join on
   * (keys, bucket). A pair overlapping across several shared buckets
   * would surface once per bucket — instead of a dedup shuffle, the
   * standard positional rule keeps each pair ONLY in the bucket
   * containing max(a.start, b.start): that bucket is covered by both
   * intervals of every truly overlapping pair (an interval always covers
   * its own start, and max-start < min-end), and it is unique — so every
   * qualifying pair is emitted exactly once, duplicate-free by
   * construction. Pick `bucketWidth` near the typical span: replication
   * stays O(1)/row while buckets stay selective; skewed keys ride the
   * same AQE/salting controls as any equi-join.
   *
   * Non-key columns are prefixed `a_`/`b_` (both sides may carry
   * arbitrary payloads); empty intervals (end ≤ start) match nothing.
   */
  def joinByOverlap(a: DataFrame, b: DataFrame, keys: Seq[String],
                    startCol: String, endCol: String,
                    bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    def side(df: DataFrame, p: String): DataFrame = {
      val renamed = df.columns.foldLeft(df) { (d, c) =>
        if (keys.contains(c)) d else d.withColumnRenamed(c, p + c)
      }
      renamed
        .where(col(p + endCol) > col(p + startCol))
        .withColumn("__bucket", explode(sequence(
          floorDiv(col(p + startCol), bucketWidth),
          floorDiv(col(p + endCol) - 1, bucketWidth))))
    }
    side(a, "a_").join(side(b, "b_"), (keys :+ "__bucket").toSeq)
      .where(col("a_" + startCol) < col("b_" + endCol) &&
        col("b_" + startCol) < col("a_" + endCol))
      .where(col("__bucket") ===
        floorDiv(greatest(col("a_" + startCol), col("b_" + startCol)), bucketWidth))
      .drop("__bucket")
  }
}
