package graft.operators

import org.apache.spark.sql.DataFrame
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
 * Times are NUMERIC (e.g. epoch seconds) — callers convert timestamps
 * first; integer bucket math is bit-identical across engines, which the
 * oracle gate requires.
 */
object RangeJoin {

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
    val f = facts.withColumn("__bucket",
      floor(col(timeCol) / bucketWidth).cast("long"))
    // empty intervals (end ≤ start) match nothing and are dropped BEFORE the
    // bucket expansion — sequence() would otherwise step backwards and emit
    // wrong buckets. end−1 = last instant an exclusive-end interval covers.
    val iv = intervals
      .where(col(endCol) > col(startCol))
      .withColumn("__bucket",
        explode(sequence(floor(col(startCol) / bucketWidth).cast("long"),
          floor((col(endCol) - 1) / bucketWidth).cast("long"))))
    f.join(iv, (keys :+ "__bucket").toSeq)
      .where(col(timeCol) >= col(startCol) && col(timeCol) < col(endCol))
      .drop("__bucket")
  }
}
