package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for hot-key aggregation: two-phase (salted) aggregation.
 *
 * A plain groupBy on a skewed key sends every row of the hot key to one
 * reducer; at 100 TB a single hot key (one viral user, one empty-string
 * token) stalls the stage. Salting splits each key into `saltBuckets`
 * sub-keys for the first (partial) aggregation, then merges the partials
 * in a second, tiny aggregation on the true key. Works for any
 * decomposable aggregate (sum/count/min/max — and avg as sum+count).
 *
 * Spark's AQE skew-join handles skewed JOINS at runtime; salting remains
 * the tool for skewed AGGREGATIONS with high-cardinality hot keys, and is
 * deterministic here (salt = hash of a secondary column, not rand()) so
 * results are reproducible and testable.
 */
object Skew {

  /**
   * Salted sum/count aggregation: returns one row per key with
   * `sum_<col>` and `cnt` columns. `saltCol` should be a column that
   * varies within a key (a row id); the salt is its non-negative hash
   * mod saltBuckets — deterministic, unlike rand().
   */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     saltCol: String, saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(col(saltCol)), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(
        sum(col(valueCol)).as("__psum"),
        count(lit(1)).as("__pcnt"))
    partial.groupBy(keys.map(col): _*)
      .agg(
        sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("cnt"))
  }

  /**
   * Salted equi-join for skewed keys: the big (skewed) side gets a
   * deterministic salt, the small side is replicated once per salt value,
   * and the join runs on (keys, salt) — the hot key's rows spread over
   * `saltBuckets` reducers instead of stalling one.
   *
   * When to reach for this at 100 TB: the small side is too big to
   * broadcast (broadcast joins have no skew problem — prefer them when
   * the dim fits) and AQE's skew-join split doesn't apply (it only splits
   * sort-merge partitions in batch; salting also works under streaming
   * micro-batches and for downstream keyed aggregations that inherit the
   * join partitioning). Cost: the replicated side shuffles
   * `saltBuckets × |small|` rows — the explicit price of splitting the
   * hot key's |big| rows `saltBuckets` ways. The salt is a hash of a
   * row-varying big-side column (NOT rand()), so plans are deterministic
   * and retries/speculative tasks can't double-count.
   *
   * `keys` must exist on both sides with the same names (rename before
   * calling); the joined output carries one copy of each key, no salt.
   * Supported joinTypes: "inner" and "left" (every (key, salt) pair of
   * the small side exists on the replicated side, so left-join null
   * semantics are unchanged).
   */
  /**
   * Join-key skew diagnostic: the measurement that DECIDES whether
   * [[saltedJoin]]/[[saltedSumCount]] (or a broadcast) is needed, instead
   * of guessing from a stalled stage. Returns the top-k hottest keys with
   * `cnt`, `share_pct` (of all rows) and `skew_x` (ratio to the mean
   * key's row count — `skew_x ≈ 1` everywhere means don't salt; a key at
   * `skew_x = 400` needs ~400-way splitting to level its reducer).
   *
   * Shapes: one hash aggregation on the key; totals ride a one-row
   * broadcast (no driver action); top-k is row_number over the AGGREGATED
   * key cardinality with the rank filter adjacent, so WindowGroupLimit
   * pushes per-partition top-k ahead of the single-partition sort — the
   * same plan contract as every other top-k path in the engine. All
   * ratios are single IEEE divisions of exact integers — deterministic
   * and oracle-portable.
   */
  def keySkewReport(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).as("total"), count(lit(1)).as("n_keys"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col(keyCol).asc)
    counts.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= topK)
      .crossJoin(broadcast(totals))
      .select(col("rank"), col(keyCol), col("cnt"),
        (col("cnt").cast("double") * 100.0 / col("total")).as("share_pct"),
        ((col("cnt") * col("n_keys")).cast("double") / col("total")).as("skew_x"))
  }

  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 bigSaltCol: String, saltBuckets: Int,
                 joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin supports inner/left, got $joinType")
    val saltedBig = big.withColumn("__salt",
      pmod(hash(col(bigSaltCol)), lit(saltBuckets)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedBig.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
