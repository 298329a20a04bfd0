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
}
