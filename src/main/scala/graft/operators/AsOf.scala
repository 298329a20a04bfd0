package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Point-in-time (as-of) join: for every left row, attach the payload of the
 * latest right row with the same key and `time` ≤ the left row's time
 * (inclusive). The feature-engineering primitive for training data — a
 * feature value must be the one KNOWN at example time, never a later one
 * (label leakage).
 *
 * Scale shape: union + one keyed window (last non-null carry-forward) —
 * ONE shuffle on the key, no per-row range probe, no join explosion;
 * contrast with the naive `left JOIN right ON key AND r.time <= l.time`
 * + argmax, whose join output is |left| × |matching rights|. Skewed keys
 * ride the same AQE/salting controls as any single-key window.
 *
 * Determinism: rows sort by (time, side, tieBreak) — right rows precede
 * left rows at equal time (inclusive semantics), and equal-time right rows
 * resolve by tieBreak (largest wins, being last in carry order).
 *
 * Null payloads: each payload column carries forward INDEPENDENTLY
 * (`last(_, ignoreNulls = true)`) — if the latest right row has a null in
 * one payload column, that column keeps the most recent non-null
 * observation (possibly from an older right row) while other columns take
 * the latest row's values. This is per-column last-observation-carried-
 * forward — the feature-store semantics, where a null means "this feature
 * was not re-measured", not "forget it" — and differs from strict
 * latest-ROW attachment (pandas merge_asof), which would surface the
 * null. Spec-pinned (AsOfSamplingSpec); with null-free payloads the two
 * semantics coincide.
 */
object AsOf {

  /**
   * @param payload right-side columns to carry (become nullable columns on
   *                the left; null until the first right row per key)
   * @param tieBreak right-side column ordering equal-time right rows
   *                 (largest value wins)
   */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, time: String,
               payload: Seq[String], tieBreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val lTagged = left
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(0L).cast(right.schema(tieBreak).dataType))
    val lWithNulls = payload.foldLeft(lTagged) { (df, p) =>
      df.withColumn(s"__p_$p", lit(null).cast(right.schema(p).dataType))
    }
    val rTagged = right.select(
      Seq(col(key), col(time), lit(0).as("__side"), col(tieBreak).as("__tie")) ++
        payload.map(p => col(p).as(s"__p_$p")) ++
        leftCols.filterNot(Set(key, time)).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy(key)
      .orderBy(col(time).asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(lWithNulls.unionByName(rTagged)) { (df, p) =>
      df.withColumn(s"__c_$p", last(col(s"__p_$p"), ignoreNulls = true).over(w))
    }
    carried
      .where(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.map(p => col(s"__c_$p").as(p)): _*)
  }
}
