package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Data-quality checks (reference README's monitoring SQL + the DB CHECK
 * constraints, SURVEY §5): null criticals, range violations, duplicate
 * keys, freshness. One pass — every check is a conditional aggregate over
 * the same scan, returning one row per check (name, violations, total,
 * pass) so a pipeline can assert or alert on the result set.
 */
object QualityChecks {

  final case class Check(name: String, violation: org.apache.spark.sql.Column)

  /** The reference's checks for an enriched readings table. */
  def weatherChecks(df: DataFrame): Seq[Check] = Seq(
    Check("null_station_id", col("station_id").isNull),
    Check("null_timestamp", col("timestamp").isNull),
    Check("temperature_out_of_range", !col("temperature_celsius").between(-50, 60)),
    Check("humidity_out_of_range", !col("humidity_percent").between(0, 100)),
    Check("pressure_out_of_range", !col("pressure_hpa").between(950, 1050)),
    Check("uv_out_of_range", !col("uv_index").between(0, 15)))

  /** Run checks in ONE aggregation pass; returns (check, violations, total, pass). */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val aggs = checks.map(c =>
      sum(when(c.violation, 1L).otherwise(0L)).as(c.name)) :+ count(lit(1)).as("__total")
    val row = df.agg(aggs.head, aggs.tail: _*)
    // pivot the single row to one row per check — stack is a narrow
    // Generator over one row, no shuffle
    val stackArgs = checks.map(c => s"'${c.name}', ${c.name}").mkString(", ")
    row.select(
      expr(s"stack(${checks.size}, $stackArgs) AS (check_name, violations)"),
      col("__total").as("total"))
      .withColumn("pass", col("violations") === 0L)
  }

  /** Duplicate-key count (needs its own aggregation — key-level, not row-level). */
  def duplicateKeyCount(df: DataFrame, keys: Seq[String]): Long =
    df.groupBy(keys.map(col): _*).count().where(col("count") > 1).count()
}
