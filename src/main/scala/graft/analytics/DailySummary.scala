package graft.analytics

import graft.functions.Enrich
import graft.operators.Aggregates
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * The reference's daily aggregation (A1-A5, load_to_postgres.py:395-445):
 * per (city, reading_date) — avg/min/max temperature, avg heat index /
 * humidity / pressure / wind, sum+max precipitation, reading count,
 * dominant (mode) comfort and severity, conditional counts per alert tier,
 * percentage of alerting readings, avg quality score. All rounded to 2 dp
 * with the cross-engine floor-rounding (Enrich.roundAt).
 *
 * Scale shape — ONE pass over the readings: partial aggregates are
 * computed per (city, date, comfort, severity, alert) — a fine grouping
 * whose cardinality is groups × small constants, so the single exchange
 * carries combiners, not readings. Everything else (numeric recompose,
 * the two modes, tier counts) derives from that tiny aggregate:
 * decimal partial sums compose exactly, min/max/count compose, and mode =
 * argmax over summed value-counts with ties to the smallest value (the
 * Postgres MODE() WITHIN GROUP rule). A naive implementation aggregates
 * the reading stream three times (numeric + two modes); this shape reads
 * and shuffles it once.
 */
object DailySummary {

  def compute(enriched: DataFrame, cityCol: String = "city", dateCol: String = "reading_date"): DataFrame = {
    val keys = Seq(cityCol, dateCol)
    val keyCols = keys.map(col)
    def dec(c: String) = sum(col(c).cast(DecimalType(28, 6)))

    // single pass: partials at (keys, comfort, severity, alert) granularity
    val fine = enriched
      .groupBy((keyCols :+ col("comfort_level") :+ col("weather_severity") :+ col("alert_level")): _*)
      .agg(
        dec("temperature_celsius").as("s_temp"),
        min(col("temperature_celsius")).as("mn_temp"),
        max(col("temperature_celsius")).as("mx_temp"),
        dec("heat_index_celsius").as("s_heat"),
        dec("humidity_percent").as("s_hum"),
        dec("pressure_hpa").as("s_press"),
        dec("wind_speed_kmh").as("s_wind"),
        dec("precipitation_mm").as("s_precip"),
        max(col("precipitation_mm")).as("mx_precip"),
        dec("data_quality_score").as("s_quality"),
        count(lit(1)).as("cnt"))

    def r2(c: Column) = Enrich.roundAt(c, 2)
    def total(c: String) = sum(col(c)) // decimal partials compose exactly
    def avgOf(c: String) = total(c).cast("double") / sum(col("cnt"))
    def tier(level: String) = sum(when(col("alert_level") === level, col("cnt")).otherwise(0L))

    val numeric = fine.groupBy(keyCols: _*).agg(
      r2(avgOf("s_temp")).as("avg_temperature"),
      min(col("mn_temp")).as("min_temperature"),
      max(col("mx_temp")).as("max_temperature"),
      r2(avgOf("s_heat")).as("avg_heat_index"),
      r2(avgOf("s_hum")).as("avg_humidity"),
      r2(avgOf("s_press")).as("avg_pressure"),
      r2(avgOf("s_wind")).as("avg_wind_speed"),
      r2(total("s_precip").cast("double")).as("total_precipitation"),
      max(col("mx_precip")).as("max_precipitation"),
      sum(col("cnt")).as("reading_count"),
      tier("NORMAL").as("normal_count"),
      tier("WATCH").as("watch_count"),
      tier("WARNING").as("warning_count"),
      tier("CRITICAL").as("critical_count"),
      r2(sum(when(col("alert_level").isin("WARNING", "CRITICAL"), col("cnt")).otherwise(0L))
        .cast("double") * 100.0 / sum(col("cnt"))).as("alert_percentage"),
      r2(avgOf("s_quality")).as("avg_quality_score"))

    // modes from the fine aggregate: sum counts per value, argmax with
    // ties to the smallest value — runs over aggregated rows only
    def modeOf(valueCol: String, as: String): DataFrame = {
      val counts = fine.groupBy((keyCols :+ col(valueCol)): _*)
        .agg(sum(col("cnt")).as("c"))
      val w = Window.partitionBy(keyCols: _*).orderBy(col("c").desc, col(valueCol).asc)
      counts.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
        .select((keyCols :+ col(valueCol).as(as)): _*)
    }

    numeric
      .join(modeOf("comfort_level", "dominant_comfort"), keys)
      .join(modeOf("weather_severity", "dominant_severity"), keys)
  }
}
