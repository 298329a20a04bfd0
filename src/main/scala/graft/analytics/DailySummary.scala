package graft.analytics

import graft.functions.Enrich
import graft.operators.Aggregates
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The reference's daily aggregation (A1-A5, load_to_postgres.py:395-445):
 * per (city, reading_date) — avg/min/max temperature, avg heat index /
 * humidity / pressure / wind, sum+max precipitation, reading count,
 * dominant (mode) comfort and severity, conditional counts per alert tier,
 * percentage of alerting readings, avg quality score. All rounded to 2 dp
 * with the cross-engine floor-rounding (Enrich.roundAt).
 *
 * Scale shape: one hash-aggregate shuffle on (city, date) for the numeric
 * block; the two modes are counts-then-argmax (Aggregates.deterministicMode)
 * whose second phase only shuffles one row per distinct (city, date, value) —
 * at 100 TB the exchanges carry aggregated rows, never readings. The joins
 * merging mode columns back are on (city, date) — tiny, AQE broadcasts them.
 */
object DailySummary {

  def compute(enriched: DataFrame, cityCol: String = "city", dateCol: String = "reading_date"): DataFrame = {
    import Aggregates._
    def r2(c: org.apache.spark.sql.Column) = Enrich.roundAt(c, 2)

    val numeric = enriched.groupBy(col(cityCol), col(dateCol)).agg(
      r2(exactAvg(col("temperature_celsius"))).as("avg_temperature"),
      min(col("temperature_celsius")).as("min_temperature"),
      max(col("temperature_celsius")).as("max_temperature"),
      r2(exactAvg(col("heat_index_celsius"))).as("avg_heat_index"),
      r2(exactAvg(col("humidity_percent"))).as("avg_humidity"),
      r2(exactAvg(col("pressure_hpa"))).as("avg_pressure"),
      r2(exactAvg(col("wind_speed_kmh"))).as("avg_wind_speed"),
      r2(exactSum(col("precipitation_mm"))).as("total_precipitation"),
      max(col("precipitation_mm")).as("max_precipitation"),
      count(lit(1)).as("reading_count"),
      countIf(col("alert_level") === "NORMAL").as("normal_count"),
      countIf(col("alert_level") === "WATCH").as("watch_count"),
      countIf(col("alert_level") === "WARNING").as("warning_count"),
      countIf(col("alert_level") === "CRITICAL").as("critical_count"),
      r2(pctIf(col("alert_level").isin("WARNING", "CRITICAL"))).as("alert_percentage"),
      r2(exactAvg(col("data_quality_score"))).as("avg_quality_score"))

    val keys = Seq(cityCol, dateCol)
    val comfort = deterministicMode(enriched, keys, "comfort_level", "dominant_comfort")
    val severity = deterministicMode(enriched, keys, "weather_severity", "dominant_severity")
    numeric.join(comfort, keys).join(severity, keys)
  }
}
