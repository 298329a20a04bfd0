package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Time-feature extraction (reference: glue_weather_etl.py:347-386).
 *
 * Day-of-week convention: Spark's `dayofweek` (Sunday=1 … Saturday=7).
 * The reference's PySpark job uses the same; its pandas twin uses ISO
 * Monday=1 — we standardize on the Spark convention (SURVEY.md §2.2 P11).
 * DuckDB's `dayofweek` is Sunday=0, so oracle SQL uses `dayofweek(ts)+1`.
 */
object TimeFeatures {

  def hourOfDay(ts: Column): Column = hour(ts)

  /** Sunday=1 … Saturday=7 (java.sql convention, Spark built-in). */
  def dayOfWeek(ts: Column): Column = dayofweek(ts)

  /** Weekend = Saturday|Sunday = dayofweek ∈ {1, 7}. */
  def isWeekend(ts: Column): Column = dayofweek(ts).isin(1, 7)

  /** Morning 6-11, Afternoon 12-17, Evening 18-21, else Night. */
  def timeOfDay(ts: Column): Column = {
    val h = hour(ts)
    when(h.between(6, 11), "Morning")
      .when(h.between(12, 17), "Afternoon")
      .when(h.between(18, 21), "Evening")
      .otherwise("Night")
  }

  /** Northern-hemisphere season from month: {12,1,2} Winter, {3,4,5} Spring, {6,7,8} Summer, else Autumn. */
  def season(ts: Column): Column = {
    val m = month(ts)
    when(m.isin(12, 1, 2), "Winter")
      .when(m.isin(3, 4, 5), "Spring")
      .when(m.isin(6, 7, 8), "Summer")
      .otherwise("Autumn")
  }

  /** Event date (reference: load_to_postgres.py:239-240). */
  def readingDate(ts: Column): Column = to_date(ts)
}
