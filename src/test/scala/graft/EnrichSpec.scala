package graft

import graft.functions.{Enrich, TimeFeatures}
import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

/** Boundary-exact tests for the six enrichment families (SURVEY §2.2),
  * mirroring the reference's threshold cases. */
class EnrichSpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("r")).head.get(0)

  test("temperature conversions round to 1 dp") {
    assert(one(Enrich.celsiusToFahrenheit(lit(37.0))) == 98.6)
    assert(one(Enrich.celsiusToFahrenheit(lit(0.0))) == 32.0)
    assert(one(Enrich.celsiusToKelvin(lit(26.85))) == 300.0)
    assert(one(Enrich.celsiusToKelvin(lit(0.0))) == 273.2)  // 273.15 rounds up
  }

  test("comfort classification boundaries (27/32/41/54, first-match)") {
    val cases = Table(
      ("hi", "expected"),
      (26.9, "Comfortable"), (27.0, "Caution"), (31.9, "Caution"),
      (32.0, "Extreme Caution"), (40.9, "Extreme Caution"),
      (41.0, "Danger"), (53.9, "Danger"), (54.0, "Extreme Danger"))
    forAll(cases) { (hi, expected) =>
      assert(one(Enrich.comfortLevel(lit(hi))) == expected)
    }
  }

  test("severity branch order: precip>50 wins over wind>60") {
    assert(one(Enrich.weatherSeverity(lit(51.0), lit(70.0), lit(10.0), lit(0))) == "Extreme")
    assert(one(Enrich.weatherSeverity(lit(26.0), lit(0.0), lit(10.0), lit(0))) == "Severe")
    assert(one(Enrich.weatherSeverity(lit(0.0), lit(61.0), lit(10.0), lit(0))) == "Severe")
    assert(one(Enrich.weatherSeverity(lit(0.0), lit(0.0), lit(0.9), lit(0))) == "Severe")
    assert(one(Enrich.weatherSeverity(lit(10.1), lit(0.0), lit(10.0), lit(0))) == "Moderate")
    assert(one(Enrich.weatherSeverity(lit(0.0), lit(40.1), lit(10.0), lit(0))) == "Moderate")
    assert(one(Enrich.weatherSeverity(lit(0.0), lit(0.0), lit(2.9), lit(0))) == "Moderate")
    assert(one(Enrich.weatherSeverity(lit(0.0), lit(0.0), lit(10.0), lit(11))) == "Moderate")
    assert(one(Enrich.weatherSeverity(lit(0.0), lit(0.0), lit(10.0), lit(10))) == "Normal")
  }

  test("alert level 4-tier boundaries") {
    assert(one(Enrich.alertLevel(lit(54.1), lit(0.0), lit(0.0), lit(10.0), lit(0))) == "CRITICAL")
    assert(one(Enrich.alertLevel(lit(0.0), lit(50.1), lit(0.0), lit(10.0), lit(0))) == "CRITICAL")
    assert(one(Enrich.alertLevel(lit(0.0), lit(0.0), lit(80.1), lit(10.0), lit(0))) == "CRITICAL")
    assert(one(Enrich.alertLevel(lit(41.1), lit(0.0), lit(0.0), lit(10.0), lit(0))) == "WARNING")
    assert(one(Enrich.alertLevel(lit(0.0), lit(0.0), lit(0.0), lit(1.9), lit(0))) == "WARNING")
    assert(one(Enrich.alertLevel(lit(0.0), lit(0.0), lit(0.0), lit(10.0), lit(11))) == "WARNING")
    assert(one(Enrich.alertLevel(lit(32.1), lit(0.0), lit(0.0), lit(10.0), lit(0))) == "WATCH")
    assert(one(Enrich.alertLevel(lit(0.0), lit(0.0), lit(0.0), lit(10.0), lit(9))) == "WATCH")
    assert(one(Enrich.alertLevel(lit(32.0), lit(10.0), lit(40.0), lit(2.0), lit(8))) == "NORMAL")
  }

  test("heat index: passthrough below 80F, regression above") {
    // 26.0C = 78.8F < 80F -> passthrough unrounded
    assert(one(Enrich.heatIndex(lit(26.0), lit(90.0))) == 26.0)
    // 35C/70% is a NOAA textbook case: full regression, ~50.6C
    val hi = one(Enrich.heatIndex(lit(35.0), lit(70.0))).asInstanceOf[Double]
    assert(hi > 49.0 && hi < 52.0, s"expected ~50.6, got $hi")
    // monotone in humidity at fixed 35C
    val lo = one(Enrich.heatIndex(lit(35.0), lit(40.0))).asInstanceOf[Double]
    assert(hi > lo)
    // exactly one decimal place
    assert(hi == math.floor(hi * 10 + 0.5) / 10)
  }

  test("quality score takes values in {0, 33.3, 66.7, 100}") {
    val scores = Seq(
      (true, true, true), (true, true, false), (true, false, false),
      (false, false, false))
      .toDF("a", "b", "c")
      .select(Enrich.qualityScore(col("a"), col("b"), col("c")).as("q"))
      .collect().map(_.getDouble(0)).toSeq
    // same association order as the Column expression: (t/3.0)*100.0
    assert(scores == Seq(100.0, 2.0 / 3.0 * 100.0, 1.0 / 3.0 * 100.0, 0.0))
  }

  test("time features: boundaries for time-of-day, season, weekend") {
    val df = Seq(
      "2026-01-03 05:59:59", // Sat night, Winter
      "2026-01-04 06:00:00", // Sun morning, Winter
      "2026-03-02 11:59:59", // Mon morning, Spring
      "2026-06-15 12:00:00", // Mon afternoon, Summer
      "2026-09-18 17:59:59", // Fri afternoon, Autumn
      "2026-12-18 18:00:00", // Fri evening, Winter
      "2026-05-20 21:59:59", // Wed evening, Spring
      "2026-08-20 22:00:00"  // Thu night, Summer
    ).toDF("s").select(to_timestamp(col("s")).as("ts"))
      .select(
        TimeFeatures.timeOfDay(col("ts")).as("tod"),
        TimeFeatures.season(col("ts")).as("season"),
        TimeFeatures.isWeekend(col("ts")).as("we"),
        TimeFeatures.dayOfWeek(col("ts")).as("dow"))
      .collect()
    assert(df.map(_.getString(0)).toSeq == Seq(
      "Night", "Morning", "Morning", "Afternoon", "Afternoon", "Evening", "Evening", "Night"))
    assert(df.map(_.getString(1)).toSeq == Seq(
      "Winter", "Winter", "Spring", "Summer", "Autumn", "Winter", "Spring", "Summer"))
    assert(df.map(_.getBoolean(2)).toSeq == Seq(true, true, false, false, false, false, false, false))
    assert(df.map(_.getInt(3)).toSeq == Seq(7, 1, 2, 2, 6, 6, 4, 5))
  }
}
