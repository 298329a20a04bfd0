package graft

import graft.sources.JsonEnvelope
import graft.streaming.EnrichStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** End-to-end EP1: envelope file-stream → enrichment → dual parquet sinks. */
class StreamingSpec extends SparkSpec {

  private def reading(station: String, tempC: Double, precip: Double): String =
    s"""{"station_id":"$station","city":"Mumbai","country":"India","latitude":19.0,"longitude":72.8,
       |"timestamp":"2026-08-12T14:30:00","temperature_celsius":$tempC,"humidity_percent":70.0,
       |"pressure_hpa":1005.0,"wind_speed_kmh":10.0,"wind_direction":"SW","precipitation_mm":$precip,
       |"visibility_km":8.0,"uv_index":5,"weather_condition":"Cloudy","heat_index_celsius":${tempC + 5}}"""
      .stripMargin.replaceAll("\n", "")

  test("dual-sink streaming job writes processed + alerts, event-time partitioned") {
    val root = Files.createTempDirectory("graft-stream").toString
    val raw = s"$root/raw"; Files.createDirectories(java.nio.file.Paths.get(raw))
    // one benign reading, one WARNING-level (precip 30 > 25)
    Files.writeString(java.nio.file.Paths.get(raw, "batch_1.json"),
      s"""{"readings": [${reading("WS001", 25.0, 0.0)}, ${reading("WS002", 30.0, 30.0)}]}""")

    val q = EnrichStream.start(
      JsonEnvelope.readStream(spark, raw),
      s"$root/processed", s"$root/alerts", s"$root/ckpt",
      trigger = Trigger.AvailableNow())
    q.awaitTermination(60000)

    val processed = spark.read.parquet(s"$root/processed")
    assert(processed.count() == 2)
    // enrichment columns present with the right values
    val ws2 = processed.where(col("station_id") === "WS002").head()
    assert(ws2.getAs[String]("alert_level") == "WARNING")
    assert(ws2.getAs[String]("weather_severity") == "Severe")
    assert(ws2.getAs[Int]("hour_of_day") == 14)
    // event-time partition columns derived (reference defect fixed)
    assert(processed.columns.contains("year"))
    val alerts = spark.read.parquet(s"$root/alerts")
    assert(alerts.count() == 1)
    assert(alerts.head.getAs[String]("station_id") == "WS002")

    // restart on the same checkpoint: no reprocessing (exactly-once)
    val q2 = EnrichStream.start(
      JsonEnvelope.readStream(spark, raw),
      s"$root/processed", s"$root/alerts", s"$root/ckpt",
      trigger = Trigger.AvailableNow())
    q2.awaitTermination(60000)
    assert(spark.read.parquet(s"$root/processed").count() == 2)
  }
}
