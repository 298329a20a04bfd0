package graft.model

/**
 * Typed view of the 16-field reading (SURVEY §1.2, reference schema
 * glue_weather_etl.py:59-80). Numeric fields are Options: envelope JSON is
 * schema-enforced but nullable, and encoder-level primitives would turn a
 * missing field into a runtime error instead of a null.
 *
 * The canonical wire schema stays the explicit StructType in
 * graft.sources.JsonEnvelope (field order matters for layout parity); this
 * case class is the compile-time-checked boundary for Dataset[T] consumers.
 */
final case class WeatherReading(
    station_id: Option[String],
    city: Option[String],
    country: Option[String],
    latitude: Option[Double],
    longitude: Option[Double],
    timestamp: Option[String],
    temperature_celsius: Option[Double],
    humidity_percent: Option[Double],
    pressure_hpa: Option[Double],
    wind_speed_kmh: Option[Double],
    wind_direction: Option[String],
    precipitation_mm: Option[Double],
    visibility_km: Option[Double],
    uv_index: Option[Int],
    weather_condition: Option[String],
    heat_index_celsius: Option[Double])
