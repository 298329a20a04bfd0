package graft.gen

import java.nio.file.{Files, Path, Paths}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter
import scala.util.Random

/**
 * Deterministic weather-reading generator (FIXTURES.md §1): reproduces the
 * reference generator's distributions (api/app.py:52-128) with an explicit
 * seed and a virtual clock — the reference uses wall-clock + unseeded
 * random, so its fixtures are not reproducible; ours are.
 *
 * Writes `{"readings": [...]}` envelopes into the Hive layout
 * `root/year=YYYY/month=MM/day=DD/hour=HH/batch_<ts>.json` the raw archiver
 * uses (kinesis_to_s3.py:205-234).
 */
object WeatherGenerator {

  final case class Station(id: String, city: String, lat: Double, lon: Double)

  val Stations: Seq[Station] = Seq(
    Station("STATION_001", "Mumbai", 19.076, 72.8777),
    Station("STATION_002", "Delhi", 28.7041, 77.1025),
    Station("STATION_003", "Bangalore", 12.9716, 77.5946),
    Station("STATION_004", "Chennai", 13.0827, 80.2707),
    Station("STATION_005", "Kolkata", 22.5726, 88.3639))

  val Conditions: Seq[String] = Seq("Clear Sky", "Partly Cloudy", "Cloudy", "Haze")
  val WindDirections: Seq[String] = Seq("N", "NE", "E", "SE", "S", "SW", "W", "NW")

  private def r1(x: Double): Double = math.floor(x * 10 + 0.5) / 10

  /** NOAA Rothfusz heat index, same piecewise semantics as
    * graft.functions.Enrich.heatIndex (the differential twin). */
  def heatIndexC(tempC: Double, humidity: Double): Double = {
    val tF = tempC * 9.0 / 5.0 + 32.0
    if (tF < 80.0) tempC
    else {
      val simple = 0.5 * (tF + 61.0 + (tF - 68.0) * 1.2 + humidity * 0.094)
      val hi =
        if (simple > 79.0)
          -42.379 + 2.04901523 * tF + 10.14333127 * humidity -
            0.22475541 * tF * humidity - 0.00683783 * tF * tF -
            0.05481717 * humidity * humidity + 0.00122874 * tF * tF * humidity +
            0.00085282 * tF * humidity * humidity - 0.00000199 * tF * tF * humidity * humidity
        else simple
      r1((hi - 32.0) * 5.0 / 9.0)
    }
  }

  private def uniform(rng: Random, lo: Double, hi: Double): Double =
    lo + rng.nextDouble() * (hi - lo)

  /** One reading as a JSON object string (field order = reference schema). */
  def readingJson(rng: Random, st: Station, ts: LocalDateTime): String = {
    val hour = ts.getHour
    val temp = r1(25.0 + 10.0 * math.sin((hour - 6) * math.Pi / 12) + uniform(rng, -3, 3))
    val humidity = r1(math.max(20.0, math.min(100.0,
      65.0 + 15.0 * math.sin((hour + 6) * math.Pi / 12) + uniform(rng, -10, 10))))
    val pressure = r1(uniform(rng, 1005, 1025))
    val wind = r1(uniform(rng, 5, 25))
    val precip = if (rng.nextDouble() < 0.7) 0.0 else r1(uniform(rng, 0.1, 15))
    val condition =
      if (precip > 10) "Heavy Rain"
      else if (precip > 5) "Moderate Rain"
      else if (precip > 0) "Light Rain"
      else Conditions(rng.nextInt(Conditions.length))
    val visibility = r1(
      if (precip > 5) uniform(rng, 2, 5)
      else if (condition == "Haze") uniform(rng, 0.5, 2)
      else uniform(rng, 8, 15))
    val uv =
      if (hour >= 10 && hour <= 16) 6 + rng.nextInt(6)
      else if (hour >= 8 && hour <= 18) 3 + rng.nextInt(5)
      else rng.nextInt(3)
    val hi = heatIndexC(temp, humidity)
    val tsStr = ts.format(DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
    s"""{"station_id":"${st.id}","city":"${st.city}","country":"India",""" +
      s""""latitude":${st.lat},"longitude":${st.lon},"timestamp":"$tsStr",""" +
      s""""temperature_celsius":$temp,"humidity_percent":$humidity,"pressure_hpa":$pressure,""" +
      s""""wind_speed_kmh":$wind,"wind_direction":"${WindDirections(rng.nextInt(8))}",""" +
      s""""precipitation_mm":$precip,"visibility_km":$visibility,"uv_index":$uv,""" +
      s""""weather_condition":"$condition","heat_index_celsius":$hi}"""
  }

  /** Write `batches` envelope files starting at `start`, one per
    * `intervalSeconds`, each holding one reading per station. Returns the
    * files written. */
  def writeBatches(root: String, start: LocalDateTime, batches: Int,
                   intervalSeconds: Int, seed: Long): Seq[Path] = {
    val rng = new Random(seed)
    (0 until batches).map { i =>
      val ts = start.plusSeconds(i.toLong * intervalSeconds)
      val dir = Paths.get(root,
        f"year=${ts.getYear}", f"month=${ts.getMonthValue}%02d",
        f"day=${ts.getDayOfMonth}%02d", f"hour=${ts.getHour}%02d")
      Files.createDirectories(dir)
      val body = Stations.map(readingJson(rng, _, ts)).mkString("""{"readings": [""", ",", "]}")
      val name = ts.format(DateTimeFormatter.ofPattern("'batch_'yyyyMMdd_HHmmss'.json'"))
      Files.writeString(dir.resolve(s"${name.dropRight(5)}_$i.json"), body)
    }
  }
}
