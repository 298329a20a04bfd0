package graft

import graft.gen.WeatherGenerator
import graft.pipeline.BatchPipeline
import java.nio.file.Files
import java.time.LocalDateTime

/** EP3 → EP2 end-to-end: seeded generator → raw envelopes → batch pipeline
  * (enrich, dedup-append, daily summary, validate, report). */
class PipelineSpec extends SparkSpec {

  test("generator is deterministic under a fixed seed") {
    val a = WeatherGenerator.readingJson(new scala.util.Random(7),
      WeatherGenerator.Stations.head, LocalDateTime.of(2026, 8, 12, 14, 0))
    val b = WeatherGenerator.readingJson(new scala.util.Random(7),
      WeatherGenerator.Stations.head, LocalDateTime.of(2026, 8, 12, 14, 0))
    assert(a == b)
    assert(a.contains("\"station_id\":\"STATION_001\"") && a.contains("\"city\":\"Mumbai\""))
  }

  test("generator heat index matches the engine's Column expression") {
    import graft.functions.Enrich
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val cases = Seq((26.0, 90.0), (28.0, 80.0), (32.0, 60.0), (38.0, 75.0), (44.0, 30.0))
    val engine = cases.toDF("t", "h")
      .select(Enrich.heatIndex(col("t"), col("h")).as("hi"))
      .collect().map(_.getDouble(0)).toSeq
    val gen = cases.map { case (t, h) => WeatherGenerator.heatIndexC(t, h) }
    assert(engine == gen)
  }

  test("full batch pipeline: load -> enrich -> store -> summarize -> validate") {
    val root = Files.createTempDirectory("graft-pipeline").toString
    // 2 hours of readings, one batch per 20 virtual minutes
    WeatherGenerator.writeBatches(s"$root/raw",
      LocalDateTime.of(2026, 8, 12, 10, 0), batches = 6, intervalSeconds = 1200, seed = 42)

    val r1 = BatchPipeline.run(spark, s"$root/raw", s"$root/store", s"$root/summary")
    assert(r1.loadedRows == 30)      // 6 batches x 5 stations
    assert(r1.storedNew == 30)
    assert(r1.summaryRows == 5)      // one per city, single day
    assert(r1.validationPassed, r1.report)
    assert(r1.avgQuality == 100.0)   // generator ranges are all in-bounds

    // re-run on the same raw data: idempotent (no new rows, same summary)
    val r2 = BatchPipeline.run(spark, s"$root/raw", s"$root/store", s"$root/summary")
    assert(r2.storedNew == 0)
    assert(r2.summaryRows == 5)
    assert(spark.read.parquet(s"$root/store").count() == 30)
  }
}
