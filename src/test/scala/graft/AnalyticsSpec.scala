package graft

import graft.analytics.{DailySummary, Views}
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  // Two cities, one day; Delhi has a WARNING reading and a comfort tie.
  private def enriched = Seq(
    ("Mumbai", "2026-08-12", 30.0, 36.0, 70.0, 1000.0, 10.0, 0.0, "Comfortable", "Normal", "NORMAL", 100.0),
    ("Mumbai", "2026-08-12", 32.0, 38.0, 72.0, 1001.0, 12.0, 5.0, "Caution", "Normal", "NORMAL", 100.0),
    ("Delhi", "2026-08-12", 40.0, 48.0, 30.0, 998.0, 20.0, 30.0, "Danger", "Severe", "WARNING", 100.0),
    ("Delhi", "2026-08-12", 41.0, 50.0, 28.0, 999.0, 22.0, 0.0, "Extreme Caution", "Normal", "WATCH", 100.0)
  ).toDF("city", "reading_date", "temperature_celsius", "heat_index_celsius",
    "humidity_percent", "pressure_hpa", "wind_speed_kmh", "precipitation_mm",
    "comfort_level", "weather_severity", "alert_level", "data_quality_score")

  test("profileNumeric censuses columns in one pass, nulls included") {
    import graft.analytics.QualityChecks
    val df = Seq((Option(1.0), 10L), (Option.empty[Double], 20L), (Option(3.0), 20L))
      .toDF("x", "y")
    val p = QualityChecks.profileNumeric(df, Seq("x", "y")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(p("x") == ((2L, 1L, 2L, 1.0, 3.0, 2.0)))
    assert(p("y") == ((3L, 0L, 2L, 10.0, 20.0, 50.0 / 3.0)))
  }

  test("DailySummary: aggregates, tiers, pct, deterministic mode") {
    val rows = DailySummary.compute(enriched)
      .collect().map(r => r.getAs[String]("city") -> r).toMap
    val mumbai = rows("Mumbai")
    assert(mumbai.getAs[Double]("avg_temperature") == 31.0)
    assert(mumbai.getAs[Double]("min_temperature") == 30.0)
    assert(mumbai.getAs[Double]("max_temperature") == 32.0)
    assert(mumbai.getAs[Long]("reading_count") == 2L)
    assert(mumbai.getAs[Long]("normal_count") == 2L)
    assert(mumbai.getAs[Double]("alert_percentage") == 0.0)
    // comfort tie (1 each) -> smallest value alphabetically: "Caution"
    assert(mumbai.getAs[String]("dominant_comfort") == "Caution")
    val delhi = rows("Delhi")
    assert(delhi.getAs[Long]("warning_count") == 1L && delhi.getAs[Long]("watch_count") == 1L)
    assert(delhi.getAs[Double]("alert_percentage") == 50.0)
    assert(delhi.getAs[Double]("total_precipitation") == 30.0)
    assert(delhi.getAs[String]("dominant_severity") == "Normal") // tie: Normal < Severe
  }

  test("Views: recentAlerts filters and orders; currentStatus picks latest per city") {
    val withTs = enriched.withColumn("ts",
      to_timestamp(concat(col("reading_date"), lit(" 0"), monotonically_increasing_id() % 10, lit(":00:00"))))
      .withColumn("station_id", col("city"))
    assert(Views.recentAlerts(withTs).collect().map(_.getAs[String]("alert_level")).toSeq == Seq("WARNING"))
    val cur = Views.currentStatus(withTs)
    assert(cur.count() == 2) // one row per city
  }

  test("Multimodal: metadata stub, frame fan-out, histogram features") {
    val docs = Seq((1L, "a" * 250), (2L, "xy")).toDF("doc_id", "text")
    val withBin = Multimodal.withBinaryPayload(docs, "text")
    val meta = Multimodal.decodeMetadata(withBin)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(meta(1L).getAs[Int]("byte_len") == 250)
    assert(meta(1L).getAs[Int]("width") >= 64 && meta(1L).getAs[Int]("width") < 512)

    val frames = Multimodal.sampleFrames(withBin, frameBytes = 100)
    val byDoc = frames.groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc == Map(1L -> 3L, 2L -> 1L)) // 250 bytes -> 3 frames of <=100

    val featRows = Multimodal.byteHistogramFeatures(withBin, "doc_id")
    // long shape: one scalar row per (doc, bin), counts reconcile to byte_len
    assert(featRows.where(col("doc_id") === 1L).count() == 16)
    val cnt1 = featRows.where(col("doc_id") === 1L)
      .agg(sum("bin_count")).head.getLong(0)
    assert(cnt1 == 250L)
    val feats = Multimodal.featureVectors(featRows, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(math.abs(feats(1L).sum - 1.0f) <= 1e-6f)
    // doc1 is all 'a' (0x61): all mass in bin (0x61*16)/256 = 6
    assert(feats(1L)(6) == 1.0f)
  }

  test("Multimodal: frame-hash Jaccard finds exact and partial payload overlap") {
    // frames are 4-byte windows: doc1=ABCD|EFGH|IJKL, doc2 identical,
    // doc3 shares 2 of its 3 frames with doc1 (jaccard 2/4=0.5),
    // doc4 disjoint
    val docs = Seq(
      (1L, "ABCDEFGHIJKL"),
      (2L, "ABCDEFGHIJKL"),
      (3L, "ABCDEFGHZZZZ"),
      (4L, "MNOPQRSTUVWX")
    ).toDF("doc_id", "text")
    val withBin = Multimodal.withBinaryPayload(docs, "text")
    val pairs = Multimodal.frameNearDupPairs(withBin, "doc_id", frameBytes = 4,
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs((1L, 3L)) == 0.5) // shares ABCD,EFGH of {ABCD,EFGH,IJKL,ZZZZ}
  }

  test("Multimodal: scene boundaries segment exactly at planted frame changes") {
    // frameBytes=100: payload = 250×'A' + 200×'B' → frames
    //   f0=A¹⁰⁰ f1=A¹⁰⁰ (identical → same scene) f2=A⁵⁰B⁵⁰ f3=B¹⁰⁰ f4=B⁵⁰
    // at maxHamming=0 boundaries land at 0,2,3,4 → scenes 0,0,1,2,3
    val docs = Seq((1L, "A" * 250 + "B" * 200)).toDF("doc_id", "text")
    val withBin = Multimodal.withBinaryPayload(docs, "text")
    val got = Multimodal.sceneBoundaries(withBin, "doc_id",
        frameBytes = 100, maxHamming = 0)
      .orderBy("frame_idx")
      .collect().map(r => (r.getInt(1), r.getBoolean(2), r.getLong(3)))
    assert(got.toSeq == Seq((0, true, 0L), (1, false, 0L), (2, true, 1L),
      (3, true, 2L), (4, true, 3L)))
    // a permissive threshold merges everything into one scene
    val one = Multimodal.sceneBoundaries(withBin, "doc_id",
        frameBytes = 100, maxHamming = 60)
      .collect().map(_.getLong(3)).toSet
    assert(one == Set(0L))
  }
}
