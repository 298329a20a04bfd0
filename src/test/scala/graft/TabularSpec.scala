package graft

import graft.sources.Tabular
import org.apache.spark.sql.types._
import java.nio.file.Files

class TabularSpec extends SparkSpec {
  import spark.implicits._

  test("csv round-trip with explicit schema") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/out"
    val df = Seq(("WS001", 32.5), ("WS002", 38.1)).toDF("station_id", "temp")
    Tabular.writeCsv(df, dir)
    val back = Tabular.readCsv(spark, dir, StructType(Seq(
      StructField("station_id", StringType), StructField("temp", DoubleType))))
    assert(back.collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      == Set(("WS001", 32.5), ("WS002", 38.1)))
  }

  test("cleanse: coerce invalid numerics to null, ints to 0, drop null criticals") {
    val raw = Seq(
      ("WS001", "32.5", "9"),
      ("WS002", "not-a-number", "bad"), // temp -> null (kept; not critical), uv -> 0
      (null, "30.0", "5")               // null critical -> dropped
    ).toDF("station_id", "temp", "uv")
    val clean = Tabular.cleanse(raw, Seq("temp"), Seq("uv"), Seq("station_id"))
    val rows = clean.collect().map(r => (r.getString(0), Option(r.get(1)), r.getInt(2))).toSet
    assert(rows == Set(
      ("WS001", Some(32.5), 9),
      ("WS002", None, 0)))
  }
}
