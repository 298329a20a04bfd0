package graft

import graft.sources.JdbcStore
import org.apache.spark.sql.functions._

/** Integration tests against embedded Derby — a real JDBC database, so the
  * append/upsert paths exercise Spark's actual JDBC relation and writer
  * (column-pruned remote SELECT, batch inserts), not a parquet stand-in. */
class JdbcStoreSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  test("appendIfAbsent is idempotent against a real JDBC table") {
    val batch = Seq(
      ("WS001", "2026-08-12T10:00:00", 30.0),
      ("WS002", "2026-08-12T10:00:00", 31.0))
      .toDF("station_id", "reading_time", "temp")
    val keys = Seq("station_id", "reading_time")
    val ddl = "station_id VARCHAR(32), reading_time VARCHAR(32)"

    assert(JdbcStore.appendIfAbsent(spark, batch, url, "readings", keys, columnTypes = ddl) == 2)
    // re-run: nothing new (ON CONFLICT DO NOTHING)
    assert(JdbcStore.appendIfAbsent(spark, batch, url, "readings", keys, columnTypes = ddl) == 0)
    // overlapping batch: only the new key lands, dup-key payload ignored
    val batch2 = Seq(
      ("WS001", "2026-08-12T10:00:00", 99.0),
      ("WS003", "2026-08-12T10:00:00", 28.0))
      .toDF("station_id", "reading_time", "temp")
    assert(JdbcStore.appendIfAbsent(spark, batch2, url, "readings", keys, columnTypes = ddl) == 1)

    val stored = spark.read.jdbc(url, "readings", new java.util.Properties)
    assert(stored.count() == 3)
    assert(stored.where(col("station_id") === "WS001").head.getAs[Double]("temp") == 30.0)
  }

  test("replaceGroups replaces only the touched groups (upsert semantics)") {
    val day1 = Seq(("2026-08-11", "Mumbai", 30.0), ("2026-08-11", "Delhi", 35.0),
      ("2026-08-12", "Mumbai", 31.0)).toDF("summary_date", "city", "avg_temp")
    val ddl = "summary_date VARCHAR(16), city VARCHAR(32)"
    JdbcStore.replaceGroups(spark, day1, url, "summaries", "summary_date", columnTypes = ddl)

    // recompute day 2 with corrected values; day 1 must be untouched
    val day2fix = Seq(("2026-08-12", "Mumbai", 29.5), ("2026-08-12", "Delhi", 33.0))
      .toDF("summary_date", "city", "avg_temp")
    JdbcStore.replaceGroups(spark, day2fix, url, "summaries", "summary_date", columnTypes = ddl)

    val stored = spark.read.jdbc(url, "summaries", new java.util.Properties)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(stored.size == 4)
    assert(stored(("2026-08-11", "Mumbai")) == 30.0)
    assert(stored(("2026-08-12", "Mumbai")) == 29.5)
    assert(stored(("2026-08-12", "Delhi")) == 33.0)
  }

  test("replaceGroups fails fast when group cardinality exceeds maxGroups") {
    val seed = Seq(("g0", 0.0)).toDF("grp", "v")
    val ddl = "grp VARCHAR(16)"
    JdbcStore.replaceGroups(spark, seed, url, "capped", "grp", columnTypes = ddl)
    // a mis-specified group column (row-granularity key) must not haul its
    // whole key set through the driver — the guard trips on the EXECUTOR
    // count before any key crosses
    val rowKeyed = (1 to 500).map(i => (s"g$i", i.toDouble)).toDF("grp", "v")
    val e = intercept[IllegalArgumentException] {
      JdbcStore.replaceGroups(spark, rowKeyed, url, "capped", "grp",
        columnTypes = ddl, maxGroups = 100)
    }
    assert(e.getMessage.contains("maxGroups"))
    // the guarded call must not have deleted anything
    assert(spark.read.jdbc(url, "capped", new java.util.Properties).count() == 1)
  }

  test("replaceGroups streams deletes in batches (high-cardinality path)") {
    val ddl = "grp VARCHAR(16)"
    val v1 = (1 to 250).map(i => (s"g$i", 1.0)).toDF("grp", "v")
    JdbcStore.replaceGroups(spark, v1, url, "batched", "grp", columnTypes = ddl)
    // replace all 250 groups with deleteBatchSize far below the key count —
    // exercises multiple executeBatch flushes plus the final partial flush
    val v2 = (1 to 250).map(i => (s"g$i", 2.0)).toDF("grp", "v")
    JdbcStore.replaceGroups(spark, v2, url, "batched", "grp",
      columnTypes = ddl, deleteBatchSize = 64)
    val stored = spark.read.jdbc(url, "batched", new java.util.Properties)
    assert(stored.count() == 250)
    assert(stored.agg(min(col("v")), max(col("v"))).head == org.apache.spark.sql.Row(2.0, 2.0))
  }
}
