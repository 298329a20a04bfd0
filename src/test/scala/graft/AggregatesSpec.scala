package graft

import graft.operators.Aggregates
import org.apache.spark.sql.functions._

class AggregatesSpec extends SparkSpec {
  import spark.implicits._

  test("deterministicMode breaks ties to the smallest value") {
    val df = Seq(
      ("u1", "b"), ("u1", "b"), ("u1", "a"), ("u1", "a"), ("u1", "c"),
      ("u2", "z")).toDF("k", "v")
    val m = Aggregates.deterministicMode(df, Seq("k"), "v", "mode_v")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m == Map("u1" -> "a", "u2" -> "z")) // a and b tie at 2; a < b
  }

  test("latestPerGroup picks max orderCol, tie-broken by tieBreak desc") {
    val df = Seq(
      ("u1", 1L, 10L), ("u1", 2L, 11L), ("u1", 2L, 9L),
      ("u2", 5L, 1L)).toDF("k", "o", "t")
    val got = Aggregates.latestPerGroup(df, Seq("k"), "o", "t")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("u1", 2L, 11L), ("u2", 5L, 1L)))
  }

  test("distributionWithPct sums to 100") {
    val df = Seq("a", "a", "a", "b").toDF("v")
    val rows = Aggregates.distributionWithPct(df, "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows == Set(("a", 3L, 75.0), ("b", 1L, 25.0)))
  }

  test("countIf/pctIf") {
    val df = Seq(1, 2, 3, 4).toDF("x")
    val r = df.agg(
      Aggregates.countIf(col("x") > 2).as("c"),
      Aggregates.pctIf(col("x") > 2).as("p")).head
    assert(r.getLong(0) == 2L && r.getDouble(1) == 50.0)
  }

  test("topKPerGroup keeps k rows per key, deterministic on ties") {
    val df = Seq(("u", 5.0, 1L), ("u", 5.0, 2L), ("u", 3.0, 3L), ("u", 1.0, 4L), ("v", 9.0, 5L))
      .toDF("k", "v", "id")
    val got = Aggregates.topKPerGroup(df, Seq("k"), "v", "id", 2)
      .collect().map(r => (r.getString(0), r.getAs[Int]("rank"), r.getLong(2))).toSet
    assert(got == Set(("u", 1, 1L), ("u", 2, 2L), ("v", 1, 5L))) // tie 5.0 -> smaller id first
  }

  test("sessionize splits on gaps over the threshold") {
    val df = Seq(
      ("u", "2026-08-12 10:00:00"), ("u", "2026-08-12 10:10:00"), // session 1
      ("u", "2026-08-12 11:00:00"),                               // 50min gap -> session 2
      ("u", "2026-08-12 11:20:00"),
      ("w", "2026-08-12 09:00:00")
    ).toDF("user_id", "s").select(col("user_id"), to_timestamp(col("s")).as("ts"))
    val got = Aggregates.sessionize(df, "user_id", "ts", gapSeconds = 1800)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(("u", 1L) -> 2L, ("u", 2L) -> 2L, ("w", 1L) -> 1L))
  }

  test("exactSum is order-independent and matches plain arithmetic") {
    // 0.1 added 1000 times: plain double fold drifts; decimal path is exact
    val df = Seq.fill(1000)(0.1).toDF("x")
    val s = df.agg(Aggregates.exactSum(col("x")).as("s")).head.getDouble(0)
    assert(s == 100.0)
    val avg = df.agg(Aggregates.exactAvg(col("x")).as("a")).head.getDouble(0)
    assert(avg == 0.1)
  }

  test("approxDistinct holds the HLL relative-error bound on sf0.1 data") {
    // same gating philosophy as the percentile rank gate: sketch VALUES
    // can't cross engines, but the relative-error contract is
    // engine-independent, so it can gate on real data
    val rsd = 0.023
    val ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
      .select("event_type", "user_id")
    val approx = Aggregates.approxDistinct(ev, Seq("event_type"), "user_id", rsd)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.distinct().groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (g, n) =>
      val err = math.abs(approx(g) - n).toDouble / n
      assert(err <= 4 * rsd, s"group $g: approx ${approx(g)} vs exact $n (err $err)")
    }
  }

  test("approxPercentiles tracks the exact percentile within rank tolerance") {
    val df = spark.range(10000)
      .selectExpr("CAST(id % 2 AS STRING) AS g", "CAST(id AS DOUBLE) AS v")
    val approx = Aggregates.approxPercentiles(df, Seq("g"), "v", Seq(0.5, 0.9))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = df.groupBy("g")
      .agg(expr("percentile(v, 0.5)").as("p50"), expr("percentile(v, 0.9)").as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.foreach { case (g, (p50, p90)) =>
      // sketch accuracy 10000 over 5000 rows per group -> near-exact here
      assert(math.abs(approx(g)._1 - p50) <= 10.0, s"p50 group $g")
      assert(math.abs(approx(g)._2 - p90) <= 10.0, s"p90 group $g")
    }
  }

  test("approxPercentiles holds the ≤ n/accuracy RANK guarantee on sf0.1 data") {
    // the sketch's contract is about RANK, not value: the returned value's
    // rank interval [#(<v)+1, #(≤v)] must intersect [p·n ± n/accuracy].
    // Values can't be compared across engines (sketch internals differ) —
    // rank tolerance is engine-independent, so it CAN gate on real data.
    val acc = 1000
    val ps = Seq(0.5, 0.9, 0.99)
    val ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
      .select("event_type", "value")
    val approx = Aggregates.approxPercentiles(ev, Seq("event_type"), "value", ps, acc)
    val melted = approx.select(col("event_type"), explode(map(
      lit(0.5), col("p50"), lit(0.9), col("p90"), lit(0.99), col("p99"))).as(Seq("p", "v")))
    // one pass: per (group, percentile), the value's rank interval + group n
    val checked = ev.join(melted, "event_type")
      .groupBy("event_type", "p", "v")
      .agg(expr("count_if(value < v)").as("below"),
        expr("count_if(value <= v)").as("belowEq"),
        count(lit(1)).as("n"))
      .collect()
    assert(checked.length == 15) // 5 event types × 3 percentiles
    checked.foreach { r =>
      val (p, below, belowEq, n) =
        (r.getDouble(1), r.getLong(3), r.getLong(4), r.getLong(5))
      val tol = n.toDouble / acc + 1
      val (lo, hi) = (p * n - tol, p * n + tol)
      assert(below + 1 <= hi && belowEq >= lo,
        s"${r.getString(0)} p=$p: rank interval [${below + 1}, $belowEq] " +
          s"outside [$lo, $hi] (n=$n)")
    }
  }

  test("hllRegisters equals the bounded-state aggregator, any partitioning, replay-safe") {
    import graft.expressions.HllRegisterAgg
    val p = 6
    val df = spark.range(2000)
      .selectExpr("CAST(id % 3 AS STRING) AS g", "CAST(id % 700 AS STRING) AS v")
    def table(d: org.apache.spark.sql.DataFrame) =
      Aggregates.hllRegisters(d, Seq("g"), "v", p)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val declarative = table(df)
    // bounded-state aggregator twin carries the FULL array (zeros included)
    val agg = df.groupBy("g").agg(HllRegisterAgg.registers(col("v"), p).as("regs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    agg.foreach { case (g, regs) =>
      assert(regs.size == 64)
      regs.zipWithIndex.foreach { case (reg, bucket) =>
        assert(declarative.getOrElse((g, bucket.toLong), 0L) == reg.toLong,
          s"group $g bucket $bucket")
      }
    }
    // max-merge: independent of partitioning AND idempotent under replay
    assert(table(df.repartition(13, col("v"))) == declarative)
    assert(table(df.union(df)) == declarative)
  }

  test("hllDistinct tracks exact distinct tokens within HLL error on sf0.1 data") {
    val p = 11 // rsd ≈ 1.04/√2048 ≈ 2.3%
    val rsd = 1.04 / math.sqrt((1 << p).toDouble)
    val toks = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
    val approx = Aggregates.hllDistinct(toks, Seq("lang"), "tok", p)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = toks.distinct().groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (g, n) =>
      val err = math.abs(approx(g) - n) / n
      assert(err <= 4 * rsd, s"lang $g: approx ${approx(g)} vs exact $n (err $err)")
    }
  }

  test("hllDistinct Column estimator matches the plain-Scala twin estimator") {
    import graft.expressions.HllRegisterAgg
    val p = 6
    val df = spark.range(500).selectExpr("'g' AS g", "CAST(id AS STRING) AS v")
    val columnEst = Aggregates.hllDistinct(df, Seq("g"), "v", p)
      .head.getDouble(1)
    val regs = df.groupBy("g").agg(HllRegisterAgg.registers(col("v"), p))
      .head.getSeq[Int](1)
    val twinEst = HllRegisterAgg.estimate(regs)
    // both are alpha·m²/Σ2^-reg with linear-counting fallback; association
    // order differs (populated-then-zeros vs bucket order) → ulp tolerance
    assert(math.abs(columnEst - twinEst) / twinEst < 1e-9,
      s"column $columnEst vs twin $twinEst")
  }

  test("trailingRange: value-range frames on irregular spacing, peers included") {
    import spark.implicits._
    // key A at t = 0, 50, 100, 100, 3000: horizon 100 —
    //  t=0   → {0}                 n=1 sum=1
    //  t=50  → {0,50}              n=2 sum=3
    //  t=100 → BOTH peers + {0,50} n=4 sum=10  (RANGE includes all peers)
    //  t=3000→ {3000}              n=1 sum=8
    // a ROWS frame of any fixed width gets at least one of these wrong
    val df = Seq(("A", 0L, 1L), ("A", 50L, 2L), ("A", 100L, 3L),
      ("A", 100L, 4L), ("A", 3000L, 8L), ("B", 60L, 5L))
      .toDF("k", "t", "v")
    val got = Aggregates.trailingRange(df, Seq("k"), "t", col("v"), horizon = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(got(("A", 0L, 1L)) == ((1L, 1L)))
    assert(got(("A", 50L, 2L)) == ((2L, 3L)))
    assert(got(("A", 100L, 3L)) == ((4L, 10L)) && got(("A", 100L, 4L)) == ((4L, 10L)))
    assert(got(("A", 3000L, 8L)) == ((1L, 8L)))
    assert(got(("B", 60L, 5L)) == ((1L, 5L)))
    // partitioning-independent (peer inclusion makes ties order-free)
    val re = Aggregates.trailingRange(df.repartition(5), Seq("k"), "t",
        col("v"), 100L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(re == got)
  }
}
