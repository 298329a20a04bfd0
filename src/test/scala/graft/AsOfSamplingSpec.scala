package graft

import graft.operators.{AsOf, Sampling}
import org.apache.spark.sql.functions._

class AsOfSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("asOfJoin attaches the latest at-or-before right row per key") {
    val left = Seq(
      (1L, 10L, 100L), (1L, 20L, 101L), (1L, 30L, 102L),
      (2L, 15L, 200L)) // user 2 has no purchase before 15
      .toDF("user_id", "t", "event_id")
    val right = Seq(
      (1L, 10L, 500L, 1.0),  // exactly at left t=10 -> inclusive match
      (1L, 25L, 501L, 2.0),
      (2L, 99L, 502L, 3.0))  // after user 2's event -> no match
      .toDF("user_id", "t", "p_event", "p_value")
    val out = AsOf.asOfJoin(left, right, "user_id", "t", Seq("p_event", "p_value"), "p_event")
      .collect().map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[java.lang.Long]("p_event")).map(_.toLong), r.getAs[Any]("p_value"))).toMap
    assert(out(100L)._1.contains(500L)) // inclusive at equal time
    assert(out(101L)._1.contains(500L)) // before 25 -> still 500
    assert(out(102L)._1.contains(501L)) // after 25 -> 501
    assert(out(200L)._1.isEmpty)        // nothing at-or-before -> null
  }

  test("asOfJoin null payloads carry per-column LOCF, not latest-row nulls") {
    // The documented semantics (AsOf.scala): each payload column carries
    // forward independently with ignoreNulls — the latest row's null keeps
    // the older observation in THAT column while sibling columns take the
    // latest row's values. A switch to strict latest-row attachment would
    // flip p_value at t=30 to null and must fail here consciously.
    val left = Seq((1L, 30L, 100L)).toDF("user_id", "t", "event_id")
    val right = Seq(
      (1L, 10L, Some(500L), Some(1.5)),
      (1L, 20L, Some(501L), None: Option[Double])) // latest row: p_value null
      .toDF("user_id", "t", "p_event", "p_value")
    val r = AsOf.asOfJoin(left, right, "user_id", "t",
      Seq("p_event", "p_value"), "p_event").head
    assert(r.getAs[Long]("p_event") == 501L)  // latest row's non-null column
    assert(r.getAs[Double]("p_value") == 1.5) // null at t=20 -> LOCF from t=10
  }

  test("asOfJoin breaks equal-time right ties toward the largest tieBreak") {
    val left = Seq((1L, 10L, 1L)).toDF("user_id", "t", "event_id")
    val right = Seq((1L, 10L, 7L, 7.0), (1L, 10L, 9L, 9.0), (1L, 10L, 8L, 8.0))
      .toDF("user_id", "t", "p_event", "p_value")
    val out = AsOf.asOfJoin(left, right, "user_id", "t", Seq("p_event", "p_value"), "p_event")
    assert(out.head.getAs[Long]("p_event") == 9L)
  }

  test("rollingFeatures sees strictly-before rows only (leakage-free)") {
    import graft.operators.Aggregates
    val base = java.sql.Timestamp.valueOf("2026-08-12 10:00:00").getTime
    def ts(s: Long) = new java.sql.Timestamp(base + s * 1000)
    val ev = Seq(
      (1L, ts(0), 10L, 5.0),
      (1L, ts(100), 11L, 7.0),
      (1L, ts(100), 12L, 9.0),   // same instant as 11 -> neither sees the other
      (1L, ts(5000), 13L, 1.0))  // every prior row is >3600s old -> empty frame
      .toDF("user_id", "ts", "event_id", "value")
    val out = Aggregates.rollingFeatures(ev, "user_id", "ts", "value", 3600)
      .collect().map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("prior_count"), Option(r.getAs[Any]("prior_sum")))).toMap
    assert(out(10L)._1 == 0 && out(10L)._2.isEmpty) // empty frame
    assert(out(11L)._1 == 1)                        // sees event 10 only
    assert(out(12L)._1 == 1)                        // same instant as 11: excluded
    assert(out(13L)._1 == 0)                        // all priors older than lookback
  }

  test("hash splits are stable under repartitioning and sum to the whole") {
    val df = spark.range(10000).toDF("id")
    val splits = Seq("train" -> 8, "val" -> 1, "test" -> 1)
    val a = Sampling.assignSplits(df, "id", splits)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Sampling.assignSplits(df.repartition(13), "id", splits)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)                       // partitioning-independent
    assert(a.values.sum == 10000L)       // total preserved
    assert(a("train") > 7500 && a("train") < 8500) // ~80%
    // same row -> same split on every evaluation
    val twice = Sampling.assignSplits(df, "id", splits).withColumnRenamed("split", "s1")
      .join(Sampling.assignSplits(df, "id", splits), "id")
    assert(twice.where(col("s1") =!= col("split")).count() == 0)
  }

  test("capPerGroup caps classes deterministically, independent of partitioning") {
    val df = spark.range(3000)
      .selectExpr("id", "CAST(id % 3 AS STRING) AS cls")
    val a = Sampling.capPerGroup(df, "cls", "id", 100)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = Sampling.capPerGroup(df.repartition(11), "cls", "id", 100)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)                                  // not "first N encountered"
    assert(a.size == 300)                           // cap actually selected rows
    assert(a.groupBy(_._2).forall(_._2.size == 100)) // exactly 100 per class
    // a group under the cap is untouched
    val small = Sampling.capPerGroup(df.where(col("id") < 30), "cls", "id", 100)
    assert(small.count() == 30)
  }

  test("shuffleWithRank materializes the shuffle order as a dense 1-based rank") {
    val df = (1L to 100L).map(i => (i, s"payload$i")).toDF("id", "p")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.shuffleWithRank(d, "id", seed = 7L)
        .collect().map(r => (r.getLong(0), r.getLong(2)))
    val got = run(df)
    assert(got.map(_._2).sorted.toSeq == (1L to 100L), "ranks are dense 1..n")
    // rank agrees with the deterministicShuffle order and is stable under
    // repartitioning (the whole point vs monotonically_increasing_id)
    val order = Sampling.deterministicShuffle(df, "id", seed = 7L)
      .collect().map(_.getLong(0)).toSeq
    assert(got.sortBy(_._2).map(_._1).toSeq == order)
    assert(run(df.repartition(13)).toMap == got.toMap)
  }

  test("tauWeight: JVM sqrt-chain twin agrees exactly; tau=1/2 mixture " +
    "reduces to temperatureMixture; tau=1 is proportional") {
    // The portable-convention claim: every step (long→double cast, sqrt,
    // multiply, floor) is correctly rounded, so the engine's double equals
    // a JVM evaluation of the same shape BIT-FOR-BIT — no tolerance.
    val rnd = new scala.util.Random(3)
    val counts = (Seq(0L, 1L, 2L, 3L, 1L << 40, (1L << 40) + 1) ++
      Seq.fill(60)(rnd.nextLong(1L << 45))).distinct
    def jvmTau(c: Long, k: Int, m: Int): Long = {
      val cd = c.toDouble
      val terms = (1 to m).flatMap { j =>
        if (((k >> (m - j)) & 1) == 1)
          Some((1 to j).foldLeft(cd)((e, _) => math.sqrt(e)))
        else None
      }
      math.floor(if (k == (1 << m)) cd else terms.reduce(_ * _)).toLong
    }
    for ((k, m) <- Seq((1, 1), (3, 2), (5, 4), (7, 3), (1, 10), (16, 4))) {
      val got = counts.toDF("c")
        .select(col("c"), Sampling.tauWeight(col("c"), k, m).as("w"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      counts.foreach(c => assert(got(c) == jvmTau(c, k, m), s"c=$c tau=$k/2^$m"))
    }
    // tau = 1/2 keeps the q72 operator's exact outputs
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Sampling.temperatureMixture(docs, "source", "doc_id", 100)
      .select("source", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = Sampling.temperatureMixtureTau(docs, "source", "doc_id", 100, 1, 1)
      .select("source", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b && a.nonEmpty)
    // tau = 1: weights are the counts themselves -> count-proportional
    // floor quotas, verified against a JVM recomputation
    val srcCounts = docs.where(col("source").isNotNull)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val z = srcCounts.values.sum
    val expQuota = srcCounts.map { case (s, c) => s -> math.min(c, 50L * c / z) }
    val gotQuota = Sampling.temperatureMixtureTau(docs, "source", "doc_id", 50, 2, 1)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    expQuota.foreach { case (s, q) =>
      assert(gotQuota.getOrElse(s, 0L) == q, s"tau=1 quota for $s") }
  }

  test("curriculumInterleave respects weights in every prefix and is partition-stable") {
    val docs = (1L to 300L).map(i => (i, "s" + (i % 3))).toDF("id", "src")
    val weights = Map("s0" -> 3, "s1" -> 2, "s2" -> 1)
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.curriculumInterleave(d, "id", "src", weights, seed = 11L)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(_._3)
    val got = run(docs)
    assert(got.map(_._3).toSeq == (1L to 300L), "positions are dense 1..n")
    assert(run(docs.repartition(13)).toSeq == got.toSeq)

    // weighted fair queueing guarantee: in any prefix, source s has
    // emitted either floor or ceil of its ideal share vt-wise — check the
    // counts never drift more than 1 item from the ideal w_s/W fraction
    // while all sources still have items left (here: always, equal sizes
    // 100 each exhaust s2 first at prefix 100·6/1=600 > 300... s0 runs
    // out at vt 100·2=200 ⇔ prefix where all s0 emitted)
    val counts = scala.collection.mutable.Map("s0" -> 0, "s1" -> 0, "s2" -> 0)
    got.foreach { case (_, s, pos) =>
      counts(s) += 1
      val exhausted = counts.exists(_._2 == 100)
      if (!exhausted) {
        weights.foreach { case (src, w) =>
          val ideal = pos * w / 6.0
          assert(math.abs(counts(src) - ideal) <= 1.0 + 1e-9,
            s"at prefix $pos source $src emitted ${counts(src)}, ideal $ideal")
        }
      }
    }
    // 3:2:1 totals: s0 exhausts its 100 docs by virtual time 200, where
    // s1 has ~66 and s2 ~33 — the long-run mixture
    val at150 = got.take(150).groupBy(_._2).view.mapValues(_.length).toMap
    assert(at150("s0") > at150("s1") && at150("s1") > at150("s2"))

    // sources not in the weight map are excluded
    val extra = docs.union(Seq((999L, "sX")).toDF("id", "src"))
    assert(!run(extra).exists(_._2 == "sX"))
  }

  test("deterministicShuffle is a seeded permutation, stable under repartitioning") {
    val df = spark.range(5000).toDF("id")
    val o1 = Sampling.deterministicShuffle(df, "id", seed = 7L)
      .collect().map(_.getLong(0))
    val o2 = Sampling.deterministicShuffle(df.repartition(13), "id", seed = 7L)
      .collect().map(_.getLong(0))
    assert(o1.sameElements(o2))              // partitioning-independent order
    assert(o1.toSet == (0L until 5000L).toSet) // a permutation, nothing lost
    val other = Sampling.deterministicShuffle(df, "id", seed = 8L)
      .collect().map(_.getLong(0))
    assert(!o1.sameElements(other))   // seeds give independent epochs
    assert(!o1.sameElements(o1.sorted)) // actually shuffled, not id order
  }

  test("stratifiedSplit hits exact cumulative-floor quotas in every stratum") {
    import graft.functions.Hashing
    import org.apache.spark.sql.expressions.Window
    // skewed strata: 97 / 10 / 3 rows
    val rows = ((1L to 97L).map(i => (i, "big")) ++
      (101L to 110L).map(i => (i, "mid")) ++ Seq((201L, "tiny"), (202L, "tiny"), (203L, "tiny")))
    val df = rows.toDF("id", "stratum")
    val got = Sampling.stratifiedSplit(df, "id", "stratum",
      quotas = Seq("test" -> 20, "val" -> 10), seed = 5L)
    // schema: original columns + split, row count preserved
    assert(got.columns.toSeq == Seq("id", "stratum", "split"))
    assert(got.count() == 110L)
    val sizes = got.groupBy("stratum", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // cumulative-floor: test = ⌊n·20/100⌋, test+val = ⌊n·30/100⌋
    assert(sizes == Map(
      ("big", "test") -> 19L, ("big", "val") -> 10L, ("big", "train") -> 68L,
      ("mid", "test") -> 2L, ("mid", "val") -> 1L, ("mid", "train") -> 7L,
      ("tiny", "train") -> 3L))   // ⌊3·0.2⌋ = 0 -> no test/val rows at all
    // identical to the naive single-window reference implementation
    val h = Hashing.stableHash60(concat_ws("\u0000", lit("5"), col("id").cast("string")))
    val w = Window.partitionBy("stratum").orderBy(h.asc, col("id").asc)
    val naive = df.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("stratum")))
      .withColumn("split", when(col("rn") <= expr("(n * 20) div 100"), "test")
        .when(col("rn") <= expr("(n * 30) div 100"), "val").otherwise("train"))
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val gotMap = got.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(gotMap == naive)
    // partitioning-independent, and the bucket width is invisible
    val re = Sampling.stratifiedSplit(df.repartition(13), "id", "stratum",
        Seq("test" -> 20, "val" -> 10), seed = 5L, prefixBits = 3)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(re == gotMap)
    // a different seed reshuffles membership but not the quota sizes
    val re2 = Sampling.stratifiedSplit(df, "id", "stratum",
      Seq("test" -> 20, "val" -> 10), seed = 6L)
    assert(re2.collect().map(r => r.getLong(0) -> r.getString(2)).toMap != gotMap)
    assert(re2.groupBy("stratum", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap == sizes)
  }

  test("crossSplitLeakage keeps exactly the pairs whose sides split apart") {
    val splits = Seq("train" -> 8, "val" -> 1, "test" -> 1)
    // all ordered pairs over a small id range: the expected answer is
    // derivable row-by-row from assignSplits itself
    val ids = spark.range(60).toDF("id")
    val pairs = ids.select(col("id").as("id_a"))
      .crossJoin(ids.select(col("id").as("id_b")))
      .where(col("id_a") < col("id_b"))
    val leak = Sampling.crossSplitLeakage(pairs, "id_a", "id_b", splits)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val label = Sampling.assignSplits(ids, "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = (for {
      a <- 0L until 60L; b <- a + 1 until 60L if label(a) != label(b)
    } yield (a, b)).toSet
    assert(leak == expected)
    // labels attached to the output agree with assignSplits per side
    val row = Sampling.crossSplitLeakage(pairs, "id_a", "id_b", splits).head
    assert(row.getAs[String]("split_a") == label(row.getAs[Long]("id_a")))
    assert(row.getAs[String]("split_b") == label(row.getAs[Long]("id_b")))
  }

  test("groupAwareSplits co-travels near-dup groups; the leakage audit reads zero") {
    val splits = Seq("train" -> 8, "val" -> 1, "test" -> 1)
    val docs = spark.range(210).toDF("id") // 200..209 have no pair (singletons)
    // pair up (2k, 2k+1): per-doc splits separate many of these pairs
    val pairs = spark.range(100)
      .select((col("id") * 2).as("id_a"), (col("id") * 2 + 1).as("id_b"))
    assert(Sampling.crossSplitLeakage(pairs, "id_a", "id_b", splits).count() > 0)
    val groups = graft.operators.Components.dedupGroups(pairs)
    val ga = Sampling.groupAwareSplits(docs, groups, "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // every pair member shares its group's split -> leakage impossible
    assert((0L until 100L).forall(k => ga(2 * k) == ga(2 * k + 1)))
    val solo = Sampling.assignSplits(docs, "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // group label of 2k IS 2k (smallest of the pair) -> matches the solo label
    assert((0L until 100L).forall(k => ga(2 * k) == solo(2 * k)))
    // singletons (no group row) fall back to their own id = assignSplits
    assert((200L until 210L).forall(i => ga(i) == solo(i)))
    // partitioning-independent
    val re = Sampling.groupAwareSplits(docs.repartition(7), groups.repartition(3),
        "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(re == ga)
  }

  test("negativeSamples draws k stable non-self negatives per anchor") {
    val df = spark.range(500).toDF("id")
    val a = Sampling.negativeSamples(df, "id", k = 4, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // exactly k rows per anchor, ranks 0..k-1, never the anchor itself
    val byAnchor = a.groupBy(_._1)
    assert(byAnchor.size == 500 && byAnchor.values.forall(_.length == 4))
    assert(a.forall { case (anchor, _, neg) => neg != anchor })
    assert(byAnchor.values.forall(_.map(_._2).sorted.toSeq == Seq(0, 1, 2, 3)))
    // deterministic under repartitioning; a different seed redraws
    val b = Sampling.negativeSamples(df.repartition(11), "id", 4, 7L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(a.toSet == b.toSet)
    val c = Sampling.negativeSamples(df, "id", 4, 8L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(a.toSet != c.toSet)
    // roughly uniform usage: no id hogs the negative pool (2000 draws over
    // 500 ids → expected 4 uses; a deterministic-hash pathology would spike)
    val usage = a.groupBy(_._3).view.mapValues(_.length)
    assert(usage.values.max <= 20, s"max usage ${usage.values.max}")
    // string ids work (hashing casts, like every Sampling op) and null
    // ids are dropped up front rather than killing the job mid-stage
    val strs = Seq("doc-a", "doc-b", "doc-c", null).toDF("id")
    val s = Sampling.negativeSamples(strs, "id", k = 2, seed = 1L)
      .collect().map(r => (r.getString(0), r.getString(2)))
    assert(s.length == 6)                       // 3 non-null anchors × 2
    assert(s.forall { case (anchor, neg) => anchor != null && neg != null && anchor != neg })
  }

  test("hashSample keeps a stable ~fraction and is a subset across runs") {
    val df = spark.range(10000).toDF("id")
    val s1 = Sampling.hashSample(df, "id", 1, 10).collect().map(_.getLong(0)).toSet
    val s2 = Sampling.hashSample(df.repartition(7), "id", 1, 10).collect().map(_.getLong(0)).toSet
    assert(s1 == s2)
    assert(s1.size > 800 && s1.size < 1200)
    // num/denom monotone: a 10% sample is inside the 20% sample
    val s20 = Sampling.hashSample(df, "id", 2, 10).collect().map(_.getLong(0)).toSet
    assert(s1.subsetOf(s20))
  }

  test("ppsSample: weight-proportional inclusion, exact HT accounting, deterministic") {
    val df = (1L to 1000L).map(i => (i, (i % 50 + 1))).toDF("id", "wt")
    val got = Sampling.ppsSample(df, "id", col("wt"), targetRows = 100L, seed = 5L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // Poisson size concentrates around targetRows (deterministic value —
    // the band is a regression pin, not a statistical assertion)
    assert(got.size > 70 && got.size < 130, s"sample size ${got.size}")
    val total = (1L to 1000L).map(i => i % 50 + 1).sum.toDouble
    got.foreach { case (id, (w, p, ht)) =>
      assert(w == id % 50 + 1)
      assert(p == math.min(1.0, w * 100.0 / total))
      assert(ht == 1.0 / p)
    }
    // a row with targetRows·w ≥ Σw has probability 1 and ALWAYS enters
    val dominant = df.union(Seq((9999L, 10000L)).toDF("id", "wt"))
    val withBig = Sampling.ppsSample(dominant, "id", col("wt"), 100L, 5L)
      .where(col("id") === 9999L).collect()
    assert(withBig.length == 1 && withBig.head.getDouble(2) == 1.0)
    // deterministic on any partitioning
    val again = Sampling.ppsSample(df.repartition(9), "id", col("wt"), 100L, 5L)
      .collect().map(r => r.getLong(0)).toSet
    assert(again == got.keySet)
    // HT estimator of the total from the sample is in a sane band
    // (deterministic draw -> fixed value; pin keeps the estimator wired)
    val htTotal = got.values.map { case (w, p, _) => w / p }.sum
    assert(math.abs(htTotal - total) / total < 0.3, s"HT $htTotal vs $total")
    // the fixed-total (ingest/streaming) form with the TRUE total is the
    // same sample, bit for bit
    val fixed = Sampling.ppsSampleWithTotal(df, "id", col("wt"), 100L, 5L,
        total = total.toLong)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(fixed == got)
  }

  test("lengthBucketBatches bounds batch size and per-row pad waste by construction") {
    val docs = (0L until 300L).map(i => (i, Seq.fill((i % 47 + 5).toInt)("w").mkString(" ")))
      .toDF("id", "t")
    val lenExpr = size(split(col("t"), " "))
    val b = Sampling.lengthBucketBatches(docs, "id", lenExpr,
      binWidth = 16, batchSize = 8, seed = 3L)
    val rows = b.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4)))
    assert(rows.length == 300) // every row assigned
    rows.foreach { case (_, n, bin, _, pos) =>
      assert(bin == n / 16, s"bin for n=$n")
      assert(pos >= 0 && pos < 8)
    }
    // batches are full except at most ONE tail batch per bin
    val perBatch = rows.groupBy(r => (r._3, r._4)).view.mapValues(_.length)
    perBatch.foreach { case ((_, _), c) => assert(c <= 8) }
    val partialPerBin = perBatch.toSeq.filter(_._2 < 8).groupBy(_._1._1)
    partialPerBin.foreach { case (bin, ps) => assert(ps.size == 1, s"bin $bin") }
    // report: exact integer pad accounting, padded width within the bin
    val rep = Sampling.lengthBatchReport(b).collect()
    rep.foreach { r =>
      val (bin, nRows, padded, real, waste) =
        (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(waste == nRows * padded - real)
      assert(padded / 16 == bin) // batch max stays inside its bin
    }
    // deterministic on any partitioning
    val again = Sampling.lengthBucketBatches(docs.repartition(7), "id", lenExpr,
      binWidth = 16, batchSize = 8, seed = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(again.toSet == rows.toSet)
  }

  test("epochPlan: hand-computed quotas, epoch cap, remainder decomposition") {
    // source A: 100 one-token docs; source B: one 10000-token doc
    // w_A = 10, w_B = 100, Z = 110; budget 34100:
    //   quota_A = 34100*10 div 110 = 3100 → capped at 4·100 = 400 (4 epochs, rem 0)
    //   quota_B = 34100*100 div 110 = 31000 → 3 full epochs + 1000 remainder
    val docs = ((1 to 100).map(i => ("A", "t")) :+
      ("B", (1 to 10000).map(_ => "w").mkString(" "))).toDF("source", "text")
    val plan = Sampling.epochPlan(docs, "source",
        size(split(col("text"), " ")), budgetTokens = 34100L, maxEpochs = 4)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(plan("A") == ((100L, 10L, 3100L, 400L, 4L, 0L)))
    assert(plan("B") == ((10000L, 100L, 31000L, 31000L, 3L, 1000L)))
    // capped surplus is NOT redistributed: the shortfall stays visible
    assert(plan.values.map(_._4).sum == 31400L)
    // null-source rows take no quota and don't dilute the denominator
    val withNull = docs.union(Seq((null.asInstanceOf[String], "x y z")).toDF("source", "text"))
    val plan2 = Sampling.epochPlan(withNull, "source",
        size(split(col("text"), " ")), 34100L, 4)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(plan2 == plan.view.mapValues(_._4).toMap)
    // partitioning-independent
    val re = Sampling.epochPlan(docs.repartition(7), "source",
        size(split(col("text"), " ")), 34100L, 4)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(re == plan)
  }

  test("ppsSampleByGroup is exactly ppsSample per group; missing/zero " +
    "targets emit nothing") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("w", size(split(col("text"), " ")).cast("long"))
      .where(col("w") > 0)
    val sources = docs.select("source").distinct()
      .collect().map(_.getString(0)).sorted
    // varied targets per source (5, 10, 15, ... by source rank); one
    // source dropped from the plan, one set to zero
    val targetMap = sources.zipWithIndex.map { case (s, i) => s -> (5L + 5L * (i % 4)) }.toMap
    val dropped = sources.head; val zeroed = sources.last
    val targets = targetMap.toSeq
      .filter(_._1 != dropped)
      .map { case (s, t) => (s, if (s == zeroed) 0L else t) }
      .toDF("source", "target")
    val got = Sampling.ppsSampleByGroup(docs, "source", "doc_id",
        col("w"), targets, seed = 11L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.nonEmpty)
    assert(!got.exists(r => r._2 == dropped || r._2 == zeroed))
    // per group, the draw is EXACTLY ppsSample on that group's slice
    got.groupBy(_._2).keySet.foreach { src =>
      val slice = Sampling.ppsSample(docs.where(col("source") === src),
          "doc_id", col("w"), targetMap(src), seed = 11L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
      val mine = got.filter(_._2 == src).map(r => (r._1, r._3, r._4, r._5)).toSet
      assert(mine == slice, s"source $src")
    }
    // deterministic under repartitioning
    val again = Sampling.ppsSampleByGroup(docs.repartition(13), "source",
        "doc_id", col("w"), targets, 11L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again == got.map(r => (r._1, r._2)).toSet)
    // duplicated plan rows are REJECTED in-plan (they would silently
    // multiply sampled rows through the join)
    val dup = targets.unionByName(targets.limit(1))
    intercept[Exception] {
      Sampling.ppsSampleByGroup(docs, "source", "doc_id", col("w"), dup, 11L)
        .count()
    }
  }

  test("expandEpochs materializes the plan: full passes, one budget " +
    "crossing, reproducible order") {
    // same fixture as the epochPlan test: A → 4 full epochs rem 0;
    // B → 3 full epochs + 1000-token remainder (one 10000-token doc)
    val docs = ((1 to 100).map(i => (i.toLong, "A", "t")) :+
      (999L, "B", (1 to 10000).map(_ => "w").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val len = size(split(col("text"), " "))
    val out = Sampling.expandEpochs(docs, "source", "doc_id", len,
        budgetTokens = 34100L, maxEpochs = 4, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byGroup = out.groupBy(_._2)
    // A: every doc exactly 4 times, epochs 1..4, no remainder pass
    assert(byGroup("A").length == 400)
    assert(byGroup("A").map(_._3).toSet == Set(1L, 2L, 3L, 4L))
    assert(byGroup("A").groupBy(_._1).forall(_._2.length == 4))
    // B: 3 full passes + the remainder pass admits the single doc once
    // (before-cumsum 0 < 1000); the budget is crossed exactly once
    assert(byGroup("B").map(_._3).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    val plannedB = 31000L
    val emittedB = byGroup("B").map(_._4).sum
    assert(emittedB >= plannedB && emittedB < plannedB + 10000L + 1)
    // bit-reproducible under repartitioning
    val again = Sampling.expandEpochs(docs.repartition(9), "source", "doc_id",
        len, 34100L, 4, 7L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(again.sorted.toSeq == out.sorted.toSeq)
    // zero-full-epoch sources still get their remainder-only partial pass
    val tiny = Sampling.expandEpochs(docs, "source", "doc_id", len,
        budgetTokens = 110L, maxEpochs = 4, seed = 7L)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    // budget 110: w_A=10,w_B=100,Z=110 → quota_A=10, quota_B=100 — both
    // below one epoch → every emitted row is an epoch-1 partial pass
    assert(tiny.nonEmpty && tiny.forall(_._2 == 1L))
  }
}
