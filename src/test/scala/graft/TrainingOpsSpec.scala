package graft

import graft.operators.{Aggregates, Chunking, CorpusStats, Sampling, Similarity}
import org.apache.spark.sql.functions._

/** Semantic corners of the round-4 training-pipeline operators (all five
  * are also oracle-gated via q54-q58 — these pin properties the synthetic
  * corpus may not exercise: exact chunk layouts, quota edges, degenerate
  * vectors, partitioning-independence). */
class TrainingOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- Chunking ----

  test("chunkByTokens layout: counts, offsets, overlap and tail clamp") {
    // 10 tokens, chunkSize 4, stride 3 → chunks at 0,3,6 cover 0..9 with
    // 1-token overlap; final chunk is full here (6+4=10)
    val docs = Seq((1L, (0 until 10).map("t" + _).mkString(" "))).toDF("doc_id", "text")
    val got = Chunking.chunkByTokens(docs, "doc_id", "text", chunkSize = 4, stride = 3)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((0L, 0L, 4L), (1L, 3L, 4L), (2L, 6L, 4L)))
    // 11 tokens → one more window with a clamped 2-token tail
    val docs11 = Seq((1L, (0 until 11).map("t" + _).mkString(" "))).toDF("doc_id", "text")
    val tail = Chunking.chunkByTokens(docs11, "doc_id", "text", 4, 3)
      .orderBy("chunk_idx").collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(tail.toSeq == Seq((0L, 4L), (3L, 4L), (6L, 4L), (9L, 2L)))
  }

  test("chunkBySentences never cuts mid-sentence and conserves tokens") {
    // sentences of 3/4/2/5 tokens; maxTokens=6 → offsets 0,3,7,9 →
    // chunks 0,0,1,1: the 4-token sentence STARTS at offset 3 (<6) so it
    // stays in chunk 0 (which then holds 7 > maxTokens — the documented
    // one-sentence-over allowance)
    val docs = Seq((1L, "a b c. d e f g! h i? j k l m n.")).toDF("doc_id", "text")
    val got = Chunking.chunkBySentences(docs, "doc_id", "text", maxTokens = 6)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getLong(1), r.getSeq[String](2), r.getLong(3)))
    assert(got.length == 2)
    assert(got(0) == ((0L, Seq("a b c", "d e f g"), 7L)))
    assert(got(1) == ((1L, Seq("h i", "j k l m n"), 7L)))
    // token conservation across every doc of the real corpus + sentence
    // order stays document order regardless of partitioning
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val chunks = Chunking.chunkBySentences(real.repartition(7), "doc_id", "text", 64)
    val perDoc = chunks.groupBy("doc_id")
      .agg(sum("chunk_tokens").as("t")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truth = real.select(col("doc_id"),
      graft.functions.Text.tokenCount(col("text")).cast("long").as("t")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // sentence splitting merges/drops only punctuation-and-space runs; the
    // corpus text has no sentence punctuation inside tokens, so totals match
    assert(perDoc.keySet == truth.keySet)
    perDoc.foreach { case (id, t) => assert(t == truth(id), s"doc $id") }

    // sentence-less docs (empty / punct-only / null) still appear: one
    // chunk-0 row, empty sentences, zero tokens — the every-doc contract
    val edge = Seq((10L, ""), (11L, "..."), (12L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val er = Chunking.chunkBySentences(edge, "doc_id", "text", 6)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getSeq[String](2), r.getLong(3)))).toMap
    assert(er.keySet == Set(10L, 11L, 12L))
    er.values.foreach { case (idx, sents, toks) =>
      assert(idx == 0L && sents.isEmpty && toks == 0L)
    }
  }

  test("chunkByTokens: short docs yield exactly one chunk; every token is covered") {
    val docs = Seq((1L, "a b"), (2L, "x")).toDF("doc_id", "text")
    val one = Chunking.chunkByTokens(docs, "doc_id", "text", 8, 5).collect()
    assert(one.length == 2 && one.forall(_.getLong(1) == 0L))
    // coverage: with stride <= chunkSize, chunk spans tile [0, n)
    val long = Seq((1L, (0 until 23).map("w" + _).mkString(" "))).toDF("doc_id", "text")
    val spans = Chunking.chunkByTokens(long, "doc_id", "text", 7, 4)
      .collect().map(r => (r.getLong(2), r.getLong(2) + r.getLong(3)))
    val covered = spans.flatMap { case (s, e) => s until e }.toSet
    assert(covered == (0L until 23L).toSet)
  }

  // ---- Quantile binning ----

  test("withQuantileBins: bins are monotone in value and balanced on a uniform column") {
    val df = (1 to 1000).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val binned = Aggregates.withQuantileBins(df, "v", (1 to 9).map(_ / 10.0))
    val rows = binned.orderBy("v").collect().map(r => (r.getDouble(1), r.getLong(2)))
    // monotone: sorting by value never decreases the bin
    assert(rows.sliding(2).forall { case Array((_, a), (_, b)) => a <= b; case _ => true })
    val counts = binned.groupBy("bin").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (1L to 10L).toSet)
    assert(counts.values.forall(c => c >= 99 && c <= 101)) // deciles of 1..1000
  }

  test("withQuantileBins is partitioning-independent") {
    val df = (1 to 500).map(i => (i.toLong, (i * 37 % 101).toDouble)).toDF("id", "v")
    val a = Aggregates.withQuantileBins(df, "v", Seq(0.25, 0.5, 0.75))
      .select("id", "bin").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Aggregates.withQuantileBins(df.repartition(7), "v", Seq(0.25, 0.5, 0.75))
      .select("id", "bin").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  // ---- Mixture sampling ----

  test("mixtureSample honors per-group quotas, default quota, and small groups") {
    val df = (0 until 100).map(i => (i.toLong, s"g${i % 4}"))
      .toDF("id", "grp") // 25 rows per group
      .union(Seq((1000L, "tiny")).toDF("id", "grp")) // 1-row group
    val got = Sampling.mixtureSample(df, "grp", "id",
      Map("g0" -> 10, "g1" -> 5), defaultQuota = 2)
    val counts = got.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("g0" -> 10L, "g1" -> 5L, "g2" -> 2L, "g3" -> 2L, "tiny" -> 1L))
  }

  test("mixtureSample draw is deterministic under repartitioning") {
    val df = (0 until 200).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "grp")
    val a = Sampling.mixtureSample(df, "grp", "id", Map("g0" -> 7), 4)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.mixtureSample(df.repartition(11), "grp", "id", Map("g0" -> 7), 4)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("band mixture (the q146 composition): per-band draws are " +
    "min(quota, band size) and a NULL band draws nothing under quota 0") {
    // one source, values 1..30 → nearest-rank-lower tercile edges p33 =
    // rank (29*1)//3+1 = 10, p66 = rank (29*2)//3+1 = 20: tail = 1..10,
    // middle = 11..20, head = 21..30 (10 docs each); a NULL value bands
    // as NULL and must vanish under defaultQuota = 0 (the q146 config)
    val df = ((1 to 30).map(i => (i.toLong, "g", Some(i.toLong))) :+
      ((99L, "g", Option.empty[Long]))).toDF("doc_id", "source", "v")
    val banded = CorpusStats.bandByGroupQuantiles(df, "source", "v",
      Seq(("p33", 1, 3), ("p66", 2, 3)), Seq("tail", "middle", "head"))
    val drawn = Sampling.mixtureSample(banded, "band", "doc_id",
      Map("head" -> 4, "middle" -> 2, "tail" -> 25), defaultQuota = 0)
    val counts = drawn.groupBy("band").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // head/middle capped by quota, tail capped by band size, NULL gone
    assert(counts == Map("head" -> 4L, "middle" -> 2L, "tail" -> 10L))
    // the draw is a subset of the banded frame with bands intact
    val bandOf = banded.where(col("v").isNotNull).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("band")).toMap
    drawn.collect().foreach { r =>
      assert(bandOf(r.getAs[Long]("doc_id")) == r.getAs[String]("band"))
    }
  }

  test("hashSampleByGroup (the q148 composition): each group's admission " +
    "equals hashSample at that group's rate, absent groups use the default, " +
    "(d,d) keeps a group whole") {
    val df = (0 until 300).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "grp")
    val rates = Map("g0" -> ((9, 10)), "g1" -> ((1, 2)))
    val got = Sampling.hashSampleByGroup(df, "grp", "id", rates)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // the rate test is per-row, so group slices decompose to plain
    // hashSample — the identity that makes the filter stateless
    for ((g, (n, d)) <- rates) {
      val slice = Sampling.hashSample(df.where(col("grp") === g), "id", n, d)
        .collect().map(_.getLong(0)).toSet
      assert(got.filter(_._2 == g).map(_._1).toSet == slice,
        s"group $g diverged from hashSample($n/$d)")
      assert(slice.nonEmpty && slice.size < 100, s"rate $n/$d must bite on $g")
    }
    // the default rate (0, 1) drops the unlisted group entirely
    assert(!got.exists(_._2 == "g2"))
    // a (d, d) rate keeps its group whole
    val whole = Sampling.hashSampleByGroup(df, "grp", "id", Map("g2" -> ((1, 1))))
      .collect().map(_.getLong(0)).toSet
    assert(whole == (0 until 300).filter(_ % 3 == 2).map(_.toLong).toSet)
  }

  test("temperatureMixture flattens: small groups take a super-proportional share") {
    // 900 vs 100 rows: proportional 60-row draw would take 54/6; √-count
    // weights (30, 10) give quotas ⌊60·30/40⌋=45 and ⌊60·10/40⌋=15
    val df = ((0 until 900).map(i => (i.toLong, "big")) ++
      (1000 until 1100).map(i => (i.toLong, "small"))).toDF("id", "grp")
    val counts = Sampling.temperatureMixture(df, "grp", "id", totalOut = 60)
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("big" -> 45L, "small" -> 15L))
  }

  test("temperatureMixture clamps quotas to group size and is partitioning-independent") {
    // tiny group (2 rows, w=1): quota ⌊50·1/11⌋=4 clamps to 2; null
    // groups drop
    val df = ((0 until 100).map(i => (i.toLong, "a")) ++
      Seq((200L, "t"), (201L, "t"), (300L, null.asInstanceOf[String]))).toDF("id", "grp")
    val got = Sampling.temperatureMixture(df, "grp", "id", totalOut = 50)
    val counts = got.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("t") == 2L && !counts.contains(null))
    // null rows must not dilute the denominator either: z = 10+1 (not
    // 10+1+1), so quota_a = ⌊50·10/11⌋ = 45 — with the null's weight
    // included it would be ⌊500/12⌋ = 41
    assert(counts("a") == 45L)
    val again = Sampling.temperatureMixture(df.repartition(13), "grp", "id", totalOut = 50)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == got.select("id").collect().map(_.getLong(0)).toSet)
  }

  // ---- OOV rate ----

  test("oovStats counts occurrences outside the top-k vocab") {
    // 'a' x6, 'b' x4, 'c' x2 → vocab(2) = {a, b}; c is OOV
    val docs = Seq(
      (1L, "a a a b b c"),
      (2L, "a a a b b c")).toDF("doc_id", "text")
    val got = CorpusStats.oovStats(docs, "doc_id", "text", vocabSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSet == Set((1L, 6L, 1L, 1.0 / 6.0), (2L, 6L, 1L, 1.0 / 6.0)))
  }

  test("oovStats vocab cutoff tie-breaks lexicographically") {
    // b and c tie at 2 occurrences; vocabSize 2 keeps {a, b} (token asc)
    val docs = Seq((1L, "a a a b b c c")).toDF("doc_id", "text")
    val got = CorpusStats.oovStats(docs, "doc_id", "text", vocabSize = 2).collect()
    assert(got.head.getLong(2) == 2L) // only the two c's are OOV
  }

  // ---- DSIR importance weighting ----

  private def dsirFixture = {
    // target-domain docs share the "data pipeline" phrasing; out-domain
    // docs talk about cooking; one mixed doc sits between
    Seq(
      (1L, "the data pipeline loads the data pipeline tables", true),
      (2L, "a data pipeline writes data pipeline outputs", true),
      (3L, "simmer the onions then roast the carrots slowly", false),
      (4L, "whisk the eggs and fold the flour gently", false),
      (5L, "the data pipeline bakes carrots", false)
    ).toDF("doc_id", "text", "is_tgt")
  }

  test("importanceWeights ranks in-domain text above out-domain text") {
    val docs = dsirFixture
    val ft = CorpusStats.hashedFeatureTable(docs, "is_tgt", "text", n = 2, buckets = 256)
    val w = CorpusStats.importanceWeights(docs, ft, "doc_id", "text", n = 2, buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(1L) > w(5L) && w(2L) > w(5L),
      s"pure target docs must outscore the mixed doc: $w")
    assert(w(5L) > w(3L) && w(5L) > w(4L),
      s"the mixed doc must outscore pure out-domain docs: $w")
    val top = CorpusStats.topByWeight(
      CorpusStats.importanceWeights(docs, ft, "doc_id", "text", n = 2, buckets = 256), 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(top == Set(1L, 2L), s"top-2 selection must be the target docs, got $top")
  }

  test("importanceWeights is partitioning-independent and matches a driver twin") {
    val docs = dsirFixture
    val ft = CorpusStats.hashedFeatureTable(docs, "is_tgt", "text", n = 2, buckets = 256)
    def run(parts: Int): Map[Long, Double] =
      CorpusStats.importanceWeights(docs.repartition(parts), ft, "doc_id", "text",
        n = 2, buckets = 256).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w1 = run(1)
    assert(w1 == run(7), "DECIMAL-summed weights must not depend on partitioning")
    // driver twin: same smoothing, same per-bucket log-ratio, BigDecimal sum
    val alpha = 0.5
    val b = 256
    val table = ft.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val tTot = table.values.map(_._1).sum.toDouble
    val rTot = table.values.map(_._2).sum.toDouble
    val twin = dsirFixture.collect().map { r =>
      val toks = r.getString(1).split(" ")
      val feats = toks.sliding(2).map(_.mkString(" ")).toSeq
      val lw = feats.map { f =>
        val bucket = graft.functions.Hashing.stableHash60Scala(f) % b
        val (tc, rc) = table.getOrElse(bucket, (0L, 0L))
        BigDecimal(math.log((tc.toDouble + alpha) / (tTot + alpha * b)) -
          math.log((rc.toDouble + alpha) / (rTot + alpha * b)))
          .setScale(18, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
      r.getLong(0) -> lw
    }.toMap
    for ((id, v) <- twin)
      assert(math.abs(w1(id) - v) < 1e-9, s"doc $id: spark ${w1(id)} vs twin $v")
  }

  test("targetAffinity and importanceWeights emit zero rows for featureless docs") {
    val docs = Seq((1L, "data pipeline runs", true), (2L, "word", false))
      .toDF("doc_id", "text", "is_tgt")
    val ft = CorpusStats.hashedFeatureTable(docs, "is_tgt", "text", n = 2, buckets = 64)
    val aff = CorpusStats.targetAffinity(docs, ft, "doc_id", "text", n = 2, buckets = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(aff(2L) == ((0L, 0L, 0L)), "a doc shorter than n tokens keeps a zero row")
    assert(aff(1L)._1 == 2L)
    val w = CorpusStats.importanceWeights(docs, ft, "doc_id", "text", n = 2, buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(2L) == 0.0, "featureless docs weigh exactly zero")
  }

  // ---- Int8 quantization ----

  test("quantizeInt8 round-trips within half a scale step and hits the extremes") {
    val vecs = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, -1.0f)),
      (2L, Array(0.003f, 0.001f, -0.002f, 0.004f))).toDF("vec_id", "embedding")
    val rows = Similarity.quantizeInt8(vecs).collect()
    for (r <- rows) {
      val scale = r.getDouble(1)
      val q = r.getSeq[Long](2)
      assert(q.forall(v => v >= -127 && v <= 127))
      assert(q.max == 127L || q.min == -127L) // max-|x| element maps to an extreme
      val orig = vecs.where(col("vec_id") === r.getLong(0))
        .collect().head.getSeq[Float](1)
      orig.zip(q).foreach { case (x, qi) =>
        assert(math.abs(x.toDouble - qi * scale) <= scale / 2 + 1e-12)
      }
    }
  }

  test("quantizeInt8 maps the all-zero vector to zeros with scale 0") {
    val vecs = Seq((1L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = Similarity.quantizeInt8(vecs).collect().head
    assert(r.getDouble(1) == 0.0 && r.getSeq[Long](2).forall(_ == 0L))
  }

  // ---- Label margins ----

  test("labelMargins flags a planted mislabel with a negative margin") {
    val rnd = new scala.util.Random(11)
    val protoA = Array.fill(8)(rnd.nextFloat() + 2f)
    val protoB = Array.fill(8)(rnd.nextFloat() - 3f)
    def near(p: Array[Float]) = p.map(x => x + rnd.nextFloat() * 0.01f)
    val vecs = ((0L until 10L).map(i => (i, near(protoA), 0))
      ++ (10L until 20L).map(i => (i, near(protoB), 1))
      ++ Seq((99L, near(protoA), 1))) // A-cluster vector labeled B
      .toDF("vec_id", "embedding", "label")
    val m = Similarity.labelMargins(vecs)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getInt(3), r.getDouble(5))).toMap
    assert(m(99L)._3 < 0)             // mislabel: own-class cos < other
    assert(m(99L)._2 == 0)            // nearest other class is the true one
    (0L until 20L).foreach(i => assert(m(i)._3 > 0, s"vec $i"))
  }

  test("labelMargins is partitioning-independent") {
    val rnd = new scala.util.Random(13)
    val vecs = (0L until 60L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.labelMargins(df).collect()
        .map(r => (r.getLong(0), r.getDouble(2), r.getInt(3), r.getDouble(5))).toSet
    assert(run(vecs) == run(vecs.repartition(13)))
  }

  // ---- Cleaning funnel ----

  test("funnelReport charges each doc to its FIRST failing stage; counts sum to corpus") {
    import graft.operators.Cleaning
    val docs = Seq(
      (1L, 5L, 1L),   // fails both stages -> charged to the first only
      (2L, 50L, 1L),  // passes len, fails tokens
      (3L, 50L, 9L),  // passes all
      (4L, 5L, 9L))   // fails len
      .toDF("id", "chars", "toks")
    val stages = Seq(
      "short" -> (col("chars") >= 10L),
      "few_tokens" -> (col("toks") >= 5L))
    val rep = Cleaning.funnelReport(docs, stages).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(rep == Map("short" -> 2L, "few_tokens" -> 1L, "pass" -> 1L))
    assert(rep.values.sum == 4L)
    val kept = Cleaning.survivors(docs, stages).collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L))
    // survivors keep the original schema (stage columns dropped)
    assert(Cleaning.survivors(docs, stages).columns.toSeq == Seq("id", "chars", "toks"))
  }

  test("frequentLines / dropFrequentLines: C4 line dedup cuts chrome, keeps documents") {
    import graft.operators.Cleaning
    val docs = Seq(
      (1L, "cookie banner\nunique body one\nfooter"),
      (2L, "cookie banner\nunique body two\nfooter"),
      (3L, "cookie banner\nunique body three\nfooter"),
      (4L, "cookie banner\ncookie banner\nonly banners here"), // within-doc repeat
      (5L, "footer")                                           // fully boilerplate
    ).toDF("doc_id", "text")
    // within-doc repeats count their doc ONCE: "cookie banner" is in 4
    // docs (not 5), "footer" in 4
    val freq = Cleaning.frequentLines(docs, "doc_id", "text", "\n", minDocs = 4L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(freq == Map("cookie banner" -> 4L, "footer" -> 4L))
    val cut = Cleaning.dropFrequentLines(docs, "doc_id", "text", "\n", minDocs = 4L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cut == Map(
      1L -> "unique body one", 2L -> "unique body two", 3L -> "unique body three",
      4L -> "only banners here",   // BOTH banner occurrences cut
      5L -> ""))                   // fully-boilerplate doc -> empty, kept
    // below threshold nothing is cut, and the rebuild is byte-identical
    val untouched = Cleaning.dropFrequentLines(docs, "doc_id", "text", "\n", minDocs = 9L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(untouched == docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap)
    // partitioning-independent; separator is a literal (regex chars safe)
    val re = Cleaning.dropFrequentLines(docs.repartition(7), "doc_id", "text", "\n", 4L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(re == cut)
    val dotted = Seq((1L, "a.b"), (2L, "a.b"), (3L, "c.d")).toDF("doc_id", "text")
    val dc = Cleaning.dropFrequentLines(dotted, "doc_id", "text", ".", minDocs = 2L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dc == Map(1L -> "", 2L -> "", 3L -> "c.d")) // '.' not a regex wildcard
  }

  test("line dedup never counts or cuts empty lines (paragraph structure survives)") {
    import graft.operators.Cleaning
    // Every doc uses blank-line paragraph breaks — the '' line is in all
    // 5 docs, far past the threshold, but it is STRUCTURE, not chrome:
    // counting it would collapse every paragraph break corpus-wide.
    val docs = (1L to 5L).map(i => (i, s"intro $i\n\nbody $i\n\nfooter"))
      .toDF("doc_id", "text")
    val freq = Cleaning.frequentLines(docs, "doc_id", "text", "\n", minDocs = 5L)
      .collect().map(_.getString(0)).toSet
    assert(freq == Set("footer")) // '' excluded despite 5 distinct docs
    val cut = Cleaning.dropFrequentLines(docs, "doc_id", "text", "\n", minDocs = 5L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cut(1L) == "intro 1\n\nbody 1\n") // breaks intact, footer gone
    assert(cut.values.forall(_.contains("\n\n")))
  }

  // ---- Streaming compatibility ----

  test("redact + chunk compose as stateless streaming transforms, batch-identical") {
    // the prep ops are narrow projections, so the SAME operator call runs
    // on a readStream frame — no batch/streaming twin needed; pin that the
    // streamed output matches the batch run on identical input
    val root = java.nio.file.Files.createTempDirectory("graft-prep-stream").toString
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    def prep(df: org.apache.spark.sql.DataFrame) =
      Chunking.chunkByTokens(
        df.select(col("doc_id"), graft.functions.Text.redactPii(col("text")).as("text")),
        "doc_id", "text", chunkSize = 4, stride = 3)
    val q = prep(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("prep_stream")
      .option("checkpointLocation", s"$root/ckpt").outputMode("append").start()
    val rows = Seq(
      (1L, "contact me at bob@corp.example for the data drop today ok"),
      (2L, "server 10.2.3.4 rebooted at dawn"))
    input.addData(rows)
    q.processAllAvailable()
    val streamed = spark.sql("SELECT * FROM prep_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(4))).toSet
    q.stop()
    val batch = prep(rows.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(4))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("spanCorruption is lossless: splicing targets back into inputs rebuilds the doc") {
    import graft.operators.Augment
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Augment.spanCorruption(docs, "doc_id", "text", noisePct = 15, seed = 7L)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4))).toMap
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == texts.keySet)
    var masked = 0L; var total = 0L
    out.foreach { case (id, (input, target, nMasked, nSpans)) =>
      // parse target "<extra_id_0> a b <extra_id_1> c <extra_id_2>" into spans
      val spans = target.split("<extra_id_\\d+>").map(_.trim).filter(_.nonEmpty)
      assert(spans.length == nSpans, s"doc $id")
      // splice each sentinel in the input with its span
      val rebuilt = spans.zipWithIndex.foldLeft(input) { case (acc, (s, k)) =>
        acc.replace(s"<extra_id_$k>", s)
      }
      assert(rebuilt == texts(id), s"doc $id reconstruction")
      masked += nMasked; total += texts(id).split(" ").length
    }
    // Bernoulli(15%) over the corpus: empirical rate in a generous band
    val rate = masked.toDouble / total
    assert(rate > 0.10 && rate < 0.20, s"mask rate $rate")
    // deterministic on any partitioning
    val again = Augment.spanCorruption(docs.repartition(13), "doc_id", "text", 15, 7L)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(again == out.view.mapValues(v => (v._1, v._2)).toMap)
  }

  test("sourceOverlap matches hand-computed shingle-set overlap per source pair") {
    val fixture = Seq(
      ("A", "a b c d e"), ("A", "c d e f g"),          // A: 3 + (3 new of 3)
      ("B", "a b c d e"), ("B", "p q r s t"),          // shares A's first doc
      ("C", "x y z x y z z"))                          // disjoint from both
      .zipWithIndex.map { case ((s, t), i) => (i.toLong, s, t) }
      .toDF("doc_id", "source", "text")
    // Scala-twin expected stats from raw shingle sets
    def shingleSet(t: String): Set[String] =
      t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val bySrc = Seq("A", "B", "C").map { s =>
      s -> fixture.where(col("source") === s).collect()
        .flatMap(r => shingleSet(r.getString(2))).toSet
    }.toMap
    val got = CorpusStats.sourceOverlap(fixture, "source", "text", n = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))).toMap
    for (a <- Seq("A", "B", "C"); b <- Seq("A", "B", "C") if a < b) {
      val (sa, sb) = (bySrc(a), bySrc(b))
      val inter = (sa & sb).size
      if (inter == 0) assert(!got.contains((a, b)), s"($a,$b)")
      else {
        val (shared, za, zb, jac, ov) = got((a, b))
        assert(shared == inter && za == sa.size && zb == sb.size)
        assert(jac == inter.toDouble / (sa.size + sb.size - inter).toDouble)
        assert(ov == inter.toDouble / math.min(sa.size, sb.size).toDouble)
      }
    }
    assert(got.contains(("A", "B")) && !got.contains(("A", "C")))
  }

  test("spanViews crops are disjoint, in-bounds, content-faithful and seed-driven") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val L = 8
    val views = Chunking.spanViews(docs, "doc_id", "text", viewLen = L, seed = 7L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val eligible = texts.filter(_._2.split(" ").length >= 2 * L)
    assert(views.keySet == eligible.keySet) // exactly one pair per eligible doc
    views.foreach { case (id, (n, a, b, va, vb)) =>
      val toks = texts(id).split(" ")
      assert(n == toks.length)
      assert(a >= 0 && a + L <= b && b + L <= n, s"doc $id: a=$a b=$b n=$n")
      // views are the actual token spans (disjoint by the bound above)
      assert(va == toks.slice(a.toInt, a.toInt + L).mkString(" "))
      assert(vb == toks.slice(b.toInt, b.toInt + L).mkString(" "))
    }
    // a different epoch seed moves the crops (somewhere, not necessarily everywhere)
    val otherSeed = Chunking.spanViews(docs, "doc_id", "text", viewLen = L, seed = 8L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(views.exists { case (id, (_, a, b, _, _)) => otherSeed(id) != ((a, b)) })
  }

  test("tokenDrift: exact TV numerators, absent-side zeros, tie order") {
    val a = Seq((1L, "x x y")).toDF("doc_id", "text")   // N_a=3: x:2 y:1
    val b = Seq((2L, "x z")).toDF("doc_id", "text")     // N_b=2: x:1 z:1
    val rows = CorpusStats.tokenDrift(a, b, "text", k = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDecimal(5).longValueExact())).toSeq
    // drift: x |2·2−1·3|=1, y |1·2−0·3|=2, z |0·2−1·3|=3 → order z,y,x
    assert(rows.map(_._1) == Seq("z", "y", "x"))
    assert(rows.toMap == Map(
      "z" -> ((0L, 1L, 3L, 2L, 3L)),
      "y" -> ((1L, 0L, 3L, 2L, 2L)),
      "x" -> ((2L, 1L, 3L, 2L, 1L))))
    // identical corpora → every numerator is zero
    val zero = CorpusStats.tokenDrift(a, a, "text", 10)
      .collect().map(_.getDecimal(5).longValueExact())
    assert(zero.forall(_ == 0L))
    // equal drift ties order by token ascending
    val t1 = Seq((1L, "b a")).toDF("doc_id", "text")
    val t2 = Seq((2L, "c d")).toDF("doc_id", "text")
    val tie = CorpusStats.tokenDrift(t1, t2, "text", 10)
      .collect().map(_.getString(0)).toSeq
    assert(tie == Seq("a", "b", "c", "d"))
    // an EMPTY side yields zero totals and zero numerators (TV against a
    // zero distribution degenerates to 0·c products) — never null rows
    val empty = a.limit(0)
    val vs = CorpusStats.tokenDrift(a, empty, "text", 10)
      .collect().map(r => (r.getString(0), r.getLong(4),
        r.getDecimal(5).longValueExact()))
    assert(vs.map(_._1).toSet == Set("x", "y"))
    assert(vs.forall { case (_, totB, num) => totB == 0L && num == 0L })
  }

  test("fimTransform is lossless: reordering PSM back rebuilds every doc") {
    import graft.operators.Augment
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = Augment.fimTransform(docs, "doc_id", "text", applyPct = 60, seed = 7L)
      .collect().map { r =>
        r.getLong(0) -> (r.getBoolean(1), r.getString(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4),
          if (r.isNullAt(5)) -1L else r.getLong(5))
      }.toMap
    assert(out.keySet == texts.keySet)
    var applied = 0; var sawEmptySegment = false
    out.foreach { case (id, (isFim, fimText, np, nm, ns)) =>
      if (!isFim) {
        assert(fimText == texts(id) && np == -1L && nm == -1L && ns == -1L, s"doc $id")
      } else {
        applied += 1
        // parse "<fim_prefix> P <fim_suffix> S <fim_middle> M"
        assert(fimText.startsWith("<fim_prefix>"), s"doc $id")
        val sufAt = fimText.indexOf("<fim_suffix>")
        val midAt = fimText.indexOf("<fim_middle>")
        assert(sufAt > 0 && midAt > sufAt, s"doc $id")
        def seg(s: String) = s.split(" ").filter(_.nonEmpty)
        val p = seg(fimText.substring("<fim_prefix>".length, sufAt))
        val sfx = seg(fimText.substring(sufAt + "<fim_suffix>".length, midAt))
        val m = seg(fimText.substring(midAt + "<fim_middle>".length))
        assert(p.length == np && m.length == nm && sfx.length == ns, s"doc $id counts")
        assert((p ++ m ++ sfx).mkString(" ") == texts(id), s"doc $id rebuild")
        sawEmptySegment ||= np == 0 || nm == 0 || ns == 0
      }
    }
    // FIM rate ~60% in a generous band; degenerate cuts occur in 500 docs
    val rate = applied.toDouble / out.size
    assert(rate > 0.5 && rate < 0.7, s"fim rate $rate")
    assert(sawEmptySegment, "expected at least one empty P/M/S segment")
    // bit-reproducible under repartitioning
    val again = Augment.fimTransform(docs.repartition(13), "doc_id", "text", 60, 7L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(again == out.view.mapValues(_._2).toMap)
  }
}
