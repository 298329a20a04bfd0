package graft

import graft.functions.Text
import org.apache.spark.sql.functions._

/** Direct unit coverage for the text-analysis functions (they are also
  * oracle-gated via q14/q15/q17/q46 — these pin the semantic corners the
  * synthetic corpus may not exercise). */
class TextSpec extends SparkSpec {
  import spark.implicits._

  test("langIdHeuristic picks the language with the strongest marker tokens") {
    val docs = Seq(
      (1L, "the cat sat on the mat with a hat"),
      (2L, "le chat et la table et le livre"),
      (3L, "el perro y los gatos y el sol"),
      (4L, "der hund und die katze und der baum"),
      (5L, "nothing matches any marker set here")) // falls back to en
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"), Text.langIdHeuristic(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "fr", 3L -> "es", 4L -> "de", 5L -> "en"))
  }

  test("docQualityScore rewards length, stopwords and sane token lengths") {
    val good = "the quick brown fox jumps over a lazy dog and then runs to the hills again " * 2
    val tooShort = "tiny"
    val noStopwords = "lorem ipsum dolor sit amet consectetur adipiscing elit sed eiusmod tempor incididunt labore"
    val scores = Seq((1L, good), (2L, tooShort), (3L, noStopwords))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Text.docQualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) == 100.0)      // all three checks pass
    assert(scores(2L) < scores(1L))  // length check fails
    assert(scores(3L) < scores(1L))  // stopword-ratio check fails
  }

  test("token statistics on degenerate inputs") {
    val rows = Seq((1L, ""), (2L, "one"), (3L, "a b"), (4L, "x  y")) // double space
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        Text.tokenCount(col("text")).as("n"),
        Text.avgTokenLength(col("text")).as("avg"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    // split-on-space contract (matches DuckDB string_split): "" -> [""],
    // repeated spaces produce empty tokens — documented corpus contract
    assert(rows(1L)._1 == 1)
    assert(rows(2L)._1 == 1 && rows(2L)._2 == 3.0)
    assert(rows(3L)._1 == 2)
    assert(rows(4L)._1 == 3) // "x", "", "y"
  }

  test("topVocabulary ranks by occurrences with per-document frequency attached") {
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "b b b")).toDF("doc_id", "text")
    val top = graft.operators.CorpusStats.topVocabulary(docs, "text", 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(top.toSeq == Seq(("b", 4L, 2L), ("a", 3L, 2L)))
  }

  test("corpusReport summarizes a corpus deterministically in one row") {
    import graft.operators.CorpusStats
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def card(df: org.apache.spark.sql.DataFrame) =
      CorpusStats.corpusReport(df, "doc_id", "text").collect().head
    val r = card(docs)
    assert(r.getAs[Long]("n_docs") == 500)
    assert(r.getAs[Long]("n_tokens") > 0 && r.getAs[Long]("max_tokens") >= r.getAs[Double]("p50_tokens"))
    val dupRate = r.getAs[Double]("dup_rate")
    assert(dupRate >= 0.0 && dupRate < 1.0)
    assert(r.getAs[Long]("n_langs") >= 1 && r.getAs[String]("top_lang").nonEmpty)
    // byte-identical under repartitioning — a data card must not depend on
    // how the release happened to be partitioned
    assert(card(docs.repartition(13)) == r)
    // empty release (round-4 advice): still exactly ONE row, zeros not
    // nulls for the counts, null top_lang — .head() must not crash
    val empty = card(docs.where(lit(false)))
    assert(empty.getAs[Long]("n_docs") == 0L)
    assert(empty.getAs[Double]("dup_rate") == 0.0)
    assert(empty.getAs[String]("top_lang") == null)
  }

  test("bigramNovelty scores rare transitions exactly (hand-computed)") {
    import graft.operators.CorpusStats
    val docs = Seq(
      (1L, "a b a b"),  // bigrams: "a b","b a","a b"
      (2L, "a b c"),    // "a b","b c"
      (3L, "z z"),      // "z z"
      (4L, "solo"))     // < 2 tokens -> no row
      .toDF("doc_id", "text")
    val got = CorpusStats.bigramNovelty(docs, "doc_id", "text", rareThreshold = 1L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    // corpus counts: "a b"->3, "b a"->1, "b c"->1, "z z"->1
    assert(got == Map(
      1L -> ((3L, 1.0 / 3.0, 7.0 / 3.0)), // rare: "b a"; mean (3+1+3)/3
      2L -> ((2L, 0.5, 2.0)),             // rare: "b c"; mean (3+1)/2
      3L -> ((1L, 1.0, 1.0))))
    // partitioning-independent (exactAvg DECIMAL mean)
    val re = CorpusStats.bigramNovelty(docs.repartition(7), "doc_id", "text", 1L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(re == got)
  }

  test("approxHeavyHitters is exact when k covers the domain, bounded when it can't") {
    import graft.operators.CorpusStats
    // k ≥ distinct tokens: no eviction can happen -> exact counts in any
    // merge order (the deterministic case)
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "b b b")).toDF("doc_id", "text")
    val exact = CorpusStats.approxHeavyHitters(docs, "text", 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact == Map("a" -> 3L, "b" -> 4L, "c" -> 1L))

    // open-domain shape on real data: truth from the exact counter, sketch
    // at k=64. Gate only the ORDER-INDEPENDENT SpaceSaving guarantees —
    // never undercounts, overcount ≤ n/k per merge level, and the heavy
    // keys (truth > n) are present. (Which borderline keys appear is
    // partition-order dependent, like any sketch's internals.)
    val real = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val truth = real.select(explode(graft.functions.Text.tokens(col("text"))).as("t"))
      .groupBy("t").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = truth.values.sum
    val k = 64
    val sketch = CorpusStats.approxHeavyHitters(real, "text", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketch.size <= k)
    // never undercounts; overcount bounded (2 merge levels: partial+final)
    sketch.foreach { case (t, est) =>
      val tr = truth(t)
      assert(est >= tr, s"$t undercounted: $est < $tr")
      assert(est - tr <= 2L * n / k, s"$t overcounted: $est vs $tr (n=$n)")
    }
    // every token heavier than the worst-case bound must be present
    truth.filter(_._2 > 2L * n / k).keys.foreach { t =>
      assert(sketch.contains(t), s"heavy token $t missing from sketch")
    }
  }

  test("count-min sketch: aggregator ≡ declarative twin, partitioning-independent, overcount-only") {
    import graft.expressions.CountMinAgg
    import graft.operators.CorpusStats
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (depth, width) = (3, 64)

    // declarative long shape is bit-identical under any partitioning
    def longShape(df: org.apache.spark.sql.DataFrame) =
      CorpusStats.cmsSketch(df, "text", depth, width)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val sketch = longShape(real)
    assert(sketch == longShape(real.repartition(13)))

    // aggregator twin reshaped == the declarative sketch (zero slots absent)
    val agg = real.select(explode(graft.functions.Text.tokens(col("text"))).as("t"))
      .agg(CountMinAgg.sketch(col("t"), depth, width).as("sk"))
      .head.getSeq[Long](0)
    val aggMap = (for {
      r <- 0 until depth; s <- 0 until width if agg(r * width + s) != 0L
    } yield (r, s.toLong) -> agg(r * width + s)).toMap
    assert(aggMap == sketch)

    // point estimates never undercount the exact truth
    val truth = real.select(explode(graft.functions.Text.tokens(col("text"))).as("t"))
      .groupBy("t").count().collect().map(r => r.getString(0) -> r.getLong(1))
    truth.foreach { case (t, c) =>
      assert(CountMinAgg.estimate(agg, t, depth, width) >= c, s"undercount for $t")
    }
    // a key never offered still gets a (possibly positive) overcount, not a crash
    assert(CountMinAgg.estimate(agg, "never-seen-token-xyz", depth, width) >= 0L)
  }

  test("bottom-k sketch: k smallest hash pairs, partitioning-independent, small groups exact") {
    import graft.expressions.BottomKSketchAgg.{sampleByHash, quantileFromSample}
    import graft.functions.Hashing
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val k = 32
    val h = Hashing.stableHash60(col("doc_id").cast("string"))

    def sketch(df: org.apache.spark.sql.DataFrame) = df.groupBy("source")
      .agg(sampleByHash(h, col("n_chars"), k).as("smp"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val got = sketch(real)
    // pure set function: identical under any partitioning / merge order
    assert(got == sketch(real.repartition(13)))

    // ≡ brute force: the k smallest (hash, value) pairs, values ascending
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(h.asc, col("n_chars").asc)
    val brute = real.withColumn("hr", row_number().over(w)).where(col("hr") <= k)
      .collect().groupBy(_.getAs[String]("source"))
      .map { case (s, rs) => s -> rs.map(_.getAs[Long]("n_chars")).sorted.toSeq }
    assert(got == brute)

    // m ≤ k: the sample IS the group, so quantiles are the exact
    // nearest-rank-lower percentiles of the full data
    val tiny = Seq.tabulate(9)(i => (i.toLong, (i + 1) * 10L)).toDF("id", "v")
    val qs = tiny.agg(sampleByHash(
        Hashing.stableHash60(col("id").cast("string")), col("v"), k).as("smp"))
      .select(
        quantileFromSample(col("smp"), 0, 4).as("min"),
        quantileFromSample(col("smp"), 1, 2).as("p50"),
        quantileFromSample(col("smp"), 4, 4).as("max"))
      .head()
    assert((qs.getLong(0), qs.getLong(1), qs.getLong(2)) == ((10L, 50L, 90L)))
    // singleton: every quantile is the value
    val one = Seq((1L, 7L)).toDF("id", "v")
      .agg(sampleByHash(Hashing.stableHash60(col("id").cast("string")),
        col("v"), k).as("smp"))
      .select(quantileFromSample(col("smp"), 1, 2)).head().getLong(0)
    assert(one == 7L)
    // empty sample (left-join / filter shape, not a groupBy output):
    // NULL, not a negative-rank element_at error
    val empty = Seq(Tuple1(Seq.empty[Long])).toDF("smp")
      .select(quantileFromSample(col("smp"), 1, 2)).head()
    assert(empty.isNullAt(0))
  }

  test("exactQuantilesByGroup equals a local sort (same nearest-rank-lower " +
    "contract) and stays row-grain under heavy ties") {
    import graft.operators.CorpusStats
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val qs = Seq(("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p90", 9, 10))
    val got = CorpusStats.exactQuantilesByGroup(real, "source", "n_chars", qs)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val twin = real.select("source", "n_chars").collect()
      .groupBy(_.getString(0)).map { case (s, rs) =>
        val v = rs.map(_.getLong(1)).sorted
        def q(num: Int, den: Int) = v((((v.length - 1).toLong * num) / den).toInt)
        s -> ((q(1, 4), q(1, 2), q(3, 4), q(9, 10), v.length.toLong))
      }
    assert(got == twin)
    // ties: 90× value 5 then 10× value 100 collapse to TWO histogram rows,
    // but ranks stay row-grain — p50 is 5, p95 is 100
    val dup = Seq.tabulate(100)(i => (i.toLong, if (i < 90) 5L else 100L))
      .toDF("id", "v").withColumn("g", lit("x"))
    val d = CorpusStats.exactQuantilesByGroup(dup, "g", "v",
      Seq(("p50", 1, 2), ("p95", 19, 20))).head()
    assert((d.getLong(1), d.getLong(2), d.getLong(3)) == ((5L, 100L, 100L)))
    // weighted: ranks run over cumulative WEIGHT — equals expanding each
    // row `w` times and taking the unweighted quantile
    val wdf = Seq((10L, 3L), (20L, 2L), (30L, 5L)).toDF("v", "w")
      .withColumn("g", lit("x"))
    val wq = CorpusStats.exactQuantilesByGroup(wdf, "g", "v",
      Seq(("p25", 1, 4), ("p50", 1, 2), ("p90", 9, 10)),
      weightCol = Some("w")).head()
    // expanded multiset: 10×3, 20×2, 30×5 (n=10) -> rank(p25)=⌊9/4⌋+1=3
    // -> 10; rank(p50)=⌊9/2⌋+1=5 -> 20; rank(p90)=⌊81/10⌋+1=9 -> 30
    assert((wq.getLong(1), wq.getLong(2), wq.getLong(3), wq.getLong(4)) ==
      ((10L, 20L, 30L, 10L)))
    // contract enforcement: NULL values are excluded from the census
    // (they would inflate __n while never being selectable), and a
    // negative weight fails loudly instead of silently breaking the
    // cumulative monotonicity the rank pick relies on
    val withNull = Seq((Some(10L), 1L), (None, 1L), (Some(30L), 1L))
      .toDF("v", "w").withColumn("g", lit("x"))
    val nq = CorpusStats.exactQuantilesByGroup(withNull, "g", "v",
      Seq(("p50", 1, 2))).head()
    assert((nq.getLong(1), nq.getLong(2)) == ((10L, 2L))) // n=2, not 3
    val negW = Seq((10L, 1L), (20L, -1L)).toDF("v", "w")
      .withColumn("g", lit("x"))
    val err = intercept[Exception] {
      CorpusStats.exactQuantilesByGroup(negW, "g", "v",
        Seq(("p50", 1, 2)), weightCol = Some("w")).collect()
    }
    assert(err.getMessage != null)
    // NULL weights are excluded like NULL values — they carry no mass —
    // and must NOT trip the negative-weight guard through the
    // three-valued `NULL >= 0` compare (the round-8 regression)
    val wNull = Seq((Some(3L), 10L), (None, 20L), (Some(5L), 30L))
      .toDF("w", "v").withColumn("g", lit("x"))
    val wnq = CorpusStats.exactQuantilesByGroup(wNull, "g", "v",
      Seq(("p50", 1, 2)), weightCol = Some("w")).head()
    // surviving mass: 10×3, 30×5 (n=8) → rank(p50)=⌊7/2⌋+1=4 → 30
    assert((wnq.getLong(1), wnq.getLong(2)) == ((30L, 8L)))
  }

  test("bandByGroupQuantiles equals the local edge-then-compare twin, keeps " +
    "ties in one band, and null values band as null") {
    import graft.operators.CorpusStats
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val edges = Seq(("p33", 1, 3), ("p66", 2, 3))
    val got = CorpusStats.bandByGroupQuantiles(real.select("doc_id", "source", "n_chars"),
        "source", "n_chars", edges, Seq("tail", "middle", "head"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val twin = real.select("source", "n_chars", "doc_id").collect()
      .groupBy(_.getString(0)).flatMap { case (_, rs) =>
        val v = rs.map(_.getLong(1)).sorted
        def q(num: Int, den: Int) = v((((v.length - 1).toLong * num) / den).toInt)
        val (p33, p66) = (q(1, 3), q(2, 3))
        rs.toSeq.map { r =>
          val x = r.getLong(1)
          r.getLong(2) -> (if (x <= p33) "tail" else if (x <= p66) "middle" else "head")
        }
      }.toMap
    assert(got == twin)
    // bands are deterministic on any partitioning (the edge is a group
    // VALUE, not a rank — ties always share a band)
    val rep = CorpusStats.bandByGroupQuantiles(
        real.select("doc_id", "source", "n_chars").repartition(13),
        "source", "n_chars", edges, Seq("tail", "middle", "head"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(rep == twin)
    // null value -> null band; an ALL-null group survives with null bands
    val withNull = Seq(("g1", Some(1L)), ("g1", None), ("g1", Some(10L)),
      ("g2", None)).toDF("g", "v")
    val nb = CorpusStats.bandByGroupQuantiles(withNull, "g", "v",
        Seq(("p50", 1, 2)), Seq("lo", "hi"))
      .collect().map(r => (r.getString(0), Option(r.get(1)), r.getString(2)))
    assert(nb.length == 4)
    assert(nb.filter(_._2.isEmpty).forall(_._3 == null))
    assert(nb.filter(t => t._1 == "g1" && t._2.nonEmpty).map(_._3).sorted
      .sameElements(Array("hi", "lo")))
    // contract: label count and edge ordering fail loudly
    intercept[IllegalArgumentException] {
      CorpusStats.bandByGroupQuantiles(withNull, "g", "v",
        Seq(("p50", 1, 2)), Seq("only"))
    }
    intercept[IllegalArgumentException] {
      CorpusStats.bandByGroupQuantiles(withNull, "g", "v",
        Seq(("p66", 2, 3), ("p33", 1, 3)), Seq("a", "b", "c"))
    }
  }

  test("bandByEdges (frozen calibration frame) replays bandByGroupQuantiles " +
    "and NULL-bands rows from groups the frame has never seen") {
    import graft.operators.CorpusStats
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "source", "n_chars")
    val edges = Seq(("p33", 1, 3), ("p66", 2, 3))
    val bands = Seq("tail", "middle", "head")
    // freezing the edges the self-derived pass would compute must replay
    // that pass bit-for-bit — the ingest-screen contract (batch ranking
    // at calibration, pure per-row function at admission)
    val frozen = CorpusStats.exactQuantilesByGroup(real, "source", "n_chars", edges)
      .select("source", "p33", "p66")
    val viaFrozen = CorpusStats.bandByEdges(real, frozen, "source", "n_chars",
        Seq("p33", "p66"), bands)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val viaSelf = CorpusStats.bandByGroupQuantiles(real, "source", "n_chars",
        edges, bands)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(viaFrozen == viaSelf)
    // a group the calibration frame never saw bands as NULL — never as
    // the top band (the all-null edge join must not fall through the
    // otherwise arm)
    val unseen = Seq(("ghost", 999L)).toDF("source", "n_chars")
      .withColumn("doc_id", lit(-1L)).select("doc_id", "source", "n_chars")
    val g = CorpusStats.bandByEdges(unseen, frozen, "source", "n_chars",
      Seq("p33", "p66"), bands).collect().head
    assert(g.isNullAt(3))
  }

  test("bottom-k sketch quantile rank error stays within the KMV bound") {
    import graft.expressions.BottomKSketchAgg.{sampleByHash, quantileFromSample}
    import graft.functions.Hashing
    // n distinct values = their own ranks, so the estimate's rank error
    // reads directly off the value; k=256 -> observed error well inside
    // the 3/sqrt(k) ~ 0.1875 envelope
    val n = 5000
    val k = 256
    val data = spark.range(n.toLong).select(col("id"),
      (col("id") + 1L).as("v")) // v = true 1-based rank
    val smp = data.agg(sampleByHash(
        Hashing.stableHash60(col("id").cast("string")), col("v"), k).as("smp"))
      .select(
        quantileFromSample(col("smp"), 1, 4).as("p25"),
        quantileFromSample(col("smp"), 1, 2).as("p50"),
        quantileFromSample(col("smp"), 3, 4).as("p75"),
        quantileFromSample(col("smp"), 9, 10).as("p90"))
      .head()
    val bound = 3.0 / math.sqrt(k.toDouble) // ~0.1875
    Seq(0.25 -> smp.getLong(0), 0.50 -> smp.getLong(1),
        0.75 -> smp.getLong(2), 0.90 -> smp.getLong(3)).foreach {
      case (q, est) =>
        val err = math.abs(est.toDouble / n - q)
        assert(err <= bound, s"q=$q est=$est rank-err=$err > $bound")
    }
  }

  test("tfIdfTopTerms ranks rare-but-frequent-in-doc terms first") {
    // "x" appears 3 times in doc 1 only (tf=3, df=1, N=3 -> score 9);
    // "a" appears everywhere (df=3 -> score tf*3/3 = tf)
    val docs = Seq((1L, "x x x a"), (2L, "a b"), (3L, "a b c")).toDF("doc_id", "text")
    val top = graft.operators.CorpusStats.tfIdfTopTerms(docs, "doc_id", "text", 1)
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getDouble(3))).toMap
    assert(top(1L) == ("x", 9.0))
    assert(top(2L)._1 == "b")        // b: 1*3/2 = 1.5 beats a: 1*3/3 = 1.0
    assert(top(3L) == ("c", 3.0))    // c is unique to doc 3: 1*3/1 = 3.0
  }

  test("normalizeForDedup is idempotent and kills only formatting differences") {
    val df = Seq(
      ("The  QUICK-brown fox!", "the quick brown fox"),
      ("the quick brown fox", "the quick brown fox"),
      ("completely different", "completely different"))
      .toDF("raw", "expected")
      .select(Text.normalizeForDedup(col("raw")).as("n"),
        Text.normalizeForDedup(Text.normalizeForDedup(col("raw"))).as("nn"),
        col("expected"))
    df.collect().foreach { r =>
      assert(r.getString(0) == r.getString(2))
      assert(r.getString(1) == r.getString(0)) // idempotent
    }
  }

  test("redactPii scrubs emails, IPs and phones; counts audit the original") {
    val rows = Seq(
      (1L, "mail bob.smith99@corp.example now"),
      (2L, "srv at 10.0.255.7 and 192.168.1.1"),
      (3L, "call 555-0142 twice 555-9999"),
      (4L, "nothing sensitive here"),
      (5L, "x@y.z from 1.2.3.4 dial 123-4567"),
      (6L, "ping John.Doe+tag@Gmail.com today"),
      (7L, "cc first-last%x@my-host.co too"))
      .toDF("id", "msg")
      .select(col("id"), Text.redactPii(col("msg")).as("red"),
        Text.piiCount(col("msg"), Text.EmailPattern).as("e"),
        Text.piiCount(col("msg"), Text.IpPattern).as("i"),
        Text.piiCount(col("msg"), Text.PhonePattern).as("p"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows(1L) == (("mail [EMAIL] now", 1L, 0L, 0L)))
    assert(rows(2L) == (("srv at [IP] and [IP]", 0L, 2L, 0L)))
    assert(rows(3L) == (("call [PHONE] twice [PHONE]", 0L, 0L, 2L)))
    assert(rows(4L) == (("nothing sensitive here", 0L, 0L, 0L)))
    assert(rows(5L) == (("[EMAIL] from [IP] dial [PHONE]", 1L, 1L, 1L)))
    // mixed case and +/%/- charset (round-4 advice): these previously
    // survived the lowercase-only pattern entirely or in part
    assert(rows(6L) == (("ping [EMAIL] today", 1L, 0L, 0L)))
    assert(rows(7L) == (("cc [EMAIL] too", 1L, 0L, 0L)))
  }

  test("bpeishTokenCount splits letter runs, digit runs and punctuation marks") {
    val got = Seq(
      (1L, "a1-b2.c"),              // a,1,-,b,2,.,c
      (2L, "plain words only"),     // 3 — equals whitespace count on clean text
      (3L, "Call 555-0042 now!"),   // Call,555,-,0042,now,!
      (4L, ""))                     // empty -> 0
      .toDF("id", "t")
      .select(col("id"), graft.functions.Text.bpeishTokenCount(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 7L, 2L -> 3L, 3L -> 6L, 4L -> 0L))
  }

  test("redactPii replacement order: emails go before the number patterns eat them") {
    // digits+dots inside an email local part must not be IP-redacted
    val red = Seq(Tuple1("reach 1.2.3.4aa@host.example ok")).toDF("msg")
      .select(Text.redactPii(col("msg"))).collect().head.getString(0)
    assert(red == "reach [EMAIL] ok")
  }

  test("stripMarkup drops block contents, strips tags, decodes entities in order") {
    def strip(s: String): String =
      Seq(Tuple1(s)).toDF("h").select(Text.stripMarkup(col("h")))
        .collect().head.getString(0)
    val html = "<html><head><style>p{x:1}</style>" +
      "<SCRIPT src=\"a.js\">var x=1;</SCRIPT></head>" +
      "<body><!-- hidden --><h1 class=\"t\">Title</h1>" +
      "<p>Hello &amp;&nbsp;world &lt;tag&gt; &quot;q&quot; &#39;s&#39;</p></body></html>"
    // style/script/comment CONTENT gone (incl. uppercase tags via (?i));
    // kept text joined by single spaces; entities decoded once
    assert(strip(html) == "Title Hello & world <tag> \"q\" 's'")
    // decode runs AFTER tag strip: entity-encoded angle brackets survive
    // as text and are never re-stripped as tags
    assert(strip("<p>a &lt;b&gt; c</p>") == "a <b> c")
    // &amp; decodes LAST: literal "&amp;lt;" is a single decode to "&lt;"
    // (the HTML rule), not a double decode to "<"
    assert(strip("<p>&amp;lt;</p>") == "&lt;")
    assert(strip("") == "")
  }

  test("linkCount counts anchor tags exactly") {
    val got = Seq(
      (1L, "<a href=\"x\">a</a> mid <a href=\"y\">b</a>"),
      (2L, "no anchors <abbr>here</abbr>"), // <abbr> must not count
      (3L, ""))
      .toDF("id", "h")
      .select(col("id"), Text.linkCount(col("h")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 0L, 3L -> 0L))
  }
}
