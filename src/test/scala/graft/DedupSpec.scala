package graft

import graft.functions.Text
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different words appear here today now"),
    (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (5L, "tiny doc")                                     // < 3 tokens
  ).toDF("doc_id", "text")

  test("keepFirst keeps the min tie-break row per key") {
    val df = Seq(("a", 3L), ("a", 1L), ("b", 2L)).toDF("k", "id")
    val got = Dedup.keepFirst(df, Seq("k"), "id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    assert(got == Set("a" -> 1L, "b" -> 2L))
  }

  test("exactTextGroups groups identical content") {
    val g = Dedup.exactTextGroups(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(g.contains((1L, 2L))) // docs 1 and 4 collapse, keeper = 1
    assert(g.count(_._2 == 1L) == 3)
  }

  test("shingles: fewer than n tokens yields empty array") {
    val s = docs.where(col("doc_id") === 5)
      .select(Text.shingleSet(col("text"), 3).as("s")).head.getSeq[String](0)
    assert(s.isEmpty)
    val s1 = docs.where(col("doc_id") === 1)
      .select(Text.shingles(col("text"), 3).as("s")).head.getSeq[String](0)
    assert(s1.head == "the quick brown" && s1.size == 7)
  }

  test("ngramJaccardPairs finds exact and near dups with correct jaccard") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((1L, 4L)) == 1.0) // exact dup
    // doc1 vs doc2: 7 shingles each, 6 shared -> 6/8
    assert(pairs((1L, 2L)) == 0.75 && pairs((2L, 4L)) == 0.75)
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("hot-shingle cap drops high-fanout buckets") {
    val many = (1L to 20L).map(i => (i, "same shared shingle text here")).toDF("doc_id", "text")
    val capped = Dedup.ngramJaccardPairs(many, "doc_id", "text", 3, 0.1, maxBucket = 5)
    assert(capped.count() == 0) // every shingle appears 20 > 5 times
  }

  test("minhash: identical docs get identical signatures, LSH catches them") {
    val sigs = Dedup.minhashSignatures(docs.where(col("doc_id") =!= 5), "doc_id", "text", 3, 16)
    val rows = sigs.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(rows(1L) == rows(4L))
    assert(rows(1L) != rows(3L))
    val cands = Dedup.minhashLshCandidates(sigs, 16, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 4L)))
    assert(!cands.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("simhash: identical docs equal; near-dups within small hamming distance") {
    val sigs = Dedup.simhashSignatures(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(4L))
    val pairs = Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // hamming 0
  }

  test("connected components label pair graphs with the smallest reachable id") {
    import graft.operators.Components
    // components {1,2,3,4-chain} and {10,11}; 20 isolated (absent from pairs)
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val labels = Components.smallestIdPropagation(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("dedupGroups keeps exactly one doc per near-dup cluster end-to-end") {
    import graft.operators.Components
    val groups = Components.dedupGroups(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.3))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    // docs 1,2,4 cluster (keeper 1); doc 3 and 5 have no pairs
    assert(groups == Set((1L, 1L, true), (2L, 1L, false), (4L, 1L, false)))
  }

  test("bestPerGroup picks the highest-scored member, id ascending on ties") {
    import graft.operators.Components
    val groups = Seq(
      (1L, 1L, true), (2L, 1L, false), (4L, 1L, false), // one cluster
      (7L, 7L, true), (9L, 7L, false)                   // another
    ).toDF("id", "keep_id", "is_keeper")
    val scored = Seq(1L -> 10.0, 2L -> 30.0, 4L -> 30.0, 7L -> 5.0, 9L -> 5.0)
      .toDF("doc_id", "q")
    val rep = Components.bestPerGroup(groups, scored, "doc_id", "q")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getBoolean(4)))
      .toSet
    // cluster 1: 2 and 4 tie at 30 -> smallest id 2 wins (NOT the keeper 1)
    // cluster 7: all tie at 5 -> smallest id 7 wins
    assert(rep == Set(
      (1L, 1L, 2L, false), (2L, 1L, 2L, true), (4L, 1L, 2L, false),
      (7L, 7L, 7L, true), (9L, 7L, 7L, false)))
    // partitioning-independent
    val re = Components.bestPerGroup(groups.repartition(5), scored.repartition(3),
        "doc_id", "q")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getBoolean(4)))
      .toSet
    assert(re == rep)
  }

  test("fingerprint is order-sensitive") {
    val fp = Seq((1L, "a b c"), (2L, "a b c"), (3L, "c b a"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Text.fingerprint(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L) && fp(1L) != fp(3L))
  }

  test("crossSetContamination finds the planted train twin and ignores disjoint docs") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"),
      (3L, "red orange yellow green blue indigo")).toDF("doc_id", "text")
    val test = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"), // identical to train 1
      (11L, "one two three four nine ten eleven"),  // partial overlap with train 2
      (12L, "cat dog fish bird mouse horse")).toDF("doc_id", "text") // disjoint
    val got = graft.operators.Dedup
      .crossSetContamination(train, test, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(got(10L) == ((1.0, 1L)))
    assert(got(11L)._2 == 2L && got(11L)._1 > 0.0 && got(11L)._1 < 1.0)
    assert(!got.contains(12L)) // no shared shingle → no row (contamination 0)
  }

  test("bloomContamination is bit-identical to the exact operator and prunes the stream") {
    // real corpus slice: train vs eval split of the sf0.001 documents table
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val train = docs.where(col("doc_id") % 10 =!= 0)
    val test = docs.where(col("doc_id") % 10 === 0)
    val exact = Dedup.crossSetContamination(train, test, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val bloom = Dedup.bloomContamination(train, test, "doc_id", "text", n = 3,
      mBits = 1 << 16)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(bloom == exact) // FPs verified away, no FNs possible → identical

    // the filter actually prunes: train shingles surviving the bitmap are a
    // strict subset when train and test vocabularies mostly differ
    val te = Dedup.hashedShingles(test, "doc_id", "text", 3).localCheckpoint()
    val words = graft.expressions.BloomExprs.buildBitmap(te, "h", 1 << 16)
    val tr = Dedup.hashedShingles(train, "doc_id", "text", 3)
    val total = tr.count()
    val survived = tr.where(
      graft.expressions.BloomExprs.mightContain(col("h"), words, 1 << 16)).count()
    assert(survived < total / 2, s"expected <50% survivors, got $survived/$total")
  }

  test("bitsForFpp sizes the bitmap to hit the target false-positive rate") {
    import graft.expressions.BloomExprs
    // formula sanity: power-of-two, monotone in n, clamped
    assert(BloomExprs.bitsForFpp(0, 0.03) == 1 << 10)
    assert(BloomExprs.bitsForFpp(Long.MaxValue, 0.01) == 1 << 30)
    val m = BloomExprs.bitsForFpp(100000, 0.03)
    assert((m & (m - 1)) == 0 && m >= 100000)
    assert(BloomExprs.bitsForFpp(100000, 0.001) > m) // tighter fpp → bigger

    // empirical: insert n keys at the auto-sized m, measure fpp on n
    // disjoint probes — must come in at or under ~2× the target (power-of-
    // two rounding only ever lowers it; the slack absorbs probe-hash
    // correlation on the shared 60-bit hash)
    val n = 20000L
    val mAuto = BloomExprs.bitsForFpp(n, 0.03)
    val inserted = spark.range(n).select(
      graft.functions.Hashing.stableHash60(concat(lit("in"), col("id"))).as("h"))
    val words = BloomExprs.buildBitmap(inserted, "h", mAuto)
    val probes = spark.range(n).select(
      graft.functions.Hashing.stableHash60(concat(lit("out"), col("id"))).as("h"))
    val fp = probes.where(BloomExprs.mightContain(col("h"), words, mAuto)).count()
    val rate = fp.toDouble / n
    assert(rate <= 0.06, s"fpp $rate exceeds 2x the 0.03 target at m=$mAuto")
  }

  test("BitmapContains matches inserted hashes exactly (no false negatives)") {
    import graft.expressions.BloomExprs
    // strict codegen: a janino failure in doGenCode must THROW here, not
    // silently fall back to interpreted eval
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val inserted = spark.range(1000).select(
        graft.functions.Hashing.stableHash60(col("id").cast("string")).as("h"))
      val words = BloomExprs.buildBitmap(inserted, "h", 1 << 16)
      // every inserted hash hits — membership is exact for insertions
      assert(inserted.where(!BloomExprs.mightContain(col("h"), words, 1 << 16)).count() == 0)
      // a disjoint hash population mostly misses (FP rate ~ (1-e^(-2n/m))^2 ≈ 0.1%)
      val other = spark.range(10000, 20000).select(
        graft.functions.Hashing.stableHash60(col("id").cast("string")).as("h"))
      val fp = other.where(BloomExprs.mightContain(col("h"), words, 1 << 16)).count()
      assert(fp < 100, s"false-positive count $fp out of 10000 is implausibly high")

      // the documented fast-path swap: NEGATIVE hashes (xxhash64) must
      // round-trip build→probe identically, not index the bitmap negatively
      val neg = spark.range(1000).select(xxhash64(col("id").cast("string")).as("h"))
      assert(neg.where(col("h") < 0).count() > 0) // the population really is signed
      val negWords = BloomExprs.buildBitmap(neg, "h", 1 << 16)
      assert(neg.where(!BloomExprs.mightContain(col("h"), negWords, 1 << 16)).count() == 0)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("incrementalLshCandidates equals the full run restricted to new-sided pairs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sigsAll = Dedup.minhashSignatures(docs, "doc_id", "text", n = 3, numHashes = 16)
      .localCheckpoint() // consumed by full run AND both incremental sides
    val newIds = docs.where(col("doc_id") % 5 === 0).select("doc_id")
    val full = Dedup.minhashLshCandidates(sigsAll, 16, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val isNew = newIds.collect().map(_.getLong(0)).toSet
    val expected = full.filter(p => isNew(p._1) || isNew(p._2))
    val inc = Dedup.incrementalLshCandidates(
        sigsAll.join(newIds.withColumnRenamed("doc_id", "id"), Seq("id")),
        sigsAll.join(newIds.withColumnRenamed("doc_id", "id"), Seq("id"), "left_anti"),
        16, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc == expected)        // nothing lost, nothing invented
    assert(expected.nonEmpty)      // the corpus actually has planted near-dups
    // old×old pairs never appear
    assert(inc.forall(p => isNew(p._1) || isNew(p._2)))
    // empty new batch: nothing to do, nothing emitted
    val none = Dedup.incrementalLshCandidates(
      sigsAll.where(lit(false)), sigsAll, 16, 4)
    assert(none.count() == 0)
  }

  test("normalized dedup collapses case/punctuation/spacing variants") {
    val variants = Seq(
      (1L, "Hello, World!"), (2L, "hello   world"), (3L, "HELLO-WORLD."),
      (4L, "a different document"))
      .toDF("doc_id", "text")
    val groups = Dedup.exactTextGroups(
      variants.withColumn("n", Text.normalizeForDedup(col("text"))), "doc_id", "n")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap // keep_id -> dup_count
    assert(groups == Map(1L -> 3L, 4L -> 1L))
  }

  test("components converge on a long chain (pointer jumping beats O(diameter))") {
    // a 200-node path needs ~199 one-hop rounds — the pointer-jump step
    // must collapse it within the default iteration cap
    val chain = (0L until 199L).map(i => (i, i + 1, 1.0)).toDF("id_a", "id_b", "jaccard")
    val labels = graft.operators.Components.smallestIdPropagation(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.length == 200)
    assert(labels.forall(_._2 == 0L), "every node must reach the chain head")
  }

  test("degenerate corpora (empty/short/unicode/duplicate-only) never crash the pipelines") {
    val weird = Seq(
      (1L, ""),                       // empty text
      (2L, "solo"),                   // single token, < shingle width
      (3L, "héllo wörld héllo wörld"),// non-ASCII round-trips the hashes
      (4L, "héllo wörld héllo wörld"))
      .toDF("doc_id", "text")
    // none of these may throw; shingle-less docs simply drop out
    assert(Dedup.ngramJaccardPairs(weird, "doc_id", "text", 3, 0.5, 1000).count() == 1) // 3~4
    assert(Dedup.minhashSignatures(weird, "doc_id", "text", 3, 16).count() == 2) // docs 3,4 only
    assert(Dedup.simhashSignatures(weird, "doc_id", "text").count() == 4)
    val exact = Dedup.exactTextGroups(weird, "doc_id", "text")
    assert(exact.count() == 3) // docs 3,4 share a hash group
    assert(graft.operators.Components.dedupGroups(
      Dedup.ngramJaccardPairs(weird, "doc_id", "text", 3, 0.5, 1000)).count() == 2)
    // empty pair input -> empty components, not a crash
    val noPairs = Seq.empty[(Long, Long, Double)].toDF("id_a", "id_b", "jaccard")
    assert(graft.operators.Components.dedupGroups(noPairs).count() == 0)
  }

  // ---- span-level dedup (window = 3 for hand-checkable fixtures) ----

  private val spanDocs = Seq(
    (1L, "a b c d e f g h"),        // shares "a b c d e" with doc 2
    (2L, "x y a b c d e q"),
    (3L, "p q r s t u"),            // nothing shared
    (4L, "c d e z z a b c"),        // two separate shared windows
    (5L, "m n o m n o m n o")       // WITHIN-doc repetition only
  ).toDF("doc_id", "text")

  test("duplicatedSpanRanges merges cross-doc duplicated windows into token ranges") {
    val got = Dedup.duplicatedSpanRanges(spanDocs, "doc_id", "text", window = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      (1L, 0L, 4L, 3L),   // windows 0,1,2 merge -> tokens [0,4]
      (2L, 2L, 6L, 3L),
      (4L, 0L, 2L, 1L),   // "c d e" ...
      (4L, 5L, 7L, 1L)))  // ... and "a b c" are 5 apart -> two ranges
    // doc 5's thrice-repeated window exists only within doc 5 -> not flagged
  }

  test("duplicateSpanPairs counts shared windows and the longest aligned run") {
    val got = Dedup.duplicateSpanPairs(spanDocs, "doc_id", "text", window = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    // docs 1-2 share windows at a constant offset, consecutive starts:
    // run of 3 windows = 5 tokens ("a b c d e")
    assert(got == Map(
      (1L, 2L) -> ((3L, 5L)),
      (1L, 4L) -> ((2L, 3L)),   // two isolated shared windows, run = 1
      (2L, 4L) -> ((2L, 3L))))
  }

  test("span dedup is partitioning-independent and the hot-span cap bites") {
    def ranges(df: org.apache.spark.sql.DataFrame) =
      Dedup.duplicatedSpanRanges(df, "doc_id", "text", window = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(ranges(spanDocs.repartition(7)) == ranges(spanDocs))
    // maxBucket = 2 drops the 3-occurrence spans ("a b c", "c d e"),
    // keeping only the 2-occurrence "b c d"
    val capped = Dedup.duplicatedSpanRanges(spanDocs, "doc_id", "text",
        window = 3, maxBucket = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(capped == Set((1L, 1L, 3L, 1L), (2L, 3L, 5L, 1L)))
  }

  test("cutDuplicatedSpans removes exactly the flagged ranges and keeps the rest") {
    val cut = Dedup.cutDuplicatedSpans(spanDocs, "doc_id", "text", window = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cut == Map(
      1L -> "f g h",             // tokens [0,4] cut
      2L -> "x y q",             // tokens [2,6] cut
      3L -> "p q r s t u",       // untouched (rebuild is identity here)
      4L -> "z z",               // both ranges cut
      5L -> "m n o m n o m n o")) // within-doc repetition is NOT boilerplate
    // a doc that is entirely shared boilerplate comes back empty
    val all = Seq((1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text")
    val gone = Dedup.cutDuplicatedSpans(all, "doc_id", "text", window = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(gone == Map(1L -> "", 2L -> ""))
    // the flagged windows are gone after the cut (re-running the detector
    // finds nothing on this fixture; in general a cut can juxtapose new
    // windows — callers iterating to a fixpoint re-run the pair)
    assert(Dedup.duplicatedSpanRanges(
      Dedup.cutDuplicatedSpans(spanDocs, "doc_id", "text", window = 3)
        .where(col("text") =!= ""), "doc_id", "text", window = 3).count() == 0)
  }

  test("selfRepeatedSpanRanges marks repeats after the first occurrence; cut de-stutters") {
    // doc 5 "m n o m n o m n o": every window from pos 3 on repeats an
    // earlier one -> positions 3..6 merge to tokens [3,8]; the first
    // period [0,2] is never marked. Cross-doc duplication (docs 1/2/4)
    // is NOT this operator's job.
    val got = Dedup.selfRepeatedSpanRanges(spanDocs, "doc_id", "text", window = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((5L, 3L, 8L, 4L)))
    val cut = Dedup.cutSelfRepeatedSpans(spanDocs, "doc_id", "text", window = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cut(5L) == "m n o")                 // one clean copy survives
    assert(cut(1L) == "a b c d e f g h")       // cross-doc dups untouched
    assert(cut(3L) == "p q r s t u")
    // partitioning-independence
    val re = Dedup.selfRepeatedSpanRanges(spanDocs.repartition(7), "doc_id", "text", window = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(re == got)
    // non-adjacent re-occurrence: only the LATER occurrence is cut, and
    // separated repeats yield separate ranges
    val far = Seq((9L, "a b c x y z q a b c")).toDF("doc_id", "text")
    val farRanges = Dedup.selfRepeatedSpanRanges(far, "doc_id", "text", window = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(farRanges == Set((9L, 7L, 9L, 1L)))
    assert(Dedup.cutSelfRepeatedSpans(far, "doc_id", "text", window = 3)
      .collect().map(r => r.getString(1)).head == "a b c x y z q")
  }

  test("crossSetSpanRanges flags only eval-covered train tokens; the cut removes them") {
    val train = Seq(
      (1L, "u v a b c w x"),   // "a b c" appears in eval doc 10
      (2L, "a b c a b c z"),   // two occurrences -> windows 0 and 3 merge [0,5]
      (3L, "p q r s t u")      // clean
    ).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "h i a b c j k"),  // contains train docs 1-2's "a b c"
      (11L, "p q r x y z")     // contains train doc 3's "p q r"
    ).toDF("doc_id", "text")
    val ranges = Dedup.crossSetSpanRanges(train, eval, "doc_id", "text", window = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // doc 3's "p q r" at pos 0 matches eval doc 11's "p q r" at pos 0 —
    // cross-set hits flag regardless of which eval doc or position
    assert(ranges == Set(
      (1L, 2L, 4L, 1L),
      (2L, 0L, 5L, 2L),  // overlapping windows 0 and 3 merge into one range
      (3L, 0L, 2L, 1L)))
    // within-train duplication alone must NOT flag: docs 1-2 share "a b c"
    // but with an eval set containing none of it, nothing is flagged
    val noEvalHit = Seq((20L, "m m m m")).toDF("doc_id", "text")
    assert(Dedup.crossSetSpanRanges(train, noEvalHit, "doc_id", "text", 3).count() == 0)
    // the cut removes exactly the leaked passages, keeps everything else
    val cut = Dedup.cutEvalPassages(train, eval, "doc_id", "text", window = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cut == Map(1L -> "u v w x", 2L -> "z", 3L -> "s t u"))
  }

  test("cutEvalPassagesToFixpoint clears seam leaks the single pass re-creates") {
    val train = Seq((1L, "u v q1 q2 q3 w x")).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "m q1 q2 q3 n"),  // quoted verbatim inside the train doc
      (11L, "a u v w b")      // matches only the SEAM the first cut creates
    ).toDF("doc_id", "text")
    val once = Dedup.cutEvalPassages(train, eval, "doc_id", "text", window = 3)
      .collect().map(r => r.getString(1)).head
    assert(once == "u v w x", "single pass must exhibit the seam leak")
    assert(Dedup.crossSetSpanRanges(
      Seq((1L, once)).toDF("doc_id", "text"), eval, "doc_id", "text", 3).count() > 0)
    val fixed = Dedup.cutEvalPassagesToFixpoint(train, eval, "doc_id", "text", window = 3)
      .collect().map(r => r.getString(1)).head
    assert(fixed == "x")
    assert(Dedup.crossSetSpanRanges(
      Seq((1L, fixed)).toDF("doc_id", "text"), eval, "doc_id", "text", 3).count() == 0)
  }

  test("cutDuplicatedSpansToFixpoint clears cut-seam duplicates a single pass creates") {
    // cutting "a b c" from docs 1-2 seams doc 1 into "u v w x", which NOW
    // duplicates doc 3's prefix — the single pass leaves that residue, the
    // fixpoint clears it
    val docs = Seq(
      (1L, "u v a b c w x"),
      (2L, "m n a b c o p"),
      (3L, "u v w x z1 z2")
    ).toDF("doc_id", "text")
    val once = Dedup.cutDuplicatedSpans(docs, "doc_id", "text", window = 3)
    assert(Dedup.duplicatedSpanRanges(once, "doc_id", "text", window = 3).count() > 0,
      "fixture must exhibit a seam duplicate after one pass")
    val fixed = Dedup.cutDuplicatedSpansToFixpoint(docs, "doc_id", "text", window = 3)
    assert(Dedup.duplicatedSpanRanges(
      fixed.where(col("text") =!= ""), "doc_id", "text", window = 3).count() == 0)
    val byId = fixed.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // round 1 cuts "a b c" from 1-2; round 2 cuts the seamed "u v w x"
    // from 1 and 3
    assert(byId == Map(1L -> "", 2L -> "m n o p", 3L -> "z1 z2"))
  }

  test("editDistancePairs equals the naive all-pairs levenshtein filter") {
    val names = Seq(
      1L -> "alice",   // base
      2L -> "alicia",  // dist 2 from alice — must NOT pair with 1
      3L -> "alce",    // deletion of alice
      4L -> "blice",   // substitution of alice
      5L -> "alicee",  // insertion of alice
      6L -> "alice",   // exact dup of 1 (dist 0)
      7L -> "zzzzz",   // far from everything
      8L -> ""         // empty string: pairs with nothing here but must not crash
    ).toDF("id", "name")
    val got = Dedup.editDistancePairs(names, "id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val rows = names.collect().map(r => r.getLong(0) -> r.getString(1))
    val naive = (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      d = levenshteinScala(sa, sb) if d <= 1
    } yield (ia, ib, d)).toSet
    assert(got == naive, s"got=$got naive=$naive")
    assert(naive.contains((1L, 3L, 1)) && naive.contains((1L, 6L, 0))
      && !naive.exists(p => p._1 == 1L && p._2 == 2L))
  }

  test("containmentPairs flags snippet-inside-document pairs Jaccard hides") {
    val snippet = "alpha beta gamma delta" // 2 distinct 3-shingles
    val long = snippet + " " + (1 to 30).map(i => s"w$i").mkString(" ") // 32 shingles
    val other = (1 to 20).map(i => s"x$i").mkString(" ")
    val docs = Seq((1L, snippet), (2L, long), (3L, other)).toDF("doc_id", "text")
    val rows = Dedup.containmentPairs(docs, "doc_id", "text", n = 3,
      minOverlap = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))).toMap
    // snippet's shingle set is fully inside the long doc: overlap = 1.0
    // while jaccard = 2/32 — far below any sensible near-dup threshold
    assert(rows.keySet == Set((1L, 2L)))
    val (shared, sa, sb, jac, ov) = rows((1L, 2L))
    assert(shared == 2L && sa == 2L && sb == 32L)
    assert(ov == 1.0 && jac == 2.0 / 32.0)
  }

  test("overlapPairsFromHashed jaccard agrees with jaccardPairsFromHashed") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sh = Dedup.hashedShingles(docs, "doc_id", "text", n = 3)
    val viaOverlap = Dedup.overlapPairsFromHashed(sh, minOverlap = 0.0,
        maxBucket = Int.MaxValue)
      .where(col("jaccard") >= 0.5)
      .select("id_a", "id_b", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaJaccard = Dedup.jaccardPairsFromHashed(sh, threshold = 0.5,
        maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaOverlap == viaJaccard && viaOverlap.nonEmpty)
  }

  test("dedupSweep: hand-computed census incl. zero-count thresholds") {
    // fixture pairs (3-gram jaccard): (1,4)=1.0, (1,2)=(2,4)=0.75
    val pairs = Dedup.overlapPairsFromHashed(
      Dedup.hashedShingles(docs, "doc_id", "text", 3),
      minOverlap = 0.0, maxBucket = Int.MaxValue)
    val got = Dedup.dedupSweep(pairs, Seq(0.5, 0.8, 1.0, 1.5))
      .collect().map(r => r.getDouble(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      0.5 -> ((3L, 3L)),   // all three pairs; docs {1,2,4}
      0.8 -> ((1L, 2L)),   // only the exact dup (1,4)
      1.0 -> ((1L, 2L)),
      1.5 -> ((0L, 0L)))) // zero row survives the census
  }

  test("jaccardPairsPrefix equals the full-index join at several " +
    "thresholds; the prefix index is strictly sparser") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sh = Dedup.hashedShingles(corpus, "doc_id", "text", n = 3)
    Seq(0.3, 0.5, 0.8, 1.0).foreach { t =>
      val full = Dedup.jaccardPairsFromHashed(sh, t, Int.MaxValue)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val pref = Dedup.jaccardPairsPrefix(corpus, "doc_id", "text", 3, t,
          Int.MaxValue)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      withClue(s"t=$t")(assert(pref == full))
    }
    // index sparsity: at t the prefix keeps ~ (1-t) of each set (+1 hash)
    val nFull = sh.count().toDouble
    val nDocs = corpus.count().toDouble
    val prefLen = sh.groupBy("id").count()
      .select(sum(expr("CAST(count - ceil(count * 0.8) + 1 AS BIGINT)")))
      .head.getLong(0).toDouble
    assert(prefLen < 0.3 * nFull + nDocs, s"prefix $prefLen of $nFull")
  }

  test("prefixCandidatePairsPos positional bound is exact-integer: " +
    "equality admits, one-below prunes; thresholdRational recovers intent") {
    assert(Dedup.thresholdRational(0.8) == (4L -> 5L))
    assert(Dedup.thresholdRational(0.7) == (7L -> 10L))
    assert(Dedup.thresholdRational(0.5) == (1L -> 2L))
    assert(Dedup.thresholdRational(0.123456789) == (123456789L -> 1000000000L))
    // NON-decimal doubles (2.0/3 has no 9-digit decimal form) must fall
    // back to an admit-only under-approximation: tn/td ≤ the double the
    // exact verification compares against, so the metadata filters can
    // only loosen. round(t·1e9) = 666666667/1e9 > 2/3 sat ABOVE the
    // verification threshold and pruned true boundary pairs (sizes 4 and
    // 6 sharing all 4 hashes: jaccard 4/6 ≥ the 2.0/3 double, but
    // 4·10⁹ < 666666667·6) — the round-8 regression.
    val (tn23, td23) = Dedup.thresholdRational(2.0 / 3)
    assert(tn23.toDouble / td23.toDouble <= 2.0 / 3)
    assert(4L * td23 >= tn23 * 6L)
    // t = 1/2 → bound (1+min(na−ia, nb−ib))·(1+2) ≥ 1·(na+nb).
    // Pair (1,2): na=4, nb=5, smallest shared hash 100 at (ia=2, ib=3)
    // → (1+2)·3 = 9 = na+nb — EXACT equality must be admitted (the old
    // float form only reached it through the 1e-9 epsilon).
    // Pair (1,3): na=4, nb=6, hash 100 at (ia=2, ib=4) → 9 < 10 — pruned
    // by the positional bound alone (length filter passes: 4·2 ≥ 1·6).
    def sets(rows: (Long, Seq[Long])*) =
      rows.toSeq.toDF("id", "__hs").withColumn("__sz", size(col("__hs")))
    val eq = Dedup.prefixCandidatePairsPos(
      sets(1L -> Seq(1L, 100L, 200L, 300L),
           2L -> Seq(2L, 3L, 100L, 400L, 500L)),
      0.5, Int.MaxValue).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(eq == Set(1L -> 2L))
    val below = Dedup.prefixCandidatePairsPos(
      sets(1L -> Seq(1L, 100L, 200L, 300L),
           3L -> Seq(2L, 3L, 4L, 100L, 400L, 500L)),
      0.5, Int.MaxValue).collect()
    assert(below.isEmpty)
  }

  test("jaccardPairsPrefix with a non-decimal threshold (2.0/3) keeps the " +
    "boundary pair the rounded rational used to prune") {
    // 4 word-bigram shingles vs a 6-shingle superset: jaccard = 4/6,
    // which the verification's double compare admits at threshold 2.0/3
    // (both round to the same double) — so the prefix filters must too
    val docs = Seq(1L -> "a b c d e", 2L -> "a b c d e f g")
      .toDF("doc_id", "text")
    val got = Dedup.jaccardPairsPrefix(docs, "doc_id", "text", n = 2,
        threshold = 2.0 / 3, maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set(1L -> 2L))
  }

  // ------------------------------------------------------------- winnowing

  /** Plain-Scala robust-winnowing twin: every full window of w k-gram
    * hashes (or one truncated window when a doc has fewer than w k-grams)
    * selects its (min hash, rightmost position). */
  private def winnowScala(text: String, k: Int, w: Int): Set[(Long, Long)] = {
    val toks = text.split(" ").toSeq
    val hs = toks.sliding(k).filter(_.size == k)
      .map(g => graft.functions.Hashing.stableHash60Scala(g.mkString(" "))).toArray
    if (hs.isEmpty) Set.empty
    else (0 to math.max(hs.length - w, 0)).map { p =>
      val win = p to math.min(p + w - 1, hs.length - 1)
      val q = win.minBy(i => (hs(i), -i))
      (q.toLong, hs(q))
    }.toSet
  }

  test("winnowedFingerprints matches the Scala twin, incl. tie-breaking") {
    // "a b a b …" makes alternating IDENTICAL k-grams — hash ties inside a
    // window, so the rightmost-min rule is actually exercised, not just the
    // min. Also one doc shorter than a window and one untokenizable.
    val fx = Seq(
      (1L, "a b a b a b a b a b a b"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "x y z x y z x y z x y z x y"),
      (4L, "one two three"),      // exactly one k-gram at k=3 (nk=1 < w)
      (5L, "s t"),                // shorter than k: no fingerprints
      (6L, "p q r s t u")         // nk=4 = w: exactly one full window
    ).toDF("doc_id", "text")
    val got = Dedup.winnowedFingerprints(fx, "doc_id", "text", k = 3, w = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val fxMap = Map(1L -> "a b a b a b a b a b a b",
      2L -> "the quick brown fox jumps over the lazy dog today",
      3L -> "x y z x y z x y z x y z x y",
      4L -> "one two three", 5L -> "s t", 6L -> "p q r s t u")
    for ((id, text) <- fxMap) {
      val want = winnowScala(text, 3, 4)
      assert(got.getOrElse(id, Set.empty) == want, s"doc $id")
    }
    assert(!got.contains(5L) && got(4L).size == 1)
  }

  test("winnowing guarantee: a shared passage of w+k-1 tokens is caught") {
    // k=3, w=4: any verbatim cross-doc match of >= 6 tokens must share a
    // fingerprint. The shared passage sits in unrelated contexts at
    // different offsets.
    val shared = "alpha beta gamma delta epsilon zeta"
    val fx = Seq(
      (1L, s"intro words here $shared trailing tail content"),
      (2L, s"completely other opening stretch goes on $shared"),
      (3L, "no overlap with anything else at all in this one document")
    ).toDF("doc_id", "text")
    val fp = Dedup.winnowedFingerprints(fx, "doc_id", "text", k = 3, w = 4)
    val byDoc = fp.collect().map(r => r.getLong(0) -> r.getLong(2))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty)
    assert((byDoc(1L) intersect byDoc(3L)).isEmpty)
    val pairs = Dedup.fingerprintOverlapPairs(fx, "doc_id", "text",
        k = 3, w = 4, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("winnowed fingerprints are a subset of the span-hash stream at " +
    "~2/(w+1) density, every tokenizable doc fingerprints, and the " +
    "selection is partitioning-independent") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val k = 8; val w = 4
    val fp = Dedup.winnowedFingerprints(docs, "doc_id", "text", k, w)
    val sp = Dedup.spanHashes(docs, "doc_id", "text", k)
      .select(col("id"), col("pos"), col("h"))
    // subset: every fingerprint is a real positional k-gram hash
    assert(fp.join(sp, Seq("id", "pos", "h"), "left_anti").count() == 0)
    // coverage: every doc with >= 1 k-gram selects >= 1 fingerprint
    val nDocs = docs.where(size(split(col("text"), " ")) >= k).count()
    assert(fp.select("id").distinct().count() == nDocs)
    // density: expected 2/(w+1) of windows on random hashes; generous band
    val nSpans = sp.count().toDouble
    val d = fp.count().toDouble / nSpans
    assert(d > 1.0 / (w + 1) && d < 3.5 / (w + 1), s"density $d")
    // partitioning independence
    val re = Dedup.winnowedFingerprints(
      docs.repartition(17, col("lang")), "doc_id", "text", k, w)
    assert(re.exceptAll(fp).count() == 0 && fp.exceptAll(re).count() == 0)
  }

  test("duplicatedSpanRangesSparse equals the full run when " +
    "fpK+fpW-1 <= window (the winnowing guarantee, end to end)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val full = Dedup.duplicatedSpanRanges(docs, "doc_id", "text",
        window = 20, maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val sparse = Dedup.duplicatedSpanRangesSparse(docs, "doc_id", "text",
        window = 20, fpK = 8, fpW = 4, maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(sparse == full && full.nonEmpty)
    // and the candidate restriction is REAL: fewer docs reach the exact
    // stage than exist in the corpus (the sparse pass's whole point)
    val nCand = Dedup.fingerprintOverlapPairs(docs, "doc_id", "text", 8, 4,
        minShared = 1, maxBucket = Int.MaxValue)
      .select(explode(array(col("id_a"), col("id_b")))).distinct().count()
    assert(nCand < docs.count(), s"candidates $nCand of ${docs.count()}")
    // the amortized entry point (stored fingerprint table, the production
    // shape) must return the same ranges — at w=13, the MAX-sparsity
    // setting the exactness constraint permits at k=8/window=20
    val fpStore = Dedup.winnowedFingerprints(docs, "doc_id", "text",
      k = 8, w = 13).select(col("id"), col("h")).distinct().localCheckpoint()
    val amz = Dedup.duplicatedSpanRangesSparseFromFp(fpStore, docs,
        "doc_id", "text", window = 20, maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(amz == full, "stored-fingerprint path must reproduce the full run")
  }

  private def levenshteinScala(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
