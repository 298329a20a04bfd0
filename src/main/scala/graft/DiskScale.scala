package graft

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * ON-DISK scaling probe — ScaleProbe's heavy dedup family, but with every
 * corpus written to and read back from PARQUET and AQE left on, at sizes
 * far beyond the in-memory probe's 80k ceiling. ScaleProbe answers "does
 * the operator's growth law hold?"; this answers "does it still hold when
 * the input is a real table" — scan + decode cost, files.maxPartitionBytes
 * splitting, AQE coalescing/skew handling, and (for the amortized span
 * row) a fingerprint STORE that is itself a parquet table, exactly like
 * IncrementalDedup's signature store.
 *
 * Corpora are ScaleProbe's generators (~60 words/doc; the span rows use
 * the 4%-dirty planted-pair variant, its design regime) so rows are
 * directly comparable with SCALE.md's in-memory tables — EXCEPT the
 * jaccard family, which runs on a Heaps-scaled corpus (vocab ∝ ∛n): the
 * closed 400-word vocabulary keeps 3-gram bucket occupancy ∝ n/V³, which
 * crosses 1 before 1.6M docs and turns pair expansion into an all-pairs
 * degeneracy no real growing corpus has. All operators run at the
 * production cap (maxBucket = 1000, ScaleProbe's convention).
 *
 * Usage: runMain graft.DiskScale [sizes csv, default 500000,1600000,5000000]
 *        [workdir, default /tmp/graft-diskscale]
 *        [ops csv, default all — row keys to run, e.g. lm5_score,band;
 *         corpora/artifacts are built (or reused) regardless]
 * Emits one JSON line per size; findings land in SCALE.md ("On-disk
 * scaling" table).
 */
object DiskScale {

  private def writeOnce(df: => DataFrame, spark: SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) df.write.parquet(path)
    spark.read.parquet(path)
  }

  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("500000,1600000,5000000")
      .split(",").map(_.trim.toLong)
    val workdir = args.drop(1).headOption.getOrElse("/tmp/graft-diskscale")
    val opsArg = args.drop(2).headOption.getOrElse("all")
    val wanted = opsArg.split(",").map(_.trim).filter(_.nonEmpty).toSet
    // fail fast on a typo'd row key: a silent no-op filter still builds
    // the (tens-of-minutes at 15M docs) corpus artifacts before emitting
    // an empty measurement line
    val knownOps = Set("all", "jac_capped", "jac_prefix08", "span_ranges",
      "span_sparse_w13", "winnow", "span_sparse_amz", "fuzzy_pairs",
      "quality_funnel", "lm_build", "lm_score", "lm5_build", "lm5_score",
      "band_build", "band", "band_rate", "cls_score", "cap", "cap_banded", "qtl_sketch", "qtl_exact")
    val unknown = wanted -- knownOps
    require(unknown.isEmpty,
      s"unknown DiskScale op key(s): ${unknown.toSeq.sorted.mkString(", ")}; " +
        s"known: ${knownOps.toSeq.sorted.mkString(", ")}")
    def want(key: String): Boolean = wanted("all") || wanted(key)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-diskscale")
    GraftSession.quietWindowWarnings() // harness tail: aggregated-cardinality windows only
    spark.sparkContext.setLogLevel("ERROR")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def time2(f: => Unit): Double = math.min(time(f), time(f))
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def f2(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

    noop(ScaleProbe.synthDocs(spark, 1000)) // warmup

    sizes.foreach { n =>
      // clean corpus, 4%-dirty span corpus and fuzzy-name table: parquet
      // tables, generated once per size, always READ from disk below.
      // The jaccard family runs on a HEAPS-SCALED corpus (vocab ∝ ∛n,
      // anchored at the in-memory probe's 400 words / 80k docs) so
      // 3-gram bucket occupancy stays constant across sizes — with the
      // fixed vocabulary it grows as n/V³ and crosses 1 before 1.6M
      // docs, after which pair expansion measures corpus degeneracy
      // (the 5M run spilled ~50 GB of all-pairs candidates), not the
      // operator. See ScaleProbe.synthDocs(vocab) and SCALE.md.
      val vocabH = math.max(400L, math.round(400.0 * math.cbrt(n / 80000.0)))
      val docsH = writeOnce(ScaleProbe.synthDocs(spark, n, vocabH), spark,
        s"$workdir/docsh_$n")
      // Size-derived shuffle width (round 9, VERDICT-r8 gap 1): the
      // 5M/15M bends all traced to aggregations spilling at the fixed
      // session default, so the probe now sizes the width from the
      // corpus actually ON DISK — the same rule a cluster job would
      // apply from its input listing. The AQE ceiling already adapts
      // keyed exchanges; this also moves the non-adaptive floor. A
      // manual SPARK_GRAFT_SHUFFLE_PARTITIONS pin wins (diagnosis).
      val corpusBytes = GraftSession.bytesOnDisk(spark, s"$workdir/docsh_$n")
      val width = GraftSession.sizeShuffleFor(spark, corpusBytes)
      // Per-op width hint (VERDICT r9 ask 1) — measured BOTH ways in
      // round 10 and OFF by default (SPARK_GRAFT_OP_WIDTH=on opts in for
      // diagnosis): the 4 MiB charge on the gram-count builds won at 5M
      // (lm5_build −17%, lm_build −9.5%, scoring flat) but INVERTED at
      // 15M (width 725: lm_build +97%, lm5_build +10% vs the session's
      // 182) — the 16 MiB session rule already clears the spill point
      // there and extra width is pure fan-out tax. A width rule that
      // helps at one size and hurts at 3× is not a law; the session's
      // size-derived single width stays the shipped default (SCALE.md
      // round 10).
      val opWidthOn = sys.env.get("SPARK_GRAFT_OP_WIDTH").contains("on")
      val blowW = GraftSession.blowupWidthFor(corpusBytes, cpus)
      def hinted[T](f: => T): T =
        if (opWidthOn) GraftSession.withShuffleWidth(spark, blowW)(f) else f
      System.err.println(s"[diskscale] n=$n shuffle width=$width " +
        s"gram-agg width=${if (opWidthOn) blowW.toString else "off"}")
      lazy val docs = writeOnce(ScaleProbe.synthDocs(spark, n), spark, s"$workdir/docs_$n")
      val pairId = expr("doc_id div 2")
      val block = concat_ws(" ", transform(sequence(lit(0), lit(23)),
        j => concat(lit("bp"), pmod(xxhash64(pairId, j), lit(999999)))))
      lazy val dirty = writeOnce(
        ScaleProbe.synthDocs(spark, n).withColumn("text",
          when(pairId % 25 === 0, concat(block, lit(" "), col("text")))
            .otherwise(col("text"))),
        spark, s"$workdir/dirty_$n")
      lazy val names = writeOnce(
        spark.range(n).select(col("id"),
          concat(lit("user-"), lpad(col("id").cast("string"), 9, "0")).as("name")),
        spark, s"$workdir/names_$n")

      val rows = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      // SPARK_GRAFT_TIME1=1: single-pass timing for one-off diagnosis
      // runs at sizes where min-of-2 costs more wall-clock than the
      // contention noise it removes (multi-minute rows amortize spikes)
      val onePass = sys.env.get("SPARK_GRAFT_TIME1").contains("1")
      def row(key: String)(f: => Unit): Unit =
        if (want(key)) rows(key) = if (onePass) time(f) else time2(f)

      // the q18/q117 jaccard family (capped production shape), on the
      // Heaps-scaled corpus — constant bucket occupancy isolates the
      // operator's growth from the closed-vocab degeneracy
      row("jac_capped")(noop(
        Dedup.ngramJaccardPairs(docsH, "doc_id", "text", 3, 0.5, 1000)))
      row("jac_prefix08")(noop(
        Dedup.jaccardPairsPrefix(docsH, "doc_id", "text", 3, 0.8, maxBucket = 1000)))
      // the q62/q120/q129 span family on the dirty corpus
      row("span_ranges")(noop(
        Dedup.duplicatedSpanRanges(dirty, "doc_id", "text", window = 20,
          maxBucket = 1000)))
      row("span_sparse_w13")(noop(
        Dedup.duplicatedSpanRangesSparse(dirty, "doc_id", "text", window = 20,
          fpK = 8, fpW = 13, maxBucket = 1000)))
      // winnow extraction alone (the stg row / ingest-time store build),
      // then the amortized detector against the STORED parquet fp table
      row("winnow")(noop(
        Dedup.winnowedFingerprints(dirty, "doc_id", "text", k = 8, w = 13)))
      lazy val fp = writeOnce(
        Dedup.winnowedFingerprints(dirty, "doc_id", "text", k = 8, w = 13)
          .select(col("id"), col("h")).distinct(),
        spark, s"$workdir/fp_$n")
      row("span_sparse_amz")(noop(
        Dedup.duplicatedSpanRangesSparseFromFp(fp, dirty, "doc_id", "text",
          window = 20, maxBucket = 1000)))
      // the q92 fuzzy family
      row("fuzzy_pairs")(noop(Dedup.editDistancePairs(names, "id", "name")))

      // the q133/q134/q136 quality battery: token bar + 7 Gopher rules +
      // 13 repetition screens as ONE first-failure when-chain — the row
      // measures parquet decode + the compiled NgramRepetition passes at
      // corpus scale (scan-speed by design; a non-flat growth here means
      // the per-row expressions stopped being the cost)
      val qualStages = Seq("min_tokens" ->
          (graft.functions.Text.tokenCount(col("text")) >= 20)) ++
        graft.functions.Quality.gopherStages("text") ++
        graft.functions.Quality.repetitionStages("text")
      row("quality_funnel")(noop(
        graft.operators.Cleaning.funnelReport(docs, qualStages)))

      // the q131/q132 LM fluency screen on the Heaps-scaled corpus:
      // model build (one aggregation shuffle to gram cardinality, pruned
      // by minCount like a production model) measured separately from
      // scoring — the model is the stored artifact, scoring is the
      // per-batch marginal cost. The candidate-stream lookup runs at
      // scoreTokens' default (explicit broadcast — the round-8 fix; the
      // planner's size-estimate choice was the measured 13× cliff,
      // SCALE.md).
      lazy val lmTbl = hinted(writeOnce(
        graft.operators.NgramLm.lmCounts(docsH, "text", n = 3, minCount = 5),
        spark, s"$workdir/lm_$n"))
      row("lm_build")(hinted(noop(
        graft.operators.NgramLm.lmCounts(docsH, "text", n = 3, minCount = 5))))
      lazy val totalsH = graft.operators.NgramLm.lmTotals(docsH, "text")
      row("lm_score")(noop(
        graft.operators.NgramLm.scoreTokens(docsH, lmTbl, totalsH,
          "doc_id", "text")))

      // the q143 production order: FIVE count tables and a 9-slot
      // candidate stream — 1.8× the order-3 stream per token, the widest
      // per-token fan-out in the repo. The "two shuffles at any order"
      // contract is only meaningful if this row stays linear with the
      // same broadcast-lookup law as the trigram row.
      lazy val lm5Tbl = hinted(writeOnce(
        graft.operators.NgramLm.lmCounts(docsH, "text", n = 5, minCount = 5),
        spark, s"$workdir/lm5_$n"))
      row("lm5_build")(hinted(noop(
        graft.operators.NgramLm.lmCounts(docsH, "text", n = 5, minCount = 5))))
      row("lm5_score")(noop(
        graft.operators.NgramLm.scoreTokens(docsH, lm5Tbl, totalsH,
          "doc_id", "text", n = 5)))

      // the q144 CCNet banding at scale, in its production decomposition:
      // score-file build (LM rescoring + census — the lmf staged frame)
      // measured separately from the BANDING read, which runs off the
      // STORED parquet score table (the CCNet score-file shape) and reads
      // it twice (edge census + assignment). The banding marginal must
      // stay near scan-speed — its exchanges carry histogram and
      // group-cardinality frames, never the corpus.
      if (want("band_build") || want("band") || want("band_rate")) {
        val sfBuild = graft.operators.NgramLm.scoreTokens(docsH, lmTbl, totalsH,
            "doc_id", "text")
          .groupBy("id")
          .agg(count(lit(1)).as("sn"),
            sum(when(col("matched_ord") >= 2L, 1L).otherwise(0L)).as("hi"))
          .select(col("id").as("doc_id"),
            pmod(col("id"), lit(10L)).as("src"),
            expr("(hi * 1000) div sn").as("fluency_pm"))
        row("band_build")(noop(sfBuild))
        val scoreFile = writeOnce(sfBuild, spark, s"$workdir/lmf_$n")
        lazy val banded = graft.operators.CorpusStats.bandByGroupQuantiles(
          scoreFile, "src", "fluency_pm", Seq(("p33", 1, 3), ("p66", 2, 3)),
          Seq("tail", "middle", "head"))
        row("band")(noop(banded))
        // the q148 rate draw off the stored score file: banding + the
        // per-band hash-threshold filter — must stay at banding cost
        // (the filter adds ZERO exchanges; q148's plan row ≡ q144's)
        row("band_rate")(noop(
          graft.operators.Sampling.hashSampleByGroup(banded, "band",
            "doc_id", Map("head" -> ((9, 10)), "middle" -> ((1, 2)),
              "tail" -> ((1, 10))))))
      }

      // the q138/q139 distilled classifier at corpus scale: training cost
      // is SIZE-INDEPENDENT (the 128-doc bounded sample), so the row
      // measures inference at the SHIPPED gate config (round 8:
      // stats-only — six bucketized doc-stat features per doc, a 6-row
      // explode + broadcast weight join + one doc-keyed map-side-combined
      // sum; the compiled NgramRepetition passes dominate, the same cost
      // family as the quality funnel). The distillation promise is
      // exactly that this row grows linearly while the screens it stands
      // in for stay affordable only on samples.
      lazy val pcpt = graft.operators.Classifier.trainPerceptron(
        docs.withColumn("__y", qualStages.map(_._2).reduce(_ && _)),
        "doc_id", "__y", "text", ns = Seq.empty, buckets = 4096,
        sampleN = 128, epochs = 1, withStats = true)
      row("cls_score")(noop(
        graft.operators.Classifier.scoreDocs(docs, pcpt, "doc_id", "text",
          ns = Seq.empty, buckets = 4096, withStats = true)))

      // the q140/q141 quantile tiers over doc length, 10 synthetic groups:
      // the sketch is one constant-state aggregation (scan-bound), the
      // exact histogram tier adds the (group, value) histogram + window —
      // both must stay flat-per-row for the "no corpus sort" claim to
      // mean anything at size
      lazy val lenDocs = docs.withColumn("__grp", pmod(col("doc_id"), lit(10L)))
        .withColumn("__len", length(col("text")).cast("long"))
      // the composed capstone (q127/q128's mandatory chain) end to end
      // on parquet: clean funnel → normalized exact dedup → minhash
      // near-dedup → bloom decontamination → integer LM fluency screen
      // (the gate's own 49/50 bar) → split → pack. Timed as ONE eager
      // pass (run() checkpoints stage by stage, so a second timing would
      // mostly re-measure checkpoints; one multi-minute run amortizes
      // contention). The Heaps corpus keeps near-dedup out of the
      // closed-vocab degeneracy, same as the jaccard rows; the stage
      // report prints to stderr so drops stay attributable.
      // ONE corpus/eval holdout + stage list for both capstone rows — a
      // convention change must move cap and cap_banded together or the
      // cap_banded − cap marginal stops meaning anything. The stop-word
      // rule is the per-language knob (SparkEntry localizes it to ITS
      // corpus via Text.Stopwords); the synthetic vocabulary has no
      // stopwords at all, so the rows run the other 20 screens — every
      // expression still evaluates per doc, which is what the timing
      // measures.
      lazy val capCorpus = docsH.where(col("doc_id") % 10 =!= 0)
      lazy val capEval = docsH.where(col("doc_id") % 10 === 0)
      lazy val capStages = qualStages.filterNot(_._1 == "r_stop_words")
      if (want("cap")) {
        rows("cap") = time {
          // NO gramWidth here — measured round 10 (same-day 5M A/B): the
          // pipeline's fused stage-4a build is LAZY inside one query, so
          // scoping a width forces a localCheckpoint whose model store
          // pass costs more than the non-spilling exchange win
          // (cap 736.7 → 844.3 s, +15%). The hint pays only where the
          // model materializes anyway (the standalone artifact builds
          // above, −9.5%/−17% same day).
          val (corpusOut, rep) = graft.pipeline.CorpusPipeline.run(
            capCorpus, capEval, "doc_id", "text",
            stages = capStages,
            fluencyMin = Some(49 -> 50))
          noop(corpusOut)
          System.err.println(s"[diskscale] cap@$n report: $rep")
        }
      }
      // the banded variant (stage 4a'' ON): cap_banded − cap isolates the
      // stage's marginal — a second census over the fluent pool (the
      // lm_score family's linear law at fluent-pool size) + flat banding
      // + the free rate filter. Same single-eager-pass timing as cap.
      if (want("cap_banded")) {
        rows("cap_banded") = time {
          val (corpusOut, rep) = graft.pipeline.CorpusPipeline.run(
            capCorpus, capEval, "doc_id", "text",
            stages = capStages,
            fluencyMin = Some(49 -> 50),
            bandRates = Some(Map("head" -> ((9, 10)), "middle" -> ((1, 2)),
              "tail" -> ((1, 10))))) // no gramWidth — see the cap row
          noop(corpusOut)
          System.err.println(s"[diskscale] cap_banded@$n report: $rep")
        }
      }

      row("qtl_sketch")(noop(lenDocs.groupBy("__grp").agg(
        graft.expressions.BottomKSketchAgg.sampleByHash(
          graft.functions.Hashing.stableHash60(col("doc_id").cast("string")),
          col("__len"), 256).as("smp"))))
      row("qtl_exact")(noop(
        graft.operators.CorpusStats.exactQuantilesByGroup(lenDocs, "__grp",
          "__len", Seq(("p50", 1, 2), ("p90", 9, 10)))))

      println((Seq(s""""n":$n""", s""""jac_vocab":$vocabH""",
        s""""width":$width""",
        s""""op_width":${if (opWidthOn) blowW else 0}""") ++
        rows.map { case (k, v) => s""""$k":${f2(v)}""" })
        .mkString("{", ",", "}"))
    }
    spark.stop()
  }
}
