package graft

/**
 * Enforced plan-shape invariants (the executable form of PLANS.md): a
 * regression that adds a cartesian product, drops a broadcast, loses the
 * rank-limit pushdown, or puts an exchange into a narrow pipeline fails
 * here instead of waiting for a human to re-read the plan audit.
 */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("no gate query ever plans a CartesianProduct") {
    // limitation: localCheckpoint-based queries (q36) truncate lineage, so
    // only their post-checkpoint plan is visible here — their per-round
    // join shapes are pinned by their own operator specs instead
    SparkEntry.queries.keys.toSeq.sorted.foreach { q =>
      withClue(q)(assert(!plan(q).contains("CartesianProduct")))
    }
  }

  test("narrow pipelines plan zero exchanges") {
    Seq("q11_weather_enrichment", "q12_alert_filter", "q14_doc_token_stats",
      "q15_doc_quality_langid", "q17_doc_fingerprint", "q27_media_metadata",
      "q28_frame_sample", "q29_media_features", "q34_rp_lsh_signatures",
      "q133_gopher_flags", "q134_repetition_screens",
      "q135_subword_encode").foreach { q =>
      withClue(q)(assert(!plan(q).contains("Exchange hashpartitioning")))
    }
  }

  test("winnowing plans ZERO exchanges: the selection is a per-document " +
    "compiled pass (round 12), so the corpus never shuffles to fingerprint") {
    SparkEntry.releaseStaged(spark) // q107 reads the staged fingerprint frame
    val p = plan("q107_winnow_fingerprints")
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("graft_winnowed_fingerprints"), p)
  }

  test("FIM transform is a zero-exchange scan-speed projection") {
    assert(!plan("q109_fim").contains("Exchange hashpartitioning"))
  }

  test("classifier inference broadcasts the model — the corpus side never " +
    "shuffles into the weight join (q138)") {
    val p = plan("q138_classifier_scores")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("classifier census: ONE scan, zero joins, zero explodes — the score " +
    "is a literal-map fold so the battery never re-evaluates per shingle " +
    "(q139)") {
    val p = plan("q139_classifier_census")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, p)
    assert(!p.contains("Generate"), p)
    assert(!p.contains("Join"), p)
  }

  test("bottom-k quantile sketch aggregates in one exchange and never sorts " +
    "the corpus (q140)") {
    val p = plan("q140_sketch_quantiles")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, p)
    assert(!p.contains("Sort "), p)
  }

  test("exact quantiles cumulate a histogram — two keyed exchanges, never a " +
    "global range sort of the corpus (q141)") {
    val p = plan("q141_exact_quantiles")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 2, p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("CCNet banding: edges broadcast back onto the score table — no range " +
    "sort, no sort-merge join of the corpus (q144)") {
    val p = plan("q144_fluency_bands")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("per-source banded capstone: the doc-cardinality id joins hash, " +
    "never sort, and banding adds no range partitioning (q150)") {
    val p = plan("q150_capstone_banded_by_source")
    // the source re-attach and the census-to-group join are both
    // corpus×corpus on doc id: shuffle-hash on the narrow side — a sort
    // of two corpus-sized frames is the plan this pin forbids
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("dimension joins broadcast (no sort-merge join on the dim side)") {
    val p = plan("q02_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("top-k queries keep the WindowGroupLimit rank pushdown") {
    Seq("q04_latest_event_per_user", "q22_knn_bruteforce", "q26_current_weather_status",
      "q30_top_events_per_user").foreach { q =>
      withClue(q)(assert(plan(q).contains("WindowGroupLimit")))
    }
  }

  test("near-dup pipelines never nested-loop over the corpus") {
    // the only sanctioned BNLJ is the broadcast query/centroid scoring in
    // the similarity queries; the text near-dup paths must have none
    Seq("q18_ngram_jaccard_pairs", "q39_minhash_neardup_pairs",
      "q40_simhash_neardup_pairs", "q41_ngram_jaccard_capped",
      "q52_contamination", "q61_split_leakage").foreach { q =>
      withClue(q)(assert(!plan(q).contains("BroadcastNestedLoopJoin")))
    }
  }

  test("split-leakage labeling adds zero exchanges over the pair pipeline") {
    def exchanges(p: String) = p.linesIterator.count(_.contains("Exchange "))
    assert(exchanges(plan("q61_split_leakage")) ==
      exchanges(plan("q39_minhash_neardup_pairs")))
  }

  test("redaction, chunking and quantization stay zero-shuffle projections") {
    Seq("q53_pii_redaction", "q54_doc_chunks").foreach { q =>
      withClue(q)(assert(!plan(q).contains("Exchange hashpartitioning")))
    }
    // q58 reduces the quantized array inside the row — the only exchange
    // is none at all (narrow scan → project)
    withClue("q58_embedding_quantize")(
      assert(!plan("q58_embedding_quantize").contains("Exchange hashpartitioning")))
  }

  test("quantile binning broadcasts the one-row bounds frame, never sorts globally") {
    val p = plan("q55_value_deciles")
    assert(p.contains("BroadcastExchange"))
    // the W1 anti-pattern this operator exists to avoid: a global-sort
    // ntile window over the raw event stream. (A SinglePartition exchange
    // DOES legitimately appear — under the percentile aggregate, carrying
    // one partial state per partition, not raw rows.)
    // (substring chosen to not match "perce-ntile(" in the aggregate)
    assert(!p.contains("Window [ntile") && !p.contains(" ntile("))
    assert(!p.contains("Sort [value"))
  }

  test("mixture sampling and OOV keep their map-side prunes") {
    withClue("q56_source_mixture")(
      assert(plan("q56_source_mixture").contains("WindowGroupLimit")))
    withClue("q57_oov_rate")(
      assert(plan("q57_oov_rate").contains("BroadcastHashJoin")))
  }

  test("span-range dedup is join-free: bucket expansion, never a self-join") {
    // q62 reads the staged ranges frame; a MATERIALIZED cache prints its
    // lineage differently, so pin the freshly-staged shape
    SparkEntry.releaseStaged(spark)
    val p = plan("q62_dup_span_ranges")
    assert(!p.contains("Join"), "span ranges must come from the single-pass " +
      "posting-list expansion, not a join of two span streams")
    // exactly two hash exchanges: the span-hash groupBy and the per-doc
    // interval-merge window; the final (id, grp) aggregation rides the
    // window's id partitioning
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 2)
  }

  test("temperature mixture: rank pushdown bounded by totalOut, quotas broadcast") {
    val p = plan("q72_temperature_mixture")
    assert(p.contains("WindowGroupLimit"),
      "the constant totalOut bound must keep the rank limit map-side pushable")
    assert(p.contains("BroadcastHashJoin"),
      "the computed quota frame is group-cardinality and must broadcast")
    assert(!p.contains("SortMergeJoin"))
  }

  test("semantic screen: train corpus never shuffles; eval rides one broadcast") {
    val p = plan("q84_semantic_screen")
    // the only exchanges are the eval collapse (single-partition, bounded
    // by maxEval) and its broadcast — zero hash exchanges anywhere
    assert(!p.contains("Exchange hashpartitioning"))
    assert(p.contains("BroadcastNestedLoopJoin"))
  }

  test("span cut: the corpus never self-joins; intervals broadcast back") {
    SparkEntry.releaseStaged(spark) // same cache-state pin as the q62 test
    val p = plan("q73_span_cut_docs")
    assert(p.contains("BroadcastHashJoin"),
      "the merged per-doc intervals are range-cardinality and must broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoopJoin"))
    // q62's two exchanges (inside the staged ranges frame's cached lineage)
    // plus ONE range-cardinality regroup of the staged table — the cache
    // boundary drops the window's partitioning attribution, and re-grouping
    // post-merge intervals is interval-count-sized, not corpus-sized
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 3)
  }

  test("pack segments add zero exchanges over the pack layout") {
    def exchanges(p: String) = p.linesIterator.count(_.contains("Exchange "))
    assert(exchanges(plan("q74_pack_segments")) ==
      exchanges(plan("q50_sequence_packing")),
      "the per-sequence explode is a narrow generator over q50's window")
  }

  test("PQ encode is a zero-shuffle scan-speed pass (codebook one-row broadcast)") {
    val p = plan("q85_pq_codes")
    // the only exchanges are the codebook collapse (single-partition over
    // m·k codeword rows) and its broadcast — the corpus never shuffles
    assert(!p.contains("Exchange hashpartitioning"))
    assert(p.contains("BroadcastNestedLoopJoin"), "one-row codebook build side")
  }

  test("IVF-PQ: index build never shuffles the corpus; search keeps rank pushdown") {
    val em = SparkEntry.queries("q87_ivfpq_topk")(spark, sf)
    val p = em.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), "per-query top-k must push down")
    // the hash exchanges are the query-side assignToCentroids aggregation
    // and the top-k window — both query-cardinality; the index scan side
    // reaches the probe join without a single corpus shuffle
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 2,
      "corpus/index side must stay shuffle-free before the probe join")
  }

  test("hard negatives: labels ride the assignment — no corpus re-join, rank pushed") {
    val p = plan("q88_hard_negatives")
    assert(p.contains("WindowGroupLimit"), "per-anchor top-k must push down")
    assert(!p.contains("BroadcastNestedLoopJoin") ||
      p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 2,
      "only the one-row centroid-array broadcasts may BNLJ")
    // one bucket equi-join: anchors × corpus on centroid_id — the two hash
    // exchanges it needs, plus the top-k window
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 3)
  }

  test("re-rank: the float table reaches the candidate join by broadcast — " +
    "never a sort-merge, never a corpus shuffle") {
    Seq("q122_adc_rerank", "q123_ivfpq_rerank").foreach { q =>
      val p = plan(q)
      withClue(q) {
        assert(p.contains("WindowGroupLimit"), "final top-k must push down")
        assert(!p.contains("SortMergeJoin"),
          "candidate and query frames are the bounded sides — they broadcast")
        // every hash exchange in the plan is pair/query-cardinality (the
        // ADC top-C window, the re-rank top-k window, the candidate-side
        // aggregations); the corpus float scan feeds a BroadcastHashJoin
        assert(p.contains("BroadcastHashJoin"),
          "candidate ids must broadcast into the float scan")
      }
    }
  }

  test("grouping sets run as ONE Expand + one aggregation, never a re-scan union") {
    Seq("q118_rollup_census", "q121_cube_census", "q124_grouping_sets").foreach { q =>
      val p = plan(q)
      withClue(q) {
        assert(p.linesIterator.count(_.trim.startsWith("+- Expand")) +
          p.linesIterator.count(_.trim.startsWith("Expand")) >= 1, "Expand node expected")
        assert(!p.contains("Union"), "grouping sets must not re-scan per set")
        assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
          "one aggregation exchange whatever the set list")
      }
    }
  }

  test("LM scoring (broadcast path): per-slot probes of ONE broadcast model — " +
    "the token stream never explodes, never re-groups, and the only keyed " +
    "exchange is the count-table build itself, at EVERY order (the model " +
    "order adds BroadcastHashJoins that reuse one exchange, never a shuffle)") {
    Seq("q131_lm_token_scores" -> 3, "q143_lm5_token_scores" -> 5).foreach {
      case (q, n) =>
        // assert on the FINAL adaptive plan after collect(): exchange
        // reuse is an AQE runtime substitution invisible in the initial
        // plan (and a noop write plans a SEPARATE QueryExecution, so it
        // would leave df's own plan unfinalized)
        val df = SparkEntry.queries(q)(spark, sf)
        df.collect()
        // a finalized AdaptiveSparkPlan prints "== Final Plan ==" AND
        // "== Initial Plan ==" — count nodes in the final section only
        val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
        withClue(q) {
          assert(p.contains("BroadcastHashJoin"),
            "the vocabulary-cardinality count table must broadcast")
          assert(!p.contains("SortMergeJoin"),
            "a sort-merge lookup would shuffle the token stream by gram text")
          assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 0,
            "the corpus never shuffles in the scorer — the r11 per-slot-" +
              "probe shape removed the (doc,pos) re-group, and the model " +
              "build runs as the checkpoint's own job")
          // 2n−1 slot probes share ONE broadcast BUILD of the model: one
          // BroadcastExchange materializes, the other 2n−2 are runtime
          // reuses (a persisted model child would defeat the reuse rule —
          // the reason scoreTokens checkpoints its model projection)
          val builds = p.linesIterator.count(l =>
            l.contains("BroadcastExchange HashedRelationBroadcastMode") &&
              !l.contains("ReusedExchange"))
          assert(builds == 1, s"one model broadcast build expected, got $builds")
          assert(p.linesIterator.count(_.contains("ReusedExchange")) == 2 * n - 2,
            "every further slot probe must reuse the model broadcast")
          // the corpus total is the sanctioned one-row broadcast, not a shuffle
          assert(p.linesIterator.count(_.contains("Exchange SinglePartition")) <= 1)
        }
    }
  }

  test("DSIR: feature table is one map-side aggregation; affinity broadcasts it") {
    val p89 = plan("q89_feature_table")
    assert(p89.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      "bucket-bounded aggregation must be the only exchange")
    val p90 = plan("q90_target_affinity")
    assert(p90.contains("BroadcastHashJoin"),
      "the buckets-row feature table must broadcast into the feature stream")
    assert(!p90.contains("SortMergeJoin") && !p90.contains("BroadcastNestedLoopJoin"))
    assert(p90.linesIterator.count(_.contains("Exchange hashpartitioning")) == 2,
      "table build + per-doc regroup are the only exchanges")
  }
}
