package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * N-gram language model with Stupid Backoff scoring — the CCNet-style
 * perplexity screen (Wenzek et al. 2020 filter corpora by KenLM
 * perplexity; Brants et al. 2007 show Stupid Backoff matches Kneser-Ney
 * at corpus scale while staying embarrassingly parallel — counts only,
 * no normalized discounting pass). The reference has no LM modality;
 * this is the training-data extension surface (SURVEY §2 extensions):
 * a fluency screen catches machine-garbled text, OCR noise and token
 * salad that the length/punctuation heuristics (`Text.docQualityScore`)
 * and the bigram-novelty proxy (q70) cannot separate from merely
 * unusual-but-fluent text.
 *
 * Determinism contract (the repo-wide oracle rule): everything up to
 * and including the per-token score FRACTION is exact integer
 * arithmetic — `matched order`, `backoff count`, and the score's
 * numerator/denominator counts are plain BIGINTs, so the token-grain
 * frame is engine- and partitioning-independent and hash-gateable.
 * Only the final per-document log-sum (a float) is engine-local; like
 * tf-idf's log and PMI's log it is a monotone-per-token transform, and
 * it is spec-pinned against a plain-Scala twin rather than oracle-gated.
 *
 * Scale shape (the 100 TB contract):
 *  - [[lmCounts]] is one hash aggregation per order with map-side
 *    combine over the positional n-gram stream (~n× the token stream in,
 *    vocabulary-sized out) — the classic distributed-LM count job
 *    (Brants §4 runs exactly this as MapReduce).
 *  - [[scoreTokens]] is ONE equi-join of the (2n−1)-slot candidate
 *    stream (2n−1 rows per token: for each order k = n..2 the gram and
 *    its backoff context, plus the unigram) against the count table,
 *    plus one (doc, pos) re-group — two shuffles total at ANY model
 *    order (the slot count scales the stream width linearly, never the
 *    exchange count; a per-order join chain would pay n joins). The
 *    count table shuffles at aggregated (vocabulary) cardinality at
 *    build time; at scoring time the pruned model broadcasts
 *    EXPLICITLY (`modelJoin` default — the planner's size-estimate
 *    choice is a measured 13× cliff at 5M docs, SCALE.md round 8).
 *  - Nothing is quadratic, nothing collects: the corpus total rides a
 *    one-row broadcast; per-doc reductions are keyed aggregations.
 */
object NgramLm {

  private def toks(textCol: String): Column = split(col(textCol), " ")

  /**
   * ONE checkpointed model artifact per distinct (session, model plan) —
   * round 12. [[scoreTokens]]' broadcast path previously
   * `localCheckpoint`-ed its (gram, c) projection on EVERY call, so each
   * bench pass / capstone phase / streaming micro-batch re-ran the model
   * job and left another set of never-released executor-pinned checkpoint
   * blocks behind (VERDICT r11: the growing block population was the
   * prime suspect for the 32-core anti-scaling cluster). Keyed by the
   * CANONICALIZED analyzed plan, so a structurally identical model built
   * fresh per call (the q149/q150 shape: `lmCounts` over the memoized
   * capstone pool) still hits; distinct corpora/orders/prunings get
   * distinct entries. Entries of stopped sessions are evicted on every
   * access; `SparkEntry.releaseStaged` clears the live session's
   * explicitly. Memoizing changes no values: the checkpoint is a
   * materialization of a deterministic projection.
   */
  private val modelMemo = scala.collection.concurrent.TrieMap.empty[
    (org.apache.spark.sql.SparkSession,
     org.apache.spark.sql.catalyst.plans.logical.LogicalPlan), DataFrame]
  private def checkpointedModel(lm: DataFrame): DataFrame = {
    val sel = lm.select(col("gram"), col("c"))
    modelMemo.keys.filter(_._1.sparkContext.isStopped).foreach(modelMemo.remove)
    modelMemo.getOrElseUpdate(
      (sel.sparkSession, sel.queryExecution.analyzed.canonicalized),
      sel.localCheckpoint())
  }
  /** Drop this session's cached model checkpoints (the blocks age out with
    * the RDDs once unreferenced — ContextCleaner reclaims them). */
  def clearModelCache(s: org.apache.spark.sql.SparkSession): Unit =
    modelMemo.keys.filter(_._1 == s).foreach(modelMemo.remove)

  /**
   * Count tables for all orders 1..n in one frame: (ord, gram, c).
   * Positional n-grams WITH multiplicity (`Text.shingles` semantics);
   * grams of different orders cannot collide (an order-k gram has
   * exactly k−1 spaces and tokens are space-free by construction).
   * `minCount` prunes the long tail for a broadcastable model; pruning
   * is order-consistent (c(prefix) ≥ c(gram), so a surviving gram's
   * backoff context always survives too — the scorer never sees a
   * numerator without its denominator).
   */
  def lmCounts(docs: DataFrame, textCol: String, n: Int = 3,
               minCount: Long = 1L): DataFrame = {
    require(n >= 1, "order must be >= 1")
    // ONE corpus scan for all orders (round 11; guide §2.3 "project
    // early / fewer passes"): each order's positional gram array is
    // tagged with its order in-row and the n arrays concatenate before
    // a single explode. The previous shape unioned n separate
    // scan+explode branches — n reads of the text column building the
    // same (ord, gram) stream this builds in one.
    val tagged = (1 to n).map { k =>
      transform(graft.functions.Text.shingles(col(textCol), k),
        g => struct(lit(k).as("ord"), g.as("gram")))
    }
    docs.select(explode(flatten(array(tagged: _*))).as("og"))
      .select(col("og.ord").as("ord"), col("og.gram").as("gram"))
      .groupBy("ord", "gram").agg(count(lit(1)).as("c"))
      .where(col("c") >= minCount)
  }

  /** One-row corpus totals frame: total token count (the unigram
    * denominator). */
  def lmTotals(docs: DataFrame, textCol: String): DataFrame =
    docs.agg(sum(size(toks(textCol)).cast("long")).as("n_tokens"))

  /**
   * Token-grain Stupid Backoff lookup — the exact-integer core of the
   * scorer. One row per corpus token position:
   * (id, pos, matched_ord, backoffs, c_num, c_den).
   *
   * Semantics: position `pos` (0-based) is scored at the highest order
   * its context allows, `avail = min(n, pos+1)`; the matched order is
   * the largest k ≤ avail with c(gram_k) > 0 in the (possibly pruned)
   * table; `backoffs = avail − matched_ord` (so leading tokens pay no
   * artificial penalty for having a short context — the Brants chain
   * S(w|short ctx) starts at the order the context supports). The score
   * fraction is c(gram_k)/c(context_k) for k ≥ 2 and c(w)/N for k = 1;
   * a token absent from the table entirely (OOV under pruning, or a
   * never-seen token when scoring a held-out document) takes the
   * deterministic floor 1/N with matched_ord = 0 and
   * backoffs = avail − 1 (the unigram step's penalty — there is no
   * lower order left to charge for).
   *
   * The per-token SCORE is then α^backoffs · c_num/c_den (see
   * [[docLogProb]]); everything in THIS frame is a BIGINT.
   *
   * `modelJoin` pins the lookup-join strategy — the round-8 on-disk
   * probe caught the planner's default as a scale cliff: at 5M docs the
   * pruned model (2.5M grams, 15 MB parquet) sits just past the 10 MB
   * autoBroadcast threshold, so the planner elected a sort-merge join
   * that SORTS the (2n−1)×token candidate stream BY GRAM TEXT — 700 s
   * vs 53 s at 1.6M (13× for a 3.1× size step; SCALE.md). A pruned LM
   * is a model ARTIFACT orders of magnitude smaller than the corpus it
   * scores (the lmCounts contract), so the default is an explicit
   * `broadcast` — the KenLM shape: ship the model, never move the
   * corpus. For model-∝-corpus analytics (self-scoring at minCount=1)
   * pass `shuffle_hash`: both sides shuffle by gram but NOTHING SORTS;
   * `auto` restores the planner's size-estimate choice.
   *
   * PLAN SHAPE by strategy (round 11): under `broadcast` the lookup is
   * 2n−1 consecutive BroadcastHashJoins — one per slot, all probing the
   * SAME broadcast relation (one BroadcastExchange + 2n−2
   * ReusedExchange) — so the token stream never explodes and never
   * re-groups: the corpus flows through the scorer with ZERO keyed
   * exchanges (guide §2.4 — the (doc,pos) re-group existed only to fold
   * the exploded slot stream back to token grain, and per-slot probes
   * of a broadcast table need no fold). Downstream per-doc reductions
   * (census, fluency) then start from token-grain rows and map-side
   * combine straight to doc cardinality — one doc-cardinality exchange
   * where the exploded shape paid a token-cardinality one first.
   * `shuffle_hash`/`auto` keep the exploded single-join + pivot shape:
   * per-slot joins against a corpus-sized model would shuffle the token
   * stream once PER SLOT, which is exactly backwards there.
   *
   * Contract notes (ADVICE r11): under `broadcast` the first call per
   * distinct model EAGERLY runs the model computation (the checkpoint
   * materializes it; subsequent calls on the same session reuse the
   * artifact) — callers that build but never execute the scoring plan
   * still pay the model build once. `localCheckpoint` blocks are
   * executor-local and unrecoverable on executor loss; a long-running
   * cluster deployment that must survive executor churn should persist
   * the model to reliable storage and pass the read-back frame instead.
   * `lm` must have UNIQUE gram keys (the [[lmCounts]] contract): the
   * per-slot left joins would multiply token rows on duplicate grams,
   * where the exploded pivot shape collapsed them via max().
   */
  def scoreTokens(docs: DataFrame, lm: DataFrame, totals: DataFrame,
                  idCol: String, textCol: String, n: Int = 3,
                  modelJoin: String = "broadcast"): DataFrame = {
    require(n >= 1, "order must be >= 1")
    require(Set("broadcast", "shuffle_hash", "auto")(modelJoin),
      s"modelJoin must be broadcast|shuffle_hash|auto, got $modelJoin")
    val withToks = docs.select(col(idCol).as("id"), toks(textCol).as("tk"))
    // one row per token position, carrying the candidate grams for every
    // slot of the backoff chain — 2n−1 slots built FROM the order: for
    // each k = n..2 the order-k gram g<k> ending at pos and its backoff
    // context b<k−1> (the k−1 tokens preceding pos — a different string
    // than g<k−1>, which ENDS at pos); plus the unigram, whose
    // denominator is the corpus total rather than a slot. slice() is
    // 1-based, pos is 0-based; positions with too little context yield
    // null grams (a null key matches nothing in either lookup shape —
    // the slot simply resolves to a null count).
    val tk = col("tk")
    def gram(from: Int, len: Int): Column = // from = offset back from pos
      when(col("pos") >= from, concat_ws(" ", slice(tk, col("pos") - from + 1, lit(len))))
    // slot name → candidate gram, in backoff-chain order; the looked-up
    // count lands in a column of the slot's name (c<k> for grams, b<k−1>
    // for backoff contexts) whichever lookup shape runs below
    val slotDefs: Seq[(String, Column)] = (n to 2 by -1).flatMap { k =>
      Seq(s"c$k" -> gram(k - 1, k), s"b${k - 1}" -> gram(k - 1, k - 1))
    } :+ ("c1" -> col("w"))
    val looked = modelJoin match {
      case "broadcast" =>
        // per-slot probes of the one broadcast model — no explode, no
        // re-group; each left join resolves one slot column in place.
        // Every probe broadcasts the IDENTICAL projection of `lm` (alias
        // it per-slot and the subplans canonicalize differently, so the
        // ReuseExchange rule builds the model 2n−1 times instead of once
        // — measured while pinning the plan shape); the slot's name is
        // applied to the looked-up count AFTER the join instead. The
        // projection is localCheckpoint-ed first: a PERSISTED model
        // defeats AQE's broadcast-exchange reuse (Spark 4.1's per-join
        // TableCacheQueryStage instances don't canonicalize equal —
        // measured: 2n−1 separate broadcast builds, i.e. 2n−1× model
        // memory on every executor), while a checkpointed child reuses
        // (1 build + 2n−2 ReusedExchange, plan-pinned). It also bounds
        // an UNcached caller to exactly one model computation whatever
        // the reuse rule decides. The model is a pruned vocabulary-
        // cardinality artifact by the lmCounts contract, so the copy is
        // cheap at any corpus size.
        val base = withToks
          .select(col("id"), posexplode(tk).as(Seq("pos", "w")), tk)
          .select(col("id") +: col("pos") +:
            slotDefs.map { case (nm, g) => g.as(s"__g_$nm") }: _*)
        val lmSel = checkpointedModel(lm)
        slotDefs.foldLeft(base) { case (df, (nm, _)) =>
          df.join(broadcast(lmSel), df(s"__g_$nm") === lmSel("gram"), "left")
            .drop("gram").withColumnRenamed("c", nm).drop(s"__g_$nm")
        }
      case _ =>
        val slots = slotDefs.map { case (nm, g) =>
          struct(lit(nm).as("slot"), g.as("gram"))
        }
        val cand = withToks
          .select(col("id"), tk, posexplode(tk).as(Seq("pos", "w")))
          .select(col("id"), col("pos"), array(slots: _*).as("cands"))
          .select(col("id"), col("pos"), explode(col("cands")).as("cd"))
          .select(col("id"), col("pos"), col("cd.slot").as("slot"), col("cd.gram").as("gram"))
          .where(col("gram").isNotNull)
        def slotMax(s: String) = max(when(col("slot") === s, col("c")))
        val pivots = slotDefs.map { case (nm, _) => slotMax(nm).as(nm) }
        val lmSide =
          if (modelJoin == "shuffle_hash") lm.select(col("gram"), col("c")).hint("shuffle_hash")
          else lm.select(col("gram"), col("c"))
        cand
          .join(lmSide, Seq("gram"), "left")
          .groupBy("id", "pos")
          .agg(pivots.head, pivots.tail: _*)
    }
    val avail = least(lit(n).cast("long"), col("pos") + 1L)
    // first matched order from n down; a matched g<k> (k ≥ 2) always has
    // a non-null b<k−1> by the count-table pruning consistency
    // (c(context) ≥ c(gram) — see lmCounts)
    val ordChain = (n to 1 by -1).map(k =>
      when(col(s"c$k").isNotNull, lit(k.toLong)))
    val matchedOrd = coalesce(ordChain :+ lit(0L): _*)
    val denChain = (n to 2 by -1).map(k =>
      when(col(s"c$k").isNotNull, col(s"b${k - 1}")))
    looked.crossJoin(broadcast(totals))
      .select(col("id"), col("pos").cast("long").as("pos"),
        matchedOrd.as("matched_ord"),
        (avail - coalesce(ordChain :+ lit(1L): _*)).as("backoffs"),
        coalesce((n to 1 by -1).map(k => col(s"c$k")) :+ lit(1L): _*).as("c_num"),
        coalesce(denChain :+ col("n_tokens"): _*).as("c_den"))
  }

  /**
   * Per-document backoff census — the integer filter-grain artifact: how
   * much of each document the LM actually recognizes at each order (one
   * `o<k>` column per order k = n..1, plus the OOV floor). A document
   * whose mass sits at matched_ord ≤ 1 is token salad to this model
   * regardless of its float score. `n` must be the order [[scoreTokens]]
   * scored with — a census narrower than the model silently misfiles
   * high-order mass, so tokens above order `n` fail loudly in-plan.
   */
  def backoffCensus(scored: DataFrame, n: Int = 3): DataFrame = {
    require(n >= 1, "order must be >= 1")
    val orderCols = (n to 1 by -1).map { k =>
      sum(when(col("matched_ord") === k.toLong, 1L).otherwise(0L)).as(s"o$k")
    }
    // the loud-contract oov column: a matched_ord above the census order
    // raises in-plan instead of silently vanishing from every o<k> bucket
    val oov = sum(when(col("matched_ord") > n.toLong,
        raise_error(concat(lit(s"backoffCensus(n=$n): matched_ord "),
          col("matched_ord").cast("string"),
          lit(" above the census order — pass the model order"))).cast("long"))
      .when(col("matched_ord") === 0L, 1L).otherwise(0L)).as("oov")
    scored.groupBy("id")
      .agg(count(lit(1)).as("scored_tokens"),
        orderCols ++ Seq(oov, sum(col("backoffs")).as("total_backoffs")): _*)
  }

  /**
   * CCNet §4.3 banded-sampling admission — the full recipe as ONE
   * decision rule: per-doc integer fluency permille
   * ⌊1000·(order-≥2 matched tokens)/scored⌋ over [[backoffCensus]],
   * per-group tercile banding by exact histogram edges
   * ([[CorpusStats.bandByGroupQuantiles]] — value-vs-edge, ties share a
   * band), and the per-band hash-RATE draw
   * ([[Sampling.hashSampleByGroup]] — a stateless fraction, the form
   * that scales; rank quotas are for bounded mixes). `groupCol` names a
   * language/source column of `docs`, or None for one global band set
   * (the single-language case). Returns the admitted
   * (idCol, fluency_pm, band) rows; a doc the model scores zero tokens
   * for has no census row and is dropped (the
   * [[fluencyThresholdFilter]] convention). One implementation shared
   * by the CorpusPipeline stage 4a'' and the q149 gate, so the stage
   * and the gate can never band or draw differently. Scale shape: the
   * census is the two-shuffle scorer, the edges broadcast back at group
   * cardinality, and the rate test adds zero exchanges. With a
   * `groupCol` the admitted rows carry the group column too (the
   * per-language audit needs to know WHICH band set admitted a doc).
   */
  def bandRateAdmission(docs: DataFrame, lm: DataFrame, totals: DataFrame,
                        idCol: String, textCol: String,
                        rates: Map[String, (Int, Int)],
                        groupCol: Option[String] = None,
                        n: Int = 3, seed: Long = 0L): DataFrame = {
    val admitted = bandRateFromScores(
      fluencyPermille(docs, lm, totals, idCol, textCol, groupCol, n),
      rates, seed)
    admitted.select(Seq(col("id").as(idCol)) ++
      groupCol.map(g => col("__bandgrp").as(g)).toSeq ++
      Seq(col("fluency_pm"), col("band")): _*)
  }

  /**
   * The CCNet SCORE FILE — the per-doc integer fluency permille
   * (id, __bandgrp, fluency_pm) that [[bandRateAdmission]] bands on.
   * Split out (round 11) so the STAGED deployment shape can persist
   * exactly this frame between jobs ("CCNet ships score files", Wenzek
   * 2020 §4.3: LM scoring runs once, banding/admission read the stored
   * scores): parquet round-trips the two longs and the group string
   * bit-exactly, so a staged run's admission equals the fused stage's —
   * one implementation of the scoring grain for the fused stage, the
   * staged job, and the q149/q150 gates. `__bandgrp` is the banding
   * group (`groupCol`, or the literal "all" for one global band set).
   */
  def fluencyPermille(docs: DataFrame, lm: DataFrame, totals: DataFrame,
                      idCol: String, textCol: String,
                      groupCol: Option[String] = None,
                      n: Int = 3): DataFrame = {
    require(n >= 2, s"the order->=2 matched-mass permille needs n >= 2, got $n")
    val hiMass = (n to 2 by -1).map(k => s"o$k").mkString(" + ")
    val pm = backoffCensus(scoreTokens(docs, lm, totals, idCol, textCol, n), n)
      .select(col("id"),
        // exact integer floor (`div` on non-negative longs)
        expr(s"(($hiMass) * 1000) div scored_tokens").as("fluency_pm"))
    groupCol match {
      // shuffle_hash on the narrow (id, group) side: both sides are
      // doc-cardinality so a broadcast is wrong, but sorting two
      // corpus-sized frames for a sort-merge is a worse trade than
      // hashing the two-column build side (the q92 fetch-join rule)
      case Some(g) => pm.join(
        docs.select(col(idCol).as("id"), col(g).as("__bandgrp"))
          .hint("shuffle_hash"), Seq("id"))
      case None => pm.withColumn("__bandgrp", lit("all"))
    }
  }

  /**
   * Banding + admission off a (possibly persisted) score file — the READ
   * side of [[bandRateAdmission]]: per-group tercile edges by exact
   * histogram, then the stateless per-band hash-rate draw. `scores`
   * carries (id, __bandgrp, fluency_pm) — [[fluencyPermille]]'s frame,
   * live or read back from parquet; the decision is a pure function of
   * the score rows, so fused and staged runs can never band or draw
   * differently. Returns the admitted rows with their band and permille.
   */
  def bandRateFromScores(scores: DataFrame, rates: Map[String, (Int, Int)],
                         seed: Long = 0L): DataFrame = {
    val banded = CorpusStats.bandByGroupQuantiles(scores, "__bandgrp",
      "fluency_pm", Seq(("p33", 1, 3), ("p66", 2, 3)),
      Seq("tail", "middle", "head"))
    Sampling.hashSampleByGroup(banded, "band", "id", rates, seed = seed)
  }

  /**
   * Per-document mean log-probability and perplexity (floats — the
   * engine-local tier; spec-pinned against a plain-Scala twin, not
   * oracle-gated). score(token) = α^backoffs · c_num/c_den;
   * logprob = Σ ln(score) / n_scored; ppl = exp(−logprob). One keyed
   * aggregation over the integer token frame.
   */
  def docLogProb(scored: DataFrame, alpha: Double = 0.4): DataFrame =
    scored.groupBy("id")
      .agg(count(lit(1)).as("scored_tokens"),
        sum(
          col("backoffs").cast("double") * math.log(alpha) +
            log(col("c_num").cast("double") / col("c_den").cast("double")))
          .as("logprob_sum"))
      .select(col("id"), col("scored_tokens"),
        (col("logprob_sum") / col("scored_tokens").cast("double")).as("mean_logprob"),
        exp(-col("logprob_sum") / col("scored_tokens").cast("double")).as("ppl"))

  /**
   * CCNet-style perplexity band filter: rank documents by perplexity and
   * keep the fraction band [keepFrom, keepTo) — CCNet keeps the head and
   * middle terciles and drops the tail. Rank ties (identical ppl) break
   * on id, so the kept set is deterministic on any partitioning. The
   * ranking is one global sort at document cardinality (ids + one double
   * — not text); at the 100 TB tier the same band cut is a quantile
   * threshold from `approx_percentile` instead of a full rank, which
   * this method switches to above `exactRankLimit` documents.
   */
  def pplBandFilter(docs: DataFrame, scored: DataFrame, idCol: String,
                    keepFrom: Double, keepTo: Double, alpha: Double = 0.4,
                    exactRankLimit: Long = 10000000L): DataFrame = {
    val ppl = docLogProb(scored, alpha).select(col("id"), col("ppl"))
    val total = ppl.count()
    val kept =
      if (total <= exactRankLimit) {
        import org.apache.spark.sql.expressions.Window
        val w = Window.orderBy(col("ppl").asc, col("id").asc)
        // document-cardinality ids+scores only; above exactRankLimit the
        // quantile path below avoids the single-partition rank entirely
        ppl.withColumn("rk", row_number().over(w) - 1L)
          .where(col("rk") >= math.floor(keepFrom * total).toLong &&
            col("rk") < math.floor(keepTo * total).toLong)
          .select("id")
      } else {
        val Array(lo, hi) = ppl.stat.approxQuantile("ppl", Array(keepFrom, keepTo), 0.001)
        ppl.where(col("ppl") >= lo && col("ppl") < hi).select("id")
      }
    docs.join(kept.withColumnRenamed("id", idCol), Seq(idCol), "leftsemi")
  }

  /**
   * Fixed-threshold fluency screen — the STREAMABLE form of the band
   * filter: keep documents with ppl < `maxPpl` under a FROZEN model
   * (`lm`/`totals` from a calibration corpus). The band filter ranks the
   * whole corpus, which an admission stream cannot do; freezing the
   * model and threshold at calibration time makes the decision a pure
   * per-document function, so batch and streaming replays agree exactly
   * (the ingest-screen contract, like the eval-passage cut). Calibrate
   * `maxPpl` with [[pplQuantile]] over the calibration corpus.
   */
  def pplThresholdFilter(docs: DataFrame, lm: DataFrame, totals: DataFrame,
                         idCol: String, textCol: String, maxPpl: Double,
                         alpha: Double = 0.4): DataFrame = {
    val kept = docLogProb(scoreTokens(docs, lm, totals, idCol, textCol), alpha)
      .where(col("ppl") < maxPpl)
      .select(col("id").as(idCol))
    docs.join(kept, Seq(idCol), "leftsemi")
  }

  /**
   * INTEGER-grain fluency screen under a FROZEN model — the streamable,
   * oracle-exact twin of the capstone's stage 4a: keep documents whose
   * token mass the model matches at order ≥ 2 for at least `num/den` of
   * their scored tokens, (o3+o2)·den ≥ num·scored_tokens as an exact
   * cross-multiplication (no floats anywhere, unlike [[pplThresholdFilter]]'s
   * perplexity cut). The decision is a pure per-document function of the
   * frozen (lm, totals) state, so batch and streaming replays agree
   * bit-for-bit, and it equals `CorpusPipeline.run(fluencyMin = …,
   * lmTrainDocs = calibration)`'s stage decision on the same inputs
   * (PipelineSpec/StatefulOpsSpec pin both parities). "Matched mass" is
   * counted as matched_ord ≥ 2 directly — equal to the q132 census's
   * o3+o2 at n = 3, and well-defined at any model order.
   */
  def fluencyThresholdFilter(docs: DataFrame, lm: DataFrame, totals: DataFrame,
                             idCol: String, textCol: String,
                             num: Int, den: Int, n: Int = 3,
                             modelJoin: String = "broadcast"): DataFrame = {
    require(num >= 0 && den > 0, s"threshold must be a non-negative " +
      s"rational with positive denominator, got $num/$den")
    val kept = scoreTokens(docs, lm, totals, idCol, textCol, n, modelJoin)
      .groupBy("id")
      .agg(count(lit(1)).as("__n"),
        sum(when(col("matched_ord") >= 2L, 1L).otherwise(0L)).as("__hi"))
      .where(col("__hi") * lit(den.toLong) >= lit(num.toLong) * col("__n"))
      .select(col("id").as(idCol))
    docs.join(kept, Seq(idCol), "leftsemi")
  }

  /** Calibration helper: the perplexity at fraction `q` of a corpus
    * under its own (or a reference) model — the threshold
    * [[pplThresholdFilter]] freezes. Exact rank at this cardinality
    * (calibration corpora are samples, not the stream). */
  def pplQuantile(docs: DataFrame, lm: DataFrame, totals: DataFrame,
                  idCol: String, textCol: String, q: Double,
                  alpha: Double = 0.4): Double = {
    val ppl = docLogProb(scoreTokens(docs, lm, totals, idCol, textCol), alpha)
      .select(col("ppl"), col("id"))
    val total = ppl.count()
    val k = math.min(total - 1, math.floor(q * total).toLong)
    import org.apache.spark.sql.expressions.Window
    ppl.withColumn("rk", row_number().over(
        Window.orderBy(col("ppl").asc, col("id").asc)) - 1L)
      .where(col("rk") === k).select("ppl").head().getDouble(0)
  }
}
