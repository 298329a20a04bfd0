package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling & dataset splitting for training pipelines.
 *
 * Spark's `randomSplit`/`sample` are seed-dependent AND partitioning-
 * dependent — re-running on a repartitioned table assigns different rows to
 * train/test, which silently invalidates every downstream eval. These
 * assign by a portable hash of a stable key instead: the same row lands in
 * the same split on any cluster, any partitioning, any engine (md5-derived
 * hash — verifiable in SQL, see the q43 oracle).
 *
 * Scale shape: split/sample assignment is a pure narrow projection (zero
 * shuffles — the split column is a function of the key alone);
 * capPerGroup is the one op here that shuffles (once, on the group key,
 * with the rank limit pushed down map-side).
 */
object Sampling {

  /**
   * Split assignment by hash(key) mod Σweights: splits like
   * ("train" -> 8, "val" -> 1, "test" -> 1) give a stable 80/10/10.
   */
  def splitColumn(key: Column, splits: Seq[(String, Int)]): Column = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "weights must be positive")
    val total = splits.map(_._2).sum
    val bucket = pmod(Hashing.stableHash60(key.cast("string")), lit(total))
    val (expr, _) = splits.foldLeft(Option.empty[Column] -> 0) {
      case ((acc, cum), (name, weight)) =>
        val upper = cum + weight
        val branch = acc match {
          case None    => when(bucket < upper, name)
          case Some(c) => c.when(bucket < upper, name)
        }
        (Some(branch), upper)
    }
    expr.get
  }

  /** Attach the split label as a column (narrow; no shuffle). */
  def assignSplits(df: DataFrame, keyCol: String, splits: Seq[(String, Int)],
                   as: String = "split"): DataFrame =
    df.withColumn(as, splitColumn(col(keyCol), splits))

  /**
   * Leakage-proof split assignment: the split key is the document's
   * DEDUP-GROUP label, not its own id, so every member of a near-dup
   * group lands in the same split — the preventive twin of the
   * cross-split leakage AUDIT ([[crossSplitLeakage]] finds the pairs a
   * per-doc split separates; this guarantees there are none over the
   * same pair pipeline, by construction). The standard contract when
   * near-dups are kept in the corpus (partial dedup) but eval must not
   * see train paraphrases.
   *
   * Documents with no near-dup pair carry no group row and fall back to
   * their own id — which IS their group label under smallest-id
   * components, so the fallback is the same labeling, not a special
   * case.
   *
   * @param groups `Components.dedupGroups` output (id, keep_id) over
   *               whatever pair pipeline defines "leakage"
   *
   * Scale shape: one left join against the member-cardinality group
   * frame (near-dup members are a small corpus fraction — typically a
   * runtime broadcast) + the narrow hash projection; no window, no
   * added shuffle over [[assignSplits]].
   */
  def groupAwareSplits(docs: DataFrame, groups: DataFrame, idCol: String,
                       splits: Seq[(String, Int)],
                       as: String = "split"): DataFrame = {
    val g = groups.select(col("id").as("__ga_id"), col("keep_id").as("__ga_grp"))
    docs.join(g, docs(idCol) === col("__ga_id"), "left")
      .withColumn(as, splitColumn(coalesce(col("__ga_grp"), col(idCol)), splits))
      .drop("__ga_id", "__ga_grp")
  }

  /**
   * EXACT-quota stratified split: within every stratum, the first
   * ⌊n·cum%/100⌋ rows of a seeded-hash order go to each quota label in
   * turn (cumulative-floor bounds — integer-exact, engine-portable), the
   * remainder to `rest`. [[assignSplits]]' hash-threshold split is only
   * proportional in expectation — small or skewed strata can land far
   * off ratio; this one guarantees per-stratum proportions, the
   * train/val/test contract evaluation pipelines assume. `idCol` must be
   * unique and non-null (it seeds the draw and breaks ties).
   *
   * Scale shape — the per-stratum rank NEVER uses a stratum-keyed
   * window (with few strata that funnels the corpus through a handful
   * of partitions): rows bucket by the TOP `prefixBits` bits of their
   * hash, so (bucket, hash, id) order equals (hash, id) order; bucket
   * counts aggregate map-side into a strata×2^prefixBits frame whose
   * running sum (tiny, post-aggregation window) gives each bucket's
   * rank offset; the real row_number runs per (stratum, bucket) —
   * hash-uniform partitions, no skew at any stratum cardinality — and
   * the offset lifts it to the stratum-global rank. One small-frame
   * broadcast join + one skew-free window exchange over the corpus.
   */
  def stratifiedSplit(df: DataFrame, idCol: String, stratumCol: String,
                      quotas: Seq[(String, Int)], seed: Long,
                      rest: String = "train", as: String = "split",
                      prefixBits: Int = 8): DataFrame = {
    require(quotas.nonEmpty && quotas.forall(_._2 > 0),
      "quota percents must be positive")
    require(quotas.map(_._2).sum <= 100, "quota percents must sum to <= 100")
    require(prefixBits >= 1 && prefixBits <= 20, "prefixBits out of range")
    val keyed = df
      .withColumn("__sp_h", Hashing.stableHash60(concat_ws("\u0000",
        lit(seed.toString), col(idCol).cast("string"))))
    val ranked = twoPhaseRank(keyed, stratumCol, idCol, prefixBits)
    val cum = quotas.scanLeft(0L)((a, q) => a + q._2).tail
    val chain = quotas.zip(cum).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), c)) =>
        val bound = expr(s"(__sp_n * ${c}L) div 100")
        Some(acc.fold(when(col("__sp_rank") <= bound, name))(
          _.when(col("__sp_rank") <= bound, name)))
    }.get.otherwise(lit(rest))
    ranked.withColumn(as, chain)
      .drop("__sp_h", "__sp_b", "__sp_s", "__sp_b2", "__sp_off", "__sp_n", "__sp_rank")
  }

  /**
   * Skew-proof rank within `stratumCol` over a frame carrying a seeded
   * hash `__sp_h`: hash-prefix sub-buckets + a tiny broadcast offsets
   * frame — never a stratum-keyed window over the corpus (a stratum can
   * be corpus-sized; a (stratum, prefix) bucket is 2^prefixBits times
   * smaller). Rank order within a stratum is (hash, id) EXACTLY — the
   * bucketing is invisible to the order because the bucket IS the hash's
   * top bits — which is what keeps every consumer's oracle a plain
   * row_number. Adds `__sp_rank` (1-based within stratum) and `__sp_n`
   * (stratum size); callers drop the `__sp_*` internals.
   */
  private def twoPhaseRank(keyed0: DataFrame, stratumCol: String,
                           idCol: String, prefixBits: Int): DataFrame = {
    val keyed = keyed0
      .withColumn("__sp_b", shiftright(col("__sp_h"), 60 - prefixBits))
    val counts = keyed
      .groupBy(col(stratumCol).as("__sp_s"), col("__sp_b").as("__sp_b2"))
      .agg(count(lit(1)).as("__sp_c"))
    val ws = Window.partitionBy("__sp_s")
    val offsets = counts
      .withColumn("__sp_off", coalesce(sum(col("__sp_c")).over(
        ws.orderBy("__sp_b2").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__sp_n", sum(col("__sp_c")).over(ws))
      .select(col("__sp_s"), col("__sp_b2"), col("__sp_off"), col("__sp_n"))
    val wr = Window.partitionBy(col(stratumCol), col("__sp_b"))
      .orderBy(col("__sp_h").asc_nulls_last, col(idCol).asc_nulls_last)
    keyed
      .join(broadcast(offsets),
        keyed(stratumCol) <=> offsets("__sp_s") && col("__sp_b") === col("__sp_b2"))
      .withColumn("__sp_rank", col("__sp_off") + row_number().over(wr))
  }

  /**
   * Length-bucketed batch assembly — the padding minimizer for inference
   * and packed-attention training: group rows into fixed-width length
   * bins (`bin = n_tokens div binWidth`), order each bin by a seeded
   * hash (deterministic "shuffle": similar-length docs batch together
   * but batch COMPOSITION is randomized and reproducible on any
   * cluster), and cut consecutive runs of `batchSize` into batches.
   * Padded width of any batch is its bin's max length, so waste per row
   * is < binWidth tokens by construction — vs padding to the global max
   * under naive batching. Returns one row per input row with
   * (n_tokens, bin, batch_in_bin, pos_in_batch); (bin, batch_in_bin) is
   * the batch key. Rank rides [[twoPhaseRank]] — no bin-keyed window
   * ever sees corpus cardinality. `lenExpr` is a Column so
   * tokenizer-faithful counts (functions.Subword) plug in unchanged.
   */
  def lengthBucketBatches(df: DataFrame, idCol: String, lenExpr: Column,
                          binWidth: Int, batchSize: Int, seed: Long,
                          prefixBits: Int = 8): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(batchSize > 0, "batchSize must be positive")
    val keyed = df
      .withColumn("n_tokens", lenExpr.cast("long"))
      .withColumn("bin", expr(s"n_tokens div $binWidth"))
      .withColumn("__sp_h", Hashing.stableHash60(concat_ws("\u0000",
        lit(seed.toString), col(idCol).cast("string"))))
    twoPhaseRank(keyed, "bin", idCol, prefixBits)
      .withColumn("batch_in_bin", expr(s"(__sp_rank - 1) div $batchSize"))
      .withColumn("pos_in_batch", (col("__sp_rank") - 1) % batchSize)
      .select(col(idCol), col("n_tokens"), col("bin"),
        col("batch_in_bin"), col("pos_in_batch"))
  }

  /**
   * Probability-proportional-to-size (Poisson/PPS) sampling with EXACT
   * integer inclusion tests — "sample ~targetRows documents with
   * probability proportional to token count" is how a token budget is
   * spent without biasing toward short documents. Row i enters iff
   *
   *   hash_i · Σw  <  targetRows · w_i · 2^60
   *
   * i.e. uniform(hash)/2^60 < targetRows·w_i/Σw, but evaluated entirely
   * in DECIMAL(38,0)/HUGEINT integer arithmetic — no float threshold, so
   * the sample is bit-identical on any engine and any partitioning
   * (products stay ≤ ~10^31 ≪ 10^38 even at 100 TB token totals). Rows
   * with targetRows·w ≥ Σw have probability 1 and always enter. Sample
   * SIZE is Poisson-distributed around targetRows (use capPerGroup /
   * stratifiedSplit for exact counts); `incl_prob` and the
   * Horvitz-Thompson weight `ht_weight` = 1/prob are emitted so
   * downstream corpus statistics stay unbiased.
   *
   * Scale shape: one one-row total aggregation broadcast back + a narrow
   * codegen filter — the corpus never shuffles. Zero-weight rows are
   * excluded (prob 0), and so are NULL-id rows: the null-propagating
   * draw can never admit them, so keeping their weight in Σw would bias
   * every Horvitz-Thompson estimate (ADVICE r9) — the denominator is the
   * SAMPLEABLE population.
   */
  def ppsSample(df: DataFrame, idCol: String, weightExpr: Column,
                targetRows: Long, seed: Long): DataFrame = {
    require(targetRows > 0, "targetRows must be positive")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val weighted = df.withColumn("w", weightExpr.cast("long"))
      .where(col("w") > 0 && col(idCol).isNotNull)
    val tot = weighted.agg(sum(col("w")).as("total"))
    val h = Hashing.domain(seed, col(idCol)) // null-propagating seed-domain draw

    weighted.crossJoin(broadcast(tot))
      .where(h.cast(dec) * col("total").cast(dec) <
        lit(targetRows).cast(dec) * col("w").cast(dec) *
          lit(1152921504606846976L).cast(dec)) // 2^60
      .withColumn("incl_prob", least(lit(1.0),
        col("w").cast("double") * targetRows.toDouble / col("total")))
      .withColumn("ht_weight", lit(1.0) / col("incl_prob"))
      .select(col(idCol), col("w"), col("incl_prob"), col("ht_weight"))
  }

  /**
   * Ingest-time form of [[ppsSample]]: inclusion against a KNOWN weight
   * total (the previous release's token census) instead of aggregating
   * one — which makes the whole operator a pure stateless narrow filter,
   * directly applicable to a STREAMING DataFrame (no aggregation, no
   * state): batch and stream admission verdicts are identical by
   * construction, and spec-pinned. With `total` = the actual Σw this is
   * exactly [[ppsSample]] (also spec-pinned).
   */
  def ppsSampleWithTotal(df: DataFrame, idCol: String, weightExpr: Column,
                         targetRows: Long, seed: Long, total: Long): DataFrame = {
    require(targetRows > 0, "targetRows must be positive")
    require(total > 0, "total must be positive")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val h = Hashing.domain(seed, col(idCol)) // null-propagating seed-domain draw
    // NULL-id rows are dropped up front (the draw could never admit
    // them); the CALLER's census must likewise exclude NULL ids for the
    // external `total` to match the sampleable population (ADVICE r9)
    df.withColumn("w", weightExpr.cast("long"))
      .where(col("w") > 0 && col(idCol).isNotNull)
      .withColumn("total", lit(total))
      .where(h.cast(dec) * col("total").cast(dec) <
        lit(targetRows).cast(dec) * col("w").cast(dec) *
          lit(1152921504606846976L).cast(dec))
      .withColumn("incl_prob", least(lit(1.0),
        col("w").cast("double") * targetRows.toDouble / col("total")))
      .withColumn("ht_weight", lit(1.0) / col("incl_prob"))
      .select(col(idCol), col("w"), col("incl_prob"), col("ht_weight"))
  }

  /**
   * Stratified PPS: [[ppsSample]] WITHIN each group, with per-group
   * expected-row targets supplied as a (group, target) plan table —
   * mixture quotas executed as one narrow pass over the corpus instead
   * of |groups| separate sampling jobs. Same exact-integer inclusion
   * test per group (hash·Σw_g < target_g·w·2^60 in DECIMAL(38,0) — no
   * float threshold, so the draw is bit-identical on any
   * engine/partitioning), and per-group Horvitz-Thompson weights keep
   * downstream statistics unbiased. Groups absent from `targets`, or
   * with target ≤ 0, emit nothing.
   *
   * Shape: one group-cardinality total aggregation and the plan table
   * both broadcast back onto the corpus; the corpus itself never
   * shuffles. By construction the draw within a group is EXACTLY
   * [[ppsSample]] run on that group's slice at its target (spec-pinned),
   * so per-group statistical properties carry over unchanged.
   */
  def ppsSampleByGroup(df: DataFrame, groupCol: String, idCol: String,
                       weightExpr: Column, targets: DataFrame,
                       seed: Long): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    // NULL-id rows excluded from the per-group Σw for the same HT-bias
    // reason as [[ppsSample]] (ADVICE r9)
    val weighted = df.withColumn("w", weightExpr.cast("long"))
      .where(col("w") > 0 && col(groupCol).isNotNull && col(idCol).isNotNull)
    val tot = weighted.groupBy(col(groupCol)).agg(sum(col("w")).as("__total"))
    val h = Hashing.domain(seed, col(idCol)) // null-propagating seed-domain draw
    // one plan row per group, enforced in-plan (the assert_true-in-filter
    // pattern — a duplicated group would silently MULTIPLY sampled rows
    // through the join); plan tables are group-cardinality, so the
    // window is cheap
    val uniqueTargets = targets
      .select(col(groupCol), col("target").cast("long").as("__target"))
      .withColumn("__tc", count(lit(1))
        .over(Window.partitionBy(col(groupCol))))
      .where(assert_true(col("__tc") === 1,
        lit("ppsSampleByGroup: duplicate target rows for a group")).isNull)
      .drop("__tc")
    weighted
      .join(broadcast(tot), Seq(groupCol))
      .join(broadcast(uniqueTargets), Seq(groupCol))
      .where(col("__target") > 0)
      .where(h.cast(dec) * col("__total").cast(dec) <
        col("__target").cast(dec) * col("w").cast(dec) *
          lit(1152921504606846976L).cast(dec)) // 2^60
      .withColumn("incl_prob", least(lit(1.0),
        col("w").cast("double") * col("__target").cast("double") / col("__total")))
      .withColumn("ht_weight", lit(1.0) / col("incl_prob"))
      .select(col(idCol), col(groupCol), col("w"), col("incl_prob"),
        col("ht_weight"))
  }

  /**
   * Per-batch padding census over [[lengthBucketBatches]] output: rows,
   * padded width (batch max), real tokens, and wasted pad slots
   * (rows·max − sum) — exact integers, one aggregation over batch
   * cardinality. The tail batch of each bin is the only place waste can
   * exceed rows·(binWidth−1).
   */
  def lengthBatchReport(batches: DataFrame): DataFrame =
    batches.groupBy("bin", "batch_in_bin")
      .agg(count(lit(1)).as("n_rows"),
        max(col("n_tokens")).as("padded_len"),
        sum(col("n_tokens")).as("real_tokens"))
      .withColumn("pad_waste",
        col("n_rows") * col("padded_len") - col("real_tokens"))

  /**
   * Deterministic global shuffle — training-order randomization as a
   * seeded permutation. `orderBy(hash(seed ∥ key))` gives the same order
   * on any cluster/partitioning/engine (unlike `repartition`+`rand`,
   * whose order changes per run and breaks resume-from-step
   * reproducibility). Different seeds give independent epoch orders.
   * Scale shape: one range exchange (Spark samples the hash to cut
   * balanced ranges) + per-partition sort — the standard global-sort
   * plan; the hash key is uniform by construction so the range exchange
   * never skews, whatever the key distribution.
   */
  def deterministicShuffle(df: DataFrame, keyCol: String, seed: Long): DataFrame =
    df.orderBy(
      Hashing.stableHash60(concat_ws("\u0000", lit(seed.toString),
        col(keyCol).cast("string"))).asc_nulls_last,
      col(keyCol).asc_nulls_last)

  /**
   * [[deterministicShuffle]] with the permutation MATERIALIZED as a dense
   * 1-based rank column — the resume-from-step bookkeeping form (a trainer
   * restarting at sample 37 billion filters `rank > N` instead of
   * re-consuming the stream). Rank comes from zipWithIndex over the sorted
   * frame — the scale-safe dense index (per-partition offsets from one
   * count job; a row_number window over a global ORDER BY would funnel the
   * corpus through a single partition).
   */
  def shuffleWithRank(df: DataFrame, keyCol: String, seed: Long,
                      as: String = "shuffle_rank"): DataFrame =
    denseRankOverOrdered(deterministicShuffle(df, keyCol, seed), as)

  /** Deterministic fraction-of-keyspace sample: keeps rows whose key hashes
    * below `num`/`denom` of the hash range — stable under re-runs and
    * engine-portable (unlike `sample(fraction, seed)`). The seed prefixes
    * the hashed key (the [[ppsSample]] convention): every threshold draw
    * lives in its OWN hash domain, so composing a rate draw with the
    * split assignment (or another draw) on the same key can never
    * correlate — the hazard the cap_banded disk probe caught: an
    * unsalted mod-10 draw upstream of the mod-10 split starves val/test
    * entirely (tail survivors were exactly the train residue). */
  def hashSample(df: DataFrame, keyCol: String, num: Int, denom: Int,
                 seed: Long = 0L): DataFrame =
    df.where(pmod(Hashing.domain(seed, col(keyCol)), lit(denom)) < num)

  /**
   * Per-group rate admission: [[hashSample]] with GROUP-DEPENDENT
   * fractions — keeps a row iff hash(key) mod denom_g < num_g under its
   * group's rate. This is the RATE form of [[mixtureSample]]: the quota
   * draw bounds the OUTPUT (a per-group rank — right for bounded mixes,
   * where the constant max-quota keeps WindowGroupLimit pushdown), while
   * the rate draw keeps a FRACTION — the only form that scales to
   * production-sized band-preferential sampling (keeping most of the
   * head band of a 100 TB corpus via a rank quota would funnel the
   * corpus into |bands| window partitions; the rate test is a pure
   * stateless per-row filter — no shuffle, no state, and therefore
   * directly applicable to a streaming admission under frozen band
   * edges). Groups absent from `rates` (or NULL) use `defaultRate`;
   * (0, d) drops the group, (d, d) keeps it whole. Deterministic branch
   * order (sorted keys) — map iteration order must never decide the
   * expression tree. The seed prefixes the hashed key ([[hashSample]]'s
   * domain-separation discipline — see the correlation hazard there).
   */
  def hashSampleByGroup(df: DataFrame, groupCol: String, keyCol: String,
                        rates: Map[String, (Int, Int)],
                        defaultRate: (Int, Int) = (0, 1),
                        seed: Long = 0L): DataFrame = {
    require((rates.values.toSeq :+ defaultRate).forall {
      case (n, d) => d > 0 && n >= 0 && n <= d },
      "rates must satisfy 0 <= num <= denom, denom > 0")
    def caseOf(pick: ((Int, Int)) => Int, dflt: Int): Column =
      rates.toSeq.sortBy(_._1)
        .foldLeft(Option.empty[Column]) { case (acc, (g, r)) =>
          Some(acc.fold(when(col(groupCol) === g, pick(r)))(
            _.when(col(groupCol) === g, pick(r))))
        }.fold(lit(dflt))(_.otherwise(dflt))
    df.where(pmod(Hashing.domain(seed, col(keyCol)),
        caseOf(_._2, defaultRate._2).cast("long")) <
      caseOf(_._1, defaultRate._1).cast("long"))
  }

  /**
   * Curriculum / mixture-ordered interleave: a single deterministic
   * global training order in which source s appears with long-run
   * frequency ∝ its integer weight — the "data order file" a trainer
   * consumes. Doc k (1-based, hash-shuffled within its source by the
   * [[deterministicShuffle]] key) of source s sorts at virtual time
   * k·(L/w_s), L = lcm(weights): weighted fair queueing, EXACT in 64-bit
   * integers — no float ratios, so the order is engine-portable and
   * oracle-able. Ties (equal virtual time) break by (source, id).
   * Sources absent from `weights` are excluded (weight 0). Global
   * position = zipWithIndex over the sorted frame, the same scale-safe
   * dense index as [[shuffleWithRank]]; the within-source rank is one
   * window shuffle on the source key.
   */
  def curriculumInterleave(df: DataFrame, idCol: String, sourceCol: String,
                           weights: Map[String, Int], seed: Long,
                           as: String = "position"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val lcmAll = weights.values.foldLeft(1L)((l, w) => l / gcd(l, w) * w)
    val step = weights.foldLeft(lit(null).cast("long")) { case (acc, (s, w)) =>
      when(col(sourceCol) === s, lit(lcmAll / w)).otherwise(acc)
    }
    val within = Window.partitionBy(col(sourceCol)).orderBy(
      Hashing.stableHash60(concat_ws("\u0000", lit(seed.toString),
        col(idCol).cast("string"))).asc_nulls_last,
      col(idCol).asc_nulls_last)
    val timed = df
      .where(col(sourceCol).isin(weights.keys.toSeq.map(x => x: Any): _*))
      .withColumn("__vt", row_number().over(within).cast("long") * step)
    val ordered = timed
      .orderBy(col("__vt").asc, col(sourceCol).asc, col(idCol).asc)
      .drop("__vt")
    denseRankOverOrdered(ordered, as)
  }

  /** 1-based dense rank over an already-sorted frame via zipWithIndex —
    * per-partition offsets from one count job; a row_number window over a
    * global ORDER BY would funnel the corpus through a single partition. */
  private def denseRankOverOrdered(ordered: DataFrame, as: String): DataFrame = {
    val spark = ordered.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(ordered.schema.fields :+
      StructField(as, LongType, nullable = false))
    spark.createDataFrame(
      ordered.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) },
      schema)
  }

  /**
   * Class balancing: keep at most `maxPerGroup` rows per group, chosen by
   * hash-of-key rank (a deterministic pseudo-random draw — NOT "first N
   * encountered", which depends on partitioning). One shuffle on the
   * group key; the rank limit pushes down map-side (WindowGroupLimit), so
   * each partition forwards at most maxPerGroup rows per group.
   */
  def capPerGroup(df: DataFrame, groupCol: String, keyCol: String,
                  maxPerGroup: Int): DataFrame =
    // nulls LAST explicitly: Spark ASC defaults to nulls-first, SQL engines
    // to nulls-last — a null key would silently change which rows survive
    // depending on the engine evaluating the same ordering
    Dedup.rankLimit(df, Seq(col(groupCol)),
      Seq(Hashing.stableHash60(col(keyCol).cast("string")).asc_nulls_last,
        col(keyCol).asc_nulls_last),
      maxPerGroup)

  /**
   * Cross-split leakage audit: near-duplicate pairs that span different
   * dataset splits — the duplicate-shaped train/test contamination that
   * split assignment alone cannot prevent (two near-identical documents
   * hash to different splits, and the test member leaks the train member's
   * content). Takes ANY pair frame (id_a, id_b, score…) — minhash, simhash
   * or embedding near-dups — and labels each side with the SAME
   * deterministic hash split as [[assignSplits]], keeping only pairs whose
   * sides disagree.
   *
   * Scale shape: the split label is a pure function of the id, so this is
   * a zero-shuffle narrow projection over the (already sub-quadratic) pair
   * pipeline's output — no join back to the corpus, nothing new
   * materializes at 100 TB beyond the pair stream itself.
   */
  def crossSplitLeakage(pairs: DataFrame, idA: String, idB: String,
                        splits: Seq[(String, Int)]): DataFrame =
    pairs
      .withColumn("split_a", splitColumn(col(idA), splits))
      .withColumn("split_b", splitColumn(col(idB), splits))
      .where(col("split_a") =!= col("split_b"))

  /**
   * Deterministic negative sampling for contrastive/triplet training: for
   * every anchor id, `k` pseudo-random OTHER ids, reproducible on any
   * cluster/partitioning/engine (seed + hash arithmetic — `sample()` or
   * `rand()`-based negatives change between runs and make training
   * unreproducible). Sampling is with replacement across anchors (two
   * anchors may draw the same negative — by design, that's what uniform
   * sampling means) and collision-free per anchor only when k ≪ n.
   *
   * Shape: a dense 0..n−1 index over the hash-sorted ids (one range-sort;
   * zipWithIndex is the standard scale-safe dense index — per-partition
   * offsets from one count job, no single-partition exchange), then each
   * anchor explodes k draws `hash(seed, anchor, j) mod n` and equi-joins
   * the index to resolve ids. Self-draws step to the next index. Two
   * shuffles total (sort + join), both on id/index cardinality.
   *
   * Output: (anchor, neg_rank 0..k−1, negative).
   */
  def negativeSamples(df: DataFrame, idCol: String, k: Int, seed: Long): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    // any id type (hashing casts to string, like the other Sampling ops);
    // null ids can't anchor or be drawn — dropped up front, not mid-job
    val ordered = df.select(col(idCol).as("id")).where(col("id").isNotNull).distinct()
      .orderBy(Hashing.stableHash60(col("id").cast("string")), col("id"))
    val idField = StructField("id", ordered.schema("id").dataType, nullable = false)
    val indexed = spark.createDataFrame(
      ordered.rdd.zipWithIndex().map { case (r, i) => Row(r.get(0), i) },
      StructType(Seq(idField, StructField("__idx", LongType, nullable = false))))
      .localCheckpoint() // consumed by the anchor side AND the resolve join
    val n = indexed.count()
    require(n > 1, "need at least two distinct ids to sample negatives")
    val draws = indexed
      .select(col("id").as("anchor"), col("__idx").as("__aidx"),
        explode(sequence(lit(0), lit(k - 1))).as("neg_rank"))
      .withColumn("__draw", pmod(Hashing.stableHash60(
        concat_ws(":", lit(seed.toString), col("anchor").cast("string"),
          col("neg_rank").cast("string"))), lit(n)))
      // never draw yourself: step to the neighboring index
      .withColumn("__nidx",
        when(col("__draw") === col("__aidx"), pmod(col("__draw") + 1, lit(n)))
          .otherwise(col("__draw")))
    draws
      .join(indexed.withColumnsRenamed(Map("id" -> "negative", "__idx" -> "__nidx")),
        Seq("__nidx"))
      .select(col("anchor"), col("neg_rank"), col("negative"))
  }

  /**
   * Data-mixture construction: per-group quotas instead of capPerGroup's
   * uniform cap — "12 docs from src0, 8 from src1, 3 from everything
   * else" is exactly how pretraining blends weight sources (up-sample
   * curated corpora, down-sample crawl). The draw per group is the same
   * deterministic hash-of-key rank. Groups smaller than their quota
   * contribute everything (standard mixture behavior — weights are caps,
   * not guarantees).
   *
   * One shuffle on the group column. The rank limit stays map-side
   * pushable (WindowGroupLimit) via the CONSTANT max-quota bound; the
   * per-group quota then filters post-window — so each partition forwards
   * at most max(quota) rows per group, and the variable part never blocks
   * the pushdown.
   */
  def mixtureSample(df: DataFrame, groupCol: String, keyCol: String,
                    quotas: Map[String, Int], defaultQuota: Int): DataFrame = {
    require(defaultQuota >= 0 && quotas.values.forall(_ >= 0), "quotas must be >= 0")
    val maxQuota = (quotas.values.toSeq :+ defaultQuota).max
    // deterministic branch order (sorted keys) — map iteration order must
    // never decide the expression tree
    val quota = quotas.toSeq.sortBy(_._1)
      .foldLeft(Option.empty[Column]) { case (acc, (g, q)) =>
        Some(acc.fold(when(col(groupCol) === g, q))(_.when(col(groupCol) === g, q)))
      }
      .fold(lit(defaultQuota))(_.otherwise(defaultQuota))
    Dedup.rankLimitKeep(df, Seq(col(groupCol)),
        Seq(Hashing.stableHash60(col(keyCol).cast("string")).asc_nulls_last,
          col(keyCol).asc_nulls_last),
        maxQuota, as = "__rn")
      .where(col("__rn") <= quota)
      .drop("__rn")
  }

  /**
   * Temperature-flattened mixture (τ = 1/2): [[mixtureSample]] with
   * DATA-DRIVEN quotas — quota_g = ⌊totalOut · w_g / Σ w⌋ clamped to the
   * group size, with integer weight w_g = ⌊√count_g⌋. This is the
   * √-count flattening rule multilingual/pretraining mixes use to give
   * small sources a larger share than proportional sampling would,
   * without ever over-drawing them. The whole quota computation is EXACT
   * and engine-portable: √ of an integer is IEEE-correctly-rounded, ⌊·⌋
   * of it is an integer, Σ w is an integer sum (no float association
   * order), and the final quotient is integer floor-division — no libm
   * drift anywhere. General dyadic τ = k/2^m keeps the same guarantee via
   * [[tauWeight]] (nested correctly-rounded sqrts — NOT pow, which has no
   * rounding guarantee); see [[temperatureMixtureTau]]. Σ quotas ≤
   * totalOut (floor under-allocates by < |groups|); rows whose group
   * value is NULL are dropped (no meaningful quota).
   *
   * Shape: one count aggregation (group-cardinality) with a
   * single-partition total over the AGGREGATED rows (sanctioned:
   * post-aggregation cardinality only), quotas broadcast back onto the
   * corpus, and q56's rank shuffle — WindowGroupLimit pushdown bounded
   * by the CONSTANT totalOut (no group ever needs more), the variable
   * quota filtering post-window.
   */
  def temperatureMixture(df: DataFrame, groupCol: String, keyCol: String,
                         totalOut: Int): DataFrame =
    mixtureByWeight(df, groupCol, keyCol, totalOut,
      c => floor(sqrt(c)).cast("long"))

  /**
   * [[temperatureMixture]] at ANY dyadic temperature τ = k/2^m ∈ (0, 1]:
   * group weight ⌊c^τ⌋ computed by [[tauWeight]] — repeated correctly-
   * rounded square roots instead of `pow`, so the weight (hence every
   * quota) is bit-identical on any engine and any partitioning. τ = 1/2
   * (k=1, m=1) reproduces [[temperatureMixture]]; τ = 1 is proportional
   * sampling; smaller τ flattens harder toward uniform — the multilingual
   * -sampling dial (α ≈ 0.3–0.7 in practice: pick the nearest k/2^m,
   * e.g. 0.75 = 3/4, 0.3125 = 5/16).
   */
  def temperatureMixtureTau(df: DataFrame, groupCol: String, keyCol: String,
                            totalOut: Int, tauNum: Int, tauDenLog2: Int): DataFrame =
    mixtureByWeight(df, groupCol, keyCol, totalOut,
      c => tauWeight(c, tauNum, tauDenLog2))

  /**
   * ⌊c^(k/2^m)⌋ without `pow`: the binary expansion of k selects nested
   * square roots (bit b of k contributes c^(2^b/2^m) = sqrt applied
   * m−b times), multiplied left-to-right from the shallowest nesting.
   * Every step — long→double cast, sqrt, multiply, floor — is correctly
   * rounded in IEEE-754, so two engines evaluating this exact shape get
   * the SAME double and the same floor. `pow` carries no such guarantee
   * (libm implementations drift in the last ulps), which is why the
   * dyadic grid is the portable temperature convention: any τ a training
   * mixture needs is within 2^-m of a dyadic rational.
   */
  private[graft] def tauWeight(c: Column, tauNum: Int, tauDenLog2: Int): Column = {
    require(tauDenLog2 >= 1 && tauDenLog2 <= 10, "tauDenLog2 must be in [1, 10]")
    require(tauNum >= 1 && tauNum <= (1 << tauDenLog2),
      s"tau = $tauNum/2^$tauDenLog2 must be in (0, 1]")
    // τ = 1 is the count itself — stay in integer arithmetic (a double
    // round-trip would drift above 2^53)
    if (tauNum == (1 << tauDenLog2)) c.cast("long")
    else {
      val cd = c.cast("double")
      val terms = (1 to tauDenLog2).flatMap { j =>
        if (((tauNum >> (tauDenLog2 - j)) & 1) == 1)
          Some((1 to j).foldLeft(cd)((e, _) => sqrt(e)))
        else None
      }
      floor(terms.reduce(_ * _)).cast("long")
    }
  }

  private def mixtureByWeight(df: DataFrame, groupCol: String, keyCol: String,
                              totalOut: Int, weightOf: Column => Column): DataFrame = {
    require(totalOut >= 0, "totalOut must be >= 0")
    // DECIMAL(38,0) cross-multiply (epochPlan's convention): at τ near 1
    // the weight approaches the group count itself, so totalOut·w can
    // overflow a long — DECIMAL keeps the product exact at any weight.
    // NULL-group rows are excluded from the DENOMINATOR too — they take
    // no quota, so they must not dilute anyone else's share
    val quotas = df.where(col(groupCol).isNotNull)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("__c"))
      .withColumn("__w", weightOf(col("__c")))
      .withColumn("__z", sum(col("__w")).over(Window.partitionBy()))
      // `div`: exact integer floor-division (a DECIMAL `/` would round at
      // result scale before a floor could run)
      .selectExpr(s"*",
        s"least(__c, CAST((CAST($totalOut AS DECIMAL(38,0)) * __w) div __z AS BIGINT)) AS __quota")
      .select(col(groupCol), col("__quota"))
    Dedup.rankLimitKeep(df.where(col(groupCol).isNotNull), Seq(col(groupCol)),
        Seq(Hashing.stableHash60(col(keyCol).cast("string")).asc_nulls_last,
          col(keyCol).asc_nulls_last),
        totalOut, as = "__rn")
      .join(broadcast(quotas), Seq(groupCol))
      .where(col("__rn") <= col("__quota"))
      .drop("__rn", "__quota")
  }

  /**
   * Data-constrained epoch plan (the repeat-allocation recipe of
   * Muennighoff et al. 2023, "Scaling Data-Constrained Language Models" —
   * public knowledge): given a total training token budget and per-source
   * availability, how many FULL passes (epochs) of each source to take and
   * how many remainder tokens to sample on top. The per-source quota
   * splits the budget by temperature-flattened weights (τ = 1/2:
   * w_g = ⌊√avail_g⌋, [[temperatureMixture]]'s integer-exact convention —
   * small sources over-represented, huge sources damped), then decomposes
   * as quota = full_epochs · avail + remainder. `maxEpochs` caps repeats
   * (the paper's finding: value decays fast past ~4 epochs); a capped
   * source's surplus is NOT silently redistributed — the emitted plan
   * makes any shortfall visible (Σ planned < budget) and the caller
   * decides, instead of a hidden data-dependent fixpoint deciding for
   * them. The remainder is exactly what [[ppsSampleWithTotal]] then draws
   * token-proportionally from that source.
   *
   * All-integer arithmetic — ⌊√⌋ (IEEE-exact below 2^52), one
   * DECIMAL(38,0) cross-multiply, floor division and mod — so the plan is
   * bit-identical on any engine and any partitioning.
   *
   * Shape: ONE count aggregation to group cardinality, then a
   * single-partition window over the GROUP table only (the q07 rule:
   * global windows only over aggregated cardinality). Output is
   * sources-sized — driver-readable at any corpus scale.
   */
  def epochPlan(df: DataFrame, groupCol: String, lenCol: Column,
                budgetTokens: Long, maxEpochs: Int = 4): DataFrame = {
    require(budgetTokens >= 0, "budgetTokens must be >= 0")
    require(maxEpochs >= 1, "maxEpochs must be >= 1")
    df.where(col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(sum(lenCol.cast("long")).as("avail_tokens"))
      .where(col("avail_tokens") > 0)
      .withColumn("weight",
        floor(sqrt(col("avail_tokens").cast("double"))).cast("long"))
      .withColumn("__z", sum(col("weight")).over(Window.partitionBy()))
      .withColumn("quota_tokens", expr(
        s"CAST((CAST($budgetTokens AS DECIMAL(38,0)) * weight) div __z AS BIGINT)"))
      .withColumn("planned_tokens",
        least(col("quota_tokens"), lit(maxEpochs.toLong) * col("avail_tokens")))
      .withColumn("full_epochs", expr("planned_tokens div avail_tokens"))
      .withColumn("remainder_tokens", col("planned_tokens") % col("avail_tokens"))
      .drop("__z")
  }

  /**
   * Epoch expansion — materialize [[epochPlan]] into the actual repeated
   * training stream: every document of a source is emitted once per full
   * epoch (epoch = 1..full_epochs), and the remainder tokens come from a
   * deterministic partial pass (epoch = full_epochs+1): documents in
   * seeded-hash order are taken while the tokens BEFORE them stay under
   * `remainder_tokens` (the packing convention — the budget is crossed at
   * most once, by the last admitted doc). Exact integers throughout; the
   * same corpus expands identically on any cluster/partitioning/restart,
   * which is what makes mid-run resume and loss-curve reproduction
   * possible at all.
   *
   * Shape: the plan is group-cardinality and broadcast onto the corpus
   * (one narrow join); full epochs are a generator explode (output
   * cardinality is the plan's, no shuffle); the remainder pass is ONE
   * group-keyed window for the seeded-rank cumulative sum. Output:
   * (id, group, epoch, tokens).
   */
  def expandEpochs(df: DataFrame, groupCol: String, idCol: String,
                   lenCol: Column, budgetTokens: Long, maxEpochs: Int = 4,
                   seed: Long = 42L): DataFrame = {
    val plan = epochPlan(df, groupCol, lenCol, budgetTokens, maxEpochs)
      .select(col(groupCol), col("full_epochs"), col("remainder_tokens"))
    val base = df.where(col(groupCol).isNotNull)
      .select(col(idCol).as("id"), col(groupCol), lenCol.cast("long").as("tokens"))
      .join(broadcast(plan), Seq(groupCol))
    val fullPasses = base
      // sequence(1,0) would DESCEND in Spark — guard the zero-epoch case
      .where(col("full_epochs") >= 1)
      .withColumn("epoch",
        explode(sequence(lit(1L), col("full_epochs"))))
    val w = Window.partitionBy(groupCol)
      .orderBy(Hashing.stableHash60(concat_ws(" ", lit(seed.toString),
        col("id").cast("string"))).asc, col("id").asc)
    val remainder = base
      .withColumn("__before", coalesce(
        sum(col("tokens")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .where(col("__before") < col("remainder_tokens"))
      .withColumn("epoch", col("full_epochs") + 1)
    fullPasses.select(col("id"), col(groupCol), col("epoch"), col("tokens"))
      .unionByName(remainder.select(col("id"), col(groupCol), col("epoch"),
        col("tokens")))
  }
}
