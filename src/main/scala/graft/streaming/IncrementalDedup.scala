package graft.streaming

import graft.operators.{Cleaning, Dedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming incremental near-dedup — the ingest-time form of the daily
 * batch job, sharing ONE code path with it: every micro-batch computes its
 * minhash signatures, generates candidates against the persisted signature
 * STORE via [[Dedup.incrementalLshCandidates]] (old×old buckets never
 * expand — the |new|-shaped work guarantee), then writes its signatures
 * to the store. A daily batch job calls [[step]] directly with the day's
 * documents; the streaming loop calls the same function per micro-batch
 * through `foreachBatch` — so batch and streaming ingestion cannot drift
 * apart in dedup semantics.
 *
 * The store is a parquet signature table (id + numHashes columns,
 * corpus-cardinality — signatures, never documents) PARTITIONED BY the
 * caller's `batchTag`, written with dynamic partition overwrite. That
 * makes every step REPLAY-IDEMPOTENT — `foreachBatch` retries a failed
 * micro-batch, and a plain append would duplicate its store rows forever —
 * and replay-EXACT: the old side excludes the current tag's partition, so
 * a re-run computes against exactly the store state the first attempt saw.
 * The tag must uniquely identify the ingestion batch (the date for a daily
 * job, the streaming batchId) — reusing a tag overwrites that batch's rows
 * by design. State is therefore OUTSIDE the streaming state store:
 * signatures survive restarts, are shared with batch jobs, and are
 * queryable.
 *
 * Output per batch: the distinct candidate pairs with ≥1 side in the
 * batch (verify with exact Jaccard downstream, exactly like q39). Unioned
 * over all batches, the candidates equal one full-corpus LSH run — the
 * equivalence StatefulOpsSpec pins.
 */
object IncrementalDedup {

  private def fsExists(df: DataFrame, path: String): Boolean =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(path))

  /** Idempotent store write: the batch's rows land in (at least) the
    * `batch=<tag>` partition, REPLACING any prior attempt's rows there
    * (dynamic overwrite touches only the partitions present in the data —
    * other batches' partitions are untouched). */
  private def writeTagged(rows: DataFrame, tag: String, path: String,
                          partitionCols: String*): Unit =
    rows.withColumn("batch", org.apache.spark.sql.functions.lit(tag))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch" +: partitionCols: _*)
      .parquet(path)

  /**
   * One ingestion step: candidates for `batch` against (store ∪ batch),
   * then the batch's signatures written to the store under `batchTag`.
   * Returns the candidate pairs. Bootstraps an absent store as empty.
   * Re-running the same tag (a `foreachBatch` replay) returns the same
   * candidates and leaves the store unchanged.
   */
  def step(batch: DataFrame, idCol: String, textCol: String, storePath: String,
           batchTag: String, n: Int = 3, numHashes: Int = 16, bands: Int = 4,
           maxBucket: Int = 10000): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val spark = batch.sparkSession
    // two consumers (candidate generation + store write): eager checkpoint
    val newSigs = Dedup.minhashSignatures(batch, idCol, textCol, n, numHashes)
      .localCheckpoint()
    val oldSigs =
      if (fsExists(batch, storePath))
        spark.read.parquet(storePath)
          .where(col("batch") =!= lit(batchTag)) // replay: skip own partition
          .drop("batch")
      else newSigs.limit(0)
    val cands = Dedup.incrementalLshCandidates(newSigs, oldSigs, numHashes, bands,
      maxBucket).localCheckpoint() // materialize BEFORE the store gains the batch
    writeTagged(newSigs, batchTag, storePath)
    cands
  }

  /**
   * [[step]] with a BAND-LAYOUT store — the 100 TB shape the plain-store
   * operator note promises. Instead of signature rows, the store persists
   * the exploded (id, band, sig) band keys PARTITIONED BY (band, pfx)
   * where pfx = hash(sig) mod `pfxMod`: a micro-batch touches only the
   * (band, pfx) cells its own band keys hash into, so the store scan
   * prunes every untouched partition at the FILE LISTING — the per-batch
   * read is |touched partitions|-shaped, not |corpus|-shaped. (The plain
   * [[step]] always scans the whole signature store; its broadcast
   * semi-join drops rows only after reading them.)
   *
   * Candidates are identical to [[step]]'s by construction (pruning by
   * (band, pfx) is lossless: a stored row matters only if a new row
   * shares its exact (band, sig), which pins the same pfx) — the
   * equivalence is spec-pinned. Store maintenance: per-tag writes
   * accumulate small files per (band, pfx) cell; Layout.compact per leaf
   * partition is the maintenance op.
   */
  def stepBandStore(batch: DataFrame, idCol: String, textCol: String,
                    storePath: String, batchTag: String, n: Int = 3,
                    numHashes: Int = 16, bands: Int = 4, maxBucket: Int = 10000,
                    pfxMod: Int = 64): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = batch.sparkSession
    val newBands = Dedup.explodedBandKeys(
        Dedup.minhashSignatures(batch, idCol, textCol, n, numHashes), numHashes, bands)
      .withColumn("pfx", pmod(graft.functions.Hashing.stableHash60(col("sig")), lit(pfxMod)))
      .localCheckpoint() // consumed by touched-cells, candidates AND the write
    // touched partition cells: bounded by bands·pfxMod, driver-safe
    val touched = newBands.select("band", "pfx").distinct()
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val old =
      if (touched.nonEmpty && fsExists(batch, storePath)) {
        // OR-chain over partition-column equalities → partition pruning at
        // the scan (an expression OVER the partition columns would not prune)
        val pred = touched.map { case (b, p) =>
          col("band") === b && col("pfx") === p
        }.reduce(_ || _)
        spark.read.parquet(storePath)
          .where(pred && col("batch") =!= lit(batchTag))
          .select("id", "band", "sig")
      } else newBands.select("id", "band", "sig").limit(0)
    val cands = Dedup.incrementalLshCandidatesFromBands(
      newBands.select("id", "band", "sig"), old, maxBucket)
      .localCheckpoint() // materialize BEFORE the store gains the batch
    writeTagged(newBands, batchTag, storePath, "band", "pfx")
    cands
  }

  /**
   * Ingest-time SPAN screen — the streaming twin of
   * [[Dedup.duplicatedSpanRanges]]: for each micro-batch document, the
   * merged token ranges covered by a window-passage already seen in
   * ANOTHER document (earlier batches via the span store, or this batch).
   * The "have I seen this boilerplate before" check a crawl pipeline runs
   * before admitting a page; downstream cleaners cut exactly these
   * ranges. Output covers the NEW docs only — that is the ingest
   * contract; a retroactive sweep over old docs is the batch operator's
   * job.
   *
   * Store: (id, pos, h) span rows partitioned by pfx = h mod `pfxMod`
   * (same pruning argument as [[stepBandStore]]: a stored span matters
   * only if a new span shares its exact h, which pins the pfx — the
   * per-batch store read prunes to the touched cells at the file
   * listing). Spec pins per-batch equality with the batch operator run
   * over the corpus-so-far, restricted to the batch's docs — and that
   * equality is exactly why replays must exclude the own-tag partition:
   * a batch must never match spans its own earlier attempt stored.
   */
  def stepSpans(batch: DataFrame, idCol: String, textCol: String,
                storePath: String, batchTag: String, window: Int,
                maxBucket: Int = 10000, pfxMod: Int = 64): DataFrame = {
    // named imports: the wildcard would shadow the `window` parameter
    // with functions.window
    import org.apache.spark.sql.functions.{array_distinct, col, explode,
      filter, lit, pmod, size, transform}
    import graft.expressions.BoundedCollectAgg
    val spark = batch.sparkSession
    val newSpans = Dedup.spanHashes(batch, idCol, textCol, window)
      .withColumn("pfx", pmod(col("h"), lit(pfxMod.toLong)))
      .localCheckpoint() // consumed by touched-cells, the mark AND the write
    val touched = newSpans.select("pfx").distinct().collect().map(_.getLong(0))
    val old =
      if (touched.nonEmpty && fsExists(batch, storePath))
        spark.read.parquet(storePath)
          .where(col("pfx").isin(touched.map(Long.box).toIndexedSeq: _*) &&
            col("batch") =!= lit(batchTag))
          .select("id", "pos", "h")
      else newSpans.select("id", "pos", "h").limit(0)
    val marked = old.withColumn("is_new", lit(0))
      .unionByName(newSpans.select("id", "pos", "h").withColumn("is_new", lit(1)))
      .groupBy("h")
      // capped collection (empty past maxBucket) — the posting-list buffer
      // stays cap-bounded even for store-wide boilerplate spans
      .agg(BoundedCollectAgg.occsCapped(col("id"), col("pos"), col("is_new"),
        maxBucket).as("occs"))
      .where(size(array_distinct(transform(col("occs"), o => o.getField("id")))) >= 2)
      // emit the NEW side's positions only — old docs were ruled on when
      // they themselves arrived
      .select(explode(filter(col("occs"), o => o.getField("is_new") === 1)).as("o"))
      .select(col("o.id").as("id"), col("o.pos").as("pos"))
    val ranges = Dedup.mergeSpanRanges(marked, window)
      .localCheckpoint() // materialize BEFORE the store gains the batch
    writeTagged(newSpans, batchTag, storePath, "pfx")
    ranges
  }

  /**
   * Attach the loop to a streaming document source: per micro-batch, run
   * [[step]] tagged with the batch id and append the candidate pairs to
   * `outPath`. The store side is replay-idempotent (a restarted batch
   * overwrites its own partition and recomputes IDENTICAL candidates —
   * the old side excludes its own tag); the candidate log at `outPath`
   * is still an append-only log, so a replay can append the same pairs
   * twice — downstream consumers treat the pair table as a set (distinct
   * on read), the usual convention for candidate logs.
   */
  def attach(docs: DataFrame, idCol: String, textCol: String, storePath: String,
             outPath: String, checkpointPath: String,
             n: Int = 3, numHashes: Int = 16, bands: Int = 4,
             maxBucket: Int = 10000): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        step(batch, idCol, textCol, storePath, s"b$batchId", n, numHashes, bands,
          maxBucket)
          .write.mode("append").parquet(outPath)
      }
      .start()

  /** Streaming SURGICAL decontamination — the stateless member of the
    * ingest-screen family: per micro-batch, the eval-passage FIXPOINT cut
    * (seam-created leaks re-cut until none remain) against the STATIC
    * eval set. The eval span-hash set is computed and checkpointed ONCE
    * for the whole stream — not once per batch — and there is no store,
    * no tag, and no replay concern beyond the append-only output log.
    * Crawl admission runs this BEFORE the stateful span screen, so text
    * still matching an eval span after `maxRounds` cuts is the only leak
    * that can reach the span store. */
  def attachEvalCut(docs: DataFrame, evalDocs: DataFrame, idCol: String,
                    textCol: String, outPath: String, checkpointPath: String,
                    window: Int, maxRounds: Int = 3): StreamingQuery = {
    val evalHashes = Dedup.evalSpanHashes(evalDocs, idCol, textCol, window)
      .localCheckpoint() // static for the stream's lifetime
    docs.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Dedup.cutEvalFixpointFromHashes(batch, evalHashes, idCol, textCol,
            window, maxRounds)
          .write.mode("append").parquet(outPath)
      }
      .start()
  }

  /** [[attach]] for the SPAN screen: per micro-batch, [[stepSpans]] tagged
    * with the batch id, duplicated-passage ranges appended to `outPath`.
    * Same idempotence story as attach: the span store is replay-exact,
    * the range log is append-only (distinct on read). */
  def attachSpans(docs: DataFrame, idCol: String, textCol: String,
                  storePath: String, outPath: String, checkpointPath: String,
                  window: Int, maxBucket: Int = 10000,
                  pfxMod: Int = 64): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        stepSpans(batch, idCol, textCol, storePath, s"b$batchId", window,
          maxBucket, pfxMod)
          .write.mode("append").parquet(outPath)
      }
      .start()

  /** Ingest-time LM fluency screen — the streaming form of the CCNet
    * band (stage 4a): per micro-batch, admit documents whose perplexity
    * under a FROZEN calibration model clears the FROZEN threshold
    * (`NgramLm.pplThresholdFilter`). The decision is a pure per-document
    * function of the frozen state — no store, no rank over the stream —
    * so batch and streaming replays agree exactly (StatefulOpsSpec pins
    * the parity). Calibrate with `NgramLm.pplQuantile`; the band filter
    * itself is NOT streamable (it ranks the whole corpus). */
  def attachLmScreen(docs: DataFrame, lm: DataFrame, totals: DataFrame,
                     idCol: String, textCol: String, maxPpl: Double,
                     outPath: String, checkpointPath: String,
                     alpha: Double = 0.4): StreamingQuery = {
    val lmFrozen = lm.localCheckpoint() // static for the stream's lifetime
    val totFrozen = totals.localCheckpoint()
    docs.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.NgramLm.pplThresholdFilter(batch, lmFrozen, totFrozen,
            idCol, textCol, maxPpl, alpha)
          .write.mode("append").parquet(outPath)
      }
      .start()
  }

  /** Ingest-time INTEGER-grain fluency screen — the streaming twin of the
    * capstone's gated stage 4a (CorpusPipeline `fluencyMin`): per
    * micro-batch, admit documents whose token mass the FROZEN calibration
    * model matches at order ≥ 2 for at least num/den of their scored
    * tokens (`NgramLm.fluencyThresholdFilter` — exact cross-multiplied
    * integers, no floats). Pure per-document function of the frozen
    * state, so batch and streaming replays agree BIT-FOR-BIT — unlike
    * [[attachLmScreen]]'s float perplexity cut, this twin carries the
    * oracle-exact decision the batch gate (q127/q128) runs. */
  def attachFluencyScreen(docs: DataFrame, lm: DataFrame, totals: DataFrame,
                          idCol: String, textCol: String, num: Int, den: Int,
                          outPath: String, checkpointPath: String,
                          n: Int = 3): StreamingQuery = {
    val lmFrozen = lm.localCheckpoint() // static for the stream's lifetime
    val totFrozen = totals.localCheckpoint()
    docs.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.NgramLm.fluencyThresholdFilter(batch, lmFrozen,
            totFrozen, idCol, textCol, num, den, n)
          .write.mode("append").parquet(outPath)
      }
      .start()
  }

  /**
   * Ingest-time LINE-frequency screen — the streaming twin of
   * `Cleaning.dropFrequentLines` under the crawl-admission contract:
   * each arriving document has its chrome lines cut against the
   * frequency census over the corpus SO FAR (persisted line store ∪ this
   * batch); already-admitted documents are not re-edited when a line
   * later crosses the threshold (they were ruled on at arrival — the
   * batch operator over the full corpus is the retroactive form).
   *
   * Store: one row per DISTINCT (doc, line-hash) — presence, not
   * multiplicity, so within-doc repeats count their doc once, exactly
   * like the batch census — partitioned by (batch, pfx): the per-batch
   * dynamic overwrite makes replays idempotent, and the hash-prefix
   * cell lets a batch's touched-prefix set prune the store scan at the
   * file listing. Returns the batch with edited text (docs the cut
   * empties are the CALLER's drop decision, as in the pipeline stage).
   */
  def stepLines(batch: DataFrame, idCol: String, textCol: String,
                storePath: String, batchTag: String, sep: String,
                minDocs: Long, pfxMod: Int = 64): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, countDistinct, length, lit, pmod}
    val spark = batch.sparkSession
    // One tokenization per batch: the line stream (with positions) is
    // micro-batch-sized, so checkpointing it and deriving the store
    // write, the census AND the edit from it is the cheap side of the
    // staging rule. Empty lines are structure, not chrome — they never
    // enter the store or the census (the Cleaning.lineCensus rule).
    val lines = Cleaning.docLines(batch, idCol, textCol, sep)
      .localCheckpoint()
    val newLines = lines.where(length(col("line")) > 0)
      .select(col("id"), col("line_h")).distinct()
      .withColumn("pfx", pmod(col("line_h"), lit(pfxMod.toLong)))
      .localCheckpoint() // consumed by touched-cells, the census AND the write
    val touched = newLines.select("pfx").distinct().collect().map(_.getLong(0))
    val old =
      if (touched.nonEmpty && fsExists(batch, storePath))
        spark.read.parquet(storePath)
          .where(col("pfx").isin(touched.map(Long.box).toIndexedSeq: _*) &&
            col("batch") =!= lit(batchTag))
          // Census rows are only CONSUMED for hashes present in this
          // batch (the edit left-semi-joins the batch's lines against
          // freq), so the store read prunes to them: per-step cost
          // tracks the batch's lines' corpus frequency, not the
          // accumulated store size (pfx cells saturate at ~pfxMod
          // distinct batch lines; this prune does not).
          .join(broadcast(newLines.select("line_h").distinct()),
            Seq("line_h"), "left_semi")
          .select("id", "line_h")
      else newLines.select("id", "line_h").limit(0)
    val freq = old.unionByName(newLines.select("id", "line_h"))
      .groupBy("line_h")
      .agg(countDistinct(col("id")).as("n_docs"))
      .where(col("n_docs") >= minDocs)
      .select("line_h")
    val edited = Cleaning.cutLinesWith(batch, idCol, textCol, sep, lines, freq)
      .localCheckpoint() // materialize BEFORE the store gains the batch
    writeTagged(newLines, batchTag, storePath, "pfx")
    edited
  }

  /** [[stepLines]] on a streaming source: per micro-batch, edit against
    * the store-so-far and append the admitted (edited) docs to `outPath`.
    * Same replay story as [[attach]]: the store write is idempotent per
    * tag; the output log is append-only (consumers read it as a set). */
  def attachLines(docs: DataFrame, idCol: String, textCol: String,
                  storePath: String, outPath: String, checkpointPath: String,
                  sep: String, minDocs: Long, pfxMod: Int = 64): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        stepLines(batch, idCol, textCol, storePath, s"b$batchId", sep,
          minDocs, pfxMod)
          .write.mode("append").parquet(outPath)
      }
      .start()
}
