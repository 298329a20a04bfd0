package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming incremental near-dedup — the ingest-time form of the daily
 * batch job, sharing ONE code path with it: every micro-batch computes its
 * minhash signatures, generates candidates against the persisted signature
 * STORE via [[Dedup.incrementalLshCandidates]] (old×old buckets never
 * expand — the |new|-shaped work guarantee), then appends its signatures
 * to the store. A daily batch job calls [[step]] directly with the day's
 * documents; the streaming loop calls the same function per micro-batch
 * through `foreachBatch` — so batch and streaming ingestion cannot drift
 * apart in dedup semantics.
 *
 * The store is a plain parquet signature table (id + numHashes columns,
 * corpus-cardinality — signatures, never documents). State is therefore
 * OUTSIDE the streaming state store: signatures survive restarts, are
 * shared with batch jobs, and are queryable. At 100 TB the store would be
 * partitioned/bucketed by band-key prefix so the per-batch scan prunes
 * (noted on the operator); the loop shape is unchanged.
 *
 * Output per batch: the distinct candidate pairs with ≥1 side in the
 * batch (verify with exact Jaccard downstream, exactly like q39). Unioned
 * over all batches, the candidates equal one full-corpus LSH run — the
 * equivalence StatefulOpsSpec pins.
 */
object IncrementalDedup {

  /**
   * One ingestion step: candidates for `batch` against (store ∪ batch),
   * then the batch's signatures appended to the store. Returns the
   * candidate pairs. Bootstraps an absent store as empty.
   */
  def step(batch: DataFrame, idCol: String, textCol: String, storePath: String,
           n: Int = 3, numHashes: Int = 16, bands: Int = 4,
           maxBucket: Int = 10000): DataFrame = {
    val spark = batch.sparkSession
    // two consumers (candidate generation + store append): eager checkpoint
    val newSigs = Dedup.minhashSignatures(batch, idCol, textCol, n, numHashes)
      .localCheckpoint()
    val fs = new org.apache.hadoop.fs.Path(storePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oldSigs =
      if (fs.exists(new org.apache.hadoop.fs.Path(storePath)))
        spark.read.parquet(storePath)
      else newSigs.limit(0)
    val cands = Dedup.incrementalLshCandidates(newSigs, oldSigs, numHashes, bands,
      maxBucket).localCheckpoint() // materialize BEFORE the store gains the batch
    newSigs.write.mode("append").parquet(storePath)
    cands
  }

  /**
   * Attach the loop to a streaming document source: per micro-batch, run
   * [[step]] and append the candidate pairs to `outPath`. Batch ids are
   * not replay-safe dedup keys on their own — a restarted batch re-runs
   * step() after its signatures were stored, so its new×old pairs include
   * self-pairs filtered by id inequality; downstream consumers treat the
   * pair table as a set (distinct on read), the usual idempotency
   * convention for append-only candidate logs.
   */
  def attach(docs: DataFrame, idCol: String, textCol: String, storePath: String,
             outPath: String, checkpointPath: String,
             n: Int = 3, numHashes: Int = 16, bands: Int = 4,
             maxBucket: Int = 10000): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        step(batch, idCol, textCol, storePath, n, numHashes, bands, maxBucket)
          .write.mode("append").parquet(outPath)
      }
      .start()
}
