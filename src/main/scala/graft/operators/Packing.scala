package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing for LLM pretraining (training-data-pipeline extension):
 * concatenate documents and split the token stream into fixed-length
 * training sequences — the standard "concat then chunk" packing step. Each
 * document gets its shard, its token start offset in the shard's
 * concatenated stream, the id of the sequence containing its first token
 * (`pack_id`), and how many sequences it straddles (`spans_packs`).
 *
 * Determinism: concatenation order is (stableHash60(id), id) within a
 * shard — a portable pseudo-random shuffle (packing wants decorrelated
 * neighbors), reproducible on any cluster or engine.
 *
 * Scale shape: a cumulative sum is inherently sequential, so packing runs
 * PER SHARD — the window partitions by shard, and shard count is the
 * parallelism knob (pick shards ≫ executor count at 100 TB; production
 * packing jobs shard exactly like this). One shuffle on the shard key;
 * everything else is narrow arithmetic on the running offset.
 */
object Packing {

  /** Exact integer floor division by a positive width over the full long
    * range (RangeJoin.floorDiv's pattern): `floor(x / w)` computes in IEEE
    * double and drifts by one past 2^53. Pack ids divide the SHARD-level
    * cumulative token offset — cross-document, so unlike the within-doc
    * chunking offsets it is the one packing quantity that grows with the
    * corpus rather than with a single document. */
  private def floorDiv(c: Column, w: Long): Column = {
    val lc = c.cast("long")
    call_function("div", lc - pmod(lc, lit(w)), lit(w))
  }

  /**
   * @param tokenCount Column producing the document's token count (e.g.
   *                   `Text.tokenCount(col("text"))`)
   * @param shards     number of independent packing streams
   * @param maxTokens  training-sequence length in tokens
   */
  def packSequences(docs: DataFrame, idCol: String, tokenCount: Column,
                    shards: Int, maxTokens: Int): DataFrame = {
    require(shards > 0 && maxTokens > 0, "shards and maxTokens must be positive")
    val h = Hashing.stableHash60(col(idCol).cast("string"))
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val packOf = (offset: Column) => floorDiv(offset, maxTokens)
    docs
      .select(col(idCol), tokenCount.cast("long").as("tokens"),
        pmod(h, lit(shards)).cast("long").as("shard"), h.as("__h"))
      .withColumn("start_offset", coalesce(sum(col("tokens")).over(w), lit(0L)))
      .select(col(idCol), col("shard"), col("tokens"), col("start_offset"),
        packOf(col("start_offset")).as("pack_id"),
        // sequences overlapped by token interval [start, start+tokens-1]
        // (for a zero-token doc the degenerate interval reports 1, or 0
        // exactly at a pack boundary — deterministic either way)
        (packOf(col("start_offset") + col("tokens") - 1) -
          packOf(col("start_offset")) + 1).as("spans_packs"))
  }

  /**
   * Per-sequence document SEGMENT map — what a trainer consumes to build
   * attention/loss masks over packed sequences: for every (shard, seq_id,
   * doc) overlap, the doc's token range WITHIN that sequence (0-based
   * inclusive [seg_start, seg_end], seg ⊆ [0, maxTokens−1]). A document
   * crossing a pack boundary contributes one row per sequence it touches;
   * summing (seg_end − seg_start + 1) over a doc's rows returns exactly
   * its token count, and a sequence's segments tile it without overlap —
   * the two invariants masks need (spec-pinned). Zero-token docs occupy
   * no positions and are omitted.
   *
   * Long scalar format on purpose (no nested arrays): joinable, oracle-
   * checkable, and directly groupable into whatever mask layout the
   * training stack wants. Shape: [[packSequences]]'s one per-shard window
   * + a narrow bounded explode (spans_packs rows per doc — a doc emits
   * ⌈tokens/maxTokens⌉+1 rows at most).
   */
  def packSegments(docs: DataFrame, idCol: String, tokenCount: Column,
                   shards: Int, maxTokens: Int): DataFrame = {
    val mt = lit(maxTokens.toLong)
    packSequences(docs, idCol, tokenCount, shards, maxTokens)
      .where(col("tokens") > 0)
      .select(col(idCol), col("shard"), col("tokens"), col("start_offset"),
        explode(sequence(col("pack_id"),
          col("pack_id") + col("spans_packs") - 1)).as("seq_id"))
      .select(col("shard"), col("seq_id"), col(idCol),
        greatest(lit(0L), col("start_offset") - col("seq_id") * mt).as("seg_start"),
        (least(col("seq_id") * mt + mt - 1,
          col("start_offset") + col("tokens") - 1) - col("seq_id") * mt).as("seg_end"))
  }

  /**
   * Per-shard packing-efficiency report — the utilization metric a
   * training team tracks over a packed layout: how much of the emitted
   * sequence budget is real tokens vs tail padding. Under
   * [[packSequences]]' greedy concat-then-chunk layout the ONLY waste is
   * each shard's final partial sequence, so utilization =
   * n_tokens / (n_sequences · maxTokens); the report also counts docs
   * crossing a sequence boundary (the segments a trainer must mask
   * across — the cost side of packing's density win).
   *
   * Output per shard: (shard, n_docs, n_tokens, n_sequences,
   * n_spanning_docs, utilization) — exact integer arithmetic plus one
   * deterministic double division (0.0 for an empty/zero-token shard).
   *
   * Scale shape: rides packSequences' one per-shard window, then ONE
   * shard-cardinality aggregation — output is shard-count-sized.
   */
  def packingEfficiency(docs: DataFrame, idCol: String, tokenCount: Column,
                        shards: Int, maxTokens: Int): DataFrame =
    packSequences(docs, idCol, tokenCount, shards, maxTokens)
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("n_tokens"),
        (floorDiv(max(col("start_offset") + col("tokens")) - 1,
          maxTokens) + 1L).as("n_sequences"),
        sum(when(col("spans_packs") > 1, 1L).otherwise(0L)).as("n_spanning_docs"))
      .withColumn("utilization",
        when(col("n_sequences") > 0,
          col("n_tokens").cast("double") /
            (col("n_sequences") * maxTokens).cast("double"))
          .otherwise(lit(0.0)))
}
