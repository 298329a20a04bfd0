package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Fixed-size overlapping token chunks — the retrieval/context-window
 * counterpart of [[Packing]] (which concatenates documents; this one slices
 * them). Every embedding/RAG ingestion pipeline runs exactly this shape:
 * document → sliding windows of `chunkSize` tokens advancing by `stride`
 * (overlap = chunkSize − stride keeps boundary context in two chunks).
 *
 * Scale shape: a single narrow projection + generator — tokenize, compute
 * the chunk count arithmetically, explode a `sequence`, slice. No shuffle,
 * no window; 100 TB of documents chunk at scan speed and the fan-out is
 * bounded by ceil(tokens/stride) per document. The chunk arithmetic is
 * all-integer-in-double (exact below 2^53) so external SQL reproduces it
 * bit-for-bit.
 */
object Chunking {

  /**
   * One row per (doc, chunk): chunk_idx, start_tok (0-based token offset),
   * chunk_tokens (== chunkSize except the final partial chunk), chunk_md5
   * (digest of the space-joined chunk — the dedup/content key downstream
   * stages join on; the text itself stays reconstructable from
   * doc + offsets without shipping it twice).
   *
   * Documents with ≤ chunkSize tokens produce exactly one chunk. For
   * n > chunkSize the count is ceil((n − chunkSize)/stride) + 1 — the last
   * window starts at the smallest multiple of stride covering the tail.
   */
  def chunkByTokens(docs: DataFrame, idCol: String, textCol: String,
                    chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be positive")
    require(stride <= chunkSize, "stride > chunkSize would drop tokens between chunks")
    val toks = Text.tokens(col(textCol))
    val n = size(toks).cast("long")
    val nChunks = when(n <= chunkSize, lit(1L))
      .otherwise(floor((n - chunkSize + stride - 1).cast("double") / stride.toDouble) + 1L)
    val start = col("chunk_idx") * stride
    docs
      .select(col(idCol).as("doc_id"), toks.as("toks"),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"), start.as("start_tok"),
        slice(col("toks"), (start + 1).cast("int"), lit(chunkSize)).as("ctoks"))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        size(col("ctoks")).cast("long").as("chunk_tokens"),
        md5(array_join(col("ctoks"), " ")).as("chunk_md5"))
  }

  /**
   * Sentence-aware chunking — the RAG-ingestion variant that never cuts
   * mid-sentence: split on sentence boundaries ([.!?] runs + whitespace),
   * then assign each sentence to the chunk its cumulative token offset
   * falls in. A sentence that would straddle a boundary belongs wholly to
   * the chunk where it STARTS, so chunks can exceed `maxTokens` by at
   * most one sentence (offset-based assignment, same rule as Packing's
   * pack_id — sequential greedy repacking per doc would not be
   * expressible as a window).
   *
   * One row per (doc, chunk): chunk_idx, sentence array, token count.
   * Every input document appears — one (chunk 0, empty sentences, 0
   * tokens) row for empty/null/punctuation-only text, matching
   * chunkByTokens's every-doc contract. chunk_idx values are
   * OFFSET-DERIVED and may skip (a single sentence spanning multiple
   * chunk widths owns only the index where it starts); consumers needing
   * dense 0..n−1 indices re-rank with a per-doc window.
   *
   * Scale shape: sentences explode (narrow), ONE window shuffle keyed on
   * the doc id for the cumulative offset, then a chunk groupBy on
   * (doc, chunk_idx) — both shuffles carry sentence/chunk cardinality,
   * and every window/group is bounded by a single document's sentences.
   */
  def chunkBySentences(docs: DataFrame, idCol: String, textCol: String,
                       maxTokens: Int): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    import org.apache.spark.sql.expressions.Window
    // split keeps order; filter drops empties from trailing punctuation.
    // posexplode_OUTER keeps sentence-less docs (empty/null/punct-only
    // text) as a single null-sentence row → their chunk-0 row below
    val sentences = docs
      .select(col(idCol).as("doc_id"),
        posexplode_outer(filter(split(col(textCol), "[.!?]+\\s*"), s => length(s) > 0))
          .as(Seq("sent_idx", "sentence")))
      .withColumn("sent_tokens",
        coalesce(Text.tokenCount(col("sentence")), lit(0)))
    val w = Window.partitionBy("doc_id").orderBy("sent_idx")
      .rowsBetween(Window.unboundedPreceding, -1)
    sentences
      .withColumn("start_offset", coalesce(sum(col("sent_tokens")).over(w), lit(0L)))
      .withColumn("chunk_idx", floor(col("start_offset") / maxTokens).cast("long"))
      .groupBy(col("doc_id"), col("chunk_idx"))
      .agg(
        // sentences stay in document order: collect_list's arrival order
        // after the shuffle is NOT guaranteed — sort by the carried index
        // (collect_list also skips the null placeholder row's struct-free
        // entry via the when-filter, leaving sentence-less docs an empty
        // array)
        sort_array(collect_list(when(col("sentence").isNotNull,
          struct(col("sent_idx"), col("sentence"))))).as("s"),
        sum(col("sent_tokens")).as("chunk_tokens"))
      .select(col("doc_id"), col("chunk_idx"),
        transform(col("s"), x => x.getField("sentence")).as("sentences"),
        col("chunk_tokens"))
  }

  /**
   * Two disjoint random crops per document — the positive-pair generator
   * for contrastive embedding pretraining (two views of one document are
   * the positive; other documents in the batch are in-batch negatives).
   * View A starts at hashA mod (slack+1) where slack = n − 2·viewLen;
   * view B starts uniformly AFTER view A ends (hashB mod the remaining
   * room). Both draws are seeded hashes of the doc id: the pairs are
   * bit-reproducible on any cluster/partitioning/engine — `rand()` crops
   * are not — and every eligible doc (n ≥ 2·viewLen) yields exactly one
   * pair per epoch seed. Disjointness by construction keeps the task
   * honest (overlapping views let the encoder cheat on shared tokens).
   *
   * Zero-shuffle narrow projection: tokenize, two mods, two slices —
   * crops at scan speed. Shorter docs are dropped (no pair exists).
   */
  def spanViews(docs: DataFrame, idCol: String, textCol: String,
                viewLen: Int, seed: Long): DataFrame = {
    require(viewLen > 0, "viewLen must be positive")
    import graft.functions.Hashing
    val toks = Text.tokens(col(textCol))
    val n = size(toks).cast("long")
    def h(tag: String) = Hashing.stableHash60(concat_ws(" ",
      lit(seed.toString), lit(tag), col(idCol).cast("string")))
    docs
      .withColumn("n_tokens", n)
      .where(col("n_tokens") >= 2L * viewLen)
      .withColumn("a_start", h("a") % (col("n_tokens") - 2L * viewLen + 1L))
      .withColumn("b_start", col("a_start") + viewLen +
        h("b") % (col("n_tokens") - col("a_start") - 2L * viewLen + 1L))
      .select(col(idCol), col("n_tokens"), col("a_start"), col("b_start"),
        array_join(slice(Text.tokens(col(textCol)),
          (col("a_start") + 1L).cast("int"), lit(viewLen)), " ").as("view_a"),
        array_join(slice(Text.tokens(col(textCol)),
          (col("b_start") + 1L).cast("int"), lit(viewLen)), " ").as("view_b"))
  }
}
