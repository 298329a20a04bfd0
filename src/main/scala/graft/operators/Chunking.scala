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
}
