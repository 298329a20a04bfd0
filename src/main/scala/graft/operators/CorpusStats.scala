package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus-level vocabulary statistics — the inputs to tokenizer training
 * (BPE merges start from token frequencies), IDF weighting and stop-token
 * selection in a training-data pipeline.
 *
 * Scale shape: token counting is one hash aggregation with map-side
 * combine (the shuffle carries one row per distinct token per partition,
 * not one per occurrence); document frequency deduplicates tokens per doc
 * BEFORE exploding, so its shuffle is bounded the same way. Top-k is a
 * TakeOrdered over the aggregated vocabulary — never a full sort of it.
 */
object CorpusStats {

  /** token → total occurrences across the corpus. */
  def tokenFrequencies(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(Text.tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("occurrences"))

  /** token → number of documents containing it (the IDF denominator). */
  def docFrequencies(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(array_distinct(Text.tokens(col(textCol)))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("doc_freq"))

  /** Top-k vocabulary by occurrence count (ties → lexicographic), with
    * document frequency attached. */
  def topVocabulary(docs: DataFrame, textCol: String, k: Int): DataFrame =
    tokenFrequencies(docs, textCol)
      .join(docFrequencies(docs, textCol), Seq("token"))
      .orderBy(col("occurrences").desc, col("token").asc)
      .limit(k)
}
