package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic subword tokenization (BPE-lite) — tokenizer-faithful token
 * counts for the budget consumers (sequence packing q50, chunk widths,
 * OOV screening). Whitespace counts undercount what a trained tokenizer
 * sees ("internationalization" is one whitespace token but ~5 BPE units),
 * so packing budgets computed from them overfill real training sequences.
 *
 * Training is classic byte-pair encoding over the corpus's AGGREGATED
 * word-frequency table (public-knowledge algorithm — Sennrich et al. 2016
 * shape): start from characters, repeatedly merge the most frequent
 * adjacent symbol pair. Everything is deterministic: candidate words are
 * the top `maxWords` by (occurrences desc, word asc), the merge choice
 * tie-breaks (count desc, pair lexicographic), so two trainings on the
 * same corpus produce identical vocabularies on any cluster.
 *
 * Counting contract (the part both engines/paths must agree on): a word
 * present in the trained table costs its merged-unit count; any other
 * word falls back to its character count (the no-merges-known floor).
 * The fallback is what keeps the COLUMN path expressible without a UDF —
 * applying merge rules to unseen words needs imperative code, so the
 * Scala twin implements the same table+fallback rule, and SubwordSpec
 * pins the parity. At 100 TB the table is vocabulary-cardinality
 * (aggregated), rides the plan as a literal/broadcast, and the count is
 * a narrow per-row fold — zero shuffles beyond the one training
 * aggregation.
 */
object Subword {

  /** Trained vocabulary: the ordered merge list (the tokenizer itself),
    * the word → unit-count table its training words compile to, and the
    * word → segment table (the compiled encodings themselves). The
    * fallback for words outside the table is per-character units — the
    * no-merges-known floor, so `unitCount` is always `units.size`. */
  final case class Vocab(merges: Seq[(String, String)],
                         wordUnits: Map[String, Int],
                         wordSegments: Map[String, Seq[String]] = Map.empty) {
    def unitCount(word: String): Int = wordUnits.getOrElse(word, word.length)
    def units(word: String): Seq[String] =
      wordSegments.getOrElse(word, word.map(_.toString))
  }

  /** Apply the learned merges to one word — the real BPE segmenter (used
    * at train time to build the table; exposed for callers that tokenize
    * driver-side strings). */
  def segment(word: String, merges: Seq[(String, String)]): Vector[String] = {
    var syms = word.map(_.toString).toVector
    merges.foreach { case (a, b) =>
      if (syms.size >= 2) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.size) {
          if (i + 1 < syms.size && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
    }
    syms
  }

  /**
   * Train from a corpus: one aggregation (word frequencies), a bounded
   * driver collect of the top `maxWords`, then `numMerges` BPE rounds.
   * The collect is vocabulary-bounded, never corpus-bounded — the same
   * contract as trainCentroids' sample.
   */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 10000): Vocab = {
    require(numMerges >= 0 && maxWords > 0)
    val freqs = graft.operators.CorpusStats.tokenFrequencies(docs, textCol)
      .where(length(col("token")) > 0)
      .orderBy(col("occurrences").desc, col("token").asc)
      .limit(maxWords)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    trainFromFrequencies(freqs.toSeq, numMerges)
  }

  /** BPE over an explicit (word, frequency) table — deterministic given
    * the input order-insensitively (pair counts are sums; ties break on
    * the pair itself). */
  def trainFromFrequencies(wordFreq: Seq[(String, Long)], numMerges: Int): Vocab = {
    var words: Vector[(Vector[String], Long)] =
      wordFreq.map { case (w, f) => (w.map(_.toString).toVector, f) }.toVector
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.size) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // max count, ties → lexicographically smallest pair: deterministic
        // regardless of hash-map iteration order
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, f) =>
          if (syms.size < 2) (syms, f)
          else {
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.size) {
              if (i + 1 < syms.size && syms(i) == best._1 && syms(i + 1) == best._2) {
                out += (best._1 + best._2); i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.result(), f)
          }
        }
        m += 1
      }
    }
    val ms = merges.result()
    val segs = wordFreq.map { case (w, _) => w -> (segment(w, ms): Seq[String]) }.toMap
    Vocab(ms, segs.map { case (w, u) => w -> u.size }, segs)
  }

  /** Tokenizer-faithful token count as a pure Column: fold over the
    * whitespace tokens, each costing its table units (char-count fallback
    * for words outside the trained vocabulary). The table rides the
    * expression as a literal map — the plan-embedded form of a broadcast. */
  def countColumn(textCol: Column, vocab: Vocab): Column = {
    val table = typedLit(vocab.wordUnits)
    // outer coalesce: null text counts 0 (same rule as the Scala twin —
    // a missing document has no token budget)
    coalesce(
      aggregate(Text.tokens(textCol), lit(0L),
        (acc, t) => acc +
          coalesce(element_at(table, t).cast("long"), length(t).cast("long"))),
      lit(0L))
  }

  /** Plain-Scala twin of [[countColumn]] — same value for the same text
    * (SubwordSpec pins the parity); for driver-side budgeting and
    * streaming state code that counts outside a Column. */
  def countScala(text: String, vocab: Vocab): Long =
    if (text == null) 0L
    else text.split(" ", -1).map(w => vocab.unitCount(w).toLong).sum

  /**
   * Corpus-scale ENCODE: the document's full subword unit sequence as a
   * pure Column — table words expand to their compiled segments,
   * out-of-vocabulary words fall back to per-character units (the same
   * fallback [[countColumn]] charges for, so `size(unitsColumn) ≡
   * countColumn` by construction; SubwordSpec pins it). Segmentation is
   * lossless: concatenating a word's units rebuilds the word.
   *
   * 100 TB shape: the segment table is vocabulary-cardinality and rides
   * the expression as a literal map (the plan-embedded broadcast form,
   * like countColumn's table); the encode is a zero-shuffle narrow
   * projection at scan speed. Null text encodes to the empty sequence.
   */
  def unitsColumn(textCol: Column, vocab: Vocab): Column = {
    val table = typedLit(vocab.wordSegments)
    // the empty-unit filter keeps the size ≡ countColumn contract on
    // EMPTY tokens: split("", "") is [""] in Spark while the count
    // charges length 0 — and no legitimate unit is ever empty (segments
    // and characters are non-empty by construction)
    coalesce(
      filter(
        flatten(transform(Text.tokens(textCol),
          t => coalesce(element_at(table, t), split(t, "")))),
        u => length(u) > 0),
      typedLit(Seq.empty[String]))
  }

  /** Plain-Scala twin of [[unitsColumn]]. */
  def unitsScala(text: String, vocab: Vocab): Seq[String] =
    if (text == null) Seq.empty
    else text.split(" ", -1).toSeq.flatMap(w => vocab.units(w))
}
