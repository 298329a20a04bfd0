package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Rule-based document quality screens for training corpora — the Gopher
 * quality-filter family (Rae et al. 2021, "Scaling Language Models",
 * §A1.1), the rule set MassiveWeb introduced and C4/RefinedWeb-style
 * pipelines reuse: per-document boolean rules rather than a blended
 * score, so every drop is attributable to exactly one named rule and the
 * funnel census is auditable per rule.
 *
 * Every threshold comparison is EXACT-INTEGER arithmetic (`10·symbols <
 * words`, never `symbols/words < 0.1`): ratio rules at the boundary would
 * otherwise hinge on float rounding and engine division order. Counts of
 * literal substrings use replace-length arithmetic (the [[Text.linkCount]]
 * pattern) — identical non-overlapping left-to-right semantics in every
 * engine. All rules are pure Column expressions: a zero-shuffle narrow
 * projection that runs at scan speed over a 100 TB corpus, and each rule
 * plugs directly into [[graft.pipeline.CorpusPipeline.run]]'s stage
 * funnel via [[gopherStages]] (per-stage attributable drop counts for
 * free).
 *
 * Complements [[Text.docQualityScore]] (the reference-shaped blended
 * score, glue_weather_etl.py:423-430) and the CCNet-style LM band
 * ([[graft.operators.NgramLm.pplBandFilter]]): rules catch structural
 * garbage (symbol soup, bullet-list chrome, word-salad length outliers),
 * the LM catches disfluency the rules cannot see.
 */
object Quality {

  /** Gopher's stop-word presence list (Rae 2021 A1.1: "contains at least
    * two of: the, be, to, of, and, that, have, with"). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Word-count band [50, 100000] (Gopher's document length rule). */
  val MinWords = 50L
  val MaxWords = 100000L

  private def words(text: Column): Column = Text.tokens(text)
  private def nWords(text: Column): Column = size(words(text)).cast("long")
  private def docLines(text: Column): Column = split(text, "\n")

  /** Non-overlapping occurrences of a literal substring, exact via
    * replace-length arithmetic. */
  private def litCount(text: Column, s: String): Column =
    ((length(text) - length(replace(text, lit(s), lit("")))) / s.length.toLong)
      .cast("long")

  /** Rule 1: word count within [50, 100000]. */
  def ruleWordCount(text: Column): Column =
    nWords(text).between(MinWords, MaxWords)

  /** Rule 2: mean word length within [3, 10] characters — exactly
    * 3·words ≤ Σ len(word) ≤ 10·words. */
  def ruleMeanWordLength(text: Column): Column = {
    val tot = aggregate(words(text), lit(0L), (acc, w) => acc + length(w))
    val n = nWords(text)
    (lit(3L) * n <= tot) && (tot <= lit(10L) * n)
  }

  /** Rule 3: symbol-to-word ratio below 0.1, symbols = '#' characters
    * plus '...' runs — exactly 10·symbols < words. */
  def ruleSymbolRatio(text: Column): Column =
    lit(10L) * (litCount(text, "#") + litCount(text, "...")) < nWords(text)

  /** Rule 4: fewer than 90% of lines start with a bullet ("- " or "• ")
    * — exactly 10·bulletLines < 9·lines. */
  def ruleBulletLines(text: Column): Column = {
    val ls = docLines(text)
    val bullets = size(filter(ls,
      l => startswith(l, lit("- ")) || startswith(l, lit("• ")))).cast("long")
    lit(10L) * bullets < lit(9L) * size(ls).cast("long")
  }

  /** Rule 5: fewer than 30% of lines end with an ellipsis —
    * exactly 10·ellipsisLines < 3·lines. */
  def ruleEllipsisLines(text: Column): Column = {
    val ls = docLines(text)
    val ell = size(filter(ls, l => endswith(l, lit("...")))).cast("long")
    lit(10L) * ell < lit(3L) * size(ls).cast("long")
  }

  /** Rule 6: at least 80% of words contain an alphabetic character —
    * exactly 5·alphaWords ≥ 4·words. */
  def ruleAlphaWords(text: Column): Column = {
    val alpha = size(filter(words(text),
      w => regexp_like(w, lit("[A-Za-z]")))).cast("long")
    lit(5L) * alpha >= lit(4L) * nWords(text)
  }

  /** Rule 7: at least two DISTINCT words from the stop-word marker list
    * appear. The list is a per-language knob (Gopher/CCNet localize it;
    * the canonical English list is the default) — same localization
    * contract as [[Text.langIdHeuristic]]'s marker words. */
  def ruleStopWords(text: Column,
                    stopwords: Seq[String] = GopherStopwords): Column =
    stopwords
      .map(w => array_contains(words(text), w).cast("long"))
      .reduce(_ + _) >= 2L

  /** All seven rules, named — the order is the census order. */
  def gopherFlags(text: Column,
                  stopwords: Seq[String] = GopherStopwords): Seq[(String, Column)] = Seq(
    "r_word_count" -> ruleWordCount(text),
    "r_word_len" -> ruleMeanWordLength(text),
    "r_symbol_ratio" -> ruleSymbolRatio(text),
    "r_bullet_lines" -> ruleBulletLines(text),
    "r_ellipsis_lines" -> ruleEllipsisLines(text),
    "r_alpha_words" -> ruleAlphaWords(text),
    "r_stop_words" -> ruleStopWords(text, stopwords))

  /** Conjunction of all seven rules — the document ships. */
  def gopherKeep(text: Column,
                 stopwords: Seq[String] = GopherStopwords): Column =
    gopherFlags(text, stopwords).map(_._2).reduce(_ && _)

  /** The rules as [[graft.pipeline.CorpusPipeline.run]] funnel stages:
    * the pipeline then reports per-rule attributable drops (each doc is
    * counted against the FIRST rule that rejects it, the funnel
    * contract). */
  def gopherStages(textCol: String,
                   stopwords: Seq[String] = GopherStopwords): Seq[(String, Column)] =
    gopherFlags(col(textCol), stopwords)

  // ---- Gopher repetition screens (Rae 2021 A1.2) ----------------------
  //
  // All metrics are emitted as EXACT-INTEGER (numerator, denominator)
  // character masses, never float fractions, so the threshold compare
  // thrDen·num ≤ thrNum·den is engine-independent at the boundary.
  // N-gram masses count token characters only (spaces excluded; the
  // denominator is [[nonSpaceChars]]); line/paragraph masses count the
  // segment's own characters (intra-segment spaces included; the
  // denominator is the segments' total mass).

  /** Token-character denominator for the n-gram family. */
  def nonSpaceChars(text: Column): Column =
    length(replace(text, lit(" "), lit(""))).cast("long")

  /** Occurrences × mass of the most frequent word n-gram (ties on count
    * → largest mass). Numerator of Gopher's "top n-gram character
    * fraction" (n = 2, 3, 4); one compiled pass per document. */
  def topNgramChars(text: Column, n: Int): Column =
    element_at(graft.expressions.NgramRepetition.column(text, n), 1)

  /** Token-character mass covered by n-grams occurring ≥ 2 times in the
    * document, overlapping occurrences counted once (position mask).
    * Numerator of Gopher's "duplicated n-gram character fraction"
    * (n = 5..10). */
  def dupNgramChars(text: Column, n: Int): Column =
    element_at(graft.expressions.NgramRepetition.column(text, n), 2)

  /** Duplicate-segment statistics over `sep`-delimited segments (lines or
    * paragraphs): (repeat_segments, total_segments, repeat_chars,
    * total_chars), where a repeat is any occurrence AFTER the first
    * identical segment (so repeat_segments = total − distinct). Pure
    * per-row array expressions — segments per document are tens, not
    * thousands, so the O(L²) prefix scan is irrelevant next to the scan. */
  def dupSegmentStats(text: Column, sep: String): (Column, Column, Column, Column) = {
    val segs = split(text, java.util.regex.Pattern.quote(sep))
    val total = size(segs).cast("long")
    val repeats = (size(segs) - size(array_distinct(segs))).cast("long")
    val repeatChars = aggregate(
      transform(segs, (x, i) =>
        when(array_position(slice(segs, lit(1), i), x) > 0,
          length(x).cast("long")).otherwise(0L)),
      lit(0L), (acc, v) => acc + v)
    val totalChars = aggregate(segs, lit(0L), (acc, x) => acc + length(x))
    (repeats, total, repeatChars, totalChars)
  }

  /** Canonical Gopher repetition thresholds, as exact rationals
    * (metricName → (thrNum, thrDen)): drop when num/den > thr, i.e. keep
    * iff thrDen·num ≤ thrNum·den. */
  val RepetitionThresholds: Seq[(String, (Int, Int))] = Seq(
    "dup_line_frac" -> (3 -> 10), // 0.30
    "dup_para_frac" -> (3 -> 10), // 0.30
    "dup_line_chars" -> (1 -> 5), // 0.20
    "dup_para_chars" -> (1 -> 5), // 0.20
    "top2_chars" -> (1 -> 5), // 0.20
    "top3_chars" -> (9 -> 50), // 0.18
    "top4_chars" -> (4 -> 25), // 0.16
    "dup5_chars" -> (3 -> 20), // 0.15
    "dup6_chars" -> (7 -> 50), // 0.14
    "dup7_chars" -> (13 -> 100), // 0.13
    "dup8_chars" -> (3 -> 25), // 0.12
    "dup9_chars" -> (11 -> 100), // 0.11
    "dup10_chars" -> (1 -> 10)) // 0.10

  /** keep iff num/den ≤ thrNum/thrDen, exact cross-multiplication;
    * an empty denominator (no segments / no tokens) passes. */
  private def withinThreshold(num: Column, den: Column, thr: (Int, Int)): Column =
    (den === 0L) || (lit(thr._2.toLong) * num <= lit(thr._1.toLong) * den)

  /** All thirteen repetition metrics as (name, numerator, denominator)
    * integer columns — the census/gate grain. */
  def repetitionMetrics(text: Column): Seq[(String, Column, Column)] = {
    val (dl, tl, dlc, tlc) = dupSegmentStats(text, "\n")
    val (dp, tp, dpc, tpc) = dupSegmentStats(text, "\n\n")
    val tot = nonSpaceChars(text)
    Seq(
      ("dup_line_frac", dl, tl), ("dup_para_frac", dp, tp),
      ("dup_line_chars", dlc, tlc), ("dup_para_chars", dpc, tpc),
      ("top2_chars", topNgramChars(text, 2), tot),
      ("top3_chars", topNgramChars(text, 3), tot),
      ("top4_chars", topNgramChars(text, 4), tot)) ++
      (5 to 10).map(n => (s"dup${n}_chars", dupNgramChars(text, n), tot))
  }

  /** The thirteen repetition rules as named keep-flags at the canonical
    * thresholds — funnel stages, like [[gopherStages]]. */
  def repetitionFlags(text: Column): Seq[(String, Column)] = {
    val thr = RepetitionThresholds.toMap
    repetitionMetrics(text).map { case (name, num, den) =>
      s"r_$name" -> withinThreshold(num, den, thr(name))
    }
  }

  def repetitionKeep(text: Column): Column =
    repetitionFlags(text).map(_._2).reduce(_ && _)

  def repetitionStages(textCol: String): Seq[(String, Column)] =
    repetitionFlags(col(textCol))
}
