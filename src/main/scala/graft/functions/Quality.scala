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
}
