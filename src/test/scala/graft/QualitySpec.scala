package graft

import graft.functions.Quality
import org.apache.spark.sql.functions._

/** Gopher rule-screen corners the synthetic corpus cannot exercise (it is
  * single-line, symbol-free text): every rule pinned on BOTH sides of its
  * threshold at the exact integer boundary, the canonical English
  * stop-word list, and the funnel composition. The oracle gate (q133)
  * covers the word-level rules on live data. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def flag(text: String, rule: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Boolean =
    Seq(Tuple1(text)).toDF("text").select(rule(col("text")).as("f"))
      .collect()(0).getBoolean(0)

  test("rule 1 word count: exact [50, 100000] band edges") {
    val w49 = Seq.fill(49)("w").mkString(" ")
    val w50 = Seq.fill(50)("w").mkString(" ")
    val w100k = Seq.fill(100000)("w").mkString(" ")
    val w100k1 = Seq.fill(100001)("w").mkString(" ")
    assert(!flag(w49, Quality.ruleWordCount))
    assert(flag(w50, Quality.ruleWordCount))
    assert(flag(w100k, Quality.ruleWordCount))
    assert(!flag(w100k1, Quality.ruleWordCount))
  }

  test("rule 2 mean word length: exact [3, 10] boundary, integer arithmetic") {
    assert(flag("abc abc abc", Quality.ruleMeanWordLength))          // mean 3
    assert(!flag("ab ab ab", Quality.ruleMeanWordLength))            // mean 2
    assert(flag("abcdefghij abcdefghij", Quality.ruleMeanWordLength)) // mean 10
    assert(!flag("abcdefghijk abcdefghijk", Quality.ruleMeanWordLength)) // mean 11
    // non-integer boundary: 2 words, lengths 3+4 = 7 → 6 ≤ 7 ≤ 20 pass;
    // lengths 2+3 = 5 → 5 < 6 fail (a float mean of 2.5 rounds nowhere)
    assert(flag("abc abcd", Quality.ruleMeanWordLength))
    assert(!flag("ab abc", Quality.ruleMeanWordLength))
  }

  test("rule 3 symbol ratio: strict < 0.1, '#' chars and '...' runs both count") {
    val w10 = Seq.fill(10)("w").mkString(" ")
    val w11 = Seq.fill(11)("w").mkString(" ")
    // one '#' glued to a word in 10 words: 10·1 < 10 is false — exactly
    // 0.1 fails; the same symbol in 11 words passes
    assert(!flag(w10 + "#", Quality.ruleSymbolRatio))
    assert(flag(w11 + "#", Quality.ruleSymbolRatio))
    // '...' counts once per non-overlapping run
    assert(!flag(w10 + "...", Quality.ruleSymbolRatio))
    assert(flag(w11 + "...", Quality.ruleSymbolRatio))
    // six dots = two runs
    assert(!flag(Seq.fill(20)("w").mkString(" ") + "......", Quality.ruleSymbolRatio))
    assert(flag(Seq.fill(21)("w").mkString(" ") + "......", Quality.ruleSymbolRatio))
  }

  test("rule 4 bullets / rule 5 ellipsis lines: exact line-fraction boundaries") {
    def doc(bullets: Int, ell: Int, plain: Int): String =
      (Seq.fill(bullets)("- item") ++ Seq.fill(ell)("cut short...") ++
        Seq.fill(plain)("a plain line")).mkString("\n")
    // 9 of 10 lines bulleted: 90 < 90 false — exactly 90% fails
    assert(!flag(doc(9, 0, 1), Quality.ruleBulletLines))
    assert(flag(doc(8, 0, 2), Quality.ruleBulletLines))
    assert(flag(doc(0, 0, 1), Quality.ruleBulletLines))
    // '•' bullets count too
    assert(!flag(Seq.fill(10)("• x").mkString("\n"), Quality.ruleBulletLines))
    // 3 of 10 lines ending '...': 30 < 30 false — exactly 30% fails
    assert(!flag(doc(0, 3, 7), Quality.ruleEllipsisLines))
    assert(flag(doc(0, 2, 8), Quality.ruleEllipsisLines))
  }

  test("rule 6 alpha words: ≥ 80% boundary inclusive") {
    // 4 of 5 words alphabetic: 20 ≥ 20 — exactly 80% passes
    assert(flag("one two three four 5555", Quality.ruleAlphaWords))
    assert(!flag("one two three 4444 5555", Quality.ruleAlphaWords))
    // a single letter inside digits qualifies the word
    assert(flag("one two three four 55a5", Quality.ruleAlphaWords))
  }

  test("rule 7 stop words: two DISTINCT canonical markers required") {
    assert(flag("down by the river with friends", Quality.ruleStopWords(_)))
    // "the" twice is still one distinct marker
    assert(!flag("the more the merrier", Quality.ruleStopWords(_)))
    assert(!flag("lorem ipsum dolor sit amet", Quality.ruleStopWords(_)))
    // localized list knob
    assert(flag("der hund und die katze", Quality.ruleStopWords(_, Seq("der", "und", "die"))))
  }

  private def rep(text: String, n: Int): (Long, Long) = {
    val r = Seq(Tuple1(text)).toDF("text")
      .select(graft.expressions.NgramRepetition.column(col("text"), n).as("r"))
      .collect()(0).getSeq[Long](0)
    (r(0), r(1))
  }

  test("NgramRepetition: top n-gram = occurrences × mass, ties on count break to larger mass") {
    // "qq w" ×2 (mass 3) vs "e rrr" ×2 (mass 4): tied count → mass 4 wins
    val (top, _) = rep("qq w qq w e rrr e rrr t", 2)
    assert(top == 2L * 4L)
    // unique max-count gram: "c d" ×2 beats the heavier count-1 "aaaa b"
    assert(rep("aaaa b c d c d", 2)._1 == 2L * 2L)
    // a count-1 most-common gram still contributes its own mass
    assert(rep("aa bb cc", 2)._1 == 1L * 4L)
    // fewer tokens than n → zeros
    assert(rep("a b", 5) == (0L, 0L))
  }

  test("NgramRepetition: duplicated coverage is a position MASK — overlaps count once") {
    // the 6-token run repeats; dup 5-grams overlap but the mask covers
    // each of the 12 single-char tokens exactly once (count×len would say 20)
    val (_, dup) = rep("a b c d e f a b c d e f", 5)
    assert(dup == 12L)
    // no 5-gram repeats → zero coverage
    assert(rep("a b c d e f g h i j", 5)._2 == 0L)
    // dup 2-grams in an alternating run cover everything
    assert(rep("a b a b a b", 2)._2 == 6L)
  }

  test("dupSegmentStats: repeats are occurrences after the first identical segment") {
    val (dl, tl, dlc, tlc) = Quality.dupSegmentStats(col("text"), "\n")
    val got = Seq(Tuple1("xx\nyyy\nxx\nz\nxx")).toDF("text")
      .select(dl.as("a"), tl.as("b"), dlc.as("c"), tlc.as("d"))
      .collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
      == ((2L, 5L, 4L, 10L))) // "xx" thrice → 2 repeats of 2 chars each
    // paragraphs split on the double separator only
    val (dp, tp, _, _) = Quality.dupSegmentStats(col("text"), "\n\n")
    val p = Seq(Tuple1("para one\n\npara two\n\npara one")).toDF("text")
      .select(dp.as("a"), tp.as("b")).collect()(0)
    assert((p.getLong(0), p.getLong(1)) == ((1L, 3L)))
  }

  test("repetition thresholds: exact boundary at dup_line_frac 0.30 and top2 0.20") {
    def flags(text: String): Map[String, Boolean] =
      Seq(Tuple1(text)).toDF("text")
        .select(Quality.repetitionFlags(col("text"))
          .map { case (n, c) => c.as(n) }: _*)
        .collect()(0).getValuesMap[Boolean](
          Quality.repetitionFlags(col("text")).map(_._1))
    // 3 repeats in 10 lines: 30 ≤ 30 — exactly 0.30 keeps; 4 drops.
    // Repeated lines are longer than 1/5 of the mass, so the char rule
    // (strict 0.20 on 10 distinct-heavy lines) diverges from the frac
    // rule only past its own boundary — use distinct fillers.
    val fill = (1 to 6).map(i => s"unique-line-$i")
    val ok = (Seq.fill(4)("dup") ++ fill).mkString("\n")         // 3 repeats/10
    val bad = (Seq.fill(5)("dup") ++ fill.take(5)).mkString("\n") // 4 repeats/10
    assert(flags(ok)("r_dup_line_frac"))
    assert(!flags(bad)("r_dup_line_frac"))
    // top2: "a b" ×5 in 20 single-char tokens → mass 10/20 > 0.2 drops;
    // all-distinct tokens keep it
    val rep20 = (Seq.fill(5)(Seq("a", "b")).flatten ++
      ('c' to 'l').map(_.toString)).mkString(" ")
    assert(!flags(rep20)("r_top2_chars"))
    assert(flags(('a' to 't').map(_.toString).mkString(" "))("r_top2_chars"))
    // repetitionKeep is the conjunction
    val keep = Seq(Tuple1(ok)).toDF("text")
      .select(Quality.repetitionKeep(col("text")).as("k")).collect()(0).getBoolean(0)
    assert(keep == Quality.repetitionFlags(col("text")).map(_._1)
      .forall(flags(ok)))
  }

  test("gopherKeep is the conjunction and the funnel attributes drops to the FIRST failing rule") {
    val docs = Seq(
      (1L, ("the quick brown fox jumps over a lazy dog and then runs to the hills " * 4).trim),
      (2L, "too short to pass the length rule"),                     // fails r_word_count
      (3L, Seq.fill(60)("####").mkString(" "))                       // fails symbol AND alpha AND stopwords
    ).toDF("doc_id", "text")
    val stages = Quality.gopherStages("text")
    val kept = graft.operators.Cleaning.survivors(docs, stages)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
    val report = graft.operators.Cleaning.funnelReport(docs, stages)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    // doc 3 fails rules 3/6/7 but is charged to r_symbol_ratio (first)
    assert(report == Map("pass" -> 1L, "r_word_count" -> 1L, "r_symbol_ratio" -> 1L))
    // conjunction column agrees with the funnel
    val keep = docs.select(col("doc_id"), Quality.gopherKeep(col("text")).as("k"))
      .where(col("k")).select("doc_id").as[Long].collect().toSet
    assert(keep == kept)
  }
}
