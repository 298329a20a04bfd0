package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus cleaning funnel — the C4/Gopher-style quality cascade: an ordered
 * list of keep-predicates where every document is charged to the FIRST
 * stage it fails (or "pass"). Production corpus reports are exactly this
 * shape: "web crawl → 23% dropped too-short, 11% low-stopword, …" — the
 * attribution must be first-failure, not any-failure, or the stage counts
 * double-count and stop summing to the corpus size.
 *
 * Scale shape: the whole cascade is ONE when-chain in a narrow projection
 * (zero shuffles — cleaning 100 TB costs one scan); the report adds a
 * single hash aggregation whose cardinality is the stage count.
 */
object Cleaning {

  /** Attach first-failing-stage columns (`drop_stage_idx`, `drop_stage`);
    * documents passing every stage get (stages.size, "pass"). Predicates
    * are KEEP conditions, evaluated in order. */
  def withDropStage(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "at least one stage required")
    val chain = stages.zipWithIndex.foldLeft(Option.empty[Column]) {
      case (acc, ((name, keep), i)) =>
        val branch = struct(lit(i.toLong).as("idx"), lit(name).as("name"))
        Some(acc.fold(when(!keep, branch))(_.when(!keep, branch)))
    }.get.otherwise(struct(lit(stages.size.toLong).as("idx"), lit("pass").as("name")))
    df.withColumn("__stage", chain)
      .withColumn("drop_stage_idx", col("__stage.idx"))
      .withColumn("drop_stage", col("__stage.name"))
      .drop("__stage")
  }

  /** Documents surviving every stage (the cleaned corpus). */
  def survivors(df: DataFrame, stages: Seq[(String, Column)]): DataFrame =
    withDropStage(df, stages).where(col("drop_stage") === "pass")
      .drop("drop_stage_idx", "drop_stage")

  /** Per-stage drop accounting: (drop_stage_idx, drop_stage, n_docs);
    * stages dropping nothing emit no row, counts sum to the corpus size. */
  def funnelReport(df: DataFrame, stages: Seq[(String, Column)]): DataFrame =
    withDropStage(df, stages)
      .groupBy("drop_stage_idx", "drop_stage")
      .agg(count(lit(1)).as("n_docs"))

  /** id → (pos, line, line_h): `sep`-delimited lines with their 0-based
    * position and portable 60-bit hash — the line-frequency input. `sep`
    * is a LITERAL delimiter (quoted into the split regex), so
    * split-then-rejoin is lossless, unlike token canonicalization.
    * Shared with the streaming ingest screen (IncrementalDedup). */
  private[graft] def docLines(docs: DataFrame, idCol: String, textCol: String,
                              sep: String): DataFrame =
    docs.select(col(idCol).as("id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("pos", "line")))
      .withColumn("line_h", Hashing.stableHash60(col("line")))

  /** The one line-frequency census (line, line_h, n_docs) over a
    * precomputed line stream: NON-EMPTY lines appearing in at least
    * `minDocs` distinct documents. Empty lines are document STRUCTURE
    * (paragraph breaks, trailing separators) — every multi-paragraph
    * corpus has them in ~all docs, so counting them would cut every
    * blank line corpus-wide; they are never counted and never cut.
    * Shared by [[frequentLines]], [[dropFrequentLines]] and the
    * streaming ingest screen so the threshold rule lives in one place. */
  private[graft] def lineCensus(lines: DataFrame, minDocs: Long): DataFrame =
    lines.where(length(col("line")) > 0)
      .groupBy(col("line_h"))
      .agg(min(col("line")).as("line"), countDistinct(col("id")).as("n_docs"))
      .where(col("n_docs") >= minDocs)

  /**
   * C4-style frequent-line census: non-empty lines appearing in at least
   * `minDocs` DISTINCT documents — navigation chrome, cookie banners,
   * license footers; the boilerplate class LINE granularity catches where
   * token windows (span dedup) need the passage to be long. Output
   * (line, line_h, n_docs). Repeats of a line within one document count
   * that document once.
   *
   * Scale shape: one aggregation shuffle on the 8-byte line hash with
   * map-side partial counts; output is boilerplate-sized (lines crossing
   * the threshold), never corpus-sized.
   */
  def frequentLines(docs: DataFrame, idCol: String, textCol: String,
                    sep: String, minDocs: Long): DataFrame =
    lineCensus(docLines(docs, idCol, textCol, sep), minDocs)
      .select(col("line"), col("line_h"), col("n_docs"))

  /**
   * The edit over [[frequentLines]]: every occurrence of a frequent line
   * removed, survivors re-joined on `sep` — the C4 cleaning step that
   * keeps the document and cuts the chrome. Line split/rejoin on a
   * literal delimiter is lossless, so untouched documents come back
   * byte-identical (null text rebuilds to the empty string, matching the
   * span-cut canonical form).
   *
   * Shape: the frequency aggregation, a left-semi join of the line
   * stream against the (boilerplate-sized, runtime-broadcast) frequent
   * set, one doc-keyed aggregation collecting each edited doc's dropped
   * POSITIONS (a small int array — never the lines themselves), a join
   * of that narrow frame back onto the corpus, and a per-row rebuild.
   * The rebuild's higher-order filter is interpreted, but runs per LINE
   * (tens per doc), not per token — not a hot path.
   */
  def dropFrequentLines(docs: DataFrame, idCol: String, textCol: String,
                        sep: String, minDocs: Long): DataFrame = {
    val freq = lineCensus(docLines(docs, idCol, textCol, sep), minDocs)
      .select(col("line_h"))
    cutLinesBy(docs, idCol, textCol, sep, freq)
  }

  /** The edit half of [[dropFrequentLines]] against a PRECOMPUTED
    * frequent-line-hash frame (column `line_h`) — shared with the
    * streaming ingest screen, whose frequency census spans the persisted
    * line store, not just the frame being edited. */
  private[graft] def cutLinesBy(docs: DataFrame, idCol: String, textCol: String,
                                sep: String, freq: DataFrame): DataFrame =
    cutLinesWith(docs, idCol, textCol, sep,
      docLines(docs, idCol, textCol, sep), freq)

  /** [[cutLinesBy]] with the line stream precomputed by the caller —
    * the streaming screen checkpoints its per-batch line stream once and
    * derives the store write, the census AND this edit from it (a batch
    * is micro-batch-sized, so materializing its occurrence stream is
    * fine where staging a corpus-sized one would not be). */
  private[graft] def cutLinesWith(docs: DataFrame, idCol: String, textCol: String,
                                  sep: String, lines: DataFrame,
                                  freq: DataFrame): DataFrame = {
    val dropped = lines.join(freq.select(col("line_h")), Seq("line_h"), "left_semi")
      .groupBy(col("id").as("__lf_id"))
      .agg(sort_array(collect_list(col("pos"))).as("__lf_drop"))
    val parts = split(col(textCol), java.util.regex.Pattern.quote(sep))
    val keptParts = filter(
      transform(parts, (l, i) => struct(l.as("l"), i.as("i"))),
      s => coalesce(!array_contains(col("__lf_drop"), s.getField("i")), lit(true)))
    docs.join(dropped, docs(idCol) === col("__lf_id"), "left")
      .withColumn(textCol,
        coalesce(array_join(transform(keptParts, s => s.getField("l")), sep), lit("")))
      .drop("__lf_id", "__lf_drop")
  }
}
