package graft.operators

import graft.functions.{Hashing, Text}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic data augmentation / denoising-objective preparation.
 *
 * The first member is T5-style span corruption (Raffel et al. 2020,
 * public algorithm): mask random token spans, replace each span with a
 * numbered sentinel in the INPUT, and emit the masked spans behind their
 * sentinels as the TARGET. Production pipelines do this at the data layer
 * (not in the training loop) exactly so that the corruption is
 * reproducible across epochs/restarts — which is why every draw here is
 * a seeded hash of (doc, position), never `rand()`: the same document
 * corrupts identically on any cluster, any partitioning, any engine.
 */
object Augment {

  /**
   * Span corruption: each token position masks independently with
   * probability `noisePct`% (seeded-hash Bernoulli); CONSECUTIVE masked
   * positions merge into one span (the T5 trick that yields mean span
   * length 1/(1−p) without a second length draw). Output per document:
   *
   *  - `input_text`: unmasked tokens with each span replaced by
   *    `<extra_id_k>` (k = 0-based span index in document order)
   *  - `target_text`: `<extra_id_0> span0 tokens <extra_id_1> span1 … <extra_id_n>`
   *    (trailing sentinel terminates the last span — the T5 convention);
   *    documents with no masked token get the bare `<extra_id_0>`
   *  - `n_masked`, `n_spans`: audit counts
   *
   * Scale shape: the token stream explodes narrow, then ONE doc-keyed
   * window exchange computes run starts + span ids (lag + running sum
   * over positions — both deterministic on the unique pos order) and the
   * two per-doc aggregations rebuild input/target in position order
   * (sorted structs, q68's rule: collect_list arrival order is never
   * trusted). Everything downstream of the window shares the doc_id
   * partitioning.
   */
  def spanCorruption(docs: DataFrame, idCol: String, textCol: String,
                     noisePct: Int, seed: Long): DataFrame = {
    require(noisePct > 0 && noisePct < 100, "noisePct must be in (0,100)")
    // ONE compiled pass per document (round 12, guide §2.4): the corruption
    // is a pure per-document function of (text, id), so the token stream
    // never explodes and the corpus never exchanges — the previous shape
    // paid a posexplode, an id-window (exchange + sort) for the run ids,
    // TWO collect_list aggregations and a join, all to regroup each
    // document's own tokens. Mask draws, sentinel numbering and the
    // space-join semantics are reproduced bit-exactly
    // (graft.expressions.SpanCorrupt; TrainingOpsSpec pins losslessness +
    // partitioning independence, StatefulOpsSpec the streaming parity).
    docs.select(col(idCol).as("id"),
        graft.expressions.SpanCorrupt.column(col(textCol),
          col(idCol).cast("string"), noisePct, seed).as("__sc"))
      .select(col("id"), col("__sc.input_text").as("input_text"),
        col("__sc.target_text").as("target_text"),
        col("__sc.n_masked").as("n_masked"),
        col("__sc.n_spans").as("n_spans"))
  }

  /**
   * Fill-in-the-middle (FIM) transform (Bavarian et al. 2022, "Efficient
   * Training of Language Models to Fill in the Middle" — public
   * algorithm): split the document at two seeded token boundaries into
   * (prefix, middle, suffix) and emit the PSM reordering
   * `<fim_prefix> P <fim_suffix> S <fim_middle> M`, so a plain
   * left-to-right model learns infilling. Applied to `applyPct`% of
   * documents (the paper's FIM rate ~50-90%); the rest pass through
   * unchanged — the mix is what preserves ordinary autoregressive
   * quality. Every draw is a seeded hash of the doc id, never `rand()`:
   * the same document transforms identically on any cluster, any
   * partitioning, any epoch.
   *
   * Cut points: two independent uniform draws over the n+1 token
   * boundaries [0, n]; lo = min, hi = max; prefix = tokens[0,lo),
   * middle = [lo,hi), suffix = [hi,n). Empty segments are legal and
   * deliberately kept (the model must learn degenerate infills — empty
   * middle teaches "nothing missing here").
   *
   * Output: (id, fim_applied, fim_text, n_prefix, n_middle, n_suffix);
   * segment counts are null on passthrough rows. Zero-shuffle narrow
   * projection — three array slices and one join, whole-stage codegen.
   */
  def fimTransform(docs: DataFrame, idCol: String, textCol: String,
                   applyPct: Int, seed: Long): DataFrame = {
    require(applyPct >= 0 && applyPct <= 100, "applyPct must be in [0,100]")
    def draw(tag: String, modulus: Column) =
      Hashing.stableHash60(concat_ws(" ", lit(seed.toString), lit(tag),
        col("id").cast("string"))) % modulus
    val toks = Text.tokens(col(textCol))
    val base = docs.select(col(idCol).as("id"), col(textCol).as("__text"),
        toks.as("__toks"), size(toks).cast("long").as("__n"))
      .withColumn("__applied", draw("f", lit(100L)) < applyPct)
      .withColumn("__c1", draw("a", col("__n") + 1))
      .withColumn("__c2", draw("b", col("__n") + 1))
      .withColumn("__lo", least(col("__c1"), col("__c2")))
      .withColumn("__hi", greatest(col("__c1"), col("__c2")))
    val pre = slice(col("__toks"), lit(1), col("__lo").cast("int"))
    val mid = slice(col("__toks"), (col("__lo") + 1).cast("int"),
      (col("__hi") - col("__lo")).cast("int"))
    val suf = slice(col("__toks"), (col("__hi") + 1).cast("int"),
      (col("__n") - col("__hi")).cast("int"))
    base.select(col("id"), col("__applied").as("fim_applied"),
      when(col("__applied"), array_join(concat(
          array(lit("<fim_prefix>")), pre,
          array(lit("<fim_suffix>")), suf,
          array(lit("<fim_middle>")), mid), " "))
        .otherwise(col("__text")).as("fim_text"),
      when(col("__applied"), col("__lo")).as("n_prefix"),
      when(col("__applied"), col("__hi") - col("__lo")).as("n_middle"),
      when(col("__applied"), col("__n") - col("__hi")).as("n_suffix"))
  }
}
