package graft.operators

import graft.functions.{Hashing, Text}
import org.apache.spark.sql.DataFrame
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
    val base = docs
      .select(col(idCol).as("id"),
        posexplode(Text.tokens(col(textCol))).as(Seq("pos", "tok")))
      .withColumn("masked",
        Hashing.stableHash60(concat_ws(" ", lit(seed.toString), lit("m"),
          col("id").cast("string"), col("pos").cast("string"))) % 100 < noisePct)
    val w = Window.partitionBy("id").orderBy("pos")
    val runs = base
      .withColumn("run_start",
        col("masked") && !coalesce(lag(col("masked"), 1).over(w), lit(false)))
      .withColumn("run_id", sum(when(col("run_start"), 1L).otherwise(0L))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    def inOrder(tokCol: String) = array_join(
      transform(sort_array(collect_list(struct(col("pos"), col(tokCol).as("t")))),
        x => x.getField("t")), " ")
    val inputAgg = runs.where(!col("masked") || col("run_start"))
      .withColumn("out_tok", when(col("masked"),
        concat(lit("<extra_id_"), (col("run_id") - 1).cast("string"), lit(">")))
        .otherwise(col("tok")))
      .groupBy("id").agg(inOrder("out_tok").as("input_text"))
    val targetAgg = runs.where(col("masked"))
      .withColumn("out_tok", when(col("run_start"),
        concat(lit("<extra_id_"), (col("run_id") - 1).cast("string"), lit("> "),
          col("tok")))
        .otherwise(col("tok")))
      .groupBy("id").agg(inOrder("out_tok").as("target_core"),
        count(lit(1)).as("n_masked"), max(col("run_id")).as("n_spans"))
      .withColumn("target_text", concat(col("target_core"),
        lit(" <extra_id_"), col("n_spans").cast("string"), lit(">")))
    inputAgg.join(targetAgg, Seq("id"), "left")
      .select(col("id"), col("input_text"),
        coalesce(col("target_text"), lit("<extra_id_0>")).as("target_text"),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"))
  }
}
