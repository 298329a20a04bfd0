package graft.pipeline

import graft.functions.Text
import org.apache.spark.sql.functions._

/**
 * CLI for the corpus-construction capstone: run the full clean → dedup →
 * decontaminate → split → pack pipeline over a documents table, writing
 * the split-labeled corpus and printing the per-stage report. The eval
 * set (decontamination target) is every 20th document — a stand-in for a
 * held-out benchmark suite. Usage:
 *   runMain graft.pipeline.CorpusPipelineMain [sfDir] [outDir]
 */
object CorpusPipelineMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = if (args.length > 1) args(1) else "/tmp/graft-corpus"

    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt, "graft-corpus-pipeline")
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val eval = docs.where(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    // corpus-local thresholds first, then the Gopher rule + repetition
    // screens (per-rule attributable drops in the funnel report; the
    // stop-word marker list localized to this corpus's vocabulary)
    val stages = Seq(
      "too_short" -> (col("n_chars") >= 60),
      "too_few_tokens" -> (Text.tokenCount(col("text")) >= 10)) ++
      graft.functions.Quality.gopherStages("text", Text.Stopwords) ++
      graft.functions.Quality.repetitionStages("text")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val (corpus, r) = CorpusPipeline.run(docs, eval, "doc_id", "text", stages,
      embeddings = Some(emb), sentenceChunkTokens = Some(64),
      emitPath = Some(s"$out-release"), spanCutWindow = Some(20),
      evalCutWindow = Some(12),
      lineDedupMinDocs = Some(5L), selfRepeatWindow = Some(3),
      stratifyBy = Some("lang"))
    corpus.write.mode("overwrite").partitionBy("split").parquet(out)
    println(s"corpus written to $out; sharded release at $out-release")
    // printed in STAGE order: 1 clean, 1b line dedup, 2 exact, 2a
    // de-stutter, 2b span cut, 3 near, 3b semantic, 3c eval cut,
    // 4 screen, 5+ splits/packing
    println(s"input=${r.input} cleaned=${r.cleaned} " +
      s"lineEdited=${r.lineEditedDocs} afterLineDedup=${r.afterLineDedup} " +
      s"afterExactDedup=${r.afterExactDedup} " +
      s"selfRepeatEdited=${r.selfRepeatEditedDocs} afterSelfRepeatCut=${r.afterSelfRepeatCut} " +
      s"spanEdited=${r.spanEditedDocs} afterSpanCut=${r.afterSpanCut} " +
      s"afterNearDedup=${r.afterNearDedup} afterSemanticDedup=${r.afterSemanticDedup} " +
      s"evalCut=${r.evalCutDocs} afterEvalCut=${r.afterEvalCut} " +
      s"contaminated=${r.contaminated} corpus=${r.corpus} splits=${r.splitCounts} " +
      s"trainSequences=${r.trainSequences} sentenceChunks=${r.sentenceChunks} " +
      s"emittedShards=${r.emittedShards}")
    spark.stop()
  }
}
