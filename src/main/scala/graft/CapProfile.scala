package graft

import org.apache.spark.sql.functions._

/** Throwaway diagnosis main (round 12): time each phase of the gated
  * capstone pipeline (the `cap` stage row — the bench's single biggest
  * stage build) separately, so the optimization target inside
  * CorpusPipeline.run is measured, not guessed. Same config as
  * SparkEntry.capstoneShared: funnel battery = token bar + Gopher +
  * repetition screens, mod-10 eval holdout, fluency 49/50, defaults
  * elsewhere. Usage: runMain graft.CapProfile [sfDir] */
object CapProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-cap-profile")
    GraftSession.quietWindowWarnings()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.pipeline.CorpusPipeline._

    def tm[A](name: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(s"cap-profile: $name")
      val t0 = System.nanoTime()
      val r = f
      println(f"[cap-profile] $name%-12s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val stages = Seq("min_tokens" ->
        (graft.functions.Text.tokenCount(col("text")) >= 20)) ++
      graft.functions.Quality.gopherStages("text", graft.functions.Text.Stopwords) ++
      graft.functions.Quality.repetitionStages("text")
    val train = docs.where(col("doc_id") % 10 =!= 0)
    val eval = docs.where(col("doc_id") % 10 === 0)

    // JIT/classloader warmup at sf0.001 — the bench times cap LAST in a
    // warm JVM; a cold first phase here would misattribute ~8 s of JVM
    // startup to phaseClean
    {
      val wd = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      val (sc0, _) = phaseClean(wd.where(col("doc_id") % 10 =!= 0),
        "doc_id", "text", stages)
      val (sem0, _, n0) = phaseNearDedup(sc0, "doc_id", "text", 0.5)
      val (scr0, _, _) = phaseDecontaminate(sem0, n0,
        wd.where(col("doc_id") % 10 === 0), "doc_id", "text", 0.5, 0)
      val (fl0, _, _) = phaseFluency(scr0, "doc_id", "text", 49, 50)
      phaseFinish(fl0, "doc_id", "text")
      println("[cap-profile] warmup done")
    }

    val total0 = System.nanoTime()
    val (spanCut, _) = tm("clean")(phaseClean(train, "doc_id", "text", stages))
    val (sem, _, nSem) = tm("neardup")(phaseNearDedup(spanCut, "doc_id", "text", 0.5))
    val (screened, _, _) = tm("decontam")(
      phaseDecontaminate(sem, nSem, eval, "doc_id", "text", 0.5, 0))
    // fluency sub-steps (same operations phaseFluency composes, timed
    // separately; the phase call below then re-times the composition)
    val base0 = tm("flu:ckpt+cnt") { val b = screened.localCheckpoint(); b.count(); b }
    tm("flu:model")(graft.operators.NgramLm
      .lmCounts(base0, "text", n = 3, minCount = 2L).count())
    tm("flu:score") {
      graft.operators.NgramLm.fluencyThresholdFilter(base0,
        graft.operators.NgramLm.lmCounts(base0, "text", n = 3, minCount = 2L),
        graft.operators.NgramLm.lmTotals(base0, "text"),
        "doc_id", "text", 49, 50).localCheckpoint().count()
    }
    val (fluent, _, _) = tm("fluency")(
      phaseFluency(screened, "doc_id", "text", 49, 50))
    tm("finish")(phaseFinish(fluent, "doc_id", "text"))
    println(f"[cap-profile] total        ${(System.nanoTime() - total0) / 1e9}%.2f s")
    spark.stop()
  }
}
