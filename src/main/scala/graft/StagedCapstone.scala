package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The STAGED deployment of the banded capstone — DiskScale's `cap_banded`
 * row decomposed into resumable jobs with parquet handoffs, one
 * SparkSession per job (the CCNet score-file architecture: Wenzek 2020
 * run LM scoring once and ship score files that the banding/admission
 * jobs read). This is not a workaround but the production shape of a
 * 100 TB corpus build: every stage checkpoints to storage, a failed
 * stage resumes without re-running its predecessors, and each job's LIVE
 * scratch footprint (in-flight shuffle spill + localCheckpoint blocks)
 * dies with its session — the constraint the round-10 single-box probe
 * hit, where ONE fused 15M run's live spill crested the machine's ~75 GB
 * scratch (SCALE.md). On a cluster the same decomposition bounds
 * per-executor scratch per job and gives the pipeline stage-level
 * resume; the handoff artifacts are exactly the frames
 * CorpusPipeline's phase functions exchange, so the staged decision set
 * EQUALS the fused run's (PipelineSpec pins the Report identity on a
 * dirty synthetic corpus; every phase decision is hash/integer-driven on
 * columns parquet round-trips bit-exactly).
 *
 * Jobs (each its own SparkSession; width size-derived from ITS input):
 *   clean    docsh → phaseClean (funnel + exact dedup)        → pool_clean
 *   neardup  pool_clean → phaseNearDedup (minhash+components) → pool_near
 *   screen   pool_near → phaseDecontaminate + phaseFluency    → pool_fluent
 *   score    pool_fluent → fluencyScoreFile (self-trained LM) → lmf_scores
 *   admit    pool_fluent + lmf_scores → bandRateFromScores →
 *            phaseFinish (splits + packing)                   → final JSON
 *
 * Config is pinned to DiskScale's cap_banded row (same corpus generator,
 * same mod-10 eval holdout, same stage battery, 49/50 fluency bar, band
 * rates head 9/10 / middle 1/2 / tail 1/10, seed 0) so the staged total
 * is comparable to the fused row and the Report to the fused Report.
 *
 * Usage: runMain graft.StagedCapstone [n, default 15000000]
 *        [workdir, default /tmp/graft-diskscale]
 *        [jobs csv, default all — resume by naming the jobs to run; a
 *         job whose output already has _SUCCESS is skipped]
 */
object StagedCapstone {

  private def f2(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val n = args.headOption.getOrElse("15000000").toLong
    val workdir = args.drop(1).headOption.getOrElse("/tmp/graft-diskscale")
    val jobsArg = args.drop(2).headOption.getOrElse("all")
    val allJobs = Seq("clean", "neardup", "screen", "score", "admit")
    val wanted = jobsArg.split(",").map(_.trim).filter(_.nonEmpty).toSet
    val unknown = wanted -- (allJobs.toSet + "all")
    require(unknown.isEmpty, s"unknown job(s): ${unknown.mkString(", ")}; " +
      s"known: ${allJobs.mkString(", ")}")
    def want(j: String): Boolean = wanted("all") || wanted(j)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    val stageDir = s"$workdir/staged_$n"
    val docshPath = s"$workdir/docsh_$n"
    val poolClean = s"$stageDir/pool_clean"
    val poolNear = s"$stageDir/pool_near"
    val poolFluent = s"$stageDir/pool_fluent"
    val lmfScores = s"$stageDir/lmf_scores"
    val rates = Map("head" -> ((9, 10)), "middle" -> ((1, 2)),
      "tail" -> ((1, 10)))

    // DiskScale's cap-row battery: token bar + Gopher rules + repetition
    // screens, minus the stop-word rule (the synthetic vocabulary has no
    // stopwords — the shared cap/cap_banded convention, DiskScale)
    def capStages = (Seq("min_tokens" ->
        (graft.functions.Text.tokenCount(col("text")) >= 20)) ++
      graft.functions.Quality.gopherStages("text") ++
      graft.functions.Quality.repetitionStages("text"))
      .filterNot(_._1 == "r_stop_words")

    def session(job: String): SparkSession = {
      val spark = GraftSession.local(cpus, s"graft-staged-$job")
      GraftSession.quietWindowWarnings() // harness: aggregated windows only
      spark.sparkContext.setLogLevel("ERROR")
      spark
    }

    def done(spark: SparkSession, path: String): Boolean = {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.exists(new org.apache.hadoop.fs.Path(path + "/_SUCCESS"))
    }
    // overwrite a PARTIAL output (dir without _SUCCESS — a crashed job),
    // never a completed one; the caller skips when done() is true
    def freshWrite(df: DataFrame, path: String): Unit =
      df.write.mode("overwrite").parquet(path)

    def writeCounts(job: String, kv: Seq[(String, Long)], sec: Double): Unit = {
      val body = (kv.map { case (k, v) => s""""$k":$v""" } :+
        s""""sec":${f2(sec)}""").mkString("{", ",", "}")
      val p = java.nio.file.Paths.get(s"$stageDir/counts_$job.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, body)
      println(s"""{"job":"$job",${body.drop(1)}""")
    }
    def readCount(job: String, key: String): Long = {
      val s = java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$stageDir/counts_$job.json"))
      s""""$key":(-?\\d+)""".r.findFirstMatchIn(s)
        .getOrElse(sys.error(s"$key missing from counts_$job.json"))
        .group(1).toLong
    }
    def readSec(job: String): Double = {
      val s = java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$stageDir/counts_$job.json"))
      """"sec":([0-9.]+)""".r.findFirstMatchIn(s)
        .getOrElse(sys.error(s"sec missing from counts_$job.json"))
        .group(1).toDouble
    }

    /** Run `job` in its own session (scratch dies with it), width derived
      * from the job's own input listing — the rule a cluster job applies. */
    def runJob(job: String, inputPath: String)(f: SparkSession => Unit): Unit = {
      if (!want(job)) return
      val spark = session(job)
      try {
        val width = GraftSession.sizeShuffleFor(spark,
          GraftSession.bytesOnDisk(spark, inputPath))
        System.err.println(s"[staged] job=$job input=$inputPath width=$width")
        f(spark)
      } finally spark.stop()
    }

    // corpus build (or reuse) — identical to DiskScale's docsh generator:
    // Heaps-scaled vocabulary (vocab ∝ ∛n anchored at 400 words / 80k
    // docs) keeps 3-gram bucket occupancy constant across sizes
    {
      val spark = session("corpus")
      try {
        if (!done(spark, docshPath)) {
          val vocabH = math.max(400L,
            math.round(400.0 * math.cbrt(n / 80000.0)))
          ScaleProbe.synthDocs(spark, n, vocabH).write.parquet(docshPath)
        }
      } finally spark.stop()
    }

    runJob("clean", docshPath) { spark =>
      if (done(spark, poolClean))
        System.err.println("[staged] clean: output exists, skipped")
      else {
        val t0 = System.nanoTime()
        val docsh = spark.read.parquet(docshPath)
        val (cut, cc) = graft.pipeline.CorpusPipeline.phaseClean(
          docsh.where(col("doc_id") % 10 =!= 0), "doc_id", "text", capStages)
        freshWrite(cut, poolClean)
        writeCounts("clean", Seq("input" -> cc.input, "cleaned" -> cc.cleaned,
          "after_exact" -> cc.afterExactDedup), (System.nanoTime() - t0) / 1e9)
      }
    }

    runJob("neardup", poolClean) { spark =>
      if (done(spark, poolNear))
        System.err.println("[staged] neardup: output exists, skipped")
      else {
        val t0 = System.nanoTime()
        val pool = spark.read.parquet(poolClean)
        val (sem, nNear, _) = graft.pipeline.CorpusPipeline.phaseNearDedup(
          pool, "doc_id", "text")
        freshWrite(sem, poolNear)
        writeCounts("neardup", Seq("after_near" -> nNear),
          (System.nanoTime() - t0) / 1e9)
      }
    }

    runJob("screen", poolNear) { spark =>
      if (done(spark, poolFluent))
        System.err.println("[staged] screen: output exists, skipped")
      else {
        val t0 = System.nanoTime()
        val pool = spark.read.parquet(poolNear)
        val evalDocs = spark.read.parquet(docshPath)
          .where(col("doc_id") % 10 === 0)
        val nSem = readCount("neardup", "after_near")
        val (screened, _, _) = graft.pipeline.CorpusPipeline
          .phaseDecontaminate(pool, nSem, evalDocs, "doc_id", "text")
        val (fluent, nPre, nFluent) = graft.pipeline.CorpusPipeline
          .phaseFluency(screened, "doc_id", "text", num = 49, den = 50)
        freshWrite(fluent, poolFluent)
        writeCounts("screen", Seq("pre_fluency" -> nPre,
          "after_fluency" -> nFluent), (System.nanoTime() - t0) / 1e9)
      }
    }

    runJob("score", poolFluent) { spark =>
      if (done(spark, lmfScores))
        System.err.println("[staged] score: output exists, skipped")
      else {
        val t0 = System.nanoTime()
        val pool = spark.read.parquet(poolFluent)
        val scores = graft.pipeline.CorpusPipeline.fluencyScoreFile(
          pool, "doc_id", "text")
        freshWrite(scores, lmfScores)
        val nScores = spark.read.parquet(lmfScores).count()
        writeCounts("score", Seq("score_rows" -> nScores),
          (System.nanoTime() - t0) / 1e9)
      }
    }

    runJob("admit", poolFluent) { spark =>
      val t0 = System.nanoTime()
      val pool = spark.read.parquet(poolFluent)
      val scores = spark.read.parquet(lmfScores)
      val admitted = graft.operators.NgramLm
        .bandRateFromScores(scores, rates, seed = 0L)
        .select(col("id").as("doc_id"))
      val kept = pool.join(admitted, Seq("doc_id"), "leftsemi")
        .localCheckpoint()
      val nKept = kept.count()
      val fin = graft.pipeline.CorpusPipeline.phaseFinish(
        kept, "doc_id", "text")
      val sec = (System.nanoTime() - t0) / 1e9
      writeCounts("admit", Seq("after_band_rate" -> nKept,
        "corpus" -> fin.corpusDocs,
        "train_sequences" -> fin.trainSequences) ++
        fin.splitCounts.toSeq.sortBy(_._1)
          .map { case (k, v) => s"split_$k" -> v }, sec)

      // assemble the fused-Report-equivalent summary + staged total
      val input = readCount("clean", "input")
      val cleaned = readCount("clean", "cleaned")
      val exact = readCount("clean", "after_exact")
      val near = readCount("neardup", "after_near")
      val preF = readCount("screen", "pre_fluency")
      val fluent = readCount("screen", "after_fluency")
      val jobSecs = allJobs.map(j => j -> readSec(j))
      val total = jobSecs.map(_._2).sum
      val splitStr = fin.splitCounts.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
      val secStr = jobSecs
        .map { case (j, s) => s""""$j":${f2(s)}""" }.mkString("{", ",", "}")
      println(s"""{"staged_cap_banded":$n,"input":$input,""" +
        s""""cleaned":$cleaned,"after_exact":$exact,"after_near":$near,""" +
        s""""contaminated":${near - preF},""" +
        s""""fluency_filtered":${preF - fluent},"after_fluency":$fluent,""" +
        s""""band_rate_filtered":${fluent - nKept},""" +
        s""""after_band_rate":$nKept,"corpus":${fin.corpusDocs},""" +
        s""""splits":$splitStr,"train_sequences":${fin.trainSequences},""" +
        s""""job_sec":$secStr,"total_sec":${f2(total)}}""")
    }
  }
}
