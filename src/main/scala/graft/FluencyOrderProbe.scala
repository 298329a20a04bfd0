package graft

import org.apache.spark.sql.functions._

/**
 * One-shot A/B for the capstone fluency screen's model ORDER (VERDICT r9
 * ask 6): the gated capstone screens with the self-trained trigram
 * (stage 4a, n = 3); CCNet's production order is 5 (Wenzek et al. 2020
 * use a 5-gram KenLM). Both orders are already gated standalone
 * (q131/q132 at n = 3, q143/q145 at n = 5); the open question is whether
 * the PRODUCTION order changes the SCREEN — its drop count, and the
 * fluency-permille spread the banding stage (4a'') would cut terciles
 * on. This probe runs the stage's exact decision rule at each order over
 * the same stage-4a pool (the pipeline output with no fluency screen —
 * everything that runs ahead of 4a) and prints, per order: kept/dropped
 * at the gate's 49/50 bar, the permille distribution (min/p10/p50/p90/
 * max) and the tercile edges (p33/p66 — the band edges 4a'' would
 * broadcast), and the census wall time. Decision rule for the round:
 * gate an order knob only if the order-5 screen's selectivity or band
 * edges move materially; otherwise record "n = 3 suffices at this
 * corpus" with the numbers (NOTES round 10).
 *
 * Usage: runMain graft.FluencyOrderProbe [sfDir] [orders csv, default 3,5]
 */
object FluencyOrderProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val orders = args.drop(1).headOption.getOrElse("3,5")
      .split(",").map(_.trim.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-fluency-order")
    GraftSession.quietWindowWarnings() // harness tail: aggregated windows only
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // the gate's screen battery (the q127/q133/q134 config): token bar +
    // 7 Gopher rules (corpus-localized stop-word list — the per-language
    // knob) + 13 repetition screens, and the gate's mod-10 eval holdout
    val stages = Seq("min_tokens" ->
        (graft.functions.Text.tokenCount(col("text")) >= 20)) ++
      graft.functions.Quality.gopherStages("text",
        graft.functions.Text.Stopwords) ++
      graft.functions.Quality.repetitionStages("text")
    // the stage-4a POOL: run the pipeline WITHOUT the fluency screen so
    // the probe's input is exactly what stage 4a would see
    val (pool0, _) = graft.pipeline.CorpusPipeline.run(
      docs.where(col("doc_id") % 10 =!= 0),
      docs.where(col("doc_id") % 10 === 0),
      "doc_id", "text", stages)
    val pool = pool0.select(col("doc_id"), col("text")).localCheckpoint()
    val nPool = pool.count()
    println(s"""{"pool":$nPool,"sf_dir":"$sfDir"}""")

    orders.foreach { n =>
      val t0 = System.nanoTime()
      val lm = graft.operators.NgramLm.lmCounts(pool, "text", n = n,
        minCount = 2L) // the pipeline's lmMinCount default
      val tot = graft.operators.NgramLm.lmTotals(pool, "text")
      // ONE census materialization per order (ADVICE r10): kept and every
      // distribution below derive from this checkpoint, so the printed
      // `sec` is one LM build + one scoring join — not two
      val cen = graft.operators.NgramLm.backoffCensus(
        graft.operators.NgramLm.scoreTokens(pool, lm, tot,
          "doc_id", "text", n = n), n).localCheckpoint()
      val hiMass = (n to 2 by -1).map(k => s"o$k").mkString(" + ")
      val pm = cen.select(col("id"),
        expr(s"(($hiMass) * 1000) div scored_tokens").as("fluency_pm"))
      // the stage's 49/50 bar off the SAME checkpointed census (the exact
      // cross-multiplication; note floor(1000·hi/sn) ≥ 980 ⟺ hi·50 ≥
      // 49·sn, so pm ≥ 980 would count identically — integer threshold
      // commutes with the floor)
      val kept = cen.where(
        expr(s"($hiMass) * 50 >= 49 * scored_tokens")).count()
      val qs = pm.select(expr(
        "percentile(fluency_pm, array(0.0, 0.1, 0.33, 0.5, 0.66, 0.9, 1.0))"))
        .head().getSeq[Double](0)
      val sec = (System.nanoTime() - t0) / 1e9
      val Seq(mn, p10, p33, p50, p66, p90, mx) = qs.toSeq
      println(f"""{"n":$n,"kept":$kept,"dropped":${nPool - kept},""" +
        f""""pm_min":$mn%.1f,"pm_p10":$p10%.1f,"pm_p33":$p33%.1f,""" +
        f""""pm_p50":$p50%.1f,"pm_p66":$p66%.1f,"pm_p90":$p90%.1f,""" +
        f""""pm_max":$mx%.1f,"sec":$sec%.2f}""")

      // HIGH-ORDER screen probe (VERDICT r10 ask 3, sharpened): by the
      // sub-gram count bound, ANY screen over matched_ord ≥ K mass is
      // order-invariant — a token matches order ≥ K iff its order-K
      // sub-gram survives pruning (c(suffix) ≥ c(gram), so a surviving
      // 4/5-gram implies its order-3 suffix survives), which an n = K
      // model already sees. So (o5+o4+o3) at n = 5 EQUALS o3-mass at
      // n = 3; the only screens order 5 can change read o4/o5
      // SEPARATELY. Probe: the (o_n..o_4) hi-order permille — its
      // distribution and the kept count at candidate bars — the numbers
      // that decide whether an order-sensitive screen separates docs at
      // all on this corpus.
      if (n > 3) {
        val hoMass = (n to 4 by -1).map(k => s"o$k").mkString(" + ")
        val ho = cen.select(col("id"),
          expr(s"(($hoMass) * 1000) div scored_tokens").as("ho_pm"))
        val hqs = ho.select(expr(
          "percentile(ho_pm, array(0.0, 0.1, 0.33, 0.5, 0.66, 0.9, 1.0))"))
          .head().getSeq[Double](0)
        val bars = Seq(100L, 250L, 500L, 750L, 900L)
        val barCounts = ho.select(
          bars.map(b => sum(when(col("ho_pm") >= b, 1L).otherwise(0L))
            .as(s"ge$b")): _*).head()
        val Seq(hmn, hp10, hp33, hp50, hp66, hp90, hmx) = hqs.toSeq
        val barStr = bars.zipWithIndex
          .map { case (b, i) => s""""kept_ge$b":${barCounts.getLong(i)}""" }
          .mkString(",")
        println(f"""{"n":$n,"screen":"hi_order_o4plus",""" +
          f""""ho_min":$hmn%.1f,"ho_p10":$hp10%.1f,"ho_p33":$hp33%.1f,""" +
          f""""ho_p50":$hp50%.1f,"ho_p66":$hp66%.1f,"ho_p90":$hp90%.1f,""" +
          f""""ho_max":$hmx%.1f,$barStr}""")
      }
    }
    spark.stop()
  }
}
