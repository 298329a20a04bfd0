package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * ANN quality probe: recall under naive vs trained centroids on the real
 * (near-isotropic) embeddings AND on the clusterable fixture, the data
 * geometry that explains the difference, and the near-dup recall/nprobe
 * curve. Run: `sbt "runMain graft.RecallProbe [sfDir]"`. Findings are
 * written up in SCALE.md ("ANN recall & data geometry"); the headline
 * numbers are re-measured every round by Bench's recall block.
 */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-recall")
    GraftSession.quietWindowWarnings() // harness tail: aggregated-cardinality windows only
    spark.sparkContext.setLogLevel("WARN")
    import operators.Similarity
    // Locale.ROOT like Bench's formatters: a comma-decimal host locale
    // would make these JSON-shaped probe lines unparseable
    def f4(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))

    def knnRecall(corpus: DataFrame, cent: DataFrame, np: Int, brute: DataFrame,
                  bruteN: Double): Double =
      Similarity.ivfKnn(corpus, corpus.where(col("vec_id") < 10), cent, k = 5, nprobe = np)
        .select("query_id", "neighbor_id").intersect(brute).count() / bruteN

    /** intra = mean cos(vector, its nearest trained centroid); inter = mean
      * pairwise cos between the centroids. Clusterable data: intra ≫ inter.
      * Isotropic data: both small and close — nothing to recover. */
    def geometry(vectors: DataFrame, cent: DataFrame): (Double, Double) = {
      val intra = Similarity.assignToCentroids(vectors, cent)
        .join(cent.select(col("vec_id").as("centroid_id"), col("embedding").as("ce")),
          Seq("centroid_id"))
        .select(avg(graft.expressions.VectorExprs.cosine(col("embedding"), col("ce"))))
        .head().getDouble(0)
      val inter = Similarity.exactNearDupPairs(cent, -2.0) // threshold −2 ⇒ all pairs
        .select(avg(abs(col("cosine")))).head().getDouble(0)
      (intra, inter)
    }

    // ---- real embeddings ----
    val em = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val brute = Similarity.bruteForceKnn(em, em.where(col("vec_id") < 10), k = 5)
      .select("query_id", "neighbor_id").localCheckpoint()
    val bruteN = brute.count().toDouble
    val naive = em.where(col("vec_id") % 50 === 0)
    val trained = Similarity.trainCentroids(em, k = 40, iters = 3).localCheckpoint()
    val (intraR, interR) = geometry(em, trained)
    println(s"""REAL {"recall":{"naive_np1":${f4(knnRecall(em, naive, 1, brute, bruteN))},""" +
      s""""trained_np1":${f4(knnRecall(em, trained, 1, brute, bruteN))},""" +
      s""""trained_np4":${f4(knnRecall(em, trained, 4, brute, bruteN))}},""" +
      s""""intra_cos":${f4(intraR)},"inter_abs_cos":${f4(interR)}}""")

    // ---- clusterable fixture ----
    val fx = gen.ClusteredFixture.build(spark, n = 2000).localCheckpoint()
    val fxBrute = Similarity.bruteForceKnn(fx, fx.where(col("vec_id") < 10), k = 5)
      .select("query_id", "neighbor_id").localCheckpoint()
    val fxBruteN = fxBrute.count().toDouble
    val fxNaive = fx.where(col("vec_id") % 100 === 0) // 20 arbitrary vectors
    val fxTrained = Similarity.trainCentroids(fx, k = 20, iters = 3).localCheckpoint()
    val (intraF, interF) = geometry(fx, fxTrained)
    println(s"""FIXTURE {"recall":{"naive_np1":${f4(knnRecall(fx, fxNaive, 1, fxBrute, fxBruteN))},""" +
      s""""trained_np1":${f4(knnRecall(fx, fxTrained, 1, fxBrute, fxBruteN))}},""" +
      s""""intra_cos":${f4(intraF)},"inter_abs_cos":${f4(interF)}}""")

    // ---- production ANN stack on the real embeddings (round 6): the
    // full dial composition trained coarse × nprobe × PQ codes × exact
    // re-rank, swept over (nprobe, C) — the number a deployment would
    // actually ship, cited in SCALE.md next to the per-dial bench rows ----
    val pqCb = Similarity.pqTrainCodebooks(em, m = 4, k = 40, iters = 3)
      .localCheckpoint()
    val idx = Similarity.ivfPqIndex(em, trained, pqCb, m = 4).localCheckpoint()
    val stack = (for (np <- Seq(1, 4, 8); c <- Seq(50, 200)) yield {
      val r = Similarity.ivfPqKnnReranked(idx, trained, pqCb, em,
          em.where(col("vec_id") < 10), m = 4, k = 5, nprobe = np, candC = c)
        .select("query_id", "neighbor_id").intersect(brute).count() / bruteN
      s""""np${np}_c$c":${f4(r)}"""
    }).mkString(",")
    println(s"""STACK {$stack}""")

    // full-index ADC + re-rank C sweep (no coarse pruning — isolates the
    // C-vs-tie-set effect from the nprobe ceiling): the pqAdcKnnReranked
    // candC default is set from this row
    val emCodes = Similarity.pqEncode(em, pqCb, m = 4).localCheckpoint()
    val pqStack = Seq(50, 200).map { c =>
      val r = Similarity.pqAdcKnnReranked(emCodes, pqCb, em,
          em.where(col("vec_id") < 10), m = 4, k = 5, candC = c)
        .select("query_id", "neighbor_id").intersect(brute).count() / bruteN
      s""""c$c":${f4(r)}"""
    }.mkString(",")
    println(s"""PQSTACK {$pqStack}""")

    // ---- near-dup recall vs nprobe (real embeddings, q23's parameters) ----
    val exact = Similarity.exactNearDupPairs(em, 0.4)
      .select("id_a", "id_b").localCheckpoint()
    val exactN = exact.count().toDouble
    val sweep = Seq(2, 4, 6, 8).map { np =>
      val got = Similarity.embeddingNearDupPairs(em, naive, 0.4, nprobe = np)
        .select("id_a", "id_b").intersect(exact).count() / exactN
      s""""np$np":${f4(got)}"""
    }.mkString(",")
    println(s"""NEARDUP {"exact_pairs":${exactN.toLong},$sweep}""")
    spark.stop()
  }
}
