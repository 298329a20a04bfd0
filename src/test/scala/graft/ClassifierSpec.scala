package graft

import graft.operators.Classifier
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The integer perceptron quality classifier (q137/q138): convergence on a
 * separable fixture, bit-determinism under re-partitioning, distributed
 * inference ≡ the training-time margin arithmetic, and the featureless-doc
 * bias contract.
 */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** Linearly separable fixture: positives draw bigrams from a "clean"
    * vocabulary, negatives from a disjoint "spam" one — disjoint feature
    * support guarantees a separating hyperplane exists (Novikoff). */
  private def fixture(n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val good = i % 2 == 0
      val vocab = if (good) Vector("clear", "prose", "reads", "well", "fine")
                  else Vector("zz9", "qq7", "xx3", "vv1", "kk5")
      val words = (0 until 12).map(j => vocab((i * 7 + j * 3) % vocab.size))
      (i.toLong, good, words.mkString(" "))
    }
    rows.toDF("doc_id", "is_good", "text")
  }

  test("perceptron converges on a separable fixture (zero last-epoch mistakes, " +
    "perfect training accuracy through the distributed scorer)") {
    val docs = fixture(40)
    val m = Classifier.trainPerceptron(docs, "doc_id", "is_good", "text",
      ns = Seq(2), buckets = 4096, sampleN = 40, epochs = 8)
    assert(m.lastEpochMistakes == 0L, s"did not converge: $m")
    val scored = Classifier.scoreDocs(docs, m, "doc_id", "text",
        ns = Seq(2), buckets = 4096)
      .join(docs.select(col("doc_id").as("id"), col("is_good")), Seq("id"))
      .collect()
    assert(scored.length == 40)
    scored.foreach { r =>
      assert(r.getAs[Boolean]("keep") == r.getAs[Boolean]("is_good"),
        s"misclassified training doc ${r.getAs[Long]("id")}")
    }
  }

  test("training is bit-deterministic under re-partitioning") {
    val docs = fixture(64)
    val a = Classifier.trainPerceptron(docs.repartition(7), "doc_id",
      "is_good", "text", ns = Seq(2), buckets = 512, sampleN = 32, epochs = 2)
    val b = Classifier.trainPerceptron(docs.coalesce(1).orderBy(desc("text")),
      "doc_id", "is_good", "text", ns = Seq(2), buckets = 512, sampleN = 32,
      epochs = 2)
    assert(a == b)
  }

  test("the model is sparse: no zero weights survive, bias rides as bucket -1") {
    val docs = fixture(32)
    val m = Classifier.trainPerceptron(docs, "doc_id", "is_good", "text",
      ns = Seq(2), buckets = 512, sampleN = 32, epochs = 2)
    assert(m.weights.values.forall(_ != 0L))
    val df = m.toDF(spark).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(df.filter(_._1 >= 0L) == m.weights)
    assert(df.getOrElse(-1L, 0L) == m.bias || (m.bias == 0L && !df.contains(-1L)))
  }

  test("distributed scoring equals a local integer replay of the same model") {
    val docs = fixture(48)
    val m = Classifier.trainPerceptron(docs, "doc_id", "is_good", "text",
      ns = Seq(2), buckets = 512, sampleN = 24, epochs = 3)
    val viaSpark = Classifier.scoreDocs(docs, m, "doc_id", "text",
        ns = Seq(2), buckets = 512)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // local twin: re-derive each doc's hashed counts through the SAME
    // column expressions (hash parity is HashingSpec's job), then sum
    // weights in plain Scala
    val feats = Classifier.featureCounts(docs, "doc_id", "text", Seq(2), 512)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val local = docs.select("doc_id").as[Long].collect().map { id =>
      id -> (m.bias + feats.filter(_._1 == id)
        .map(t => m.weights.getOrElse(t._2, 0L) * t._3).sum)
    }.toMap
    assert(viaSpark == local)
  }

  test("classifier-weighted PPS (the q147 composition): the draw over the " +
    "scored frame equals the draw over its keep subset, so a rejected doc " +
    "can never be admitted") {
    val docs = fixture(48)
    val m = Classifier.trainPerceptron(docs, "doc_id", "is_good", "text",
      ns = Seq(2), buckets = 4096, sampleN = 48, epochs = 8)
    val scored = Classifier.scoreDocs(docs, m, "doc_id", "text",
      ns = Seq(2), buckets = 4096).withColumnRenamed("id", "doc_id")
    val full = graft.operators.Sampling.ppsSample(
      scored, "doc_id", col("score"), targetRows = 10L, seed = 11L)
    val keepOnly = graft.operators.Sampling.ppsSample(
      scored.where(col("keep")), "doc_id", col("score"),
      targetRows = 10L, seed = 11L)
    // ppsSample's w > 0 filter IS q138's keep rule (score > 0), so the
    // composition is insensitive to pre-filtering by keep: same admitted
    // docs, same weights, same inclusion probabilities
    assert(full.collect().map(_.toSeq).toSet ==
      keepOnly.collect().map(_.toSeq).toSet)
    assert(full.count() > 0, "separable fixture must admit some positives")
    // every admitted doc is classifier-kept
    val keepSet = scored.where(col("keep")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    full.select("doc_id").collect().map(_.getLong(0))
      .foreach(id => assert(keepSet(id), s"admitted rejected doc $id"))
  }

  test("a doc below the shingle width scores the bare bias and still appears") {
    val docs = Seq((1L, true, "solo"), (2L, false, "two words here now"))
      .toDF("doc_id", "is_good", "text")
    val m = Classifier.PerceptronModel(Map(3L -> 5L), bias = -2L,
      lastEpochMistakes = 0L)
    val out = Classifier.scoreDocs(docs, m, "doc_id", "text", ns = Seq(2),
        buckets = 512)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) == ((-2L, false)))
    assert(out.contains(2L) && out.size == 2)
  }

  test("the q137/q138 gates run at sf0.001: model nonempty, one score row " +
    "per document, keeps consistent with scores") {
    val sf = "/root/testdata/sf0.001"
    val model = SparkEntry.queries("q137_perceptron_model")(spark, sf).collect()
    assert(model.nonEmpty)
    assert(model.forall(_.getLong(1) != 0L))
    val scores = SparkEntry.queries("q138_classifier_scores")(spark, sf)
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    val rows = scores.collect()
    assert(rows.length == n)
    rows.foreach(r => assert(r.getBoolean(2) == (r.getLong(1) > 0L)))
  }

  test("the distilled classifier beats the majority baseline on HELD-OUT " +
    "docs (the distillation carries signal, not just the training sample)") {
    val sf = "/root/testdata/sf0.01"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // the teacher: the same 21-stage battery the gate trains against
    val stages =
      Seq("min_tokens" -> (functions.Text.tokenCount(col("text")) >= 20)) ++
        functions.Quality.gopherStages("text", functions.Text.Stopwords) ++
        functions.Quality.repetitionStages("text")
    val labeled = docs.select(col("doc_id"),
      stages.map(_._2).reduce(_ && _).as("is_pass"))
    val m = Classifier.trainPerceptron(
      docs.join(labeled, "doc_id"), "doc_id", "is_pass", "text",
      ns = Seq.empty, buckets = 4096, sampleN = 128, epochs = 1,
      withStats = true)
    val verdicts = Classifier.scoreDocs(docs, m, "doc_id", "text",
        ns = Seq.empty, buckets = 4096, withStats = true)
      .join(labeled.withColumnRenamed("doc_id", "id"), "id")
      .where(col("id") >= 128) // holdout: never seen in training
      .select((col("keep") === col("is_pass")).cast("long").as("hit"),
        col("is_pass").cast("long").as("pos"))
      .agg(sum("hit").as("hits"), sum("pos").as("npos"), count(lit(1)).as("n"))
      .head()
    val (hits, npos, total) =
      (verdicts.getLong(0), verdicts.getLong(1), verdicts.getLong(2))
    val majority = math.max(npos, total - npos)
    assert(hits > majority,
      s"classifier $hits/$total does not beat majority $majority/$total")
    // round-8 pin: the stats-only 128x1 gate config measured 0.858
    // holdout accuracy (majority 0.52; the best gram config reached
    // 0.73); 0.80 leaves margin for corpus noise only
    assert(hits.toDouble / total >= 0.80,
      s"holdout accuracy ${hits.toDouble / total} fell below the 0.80 pin")
  }

  test("stat-channel scoring: fold ≡ broadcast-join twin, featureless docs " +
    "carry their six stat features, stats compose with gram orders") {
    val docs = fixture(24)
    val m = Classifier.trainPerceptron(docs, "doc_id", "is_good", "text",
      ns = Seq.empty, buckets = 512, sampleN = 24, epochs = 2,
      withStats = true)
    assert(m.weights.nonEmpty)
    val viaJoin = Classifier.scoreDocs(docs, m, "doc_id", "text",
        ns = Seq.empty, buckets = 512, withStats = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaFold = docs.select(col("doc_id"),
        Classifier.scoreColumn(m, col("text"), ns = Seq.empty, buckets = 512,
          withStats = true).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaJoin == viaFold)
    // every doc has exactly six stat features (counts sum per doc = 6)
    val cnts = Classifier.featureCounts(docs, "doc_id", "text",
        ns = Seq.empty, buckets = 512, withStats = true)
      .groupBy("id").agg(sum("cnt").as("n")).collect().map(_.getLong(1)).toSet
    assert(cnts == Set(6L))
    // union composes: gram + stat counts = gram counts + 6
    val both = Classifier.featureCounts(docs, "doc_id", "text",
        ns = Seq(2), buckets = 512, withStats = true)
      .agg(sum("cnt")).head().getLong(0)
    val grams = Classifier.featureCounts(docs, "doc_id", "text",
        ns = Seq(2), buckets = 512)
      .agg(sum("cnt")).head().getLong(0)
    assert(both == grams + 6L * 24L)
  }

  test("confusionCensus ≡ scoreDocs joined to the label (single-pass twin), " +
    "cells partition the corpus") {
    val docs = fixture(48)
    val m = Classifier.trainPerceptron(docs, "doc_id", "is_good", "text",
      ns = Seq(2), buckets = 512, sampleN = 24, epochs = 3)
    def cells(df: DataFrame) = df.collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    val census = cells(Classifier.confusionCensus(docs, m, "doc_id", "text",
      col("is_good"), ns = Seq(2), buckets = 512))
    // differential twin: the two-pass composition
    val twin = cells(Classifier.scoreDocs(docs, m, "doc_id", "text", Seq(2), 512)
      .join(docs.select(col("doc_id").as("id"), col("is_good")), Seq("id"))
      .groupBy(col("keep").as("pred_keep"), col("is_good").as("teacher_pass"))
      .agg(count(lit(1)).as("n_docs")))
    assert(census == twin)
    assert(census.values.sum == 48L)
    // partitioning independence rides the set-function aggregation
    assert(census == cells(Classifier.confusionCensus(docs.repartition(7),
      m, "doc_id", "text", col("is_good"), ns = Seq(2), buckets = 512)))
  }
}
