package graft

import graft.expressions.VectorExprs
import graft.functions.Vec
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import scala.util.Random

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("codegen cosine is bit-equal to the declarative fold") {
    val rnd = new Random(42)
    val vecs = (1L to 50L).map(i =>
      (i, Array.fill(64)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val both = vecs.as("a").crossJoin(vecs.as("b"))
      .select(
        VectorExprs.cosine(col("a.embedding"), col("b.embedding")).as("fast"),
        Vec.cosine(col("a.embedding"), col("b.embedding")).as("slow"))
      .where(col("fast") =!= col("slow"))
    assert(both.count() == 0)
  }

  test("cosine basics: parallel=1, orthogonal=0, mismatched length=null") {
    val df = Seq((
      Array(1f, 0f, 2f), Array(2f, 0f, 4f), Array(0f, 3f, 0f), Array(1f, 1f)))
      .toDF("a", "b", "c", "short")
    val r = df.select(
      VectorExprs.cosine(col("a"), col("b")),
      VectorExprs.cosine(col("a"), col("c")),
      VectorExprs.cosine(col("a"), col("short"))).head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-15)
    assert(r.getDouble(1) == 0.0)
    assert(r.isNullAt(2))
  }

  test("bruteForceKnn finds the planted nearest neighbor first") {
    val base = Array.fill(8)(1f)
    val near = base.clone(); near(0) = 0.99f
    val far = Array.fill(8)(-1f); far(0) = 1f
    val vecs = Seq((0L, base), (1L, near), (2L, far)).toDF("vec_id", "embedding")
    val knn = Similarity.bruteForceKnn(vecs, vecs.where(col("vec_id") === 0), k = 2)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toMap
    assert(knn(1) == 1L && knn(2) == 2L)
  }

  test("ivfKnn matches brute force when all vectors share one centroid bucket") {
    val rnd = new Random(7)
    // all vectors in the same half-space -> all assigned to the single centroid
    val vecs = (0L to 20L).map(i => (i, Array.fill(8)(rnd.nextFloat() + 0.5f)))
      .toDF("vec_id", "embedding")
    val queries = vecs.where(col("vec_id") < 3)
    val centroids = vecs.where(col("vec_id") === 0)
    val brute = Similarity.bruteForceKnn(vecs, queries, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val ivf = Similarity.ivfKnn(vecs, queries, centroids, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(ivf == brute)
  }

  test("random-hyperplane LSH buckets catch planted near-identical vectors") {
    val rnd = new Random(3)
    val base = Array.fill(16)(rnd.nextFloat() * 2 - 1)
    val near = base.clone(); near(0) = near(0) + 1e-4f
    val vecs = ((0L until 30L).map(i => (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
      ++ Seq((100L, base), (101L, near))).toDF("vec_id", "embedding")
    val planes = Similarity.hyperplanes(dim = 16, bits = 12)
    val cands = Similarity.rpLshCandidates(vecs, planes)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((100L, 101L)))
    val sigs = Similarity.rpLshSignatures(vecs, planes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(100L) == sigs(101L))
  }

  test("trainCentroids recovers planted clusters and is run-to-run deterministic") {
    val rnd = new Random(5)
    val base1 = Array.fill(8)(rnd.nextFloat() + 2f)
    val base2 = Array.fill(8)(rnd.nextFloat() - 3f)
    def jitter(b: Array[Float]) = b.map(x => x + rnd.nextFloat() * 0.01f)
    val vecs = ((0L until 20L).map(i => (i, jitter(base1)))
      ++ (20L until 40L).map(i => (i, jitter(base2)))).toDF("vec_id", "embedding")
    val cents = Similarity.trainCentroids(vecs, k = 2, iters = 3)
    assert(cents.count() == 2)
    // assignment splits exactly along the planted clusters
    val assign = Similarity.assignToCentroids(vecs, cents)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("centroid_id")).toMap
    val g1 = (0L until 20L).map(assign).toSet
    val g2 = (20L until 40L).map(assign).toSet
    assert(g1.size == 1 && g2.size == 1 && g1 != g2)
    // decimal-sum means: bit-identical on a second run
    val cents2 = Similarity.trainCentroids(vecs, k = 2, iters = 3)
    assert(cents.except(cents2).isEmpty && cents2.except(cents).isEmpty)
  }

  test("trained centroids beat naive bucketing on clusterable data (fixture recall)") {
    // the real embeddings fixture is near-isotropic, where training CANNOT
    // win (SCALE.md "ANN recall & data geometry"); this pins the trainer's
    // value where cluster structure exists, so a trainer regression fails
    // here instead of hiding behind "the data is unclusterable anyway"
    import org.apache.spark.sql.functions.col
    val fx = graft.gen.ClusteredFixture.build(spark, n = 1000).localCheckpoint()
    val brute = Similarity.bruteForceKnn(fx, fx.where(col("vec_id") < 10), k = 5)
      .select("query_id", "neighbor_id").localCheckpoint()
    val bruteN = brute.count().toDouble
    def recall(cents: org.apache.spark.sql.DataFrame): Double =
      Similarity.ivfKnn(fx, fx.where(col("vec_id") < 10), cents, k = 5, nprobe = 1)
        .select("query_id", "neighbor_id").intersect(brute).count() / bruteN
    val naive = recall(fx.where(col("vec_id") % 50 === 0))
    val trained = recall(Similarity.trainCentroids(fx, k = 20, iters = 3).localCheckpoint())
    assert(trained >= 0.9, s"trained recall $trained should recover planted clusters")
    assert(trained > naive, s"trained $trained must beat naive $naive at equal nprobe")
  }

  test("pqEncode assigns codeword rows to themselves; pqDecode reconstructs them exactly") {
    // 8-dim vectors, m=2 subspaces of 4; rows 0 and 10 are the codewords
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f, 0f, 1f, 0f, 0f)),
      (10L, Array(0f, 0f, 1f, 0f, 0f, 0f, 0f, 1f)),
      // mixes codeword 0's first half with codeword 10's second half
      (3L, Array(0.9f, 0.1f, 0f, 0f, 0f, 0.1f, 0f, 0.9f))).toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebooks(vecs.where(col("vec_id") % 10 === 0), m = 2)
    assert(cb.count() == 4) // 2 codewords × 2 subspaces
    val codes = Similarity.pqEncode(vecs, cb, m = 2)
    val byId = codes.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(byId(0L) == Seq(0L, 0L) && byId(10L) == Seq(10L, 10L),
      s"codeword rows must self-assign, got $byId")
    assert(byId(3L) == Seq(0L, 10L), "mixed row picks the nearest codeword per subspace")
    // decode of a codeword row = the row itself, bit-for-bit
    val recon = Similarity.pqDecode(codes, cb, m = 2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(recon(0L) == Seq(1f, 0f, 0f, 0f, 0f, 1f, 0f, 0f))
    assert(recon(3L) == Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 1f),
      "mixed row reconstructs as its chosen codewords concatenated in subspace order")
  }

  test("pqAdcKnn ranks the exact-codeword match first (asymmetric scoring)") {
    val rnd = new Random(11)
    // corpus = noisy copies of two orthogonal prototypes; queries are the
    // clean prototypes — ADC must put same-prototype members on top
    val protoA = Array.tabulate(8)(i => if (i < 4) 1f else 0f)
    val protoB = Array.tabulate(8)(i => if (i < 4) 0f else 1f)
    val corpus = (1L to 20L).map { i =>
      val p = if (i % 2 == 0) protoA else protoB
      (i, p.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f))
    }.toDF("vec_id", "embedding")
    val queries = Seq((100L, protoA), (101L, protoB)).toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebooks(corpus.where(col("vec_id") <= 2), m = 2)
    val top = Similarity.pqAdcKnn(Similarity.pqEncode(corpus, cb, m = 2), cb,
        queries, m = 2, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // every top-5 neighbor of each query shares its prototype's parity
    (1 to 5).foreach { rk =>
      assert(top((100L, rk)) % 2 == 0, s"query A rank $rk got ${top((100L, rk))}")
      assert(top((101L, rk)) % 2 == 1, s"query B rank $rk got ${top((101L, rk))}")
    }
  }

  test("ivfPqIndex = assignToCentroids(nprobe=1) ⊗ pqEncode, in one pass") {
    val rnd = new Random(7)
    val vecs = (1L to 120L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val cents = vecs.where(col("vec_id") % 30 === 0)
    val cb = Similarity.pqCodebooks(cents, m = 4)
    val idx = Similarity.ivfPqIndex(vecs, cents, cb, m = 4)
    val viaAssign = Similarity.assignToCentroids(vecs, cents)
      .select("vec_id", "centroid_id")
    assert(idx.select("vec_id", "centroid_id")
      .exceptAll(viaAssign).isEmpty && viaAssign.exceptAll(
        idx.select("vec_id", "centroid_id")).isEmpty,
      "one-pass coarse assignment must equal assignToCentroids")
    val viaEncode = Similarity.pqEncode(vecs, cb, m = 4)
    assert(idx.select("vec_id", "code").exceptAll(viaEncode).isEmpty,
      "one-pass codes must equal pqEncode")
  }

  test("ivfPqKnn probing every bucket equals pqAdcKnn (full asymmetric scan)") {
    val rnd = new Random(13)
    val vecs = (1L to 100L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val cents = vecs.where(col("vec_id") % 25 === 0) // 4 centroids
    val cb = Similarity.pqCodebooks(cents, m = 4)
    val queries = vecs.where(col("vec_id") <= 5)
    val full = Similarity.pqAdcKnn(Similarity.pqEncode(vecs, cb, m = 4), cb,
      queries, m = 4, k = 4).orderBy("query_id", "rank").collect()
    val ivf = Similarity.ivfPqKnn(Similarity.ivfPqIndex(vecs, cents, cb, m = 4),
      cents, cb, queries, m = 4, k = 4, nprobe = 4)
      .orderBy("query_id", "rank").collect()
    assert(ivf.toSeq == full.toSeq,
      "nprobe = #centroids must reduce IVF-PQ to the full asymmetric scan")
  }

  test("rerankExact with candC >= corpus reduces to brute force exactly") {
    // candidates = every non-self pair -> the re-rank IS the exact scan;
    // ranks, ids AND cosines must be bit-identical (same codegen cosine)
    val rnd = new Random(31)
    val vecs = (1L to 80L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebooks(vecs.where(col("vec_id") % 20 === 0), m = 4)
    val queries = vecs.where(col("vec_id") <= 5)
    val rr = Similarity.pqAdcKnnReranked(Similarity.pqEncode(vecs, cb, m = 4),
      cb, vecs, queries, m = 4, k = 4, candC = 80)
      .orderBy("query_id", "rank").collect()
    val brute = Similarity.bruteForceKnn(vecs, queries, k = 4)
      .orderBy("query_id", "rank").collect()
    assert(rr.toSeq == brute.toSeq,
      "re-rank over the full candidate set must equal the exact scan")
  }

  test("re-ranked quantized search recovers exact-tier recall on the fixture " +
    "(rr >= raw ADC, rr >= 0.8 at C=50)") {
    val fx = graft.gen.ClusteredFixture.build(spark, n = 600).localCheckpoint()
    val queries = fx.where(col("vec_id") < 10)
    val brute = Similarity.bruteForceKnn(fx, queries, k = 5)
      .select("query_id", "neighbor_id").localCheckpoint()
    val bruteN = brute.count().toDouble
    val cents = fx.where(col("vec_id") % 50 === 0)
    val cb = Similarity.pqCodebooks(cents, m = 4)
    val codes = Similarity.pqEncode(fx, cb, m = 4).localCheckpoint()
    def recall(r: org.apache.spark.sql.DataFrame): Double =
      r.select("query_id", "neighbor_id").intersect(brute).count() / bruteN
    val raw = recall(Similarity.pqAdcKnn(codes, cb, queries, m = 4, k = 5))
    val rr = recall(Similarity.pqAdcKnnReranked(codes, cb, fx, queries,
      m = 4, k = 5, candC = 50))
    assert(rr >= raw, s"re-ranked recall $rr must not trail raw ADC $raw")
    assert(rr >= 0.8, s"re-ranked recall@5 should reach exact tier, got $rr")
    // composed index with the same re-rank stage: never below raw IVF-PQ
    val idx = Similarity.ivfPqIndex(fx, cents, cb, m = 4)
    val rawIvf = recall(Similarity.ivfPqKnn(idx, cents, cb, queries, m = 4, k = 5))
    val rrIvf = recall(Similarity.ivfPqKnnReranked(idx, cents, cb, fx, queries,
      m = 4, k = 5, candC = 50))
    assert(rrIvf >= rawIvf, s"re-ranked IVF-PQ $rrIvf must not trail raw $rawIvf")
    // the production config — TRAINED coarse stage (naive coarse caps
    // recall at its own ceiling regardless of the re-rank) — must reach
    // exact tier: C=50 covers a 30-member cluster's ADC tie set here
    val trained = Similarity.trainCentroids(fx, k = 20, iters = 3).localCheckpoint()
    val tIdx = Similarity.ivfPqIndex(fx, trained, cb, m = 4)
    val rrTrained = recall(Similarity.ivfPqKnnReranked(tIdx, trained, cb, fx,
      queries, m = 4, k = 5, candC = 50))
    assert(rrTrained >= 0.8,
      s"trained-coarse re-ranked IVF-PQ should reach exact tier, got $rrTrained")
  }

  test("hardNegatives returns only different-label neighbors, drops null labels") {
    // two tight direction clusters; labels interleave within each cluster so
    // the nearest different-label vector is a same-cluster neighbor
    val rnd = new Random(5)
    val protoA = Array.tabulate(8)(i => if (i < 4) 1f else 0f)
    val protoB = Array.tabulate(8)(i => if (i < 4) 0f else 1f)
    val rows = (1L to 40L).map { i =>
      val p = if (i <= 20) protoA else protoB
      val lbl: Integer = if (i % 10 == 0) null else Int.box((i % 2).toInt)
      (i, p.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f), lbl)
    }.toDF("vec_id", "embedding", "label")
    val cents = rows.where(col("vec_id").isin(1L, 21L))
    val out = Similarity.hardNegatives(rows, cents, k = 3, nprobe = 1)
    val withLabels = out
      .join(rows.select(col("vec_id").as("anchor_id"), col("label").as("albl")), "anchor_id")
      .join(rows.select(col("vec_id").as("negative_id"), col("label").as("nlbl")), "negative_id")
    assert(withLabels.where(col("albl") === col("nlbl")).isEmpty,
      "a hard negative must carry a different label")
    assert(withLabels.where(col("albl").isNull || col("nlbl").isNull).isEmpty,
      "null-labeled vectors take no part")
    // every labeled anchor has same-bucket different-label candidates here,
    // so each yields a full top-3
    val anchors = out.select("anchor_id").distinct().count()
    assert(anchors == 36 && out.count() == 36 * 3,
      s"expected 36 anchors x 3 negatives, got $anchors anchors, ${out.count()} rows")
    // negatives must come from the anchor's own probed bucket: cross-proto
    // cosine is ~0 while in-cluster is ~1 — check mined cosines are high
    val minCos = out.agg(min("cosine")).head.getDouble(0)
    assert(minCos > 0.8, s"in-bucket hard negatives should be near neighbors, min cos $minCos")
  }

  test("trained PQ codebooks quantize with less distortion than naive ones") {
    // recall@5 cannot separate codebook quality on tightly clustered data
    // (same-cluster members collapse to near-identical reconstructions, so
    // intra-cluster ranking is tie-noise for ANY codebook); the objective
    // k-means actually minimizes — total squared reconstruction error — is
    // the discriminating pin
    import org.apache.spark.sql.functions.{col, sum => fsum}
    val fx = graft.gen.ClusteredFixture.build(spark, n = 600).localCheckpoint()
    def distortion(cb: org.apache.spark.sql.DataFrame): Double =
      Similarity.pqDecode(Similarity.pqEncode(fx, cb, m = 4), cb, m = 4)
        .withColumnsRenamed(Map("embedding" -> "recon"))
        .join(fx, Seq("vec_id"))
        .select(VectorExprs.l2sq(col("embedding"), col("recon")).as("e"))
        .agg(fsum("e")).head.getDouble(0)
    val naive = distortion(Similarity.pqCodebooks(fx.where(col("vec_id") % 50 === 0), m = 4))
    val trained = distortion(Similarity.pqTrainCodebooks(fx, m = 4, k = 12, iters = 3)
      .localCheckpoint())
    assert(trained < naive * 0.8,
      s"trained PQ distortion $trained should be well under naive $naive at equal k")
  }

  test("trainCentroids caps k at the distinct directions in the sample (no duplicate centroids)") {
    // two distinct directions but k=4: farthest-point init must STOP once
    // every unchosen sample point is directionally identical to a chosen
    // centroid — emitting duplicates would keep 4 vec_ids while silently
    // shrinking effective k (the round-3 advice item). Scaled copies count
    // as the same direction under cosine.
    val vecs = ((0L until 10L).map(i => (i, Array.fill(4)(1f)))
      ++ (10L until 15L).map(i => (i, Array.fill(4)(2f)))   // same direction, scaled
      ++ (15L until 20L).map(i => (i, Array.fill(4)(-1f)))).toDF("vec_id", "embedding")
    val cents = Similarity.trainCentroids(vecs, k = 4, iters = 3)
    val rows = cents.collect().map(_.getSeq[Float](1).toArray)
    assert(rows.length == 2)
    // and the two survivors are genuinely distinct directions
    val d = {
      val a = rows(0); val b = rows(1)
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      1.0 - dot / (na * nb)
    }
    assert(d > 0.5)
  }

  test("multi-probe assignment widens the bucketed near-dup net") {
    val rnd = new Random(9)
    val vecs = (0L until 60L).map(i => (i, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val cents = vecs.where(col("vec_id") % 10 === 0)
    val np1 = Similarity.embeddingNearDupPairs(vecs, cents, 0.3, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val np2 = Similarity.embeddingNearDupPairs(vecs, cents, 0.3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(np1.subsetOf(np2))
    val exact = Similarity.exactNearDupPairs(vecs, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(np2.subsetOf(exact)) // bucketing never invents pairs
  }

  test("meanPool averages element-wise, order-independently") {
    val vecs = Seq(
      (1L, Array(1f, 2f, 3f)), (1L, Array(3f, 4f, 5f)),
      (2L, Array(10f, 0f, -2f)))
      .toDF("doc_id", "embedding")
    def pooled(df: org.apache.spark.sql.DataFrame) =
      Similarity.meanPool(df, "doc_id", "embedding")
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toList).toMap
    val a = pooled(vecs)
    assert(a(1L) == List(2f, 3f, 4f))
    assert(a(2L) == List(10f, 0f, -2f)) // singleton group passes through
    // bit-identical under repartitioning (decimal per-position sums)
    assert(pooled(vecs.repartition(7)) == a)
  }

  test("semanticDedupGroups clusters planted duplicate families to one keeper each") {
    val rnd = new Random(11)
    // 3 duplicate families (near-identical copies of a prototype) + 40
    // unrelated random vectors that must not join any family
    val protos = Array.fill(3)(Array.fill(16)(rnd.nextFloat() * 2 - 1))
    def jitter(p: Array[Float]) = p.map(x => x + rnd.nextFloat() * 0.01f)
    val family = for (f <- 0 until 3; c <- 0 until 4)
      yield (100L * f + c, jitter(protos(f)))
    val noise = (1000L until 1040L).map(i => (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val vecs = (family ++ noise).toDF("vec_id", "embedding")
    val cents = vecs.where(col("vec_id") % 7 === 0)
    val groups = Similarity.semanticDedupGroups(vecs, cents, threshold = 0.995,
        nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // every family member labels to the family's smallest id
    val byKeep = groups.groupBy(_._2)
    assert(byKeep.keySet == Set(0L, 100L, 200L))
    byKeep.foreach { case (keep, members) =>
      assert(members.map(_._1).toSet == Set(keep, keep + 1, keep + 2, keep + 3))
      assert(members.count(_._3) == 1) // exactly one keeper
      assert(members.find(_._3).get._1 == keep) // the smallest id
    }
    // noise vectors appear in no group (implicit keepers)
    assert(groups.forall(_._1 < 1000L))
  }

  test("hierarchical assignment agrees with flat on clustered data and is deterministic") {
    // 4 well-separated clusters of 50 vectors; 16 centroids drawn from the
    // data (4 per cluster). On separated data the coarse routing cannot
    // cross cluster boundaries, so hier ≡ flat for in-cluster vectors.
    val rnd = new Random(7)
    val protos = Array.fill(4)(Array.fill(16)(rnd.nextFloat() * 2 - 1))
    val vecs = (0L until 200L).map { i =>
      val p = protos((i % 4).toInt)
      (i, p.map(x => x + rnd.nextFloat() * 0.01f))
    }.toDF("vec_id", "embedding")
    val cents = vecs.where(col("vec_id") < 16)
    val flat = Similarity.assignToCentroids(vecs, cents)
      .select("vec_id", "centroid_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hier = Similarity.assignToCentroidsHier(vecs, cents)
      .select("vec_id", "centroid_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hier.keySet == flat.keySet) // every vector assigned exactly once
    val agree = flat.count { case (v, c) => hier(v) == c }
    assert(agree >= 190, s"only $agree/200 agree with flat assignment")
    // run-to-run determinism (md5-ordered coarse picks, tie-broken argmax)
    val again = Similarity.assignToCentroidsHier(vecs, cents)
      .select("vec_id", "centroid_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == hier)
    // multi-probe shape parity with the flat path: nprobe distinct fine
    // centroids per vector
    val np2 = Similarity.assignToCentroidsHier(vecs, cents, nprobe = 2)
    assert(np2.count() == 400)
    assert(np2.select("vec_id", "centroid_id").distinct().count() == 400)
  }

  test("exactNearDupPairs finds planted duplicate pair only") {
    val rnd = new Random(1)
    val distinct = (0L until 10L).map(i => (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val dup = Seq((10L, distinct.head._2.clone()))
    val vecs = (distinct ++ dup).toDF("vec_id", "embedding")
    val pairs = Similarity.exactNearDupPairs(vecs, 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 10L)))
  }

  test("semanticContamination matches the brute-force cross join, smallest-id ties") {
    val rnd = new Random(11)
    val all = (0L until 60L).map(i => (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val train = all.filter(_._1 % 5 != 0).toDF("vec_id", "embedding")
    val evalSet = all.filter(_._1 % 5 == 0).toDF("vec_id", "embedding")
    val got = Similarity.semanticContamination(train, evalSet, threshold = 0.3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    // brute-force twin through the same codegen cosine, argmax tie → min id
    val brute = train.as("t").crossJoin(evalSet.as("e"))
      .select(col("t.vec_id").as("tid"), col("e.vec_id").as("eid"),
        VectorExprs.cosine(col("t.embedding"), col("e.embedding")).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (tid, rs) =>
        val best = rs.map(_._3).max
        tid -> (rs.filter(_._3 == best).map(_._2).min, best, best >= 0.3)
      }
    assert(got == brute)
    assert(got.values.exists(_._3) && got.values.exists(!_._3)) // threshold splits
  }

  test("semanticContamination: exact-duplicate eval vector flags with cosine 1") {
    val base = Array.fill(8)(0.5f)
    val train = Seq((1L, base.clone()), (2L, Array.fill(8)(-0.5f))).toDF("vec_id", "embedding")
    val evalSet = Seq((100L, base.clone()), (101L, base.clone())).toDF("vec_id", "embedding")
    val r = Similarity.semanticContamination(train, evalSet, threshold = 0.99)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(r(1L) == (100L, true)) // tie between 100/101 → smallest eval id
    assert(!r(2L)._2)
  }

  test("semanticContamination: empty eval set passes everything through unflagged") {
    val train = Seq((1L, Array.fill(4)(1f))).toDF("vec_id", "embedding")
    val evalSet = train.where(col("vec_id") < 0)
    val rows = Similarity.semanticContamination(train, evalSet).collect()
    assert(rows.length == 1)
    assert(rows.head.isNullAt(1) && rows.head.isNullAt(2) && !rows.head.getBoolean(3))
  }

  test("semanticContamination: maxEval bound raises instead of over-broadcasting") {
    val vecs = (0L until 10L).map(i => (i, Array.fill(4)(i.toFloat + 1)))
      .toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Similarity.semanticContamination(vecs, vecs, maxEval = 5).collect()
    }
    assert(ex.getMessage.contains("maxEval") ||
      ex.getCause != null && ex.getCause.getMessage.contains("maxEval"))
  }
}
