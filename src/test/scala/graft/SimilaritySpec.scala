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

  test("exactNearDupPairs finds planted duplicate pair only") {
    val rnd = new Random(1)
    val distinct = (0L until 10L).map(i => (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val dup = Seq((10L, distinct.head._2.clone()))
    val vecs = (distinct ++ dup).toDF("vec_id", "embedding")
    val pairs = Similarity.exactNearDupPairs(vecs, 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 10L)))
  }
}
