package graft

import org.apache.spark.sql.functions.col

/** One-off quality probe: recall@5 of IVF search under naive modulo
  * centroids vs self-trained centroids, against the exact brute force.
  * Run: sbt "runMain graft.RecallProbe [sfDir]". Not part of the gate —
  * the gate rows live in Bench's recall block. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-recall")
    spark.sparkContext.setLogLevel("WARN")
    val em = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = em.where(col("vec_id") < 10)
    val brute = operators.Similarity.bruteForceKnn(em, queries, k = 5)
      .select("query_id", "neighbor_id").localCheckpoint()
    val bruteN = brute.count().toDouble
    def recall(cent: org.apache.spark.sql.DataFrame, np: Int): Double =
      operators.Similarity.ivfKnn(em, queries, cent, k = 5, nprobe = np)
        .select("query_id", "neighbor_id").intersect(brute).count() / bruteN
    val naive = em.where(col("vec_id") % 50 === 0)
    val trained = operators.Similarity.trainCentroids(em, k = 40, iters = sys.env.getOrElse("PROBE_ITERS", "3").toInt).localCheckpoint()
    println(s"""RECALL {"naive_np1":${recall(naive, 1)},"trained_np1":${recall(trained, 1)},"trained_np4":${recall(trained, 4)}}""")
    spark.stop()
  }
}
