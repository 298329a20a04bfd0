package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus.toInt, "graft-bench")
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT/codegen/parquet-reader initialization otherwise
    // lands entirely on whichever query happens to run first (~3s skew)
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      SparkEntry.queries.head._2(spark, sfDir).write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }

    // noop sink: forces FULL evaluation of every output column (count() would
    // let Catalyst prune the computed columns away and time an empty scan).
    // sorted: deterministic execution order keeps per-query numbers
    // comparable across rounds (Map iteration order is hash-dependent)
    // optional args = query-name prefixes to run (local iteration); default all
    val wanted = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.isEmpty || args.exists(n.startsWith) }
    val results = wanted.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    spark.stop()
    // after stop(): Spark's shutdown logging goes to stderr, so this stays
    // the final clean stdout line (fork output passes through unprefixed —
    // see build.sbt outputStrategy)
    println(json)
  }
}
