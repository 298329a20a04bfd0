package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString + "/t"

  /** Reference Morton interleave (the obvious bit-twiddling twin). */
  private def zRef(a: Long, b: Long, bits: Int): Long =
    (0 until bits).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum

  test("zorderKey matches the reference interleave and is monotone per coordinate") {
    val pts = for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)
    val got = pts.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zorderKey(col("a"), col("b"), bitsPer = 4).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (a, b) => assert(got((a, b)) == zRef(a, b, 4), s"($a,$b)") }
    // fixing one coordinate, z is strictly increasing in the other
    for (b <- 0L until 16L; a <- 1L until 16L)
      assert(got((a, b)) > got((a - 1, b)))
    // all 256 cells distinct (bijective on the 4-bit grid)
    assert(got.values.toSet.size == 256)
  }

  test("z-ordered layout prunes files for point predicates on EITHER column") {
    // 64x64 grid; 16 files. Sorted-by-a layout would give every file the
    // full b range (no pruning on b); the Z layout tiles the grid so a
    // point predicate on a OR b overlaps only a fraction of the files.
    val root = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val grid = (for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)).toDF("a", "b")
    Layout.writeZOrdered(grid, s"$root/z", "a", "b", numFiles = 16, bitsPer = 6)

    // per-file min/max footer stats, as a reader's file-skipping would see
    val stats = spark.read.parquet(s"$root/z")
      .select(input_file_name().as("f"), col("a"), col("b"))
      .groupBy("f")
      .agg(min("a").as("a_lo"), max("a").as("a_hi"), min("b").as("b_lo"), max("b").as("b_hi"))
      .collect()
    assert(stats.length > 8) // layout actually produced many files
    def overlapping(c: String, v: Long): Int = stats.count { r =>
      val lo = r.getAs[Long](s"${c}_lo"); val hi = r.getAs[Long](s"${c}_hi")
      lo <= v && v <= hi
    }
    // a point predicate on either column must skip at least half the files
    assert(overlapping("a", 13L) <= stats.length / 2)
    assert(overlapping("b", 47L) <= stats.length / 2)
  }

  test("compact rewrites a fragmented table into few files, content intact") {
    val root = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val path = s"$root/t"
    spark.range(50000).selectExpr("id", "id % 97 AS k")
      .repartition(64) // the streaming-sink fragmentation shape
      .write.parquet(path)
    def dataFiles = new java.io.File(path).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).toSeq
    assert(dataFiles.size == 64)
    val before = spark.read.parquet(path).orderBy("id").collect()

    val target = dataFiles.map(_.length()).sum / 4 // aim for ~4 files
    val n = Layout.compact(spark, path, targetBytes = target)
    assert(n >= 3 && n <= 6, s"expected ~4 output files, planned $n")
    assert(dataFiles.size == n) // table actually swapped in
    // no staging/retired leftovers
    assert(!new java.io.File(path + "__compacting").exists())
    assert(!new java.io.File(path + "__retired").exists())
    // content identical
    assert(spark.read.parquet(path).orderBy("id").collect().sameElements(before))
  }

  test("compact refuses partitioned tables instead of flattening them") {
    val root = java.nio.file.Files.createTempDirectory("graft-compactp").toString
    val path = s"$root/t"
    spark.range(1000).selectExpr("id", "id % 3 AS part")
      .write.partitionBy("part").parquet(path)
    val e = intercept[IllegalArgumentException](Layout.compact(spark, path))
    assert(e.getMessage.contains("subdirectories"))
    // the leaf partition dir itself compacts fine
    assert(Layout.compact(spark, s"$path/part=0", targetBytes = 1L << 30) == 1)
  }

  test("compact with clusterBy restores min/max locality on the cluster column") {
    val root = java.nio.file.Files.createTempDirectory("graft-compactc").toString
    val path = s"$root/t"
    // round-robin-fragmented: every small file spans the whole key range,
    // so footer stats prune nothing
    spark.range(40000).selectExpr("id", "id % 1000 AS k")
      .repartition(32).write.parquet(path)
    val bytes = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    Layout.compact(spark, path, targetBytes = bytes / 8, clusterBy = Some("id"))
    val stats = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("id").as("lo"), max("id").as("hi")).collect()
    assert(stats.length >= 4)
    // clustered: a point predicate overlaps exactly one file's range
    val hits = stats.count(r => r.getAs[Long]("lo") <= 20000L && 20000L <= r.getAs[Long]("hi"))
    assert(hits == 1, s"expected 1 overlapping file, got $hits")
  }

  test("writeShards emits one verifiable file per shard; manifest totals match the corpus") {
    val path = tmpDir("shards")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "source")
    val m = Layout.writeShards(docs, path, "doc_id", numShards = 8)
    assert(m.shards.map(_.shard).sorted == (0 until 8))
    assert(m.totalRows == 500 && m.shards.map(_.rows).sum == 500)
    m.shards.foreach(s => assert(s.bytes > 0 && s.rows > 0))
    // manifest row counts match the physical files, shard by shard
    val physical = spark.read.parquet(path).groupBy("shard").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    m.shards.foreach(s => assert(physical(s.shard) == s.rows))
    // full content round-trips
    assert(spark.read.parquet(path).drop("shard")
      .except(docs).isEmpty && docs.except(
        spark.read.parquet(path).drop("shard")).isEmpty)
    // manifest.json exists and carries the totals
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, "_manifest.json")))
    assert(json.contains(s""""total_rows":500""") &&
      json.contains(s""""checksum":${m.checksum}"""))
  }

  test("writeShards re-emit is idempotent; content changes flip the checksum") {
    val path = tmpDir("shards-idem")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val m1 = Layout.writeShards(docs, path, "doc_id", numShards = 4)
    val m2 = Layout.writeShards(docs.repartition(13), path, "doc_id", numShards = 4)
    // content-level determinism: same corpus → same manifest, on any
    // input partitioning (file BYTES may differ; the contract is content)
    assert(m1.shards.map(s => (s.shard, s.rows, s.checksum)) ==
      m2.shards.map(s => (s.shard, s.rows, s.checksum)))
    assert(m1.checksum == m2.checksum && m1.totalRows == m2.totalRows)
    // sensitivity: a one-row content edit changes the release checksum
    val edited = docs.withColumn("text",
      when(col("doc_id") === 7, lit("tampered")).otherwise(col("text")))
    val m3 = Layout.writeShards(edited, tmpDir("shards-edit"), "doc_id", numShards = 4)
    assert(m3.checksum != m1.checksum)
  }

  test("writeCorpusRelease attaches a data card consistent with the manifest") {
    val path = tmpDir("release")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val m = Layout.writeCorpusRelease(docs, path, "doc_id", "text", numShards = 4)
    val card = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, "_datacard.json")))
    // card.n_docs == manifest.total_rows by construction
    assert(card.contains(s""""n_docs":${m.totalRows}"""))
    assert(card.contains("\"top_lang\":") && card.contains("\"dup_rate\":"))
  }

  test("jsonLine keeps nulls and field order; writeJsonl round-trips through read.json") {
    import spark.implicits._
    // null fields stay (the JSONL interchange contract — Spark's default
    // would silently drop them and a loader expecting the key would break)
    val line = Seq((1L, null: String)).toDF("id", "s")
      .select(Layout.jsonLine(Seq(col("id"), col("s"))))
      .head.getString(0)
    assert(line == """{"id":1,"s":null}""")
    val path = tmpDir("jsonl")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "text")
    Layout.writeJsonl(docs, path, "doc_id", Seq("doc_id", "lang", "text"),
      numShards = 3)
    val back = spark.read.schema("doc_id LONG, lang STRING, text STRING")
      .json(path)
      .select("doc_id", "lang", "text") // drop the discovered shard= partition col
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    // one text file per shard
    val files = new java.io.File(path).listFiles
      .filter(d => d.isDirectory && d.getName.startsWith("shard="))
      .map(_.listFiles.count(f => f.getName.startsWith("part-")))
    assert(files.length == 3 && files.forall(_ == 1))
  }

  test("bucketed tables join with ZERO exchanges and ZERO sorts; " +
    "reading the bare path instead would shuffle") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val scores = docs.select(col("doc_id"), length(col("text")).as("score"))
    Layout.writeBucketed(docs.select("doc_id", "lang", "text"),
      "bk_docs", tmpDir("bk-docs"), buckets = 8, keys = Seq("doc_id"))
    Layout.writeBucketed(scores,
      "bk_scores", tmpDir("bk-scores"), buckets = 8, keys = Seq("doc_id"))
    try {
      val joined = spark.table("bk_docs").join(spark.table("bk_scores"), "doc_id")
      joined.collect() // materialize with AQE final plan
      val p = joined.queryExecution.executedPlan.toString
      // the whole point: no exchange, no sort — the write already paid both
      assert(!p.contains("Exchange hashpartitioning"), p)
      assert(!p.linesIterator.exists(_.trim.startsWith("+- Sort")), p)
      // same join via the bare parquet path loses the bucket metadata
      val unbucketed = spark.read.parquet(spark.table("bk_docs").inputFiles.head
          .replaceAll("/[^/]*$", ""))
        .join(spark.table("bk_scores"), "doc_id")
      val pu = unbucketed.queryExecution.executedPlan.toString
      assert(pu.contains("Exchange") || pu.contains("BroadcastExchange"), pu)
      // and the bucketed join is still CORRECT
      val expect = docs.select("doc_id").join(scores, "doc_id").count()
      assert(joined.count() == expect)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_docs")
      spark.sql("DROP TABLE IF EXISTS bk_scores")
    }
  }
}
