package graft

import org.apache.spark.sql.SparkSession

/** Guards on the driver contract itself. */
class ContractSpec extends SparkSpec {

  test("every oracleSql key names an existing query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracleSql keys without queries: $unknown")
  }

  test("every gate query carries a DuckDB oracle (no rows-only checks)") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"unexpected rows-only set: $rowsOnly")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("entry() returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every gate query executes at the smoke scale factor") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      withClue(name)(assert(n >= 0))
    }
  }

  test("graft SQL functions evaluate after registration") {
    GraftExtensions.registerInto(spark)
    val r = spark.sql(
      """SELECT graft_cosine(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS c,
        |       graft_dot(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS d,
        |       graft_dot_fd(array(1.0f, 2.0f), array(3.0d, 4.0d)) AS dfd,
        |       graft_shingles('a b c d', 3) AS s,
        |       graft_ngram_repetition('a b a b', 2) AS rep""".stripMargin).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 11.0)
    assert(r.getAs[Double]("dfd") == 11.0)
    assert(r.getSeq[String](3) == Seq("a b c", "b c d"))
    assert(r.getSeq[Long](4) == Seq(4L, 4L)) // "a b" ×2 · mass 2; all 4 chars covered
  }
}
