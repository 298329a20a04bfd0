package graft

import graft.operators.Versioning
import org.apache.spark.sql.functions._

class VersioningSpec extends SparkSpec {
  import spark.implicits._

  private val oldSnap = Seq(
    (1L, "unchanged doc"),
    (2L, "this doc will change"),
    (3L, "this doc will be removed")
  ).toDF("doc_id", "text")
  private val newSnap = Seq(
    (1L, "unchanged doc"),
    (2L, "this doc has changed"),
    (4L, "this doc is new")
  ).toDF("doc_id", "text")

  test("snapshotDiff labels added/removed/changed/unchanged per doc") {
    val got = Versioning.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
    val census = Versioning.diffSummary(
      Versioning.snapshotDiff(oldSnap, newSnap, "doc_id", "text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(census == Map("added" -> 1L, "removed" -> 1L, "changed" -> 1L, "unchanged" -> 1L))
  }

  test("incrementalRefresh equals the full recompute and touches only the delta") {
    def derive(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val diff = Versioning.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
    // poison the old derived rows for non-unchanged ids: if the refresh
    // carried them forward instead of recomputing, equality would break
    val oldDerived = derive(oldSnap)
      .withColumn("n_tokens",
        when(col("doc_id") === 1L, col("n_tokens")).otherwise(lit(-999L)))
    val got = Versioning.incrementalRefresh(diff, oldDerived, newSnap, "doc_id", derive)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = derive(newSnap).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == full)
    assert(!got.valuesIterator.contains(-999L))
  }
}
