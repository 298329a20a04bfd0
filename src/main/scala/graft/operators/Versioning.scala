package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus snapshot versioning: diff two releases of a keyed corpus and
 * recompute derived artifacts incrementally from the diff.
 *
 * At 100 TB a daily corpus release can't re-derive everything from
 * scratch; the workable shape is (1) a content-digest diff — one
 * full-outer join on the id, digests computed at the scan so the wide
 * text column never shuffles — and (2) delta recompute: expensive
 * derived tables (enrichment, signatures, embeddings) re-run only over
 * added/changed docs, unchanged rows carried forward from the previous
 * derived snapshot. |diff work| scales with the delta, not the corpus.
 */
object Versioning {

  /**
   * Per-doc diff between two snapshots keyed by `idCol`: status ∈
   * {added, removed, changed, unchanged} with the content digests that
   * justify it. Digests are md5 of the content column — computed BEFORE
   * the join shuffle, so only (id, 32-byte digest) moves. Digest columns
   * are ''-coalesced (a side with no row has no digest), keeping the
   * output join-friendly and null-free.
   */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   idCol: String, contentCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol).as("id"), md5(col(contentCol)).as("old_md5"))
    val n = newSnap.select(col(idCol).as("id"), md5(col(contentCol)).as("new_md5"))
    o.join(n, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("old_md5").isNull, lit("added"))
          .when(col("new_md5").isNull, lit("removed"))
          .when(col("old_md5") === col("new_md5"), lit("unchanged"))
          .otherwise(lit("changed")))
      .select(col("id"), col("status"),
        coalesce(col("old_md5"), lit("")).as("old_md5"),
        coalesce(col("new_md5"), lit("")).as("new_md5"))
  }

  /** One row per status with doc counts — the release-note census. */
  def diffSummary(diff: DataFrame): DataFrame =
    diff.groupBy("status").agg(count(lit(1)).as("n_docs"))

  /**
   * Incremental derived-table refresh: recompute `derive` only over the
   * added/changed docs of the new snapshot and carry forward the previous
   * derived rows for unchanged ids. `derive` must be per-doc (row-local
   * over any subset — signatures, enrichment, features); for corpus-global
   * derivations (IDF, vocabularies) recompute fully instead. Equals the
   * full recompute (VersioningSpec pins it) while touching |delta| docs.
   */
  def incrementalRefresh(diff: DataFrame, oldDerived: DataFrame,
                         newSnap: DataFrame, idCol: String,
                         derive: DataFrame => DataFrame): DataFrame = {
    val statusById = diff.select(col("id").as(idCol), col("status"))
    val dirtyIds = statusById.where(col("status").isin("added", "changed"))
    val fresh = derive(newSnap.join(dirtyIds.select(col(idCol)), Seq(idCol), "left_semi"))
    val carried = oldDerived.join(
      statusById.where(col("status") === "unchanged").select(col(idCol)),
      Seq(idCol), "left_semi")
    carried.unionByName(fresh)
  }
}
