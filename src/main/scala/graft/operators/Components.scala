package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Connected components over near-duplicate pair lists — the step that turns
 * pairwise matches (id_a, id_b) into dedup GROUPS (every doc labeled with
 * its group's smallest id, so "keep the smallest id per group" falls out).
 *
 * Algorithm: iterative smallest-label propagation. Each round every node
 * adopts the minimum label among itself and its neighbors; converges in
 * O(diameter) rounds. Near-dup graphs are unions of small cliques-ish
 * clusters (diameter 2-4), so a handful of rounds suffices; `maxIters`
 * bounds pathological chains and the loop exits early on fixpoint.
 *
 * Scale shape per round: one join of labels against the (symmetrized) edge
 * list on the node id + one min-aggregate — both shuffle on the node id
 * and can reuse the same partitioning. Each round's label set is one row
 * per node, never materializing components as collections.
 */
object Components {

  /**
   * @param pairs edges (id_a, id_b), any orientation, dups fine
   * @return (id, component) — component = smallest id reachable
   */
  def smallestIdPropagation(pairs: DataFrame, maxIters: Int = 10): DataFrame = {
    // Eager localCheckpoint, not persist: every round (and every convergence
    // check) reads the edge list, and persist alone is lazy — a first action
    // that short-circuits (e.g. limit) materializes only SOME partitions, so
    // later rounds silently recompute the missing ones through the whole
    // upstream pair-generation pipeline (this exact failure mode cost 5× in
    // the round-1 bench). localCheckpoint materializes every partition NOW
    // and truncates the lineage, so per-round cost is the tiny label join
    // only, independent of how expensive `pairs` was to produce.
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint()

    var converged = false
    var i = 0
    while (i < maxIters && !converged) {
      val neighborLabels = edges
        .join(labels.withColumnsRenamed(Map("id" -> "dst", "component" -> "dst_comp")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("dst_comp")).as("neighbor_min"))
      // checkpoint BEFORE the convergence probe: the probe then scans fully
      // materialized blocks, and next round's labels carry no lineage
      val joined = labels.join(neighborLabels, Seq("id"), "left")
        .select(col("id"), col("component"),
          least(col("component"), coalesce(col("neighbor_min"), col("component"))).as("new_component"))
        .localCheckpoint()
      val changed = joined.where(col("new_component") =!= col("component")).limit(1).count()
      labels = joined.select(col("id"), col("new_component").as("component"))
      converged = changed == 0
      i += 1
    }
    labels
  }

  /** Dedup decision from pair matches: one keeper (smallest id) per
    * component; returns (id, keep_id, is_keeper). */
  def dedupGroups(pairs: DataFrame): DataFrame =
    smallestIdPropagation(pairs)
      .select(col("id"), col("component").as("keep_id"),
        (col("id") === col("component")).as("is_keeper"))
}
