package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Connected components over near-duplicate pair lists — the step that turns
 * pairwise matches (id_a, id_b) into dedup GROUPS (every doc labeled with
 * its group's smallest id, so "keep the smallest id per group" falls out).
 *
 * Algorithm: smallest-label propagation with POINTER JUMPING. Each round
 * every node adopts the minimum label among itself and its neighbors
 * (one-hop propagation), then follows its label to that node's label
 * (label(x) := label(label(x)) — the path-halving step of classic
 * union-find / Shiloach-Vishkin). One-hop propagation alone converges in
 * O(diameter) rounds, which silently returns WRONG labels on a chain
 * longer than the iteration cap; the jump step squares the reach per
 * round, so convergence is O(log diameter) — 25 rounds covers any graph
 * that fits in storage. The loop still exits early on fixpoint (near-dup
 * graphs are clique-ish, diameter 2-4 → 2-3 rounds).
 *
 * Scale shape per round: one join of labels against the (symmetrized) edge
 * list + one min-aggregate + one label self-join — all shuffling one row
 * per node/edge, never materializing components as collections.
 */
object Components {

  /**
   * @param pairs edges (id_a, id_b), any orientation, dups fine
   * @return (id, component) — component = smallest id reachable
   */
  def smallestIdPropagation(pairs: DataFrame, maxIters: Int = 25): DataFrame = {
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
      // pointer jump: label := label(label) — component ids are node ids,
      // so the lookup is a self-join on the (checkpointed) labels. Both
      // the hop and the jump read the SAME materialized labels, so the
      // round needs only one new checkpoint; applying the jump to the
      // pre-hop labels (rather than the hopped ones) keeps the same
      // monotone fixpoint and still compounds the reach per round.
      val ptr = labels.select(col("id").as("__pid"), col("component").as("__pcomp"))
      val joined = labels
        .join(neighborLabels, Seq("id"), "left")
        .join(ptr, col("component") === col("__pid"), "left")
        .select(col("id"), col("component"),
          least(
            least(col("component"), coalesce(col("neighbor_min"), col("component"))),
            coalesce(col("__pcomp"), col("component"))).as("new_component"))
        .localCheckpoint()
      val changed = joined.where(col("new_component") =!= col("component")).limit(1).count()
      labels = joined.select(col("id"), col("new_component").as("component"))
      converged = changed == 0
      i += 1
    }
    // un-converged labels are silently WRONG (some nodes still carry a
    // non-minimal id) — fail loudly rather than return them
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge within $maxIters rounds")
    labels
  }

  /** Dedup decision from pair matches: one keeper (smallest id) per
    * component; returns (id, keep_id, is_keeper). */
  def dedupGroups(pairs: DataFrame): DataFrame =
    smallestIdPropagation(pairs)
      .select(col("id"), col("component").as("keep_id"),
        (col("id") === col("component")).as("is_keeper"))

  /**
   * Quality-aware representative selection over dedup groups — the
   * decision step a production dedup pipeline actually wants: within
   * each near-dup group keep the BEST document (highest score, smallest
   * id on ties), not the smallest id. [[dedupGroups]]' keeper is a group
   * NAME (smallest reachable id — stable under re-scoring); the
   * representative is a POLICY over member scores, and keeping the two
   * separate means changing the scorer never relabels groups.
   *
   * @param groups [[dedupGroups]] output (id, keep_id, …)
   * @param scored per-document scores, any frame with (idCol, scoreCol)
   * @return (id, group_id, score, rep_id, is_rep) per member — a drop
   *         step is `where(!is_rep)`, attribution keeps the full map
   *
   * Scale shape: one id-keyed join (members × scores) and ONE window
   * partitioned by group_id — near-dup groups are small by construction,
   * so partitions are tiny; no self-join, no collect.
   */
  def bestPerGroup(groups: DataFrame, scored: DataFrame,
                   idCol: String, scoreCol: String): DataFrame = {
    val members = groups.select(col("id"), col("keep_id").as("group_id"))
      .join(scored.select(col(idCol).as("id"), col(scoreCol).as("score")),
        Seq("id"))
    val w = Window.partitionBy(col("group_id"))
      .orderBy(col("score").desc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    members
      .withColumn("rep_id", first(col("id")).over(w))
      .withColumn("is_rep", col("id") === col("rep_id"))
  }
}
