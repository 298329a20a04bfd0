package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling & dataset splitting for training pipelines.
 *
 * Spark's `randomSplit`/`sample` are seed-dependent AND partitioning-
 * dependent — re-running on a repartitioned table assigns different rows to
 * train/test, which silently invalidates every downstream eval. These
 * assign by a portable hash of a stable key instead: the same row lands in
 * the same split on any cluster, any partitioning, any engine (md5-derived
 * hash — verifiable in SQL, see the q43 oracle).
 *
 * Scale shape: split/sample assignment is a pure narrow projection (zero
 * shuffles — the split column is a function of the key alone);
 * capPerGroup is the one op here that shuffles (once, on the group key,
 * with the rank limit pushed down map-side).
 */
object Sampling {

  /**
   * Split assignment by hash(key) mod Σweights: splits like
   * ("train" -> 8, "val" -> 1, "test" -> 1) give a stable 80/10/10.
   */
  def splitColumn(key: Column, splits: Seq[(String, Int)]): Column = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "weights must be positive")
    val total = splits.map(_._2).sum
    val bucket = pmod(Hashing.stableHash60(key.cast("string")), lit(total))
    val (expr, _) = splits.foldLeft(Option.empty[Column] -> 0) {
      case ((acc, cum), (name, weight)) =>
        val upper = cum + weight
        val branch = acc match {
          case None    => when(bucket < upper, name)
          case Some(c) => c.when(bucket < upper, name)
        }
        (Some(branch), upper)
    }
    expr.get
  }

  /** Attach the split label as a column (narrow; no shuffle). */
  def assignSplits(df: DataFrame, keyCol: String, splits: Seq[(String, Int)],
                   as: String = "split"): DataFrame =
    df.withColumn(as, splitColumn(col(keyCol), splits))

  /** Deterministic fraction-of-keyspace sample: keeps rows whose key hashes
    * below `num`/`denom` of the hash range — stable under re-runs and
    * engine-portable (unlike `sample(fraction, seed)`). */
  def hashSample(df: DataFrame, keyCol: String, num: Int, denom: Int): DataFrame =
    df.where(pmod(Hashing.stableHash60(col(keyCol).cast("string")), lit(denom)) < num)

  /**
   * Class balancing: keep at most `maxPerGroup` rows per group, chosen by
   * hash-of-key rank (a deterministic pseudo-random draw — NOT "first N
   * encountered", which depends on partitioning). One shuffle on the
   * group key; the rank limit pushes down map-side (WindowGroupLimit), so
   * each partition forwards at most maxPerGroup rows per group.
   */
  def capPerGroup(df: DataFrame, groupCol: String, keyCol: String,
                  maxPerGroup: Int): DataFrame =
    // nulls LAST explicitly: Spark ASC defaults to nulls-first, SQL engines
    // to nulls-last — a null key would silently change which rows survive
    // depending on the engine evaluating the same ordering
    Dedup.rankLimit(df, Seq(col(groupCol)),
      Seq(Hashing.stableHash60(col(keyCol).cast("string")).asc_nulls_last,
        col(keyCol).asc_nulls_last),
      maxPerGroup)

  /**
   * Cross-split leakage audit: near-duplicate pairs that span different
   * dataset splits — the duplicate-shaped train/test contamination that
   * split assignment alone cannot prevent (two near-identical documents
   * hash to different splits, and the test member leaks the train member's
   * content). Takes ANY pair frame (id_a, id_b, score…) — minhash, simhash
   * or embedding near-dups — and labels each side with the SAME
   * deterministic hash split as [[assignSplits]], keeping only pairs whose
   * sides disagree.
   *
   * Scale shape: the split label is a pure function of the id, so this is
   * a zero-shuffle narrow projection over the (already sub-quadratic) pair
   * pipeline's output — no join back to the corpus, nothing new
   * materializes at 100 TB beyond the pair stream itself.
   */
  def crossSplitLeakage(pairs: DataFrame, idA: String, idB: String,
                        splits: Seq[(String, Int)]): DataFrame =
    pairs
      .withColumn("split_a", splitColumn(col(idA), splits))
      .withColumn("split_b", splitColumn(col(idB), splits))
      .where(col("split_a") =!= col("split_b"))

  /**
   * Data-mixture construction: per-group quotas instead of capPerGroup's
   * uniform cap — "12 docs from src0, 8 from src1, 3 from everything
   * else" is exactly how pretraining blends weight sources (up-sample
   * curated corpora, down-sample crawl). The draw per group is the same
   * deterministic hash-of-key rank. Groups smaller than their quota
   * contribute everything (standard mixture behavior — weights are caps,
   * not guarantees).
   *
   * One shuffle on the group column. The rank limit stays map-side
   * pushable (WindowGroupLimit) via the CONSTANT max-quota bound; the
   * per-group quota then filters post-window — so each partition forwards
   * at most max(quota) rows per group, and the variable part never blocks
   * the pushdown.
   */
  def mixtureSample(df: DataFrame, groupCol: String, keyCol: String,
                    quotas: Map[String, Int], defaultQuota: Int): DataFrame = {
    require(defaultQuota >= 0 && quotas.values.forall(_ >= 0), "quotas must be >= 0")
    val maxQuota = (quotas.values.toSeq :+ defaultQuota).max
    // deterministic branch order (sorted keys) — map iteration order must
    // never decide the expression tree
    val quota = quotas.toSeq.sortBy(_._1)
      .foldLeft(Option.empty[Column]) { case (acc, (g, q)) =>
        Some(acc.fold(when(col(groupCol) === g, q))(_.when(col(groupCol) === g, q)))
      }
      .fold(lit(defaultQuota))(_.otherwise(defaultQuota))
    Dedup.rankLimitKeep(df, Seq(col(groupCol)),
        Seq(Hashing.stableHash60(col(keyCol).cast("string")).asc_nulls_last,
          col(keyCol).asc_nulls_last),
        maxQuota, as = "__rn")
      .where(col("__rn") <= quota)
      .drop("__rn")
  }
}
