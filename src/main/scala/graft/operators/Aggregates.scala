package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Aggregation operators (reference analytics layer, SURVEY.md §2.5-2.7):
 * daily summaries with conditional counts and percentage-of-group, ordered
 * mode with deterministic tie-break, latest-per-group, distribution with
 * window total. All single-shuffle hash aggregates; Catalyst plans the
 * partial/final split and AQE coalesces the 5-group shuffles.
 */
object Aggregates {

  /**
   * Order-independent exact sum of a double column: sum in DECIMAL(28,6)
   * then back to double. Plain double sums are order-dependent (FP addition
   * is non-associative), which breaks both cross-engine verification and
   * run-to-run reproducibility once partitioning changes — at 1000-executor
   * scale the reduction order is never the same twice.
   */
  def exactSum(c: Column): Column =
    sum(c.cast(DecimalType(28, 6))).cast("double")

  /** Exact mean built from the exact sum (deterministic double division). */
  def exactAvg(c: Column): Column = exactSum(c) / count(c)

  /** SUM(CASE WHEN cond THEN 1 ELSE 0 END) — conditional count (A2). */
  def countIf(cond: Column): Column = sum(when(cond, 1L).otherwise(0L))

  /** Percentage of rows in the group satisfying cond (A3), exact division. */
  def pctIf(cond: Column): Column =
    countIf(cond).cast("double") * 100.0 / count(lit(1))

  /**
   * Deterministic MODE() WITHIN GROUP (A4): most frequent value; ties break
   * to the smallest value (Postgres picks first in ORDER BY — same rule).
   * Spark's built-in `mode()` is tie-arbitrary, so we take max_by over
   * (count, reversed-rank of value) via a two-level aggregate:
   * count per (keys, value) → argmax. Two shuffles on the same keys; the
   * second exchange is narrow (one row per distinct value).
   */
  def deterministicMode(df: DataFrame, keys: Seq[String], valueCol: String, as: String): DataFrame = {
    val counts = df.groupBy((keys :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__cnt").desc, col(valueCol).asc)
    counts.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select((keys.map(col) :+ col(valueCol).as(as)): _*)
  }

  /**
   * Latest row per group (J1/W2): row_number over (orderCol desc, tieBreak
   * desc) = 1. Single shuffle on the group keys; with low-cardinality keys
   * prefer this over groupBy(max)+self-join (one shuffle instead of two).
   */
  def latestPerGroup(df: DataFrame, keys: Seq[String], orderCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol).desc, col(tieBreak).desc)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /**
   * Top-k rows per group with a deterministic total order (generalizes
   * latestPerGroup). WindowGroupLimit pushes the rank limit map-side, so
   * each input partition forwards at most k rows per key into the single
   * exchange — the shuffle never carries more than k·|groups| rows.
   */
  def topKPerGroup(df: DataFrame, keys: Seq[String], orderCol: String,
                   tieBreak: String, k: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol).desc, col(tieBreak).asc)
    df.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /**
   * Gap-based sessionization: rows of a key belong to one session while
   * consecutive event-time gaps stay within `gapSeconds`. Implemented as
   * lag → boundary flag → running sum (the session id) — two window passes
   * over ONE partitioning (single shuffle on the key), then a hash
   * aggregate per session. The classic scale shape for clickstream
   * sessionization; skewed users are the risk and AQE skew handling plus
   * the bounded per-user row counts cover it.
   */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String, gapSeconds: Long): DataFrame = {
    val byTime = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc)
    val gapped = df
      .withColumn("__prev", lag(col(tsCol), 1).over(byTime))
      .withColumn("__new_session",
        when(col("__prev").isNull, 1L)
          .when(unix_timestamp(col(tsCol)) - unix_timestamp(col("__prev")) > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__new_session")).over(
        byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    gapped.groupBy(col(keyCol), col("session_id"))
      .agg(
        count(lit(1)).as("event_count"),
        min(unix_timestamp(col(tsCol))).as("start_epoch"),
        max(unix_timestamp(col(tsCol))).as("end_epoch"))
  }

  /**
   * Bounded-state percentiles for 100 TB groups: Spark's exact
   * `percentile` buffers EVERY value of a group in the aggregation state —
   * fine on test scale factors (and bit-matchable to a SQL oracle, which
   * is why the gate query uses it), fatal on a billion-row group. This is
   * the production path: `approx_percentile` keeps a fixed-size sketch per
   * group (state is O(accuracy), not O(rows)), trading ≤1/accuracy rank
   * error. Same call shape so a caller can swap exact↔approx with one
   * word.
   */
  def approxPercentiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                        percentiles: Seq[Double], accuracy: Int = 10000): DataFrame = {
    require(percentiles.nonEmpty, "at least one percentile required")
    def label(p: Double): String = {
      // decimal-exact label: 0.29 -> p29, 0.999 -> p99_9 (a truncating
      // (p*100).toInt mislabels 0.29 as p28 and collides 0.99 with 0.999)
      val pct = java.math.BigDecimal.valueOf(p)
        .multiply(java.math.BigDecimal.valueOf(100))
        .stripTrailingZeros.toPlainString
      "p" + pct.replace(".", "_")
    }
    val aggs = percentiles.map(p =>
      percentile_approx(col(valueCol), lit(p), lit(accuracy)).as(label(p)))
    df.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /**
   * Bounded-state distinct counting for 100 TB groups — the cardinality
   * twin of [[approxPercentiles]]. Exact `count(DISTINCT x)` plans an
   * Expand plus a second aggregation whose state holds every distinct
   * value per group — fine when the gate query counts a 5-value column,
   * fatal counting users over a billion-event group. HLL++ keeps a
   * fixed-size sketch per group (state O(1/rsd²), independent of
   * cardinality) with ~rsd relative error. Same call shape as an exact
   * groupBy so callers swap exact↔approx with one word.
   */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     rsd: Double = 0.023): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as(s"approx_distinct_$valueCol"))

  /**
   * Deterministic HyperLogLog register table, long shape: one (group,
   * bucket, register) row per POPULATED bucket of the 2^p-register HLL
   * over `valueCol`'s distinct values. The oracle-able core of
   * [[approxDistinct]] (Spark's HLL++ sketch bytes are engine-internal;
   * these registers are plain integer arithmetic any engine reproduces):
   * bucket = low p bits of the portable 60-bit hash, register = max over
   * rows of the rank (leading-zeros-plus-one) of the remaining 60−p bits.
   * Max-merge makes the whole table independent of partitioning AND
   * idempotent under replay — at-least-once streams accumulate it without
   * a dedup stage (unlike CMS addition). One aggregation shuffle of
   * ≤ |groups|·2^p narrow rows; the value stream itself never shuffles.
   * Estimation from the table: [[hllDistinct]]; bounded-state single-pass
   * twin: [[graft.expressions.HllRegisterAgg]] (spec-pinned equal).
   */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   p: Int): DataFrame = {
    require(p >= 2 && p <= 16, s"p must be in [2,16], got $p")
    val bits = 60 - p
    val h = graft.functions.Hashing.stableHash60(col(valueCol))
    val v = shiftright(h, p)
    val rank = when(v === 0L, lit(bits + 1))
      .otherwise(lit(bits + 1) - length(conv(v, 10, 2)))
    df.where(col(valueCol).isNotNull)
      .select((groupCols.map(col) :+ (h % (1L << p)).as("bucket")
        :+ rank.cast("long").as("rho")): _*)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("rho")).as("register"))
  }

  /**
   * Per-group HLL distinct estimate from [[hllRegisters]]'s table: the
   * standard alpha-corrected harmonic mean, with linear counting below
   * 2.5·m while empty registers remain. Empty (absent) buckets enter the
   * harmonic sum as 2^0 = 1 via m − populated. Floating point (pow/log),
   * so engine-local and spec-gated against exact distincts — the register
   * table above is the cross-engine contract. Second aggregation is over
   * the ≤ |groups|·2^p register rows, not the data.
   */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  p: Int): DataFrame = {
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    hllRegisters(df, groupCols, valueCol, p)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(pow(lit(2.0), -col("register"))).as("__inv"),
        count(lit(1)).as("__pop"))
      .withColumn("__zeros", lit(m) - col("__pop"))
      .withColumn("__invSum", col("__inv") + col("__zeros"))
      .withColumn("__raw", lit(alpha * m * m) / col("__invSum"))
      .withColumn(s"approx_distinct_$valueCol",
        when(col("__raw") <= lit(2.5 * m) && col("__zeros") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("__zeros")))
          .otherwise(col("__raw")))
      .select((groupCols.map(col) :+ col(s"approx_distinct_$valueCol")): _*)
  }

  /**
   * Rolling point-in-time entity features: for every row, aggregates over
   * the same key's rows in the `lookbackSec` seconds STRICTLY BEFORE it
   * (range frame [−lookback, −1] on epoch seconds) — "user's activity in
   * the hour before this event". Strictly-before matters twice: it keeps
   * the feature leakage-free (the row never sees itself or same-instant
   * peers), and it makes the frame peer-order-independent (equal-epoch
   * rows are excluded, so no engine's peer ordering can change the
   * answer). The sum goes through DECIMAL — order-independent like every
   * other sum in the engine. One shuffle on the key.
   */
  def rollingFeatures(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
                      lookbackSec: Long, idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(unix_timestamp(col(tsCol)))
      .rangeBetween(-lookbackSec, -1)
    df.select(
      col(keyCol), col(idCol), unix_timestamp(col(tsCol)).as("ts_epoch"),
      count(lit(1)).over(w).as("prior_count"),
      sum(col(valueCol).cast(DecimalType(28, 6))).over(w).cast("double").as("prior_sum"),
      max(col(valueCol)).over(w).as("prior_max"))
  }

  /**
   * Quantile binning (feature discretization): assign each row the bucket
   * implied by the column's own quantiles — bin i+1 holds values in
   * (bounds[i-1], bounds[i]]. The scale-safe shape for 100 TB: boundaries
   * come from ONE aggregation (partial-combinable percentile state — never
   * a global sort or a single-partition ntile window over raw rows), land
   * in a one-row frame broadcast to every executor, and assignment is a
   * codegen'd comparison chain (bin = 1 + Σ_i [value > bounds_i], unrolled
   * per probability at plan time — no interpreted lambda in the hot path).
   * The exact `percentile` matches SQL `quantile_cont` bit-for-bit (same
   * interpolation formula); swap in approx_percentile for billion-row
   * groups, same call shape.
   */
  def withQuantileBins(df: DataFrame, valueCol: String, probs: Seq[Double],
                       as: String = "bin"): DataFrame = {
    require(probs.nonEmpty && probs == probs.sorted && probs.forall(p => p > 0 && p < 1),
      "probs must be sorted interior probabilities")
    val bounds = df.agg(
      expr(s"percentile($valueCol, array(${probs.mkString(",")}))").as("__bounds"))
    val bin = probs.indices
      .map(i => when(col(valueCol) > col("__bounds").getItem(i), 1L).otherwise(0L))
      .reduce(_ + _) + 1L
    df.crossJoin(broadcast(bounds)).withColumn(as, bin).drop("__bounds")
  }

  /**
   * Value distribution with percent-of-total (A6/W1): groupBy(col).count +
   * unpartitioned window total. The window over () collapses to a single
   * partition — safe ONLY on post-aggregation cardinality (here: #distinct
   * values, tiny); never apply to raw rows.
   */
  def distributionWithPct(df: DataFrame, c: String): DataFrame = {
    val counts = df.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
    counts.withColumn(
      "pct",
      col("cnt").cast("double") * 100.0 / sum("cnt").over(Window.partitionBy()).cast("double"))
  }

  /**
   * Trailing VALUE-RANGE window aggregation: per key, count and sum over
   * the rows whose numeric order value lies in [current − horizon,
   * current] — the RANGE-frame sibling of [[rollingFeatures]]' ROWS
   * frames. The distinction matters on irregularly-spaced events: a
   * "last hour" feature is an hour whether three events landed in it or
   * three thousand; a ROWS frame would silently change meaning with
   * density. RANGE frames include ALL peers of the current order value
   * (both engines), so ties need no break column and the result is
   * deterministic on any partitioning. `valueCol` should be integral
   * (sum in longs — a double sum's association order would vary with
   * the frame's internal order).
   *
   * One keyed window exchange; everything else rides it.
   */
  def trailingRange(df: DataFrame, keys: Seq[String], orderCol: String,
                    valueCol: Column, horizon: Long): DataFrame = {
    require(horizon >= 0, "horizon must be >= 0")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
      .rangeBetween(-horizon, 0)
    df.withColumn("trail_n", count(lit(1)).over(w))
      .withColumn("trail_sum", sum(valueCol.cast("long")).over(w))
  }
}
