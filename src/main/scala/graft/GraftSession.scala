package graft

import org.apache.spark.sql.SparkSession

/**
 * Session factory with the engine's recommended configuration.
 *
 * Local mode sizes shuffle partitions to the core count (the 200 default
 * just makes 32-core local runs schedule 6× too many tiny tasks). On a
 * real cluster, size `spark.sql.shuffle.partitions` to ~2-3× total
 * executor cores and let AQE coalesce — the skew-join and coalesce flags
 * below are what keep 100 TB shuffles healthy; they are on by default in
 * Spark 4 but pinned here as part of the engine contract.
 */
object GraftSession {

  def local(cores: Int, appName: String = "graft"): SparkSession = {
    // SPARK_GRAFT_SHUFFLE_PARTITIONS decouples shuffle width from the
    // core count for probe runs — the cluster sizing rule above says
    // partitions scale with DATA, and the 15M-doc probe needed exactly
    // that knob to show the fixed-width spill, not the operator, bends
    // the growth law (SCALE.md round 8)
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
      cores.toString)
    val spark = configure(SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shuffleParts))
      .getOrCreate()
    GraftExtensions.registerInto(spark) // graft_cosine/graft_dot/graft_shingles in SQL
    spark
  }

  /**
   * Silence WindowExec's "No Partition Defined" warning — for HARNESS
   * mains only (bench/verify/probes), NOT the shared factory. Every
   * unpartitioned window in the engine runs over AGGREGATED cardinality
   * by design (the q07 rule; PlanShapeSpec pins each site), so in the
   * harness the warning only buries real warnings in the driver tail. A
   * literal partition key can't silence it on Spark 4
   * (EliminateWindowPartitions strips foldable keys). User-facing mains
   * and the test session keep the logger at WARN so a NEW accidental
   * unpartitioned window over non-aggregated cardinality still announces
   * itself at development time.
   */
  def quietWindowWarnings(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)

  /** Apply the engine's config contract to any builder (cluster or local). */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    // events.ts test data is nanosecond parquet (see SparkEntry.t)
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.ui.enabled", "false")
}
