package graft

import org.apache.spark.sql.SparkSession

/**
 * Session factory with the engine's recommended configuration.
 *
 * Local mode floors shuffle partitions at the core count (the 200
 * default just makes 32-core local runs schedule 6× too many tiny
 * tasks) and lets AQE derive the EFFECTIVE width from the data: the
 * pre-coalesce fan-out ([[initialPartitionsFor]]) is wide, and adaptive
 * coalescing merges post-shuffle partitions back to the advisory size
 * measured in bytes — so a shuffle's width scales with its data, never
 * with a constant (the round-8 15M-doc lesson: every growth-law bend
 * traced to a fixed width, SCALE.md). On a real cluster the same
 * contract reads: floor at ~2-3× total executor cores, ceiling at the
 * width your largest shuffle needs, AQE coalesces the rest — the
 * skew-join and coalesce flags below are what keep 100 TB shuffles
 * healthy; they are on by default in Spark 4 but pinned here as part
 * of the engine contract. Paths that know their input size can set the
 * floor explicitly via [[sizeShuffleFor]].
 */
object GraftSession {

  def local(cores: Int, appName: String = "graft"): SparkSession = {
    // SPARK_GRAFT_SHUFFLE_PARTITIONS pins shuffle width exactly (floor
    // AND AQE ceiling) for diagnosis runs — the knob that proved the
    // 15M-doc bends were the fixed-width spill, not the operators
    // (SCALE.md round 8). Absent the pin, the FLOOR is the core count
    // (tiny local queries shouldn't schedule 200 tasks) but the AQE
    // ceiling is wide: shuffles fan out to `initialPartitionNum` map
    // buckets and AQE coalesces them back by MEASURED bytes, so the
    // effective width is derived from the data, not from a constant —
    // a 5M-doc aggregation holds ~64 MB partitions instead of spilling
    // at width 32, while an 8-group count still collapses to a handful
    // of tasks. This is the round-9 fix for the r8 verdict's gap 1.
    val pinned = sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
    val shuffleParts = pinned.getOrElse(cores.toString)
    val initialParts = pinned.getOrElse(initialPartitionsFor(cores).toString)
    val spark = configure(SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        initialParts))
      .getOrCreate()
    GraftExtensions.registerInto(spark) // graft_cosine/graft_dot/graft_shingles in SQL
    spark
  }

  /**
   * Default AQE pre-coalesce fan-out for a local session: wide enough
   * that the biggest local-tier workload (the 15M-doc disk probe) never
   * sees a partition grow past memory, bounded so the per-shuffle
   * bookkeeping (map-status entries = maps × buckets) stays trivial.
   * On a cluster the same rule is "initialPartitionNum ≈ the width your
   * largest shuffle would need; let AQE coalesce the rest".
   */
  def initialPartitionsFor(cores: Int): Int = math.max(32 * cores, 1024)

  /**
   * Size-derived shuffle width: one partition per `bytesPerPartition`
   * of INPUT data, floored at the core count and capped at `maxParts`.
   * 64 MiB of (compressed, columnar) parquet decodes to a few hundred
   * MB of row data — about what one post-shuffle partition should hold
   * so sort-aggregations stay in memory. This is the explicit form of
   * the sizing rule the AQE ceiling applies implicitly; harness paths
   * that know their input size (the disk probe) call [[sizeShuffleFor]]
   * so even non-adaptive shuffles (e.g. streaming state) scale with
   * the data instead of riding a fixed default.
   */
  def shuffleWidthFor(inputBytes: Long, cores: Int,
                      bytesPerPartition: Long = 64L << 20,
                      maxParts: Int = 4096): Int = {
    require(bytesPerPartition > 0 && cores > 0 && maxParts >= cores)
    val byData = (inputBytes + bytesPerPartition - 1) / bytesPerPartition
    math.min(math.max(byData, cores.toLong), maxParts.toLong).toInt
  }

  /**
   * Apply [[shuffleWidthFor]] to a live session: sets the shuffle width
   * (the non-AQE floor) and keeps the AQE pre-coalesce fan-out at least
   * as wide. A manual SPARK_GRAFT_SHUFFLE_PARTITIONS pin wins — a
   * diagnosis run must measure the width it asked for. Returns the
   * width actually in force.
   */
  def sizeShuffleFor(spark: SparkSession, inputBytes: Long): Int = {
    val cores = spark.sparkContext.defaultParallelism
    val width = sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS").map(_.toInt)
      .getOrElse(shuffleWidthFor(inputBytes, cores))
    spark.conf.set("spark.sql.shuffle.partitions", width.toString)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
      math.max(width, initialPartitionsFor(cores)).toString)
    width
  }

  /** Bytes on disk under `path` (parquet dir or file) — the input-size
    * probe [[sizeShuffleFor]] feeds on. */
  def bytesOnDisk(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
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
