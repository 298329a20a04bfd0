package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Write-layout optimization for scan pruning — the storage-side half of the
 * 100 TB story. Parquet readers skip whole files/row-groups from footer
 * min/max stats, but stats only prune if the layout CLUSTERS each filter
 * column; sorting by one column destroys locality for the others. Z-order
 * interleaves the bits of two key columns so files stay clustered in BOTH —
 * a point/range predicate on either column then touches a fraction of the
 * files (the Delta/Iceberg OPTIMIZE ZORDER shape, built from plain Column
 * arithmetic).
 */
object Layout {

  /**
   * 2-D Morton (Z-order) key: interleaves the low `bitsPer` bits of each
   * key (a on even positions, b on odd). Pure codegen'd integer arithmetic
   * — an unrolled sum of masked shifts, zero shuffle. Keys must be
   * non-negative; values ≥ 2^bitsPer wrap into the same cell (callers
   * bucket/hash real keys into range first, same as any Z-order impl).
   */
  def zorderKey(a: Column, b: Column, bitsPer: Int = 16): Column = {
    require(bitsPer > 0 && bitsPer <= 31, "bitsPer must be 1..31")
    (0 until bitsPer).map { i =>
      shiftright(a.cast("long"), i).bitwiseAND(1) * (1L << (2 * i)) +
        shiftright(b.cast("long"), i).bitwiseAND(1) * (1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /**
   * Write parquet clustered by the Z-key of two columns: range-partition on
   * the key (each output file owns a contiguous Z-range = a tile of the
   * (a,b) grid), sort within partitions so row-group stats are tight too.
   * `numFiles` is the file-count knob — at scale, target file sizes in the
   * 128 MB-1 GB band.
   */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    numFiles: Int, bitsPer: Int = 16): Unit = {
    val keyed = df.withColumn("__z", zorderKey(col(colA), col(colB), bitsPer))
    keyed
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /**
   * Small-file compaction: rewrite a parquet directory into files of
   * ~`targetBytes` each, sized from the table's ACTUAL on-disk bytes (not
   * a row-count guess — row width varies wildly across text/embedding
   * tables). The small-file problem is the operational failure mode of
   * streaming sinks at scale: a table appended in minute micro-batches
   * becomes millions of KB-files, and every scan pays per-file
   * open/footer/listing costs that dwarf the data read. One round-robin
   * shuffle (or a range shuffle when `clusterBy` is set, which also
   * restores min/max locality on that column for post-compaction
   * pruning), written to a staging dir and swapped in with two FileSystem
   * renames. The swap leaves a brief window where the path does not
   * resolve (a reader between the renames sees table-not-found, never
   * partial data) and a crash inside it strands the table at
   * `path__retired` — the next compact() call detects and rolls that
   * back. A table FORMAT (Delta/Iceberg) closes the window with an
   * atomic metadata commit; this is the plain-filesystem shape.
   *
   * Flat (unpartitioned) directories only: a Hive-partitioned table must
   * be compacted per partition (subdirectories — including a streaming
   * sink's `_spark_metadata` commit log — would be silently flattened or
   * destroyed by a whole-table rewrite, so they are refused instead).
   *
   * Returns the actual output file count.
   */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetBytes: Long = 128L << 20,
              clusterBy: Option[String] = None): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(path + "__compacting")
    val retired = new org.apache.hadoop.fs.Path(path + "__retired")
    // crash recovery: a previous run that died between its two renames
    // left the data at `retired` and nothing at `path` — restore first
    if (!fs.exists(p) && fs.exists(retired)) fs.rename(retired, p)
    require(fs.exists(p), s"compact: $path does not exist")
    val kids = fs.listStatus(p)
    require(!kids.exists(_.isDirectory),
      s"compact: $path has subdirectories (partitioned table or streaming " +
        "_spark_metadata) — compact each leaf partition directory instead")
    val totalBytes = kids.map(_.getLen).sum
    val numFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    val df = spark.read.parquet(path)
    val shaped = clusterBy match {
      case Some(c) => df.repartitionByRange(numFiles, col(c)).sortWithinPartitions(c)
      case None    => df.repartition(numFiles)
    }
    fs.delete(staging, true); fs.delete(retired, true)
    shaped.write.mode("overwrite").parquet(staging.toString)
    // swap: old table out, staging in — two metadata renames, no copy
    if (!fs.rename(p, retired)) sys.error(s"compact: could not retire $path")
    if (!fs.rename(staging, p)) {
      fs.rename(retired, p) // roll back — leave the table as it was
      sys.error(s"compact: could not activate staging for $path")
    }
    fs.delete(retired, true)
    // actual count: range partitions can come up empty on skewed/sampled
    // boundaries and then write no file — report what exists, not the plan
    fs.listStatus(p).count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
  }
}
