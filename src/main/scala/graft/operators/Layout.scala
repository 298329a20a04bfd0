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
}
