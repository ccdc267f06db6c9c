package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering layout — multi-dimensional file skipping.
  *
  * A table laid out sorted by one column prunes scans on that column only;
  * interleaving the bits of two filter dimensions into one sort key keeps
  * BOTH dimensions' value ranges narrow inside every file, so parquet
  * footer (row-group min/max) stats let a predicate on EITHER column skip
  * most of the corpus. This is the standard lakehouse layout trick (Delta
  * OPTIMIZE ZORDER BY, Iceberg sort orders) expressed with stock Spark
  * operators: the write is `repartitionByRange(z)` + `sortWithinPartitions`
  * — a sampled range shuffle, no single-partition window, no skew pileup —
  * and the read path needs nothing at all: Spark's parquet scan consumes
  * the footer stats natively.
  *
  * Reference tie-in: the replica tables the CDC chain maintains
  * (reference README.md:195-206) are exactly the tables analysts then
  * filter on secondary dimensions; this is the layout maintenance job that
  * keeps those scans cheap at 100 TB. ZorderLayoutSpec MEASURES the
  * benefit: files touched by a single-dimension probe on the z layout vs a
  * linear layout.
  */
object ZorderLayout {

  /** Morton key: interleave the low `bits` bits of x (even positions) and
    * y (odd positions). Pure integer bit math — codegen'd comparisons,
    * bit-identical everywhere. Inputs must already be non-negative and
    * < 2^bits (mask/bucket upstream: e.g. `col % 256`, or a rank). */
  def zvalue(x: Column, y: Column, bits: Int = 8): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Write `df` clustered on zvalue(x, y) into ~`nFiles` files. The z key
    * is materialized as `__z` (kept in the files: harmless, and lets a
    * maintenance job verify clustering without recomputing). Range
    * partitioning samples z to place file boundaries, so files are
    * balanced even when the key distribution is skewed. */
  def write(df: DataFrame, x: Column, y: Column, path: String,
            nFiles: Int, bits: Int = 8): Unit =
    df.withColumn("__z", zvalue(x, y, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .write.mode("overwrite").parquet(path)

  /** Distinct data files a filtered scan actually produced rows from —
    * with parquet row-group stats, files whose min/max exclude the
    * predicate yield zero rows, so this measures real skipping. */
  def filesTouched(df: DataFrame): Long =
    df.select(input_file_name()).distinct().count()
}
