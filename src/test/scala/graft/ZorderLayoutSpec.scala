package graft

import org.apache.spark.sql.functions._
import graft.operators.ZorderLayout

/** Measures the property Z-ordering exists for: a single-dimension
  * predicate skips most FILES on the z layout (parquet footer min/max
  * prunes them to zero rows), while a linear layout only skips on its own
  * sort key. Counting distinct input_file_name() over the filtered scan is
  * the real skipping signal — pruned files produce no rows at all. */
class ZorderLayoutSpec extends SparkSpecBase {

  // dimensions chosen for spread at the fixture SF (l_suppkey spans only
  // 0..9 at sf0.001 — a y<16 probe there would match everything and prune
  // nothing, vacuously)
  private def base = Tables.load(spark, sfDir, "lineitem")
    .select(col("l_linenumber"),
      (col("l_partkey") % 256).as("x"), (col("l_orderkey") % 256).as("y"))

  test("z layout: probes on EITHER dimension touch a fraction of the files; a linear layout only prunes its sort key") {
    val zPath = tmpDir("zorder") + "/z"
    val linPath = tmpDir("zorder") + "/linear"
    ZorderLayout.write(base, col("x"), col("y"), zPath, nFiles = 16)
    // linear comparison layout: range-clustered on x only
    base.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(linPath)

    val z = spark.read.parquet(zPath)
    val lin = spark.read.parquet(linPath)

    // probe on y (the NON-sort dimension for the linear layout)
    val zY = ZorderLayout.filesTouched(z.filter(col("y") < 16))
    val linY = ZorderLayout.filesTouched(lin.filter(col("y") < 16))
    assert(zY <= 8, s"z layout should skip most files on a y probe, touched $zY/16")
    assert(linY >= 12, s"linear-x layout cannot skip on y, touched $linY/16")

    // probe on x: the z layout skips here TOO (that is the whole point)
    val zX = ZorderLayout.filesTouched(z.filter(col("x") < 16))
    assert(zX <= 8, s"z layout should also skip on an x probe, touched $zX/16")

    // layout must never change answers
    val a = z.filter(col("y") < 16).agg(count(lit(1)), sum(col("x"))).head()
    val b = lin.filter(col("y") < 16).agg(count(lit(1)), sum(col("x"))).head()
    assert(a === b)
  }
}
