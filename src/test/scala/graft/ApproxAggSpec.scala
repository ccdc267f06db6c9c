package graft

import org.apache.spark.sql.functions._

/** SURVEY C15 note — approximate distinct (HLL++): sketch-based aggregates
  * can't be oracle-diffed against DuckDB (different sketches), so the
  * contract here is relative-error against the exact count. */
class ApproxAggSpec extends SparkSpecBase {

  test("approx_count_distinct within 5% of exact on lineitem keys") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val r = li.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey"), 0.02).as("approx")).head()
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("HLL sketches merge across partitions consistently") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val whole = li.agg(approx_count_distinct(col("l_partkey"), 0.02)).head().getLong(0)
    // same data, different partitioning → same merged estimate (sketch merge
    // is associative/commutative; this is what makes it work across 1000
    // executors)
    val repart = li.repartition(13).agg(approx_count_distinct(col("l_partkey"), 0.02))
      .head().getLong(0)
    assert(whole === repart)
  }
}
