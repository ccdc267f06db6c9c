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

  test("approx_percentile within rank-error bound of the exact quantiles") {
    // the sketch-quantile contract: with accuracy parameter B the estimate's
    // RANK error is <= 1/B, so the returned value must lie between the exact
    // quantiles at p ± 1/B (value error can be arbitrary, rank error cannot)
    val li = Tables.load(spark, sfDir, "lineitem")
    val b = 100 // rank error <= 1%
    val ps = Seq(0.25, 0.5, 0.75)
    val row = li.agg(
      expr(s"approx_percentile(l_extendedprice, array(${ps.mkString(",")}), $b)")
        .as("approx"),
      expr(s"percentile(l_extendedprice, array(${ps.map(p => p - 0.01).mkString(",")}))")
        .as("lo"),
      expr(s"percentile(l_extendedprice, array(${ps.map(p => p + 0.01).mkString(",")}))")
        .as("hi")).head()
    val approx = row.getSeq[Double](0)
    val lo = row.getSeq[Double](1)
    val hi = row.getSeq[Double](2)
    ps.indices.foreach { i =>
      assert(approx(i) >= lo(i) && approx(i) <= hi(i),
        s"p=${ps(i)}: approx=${approx(i)} outside exact rank band [${lo(i)}, ${hi(i)}]")
    }
  }

  test("DataSketches HLL: per-group sketches union to the global estimate") {
    // the mergeable-sketch pattern for 100 TB rollups: build sketches per
    // group once, then combine them for any coarser grouping without
    // rescanning the data
    Tables.registerAll(spark, sfDir)
    val perFlag = spark.sql(
      """SELECT l_returnflag, hll_sketch_agg(l_partkey) AS sk
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)
    perFlag.createOrReplaceTempView("flag_sketches")
    val merged = spark.sql(
      "SELECT hll_sketch_estimate(hll_union_agg(sk)) FROM flag_sketches")
      .head().getLong(0)
    val exact = spark.sql("SELECT COUNT(DISTINCT l_partkey) FROM lineitem")
      .head().getLong(0)
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"merged=$merged exact=$exact")
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
