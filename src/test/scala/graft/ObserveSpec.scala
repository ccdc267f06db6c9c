package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** The observe() API — pipeline metrics collected during a pass with zero
  * extra scans (what a 100 TB job uses instead of a second count(*) query). */
class ObserveSpec extends SparkSpecBase {

  test("observation metrics ride along a real query at no extra pass") {
    val obs = Observation("ingest_metrics")
    val out = Tables.load(spark, sfDir, "lineitem")
      .observe(obs,
        count(lit(1)).as("rows_seen"),
        sum(when(col("l_discount") > 0.05, 1L).otherwise(0L)).as("high_discount"),
        max(col("l_extendedprice")).as("max_price"))
      .filter(col("l_returnflag") === "R")
      .groupBy(col("l_linestatus")).agg(count(lit(1)).as("n"))
    val resultRows = out.collect().map(_.getLong(1)).sum
    val m = obs.get
    // metrics reflect the FULL scan, not the filtered result
    assert(m("rows_seen").asInstanceOf[Long] === 6000L)
    assert(m("rows_seen").asInstanceOf[Long] > resultRows)
    assert(m("high_discount").asInstanceOf[Long] > 0)
    assert(m("max_price").asInstanceOf[Double] > 0)
  }
}
