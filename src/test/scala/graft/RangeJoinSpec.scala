package graft

import org.apache.spark.sql.functions._
import graft.plans.BroadcastRangeJoinStrategy

/** The custom band-join operator: same results as Spark's
  * BroadcastNestedLoopJoin plan, different complexity class.
  * Query shape: events falling inside 30-day incident windows anchored at
  * sampled order dates — a pure range condition, no equi key. */
class RangeJoinSpec extends SparkSpecBase {

  private def windows = Tables.load(spark, sfDir, "orders")
    .filter(col("o_orderkey") % 100 === 0)
    .select(col("o_orderkey").as("win_id"),
      unix_timestamp(col("o_orderdate")).as("lo"),
      (unix_timestamp(col("o_orderdate")) + 30L * 86400).as("hi"))

  private def points = Tables.load(spark, sfDir, "lineitem")
    .filter(col("l_suppkey") <= 2)
    .select(col("l_orderkey"), col("l_linenumber"),
      unix_timestamp(col("l_shipdate")).as("v"))

  private def bandJoin = windows.join(points,
    col("v") >= col("lo") && col("v") <= col("hi"))

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(3), r.getInt(4))

  test("strategy plans BroadcastRangeJoinExec and matches the BNLJ results") {
    val expected = bandJoin.collect().map(key).sorted.toSeq // stock plan (BNLJ)
    BroadcastRangeJoinStrategy.install(spark)
    try {
      val df = bandJoin
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastRangeJoin"), plan.take(1500))
      assert(!plan.contains("BroadcastNestedLoopJoin"))
      val got = df.collect().map(key).sorted.toSeq
      assert(got === expected)
      assert(got.nonEmpty)
    } finally BroadcastRangeJoinStrategy.uninstall(spark)
  }

  test("null stream values never match; empty range side yields empty result") {
    BroadcastRangeJoinStrategy.install(spark)
    try {
      import spark.implicits._
      val ranges = Seq((1L, 0L, 10L)).toDF("win_id", "lo", "hi")
      val pts = Seq(Some(5L), None, Some(20L)).toDF("v")
      val j = ranges.join(pts, col("v") >= col("lo") && col("v") <= col("hi"))
      assert(j.queryExecution.executedPlan.toString.contains("BroadcastRangeJoin"))
      assert(j.collect().map(_.getLong(3)).toSeq === Seq(5L))
      val empty = ranges.filter(col("win_id") < 0)
        .join(pts, col("v") >= col("lo") && col("v") <= col("hi"))
      assert(empty.collect().isEmpty)
    } finally BroadcastRangeJoinStrategy.uninstall(spark)
  }
}
