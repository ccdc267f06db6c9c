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

  test("null build-side bounds produce no matches (SQL three-valued semantics)") {
    BroadcastRangeJoinStrategy.install(spark)
    try {
      import spark.implicits._
      val ranges = Seq(
        (1L, Some(0L), Some(10L)),   // normal band
        (2L, None, Some(100L)),      // null lo: v >= NULL is never true
        (3L, Some(0L), None)         // null hi: v <= NULL is never true
      ).toDF("win_id", "lo", "hi")
      val pts = Seq(5L, 50L).toDF("v")
      val j = ranges.join(pts, col("v") >= col("lo") && col("v") <= col("hi"))
      assert(j.queryExecution.executedPlan.toString.contains("BroadcastRangeJoin"))
      // only the fully-bounded window matches; the null-bound windows must
      // NOT match anything (an unboxed-null 0L would have matched v=5/v=50)
      val got = j.collect().map(r => (r.getLong(0), r.getLong(3))).sorted.toSeq
      assert(got === Seq((1L, 5L)))
    } finally BroadcastRangeJoinStrategy.uninstall(spark)
  }

  test("non-Long band types fall back to Spark's own plan, results correct") {
    BroadcastRangeJoinStrategy.install(spark)
    try {
      import spark.implicits._
      // Int band — the strategy must decline (exec would ClassCastException)
      val rInt = Seq((1, 0, 10)).toDF("win_id", "lo", "hi")
      val pInt = Seq(5, 20).toDF("v")
      val jInt = rInt.join(pInt, col("v") >= col("lo") && col("v") <= col("hi"))
      val planInt = jInt.queryExecution.executedPlan.toString
      assert(!planInt.contains("BroadcastRangeJoin"), planInt.take(800))
      assert(jInt.collect().map(_.getInt(3)).toSeq === Seq(5))
      // Date band — same: decline and stay correct
      val rDate = Seq(("w1", "2024-01-01", "2024-01-31")).toDF("win_id", "lo", "hi")
        .select(col("win_id"), col("lo").cast("date"), col("hi").cast("date"))
      val pDate = Seq("2024-01-15", "2024-03-01").toDF("v")
        .select(col("v").cast("date"))
      val jDate = rDate.join(pDate, col("v") >= col("lo") && col("v") <= col("hi"))
      assert(!jDate.queryExecution.executedPlan.toString.contains("BroadcastRangeJoin"))
      assert(jDate.collect().map(_.getDate(3).toString).toSeq === Seq("2024-01-15"))
    } finally BroadcastRangeJoinStrategy.uninstall(spark)
  }
}
