package graft

import org.apache.spark.sql.functions._
import graft.plans.AsofJoin

/** The custom as-of operator (logical node + strategy + broadcast exec):
  * identical results to the composed union-scan form and to DuckDB's native
  * ASOF (oracle d10b), with the edge semantics pinned — inclusive bound,
  * tie-breaking on the ordered-log position, inner drop when no earlier
  * reference exists, null keys/times never match. */
class AsofJoinSpec extends SparkSpecBase {

  test("custom operator matches the composed window-scan as-of (d10) exactly") {
    val composed = SparkEntry.queries("d10_asof_join")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val custom = SparkEntry.queries("d10b_asof_custom")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(custom.nonEmpty)
    assert(custom === composed)
  }

  test("plans BroadcastAsofJoin; probe side has no shuffle") {
    val df = SparkEntry.queries("d10b_asof_custom")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastAsofJoin"), plan.take(1200))
  }

  test("inclusive bound, tie-break on position, inner drop, null semantics") {
    import spark.implicits._
    val probe = Seq(
      (1L, 10L, "at-bound"),     // t == ref time: inclusive match
      (1L, 5L, "too-early"),     // before any ref: dropped (inner)
      (2L, 100L, "normal"),
      (3L, 50L, "no-such-key")   // key absent from ref: dropped
    ).toDF("user_id", "ts_ns", "tag")
    val ref = Seq(
      (1L, 10L, 1L, 111.0),      // two refs at the same time for key 1:
      (1L, 10L, 2L, 222.0),      //   tie must break to the greater pos (2)
      (2L, 60L, 3L, 333.0),
      (2L, 90L, 4L, 444.0)       // latest <= 100 wins over the earlier one
    ).toDF("user_id", "ts_ns", "event_id", "value")
    val out = AsofJoin.broadcastAsof(probe, ref, "user_id", "ts_ns", "event_id")
      .select(col("tag"), col("ref_event_id"), col("ref_value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out === Set(("at-bound", 2L, 222.0), ("normal", 4L, 444.0)))

    // null key / null time on the probe: never match, never throw
    val probeNulls = Seq(
      (Some(1L), Some(20L), "ok"),
      (None, Some(20L), "null-key"),
      (Some(1L), None, "null-time")
    ).toDF("user_id", "ts_ns", "tag")
    val out2 = AsofJoin.broadcastAsof(probeNulls, ref, "user_id", "ts_ns", "event_id")
      .select(col("tag")).collect().map(_.getString(0)).toSet
    assert(out2 === Set("ok"))

    // non-Long time column is rejected at the API, not at runtime
    val bad = intercept[IllegalArgumentException] {
      AsofJoin.broadcastAsof(
        probe.withColumn("ts_ns", col("ts_ns").cast("int")), ref,
        "user_id", "ts_ns", "event_id")
    }
    assert(bad.getMessage.contains("LongType"))
  }

  test("forward as-of by negation (d10c) routes through the custom operator") {
    val df = SparkEntry.queries("d10c_asof_forward")(spark, sfDir)
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastAsofJoin"))
    // strictness: every matched next-purchase is strictly after its error
    import org.apache.spark.sql.functions.{col, expr}
    val ev = Tables.events(spark, sfDir)
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .select(col("event_id"), col("ts_us"))
    val t = df.join(ev.withColumnRenamed("event_id", "error_pos")
        .withColumnRenamed("ts_us", "err_us"), "error_pos")
      .join(ev.withColumnRenamed("event_id", "next_purchase_pos")
        .withColumnRenamed("ts_us", "nxt_us"), "next_purchase_pos")
    assert(t.filter(col("nxt_us") <= col("err_us")).isEmpty)
  }
}
