package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream inner join with watermarks and a time-range condition:
  * purchases attributed to a signup within 1 hour, state bounded on both
  * sides by the watermark (the attribution-join shape of the CDC event
  * stream). */
class StreamStreamJoinSpec extends SparkSpecBase {

  private val M = 60L * 1000000000L // ns per minute
  // epoch-0 event times sit AT Spark's initial watermark and are dropped as
  // late on arrival — anchor the clock in 2024 like the fixtures
  private val T0 = 1704067200L * 1000000000L
  test("purchases join signups within a 1-hour attribution window") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val signups = MemoryStream[(Long, Long)]   // (user_id, ts_ns)
    val purchases = MemoryStream[(Long, Long, Double)] // (user_id, ts_ns, value)

    val sdf = signups.toDF().toDF("s_user", "s_ts_ns")
      .withColumn("s_ts", timestamp_micros(expr("s_ts_ns div 1000")))
      .withWatermark("s_ts", "10 minutes")
    val pdf = purchases.toDF().toDF("p_user", "p_ts_ns", "value")
      .withColumn("p_ts", timestamp_micros(expr("p_ts_ns div 1000")))
      .withWatermark("p_ts", "10 minutes")

    val joined = sdf.join(pdf,
      col("s_user") === col("p_user") &&
        col("p_ts") >= col("s_ts") &&
        col("p_ts") <= col("s_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("s_user").as("user"), col("p_ts_ns"), col("value"))

    val q = joined.writeStream.format("memory").queryName("attributed")
      .outputMode("append").start()

    signups.addData((1L, T0), (2L, T0 + 5 * M))
    purchases.addData((1L, T0 + 30 * M, 9.99))   // in window → match
    q.processAllAvailable()
    purchases.addData((1L, T0 + 90 * M, 5.0))    // 90min after signup → no match
    purchases.addData((2L, T0 + 20 * M, 7.5))    // in window → match
    purchases.addData((3L, T0 + 10 * M, 1.0))    // no signup → no match
    q.processAllAvailable()
    // advance both watermarks so all join state can be finalized
    signups.addData((99L, T0 + 600 * M)); purchases.addData((99L, T0 + 601 * M, 0.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("attributed")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows.contains((1L, T0 + 30 * M, 9.99)))
    assert(rows.contains((2L, T0 + 20 * M, 7.5)))
    assert(!rows.exists(_._1 == 3L))
    assert(!rows.contains((1L, T0 + 90 * M, 5.0)))
    // user 99's self-pairing (601-600=1min, in window) is expected
    assert(rows.size === 3)
  }

  test("stream-stream LEFT OUTER join emits null-extended signups once the watermark closes the window") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val signups = MemoryStream[(Long, Long)]
    val purchases = MemoryStream[(Long, Long, Double)]

    val sdf = signups.toDF().toDF("s_user", "s_ts_ns")
      .withColumn("s_ts", timestamp_micros(expr("s_ts_ns div 1000")))
      .withWatermark("s_ts", "10 minutes")
    val pdf = purchases.toDF().toDF("p_user", "p_ts_ns", "value")
      .withColumn("p_ts", timestamp_micros(expr("p_ts_ns div 1000")))
      .withWatermark("p_ts", "10 minutes")

    val joined = sdf.join(pdf,
      col("s_user") === col("p_user") &&
        col("p_ts") >= col("s_ts") &&
        col("p_ts") <= col("s_ts") + expr("INTERVAL 1 HOUR"),
      "left_outer")
      .select(col("s_user").as("user"), col("value"))

    val q = joined.writeStream.format("memory").queryName("attributed_lo")
      .outputMode("append").start()

    signups.addData((1L, T0), (2L, T0))
    purchases.addData((1L, T0 + 30 * M, 9.99)) // user 1 converts, user 2 never
    q.processAllAvailable()
    // the null-extended row for user 2 can only be emitted once the
    // watermark proves no matching purchase can still arrive
    signups.addData((99L, T0 + 600 * M))
    purchases.addData((99L, T0 + 601 * M, 0.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("attributed_lo")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(rows.contains((1L, Some(9.99))), rows.toString)
    assert(rows.contains((2L, None)),
      s"non-converting signup must appear null-extended after watermark: $rows")
  }
}
