package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.CdcStream

/** SURVEY §5.4 — event-time semantics over true streams: watermark drops
  * late rows (D2/D9), tumbling aggregation finalizes windows (D3 streaming
  * form), and streaming dedup collapses redelivery (D6). */
class StreamingWindowSpec extends SparkSpecBase {

  private val H = 3600L * 1000 * 1000 * 1000 // ns per hour
  private def ev(pos: Long, tsNs: Long, op: String = "INSERT") =
    (op, "users", pos, tsNs, pos % 5, 1.0, "e")

  private def toChanges(ms: MemoryStream[(String, String, Long, Long, Long, Double, String)]) =
    ms.toDF().toDF("op", "tbl", "pos", "ts_ns", "user_id", "value", "event_type")

  test("D2/D3: watermark finalizes windows and drops late data") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, String, Long, Long, Long, Double, String)]
    val agg = CdcStream.tumblingCounts(toChanges(input))
    val q = agg.writeStream.format("memory").queryName("tumbling")
      .outputMode("append").start()

    // hour 0: three events; then jump far ahead to advance the watermark
    input.addData(ev(1, 10L * 60 * 1000000000L), ev(2, 20L * 60 * 1000000000L),
      ev(3, 40L * 60 * 1000000000L))
    q.processAllAvailable()
    input.addData(ev(10, 5 * H)) // watermark → 5h - 10min, hour-0 window closes
    q.processAllAvailable()
    // a straggler from hour 0 — behind the watermark, must be dropped
    input.addData(ev(11, 30L * 60 * 1000000000L))
    q.processAllAvailable()
    input.addData(ev(12, 7 * H)) // close the 5h window too
    q.processAllAvailable()
    q.stop()

    val out = spark.table("tumbling")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // hour-0 window emitted exactly once with the 3 on-time events; the late
    // straggler (pos 11) never appears anywhere
    assert(out.contains((0L, "INSERT", 3L)))
    assert(!out.exists { case (ws, _, n) => ws == 0L && n != 3L })
    assert(out.contains((5L * 3600, "INSERT", 1L)))
  }

  test("D5: session windows close in a true stream once the watermark passes") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, String, Long, Long, Long, Double, String)]
    val sessions = CdcStream.withEventTime(toChanges(input), "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").cast("long").as("start_s"), col("n"))
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()

    // user 1: two events 10 min apart (one session), then a 40-min gap event
    // (second session); all within hour 1
    input.addData(ev(1, H) /* user 1 */, ev(6, H + 10L * 60 * 1000000000L) /* user 1 */)
    q.processAllAvailable()
    input.addData(ev(11, H + 50L * 60 * 1000000000L)) // user 1, new session
    q.processAllAvailable()
    input.addData(ev(12, 10 * H)) // advance watermark far → all sessions close
    q.processAllAvailable()
    q.stop()

    val u1 = spark.table("sessions").filter(col("user_id") === 1)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(u1.toSeq === Seq((3600L, 2L), (3600L + 3000, 1L)))
  }

  test("D6b: dropDuplicatesWithinWatermark bounds dedup state by event time") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, String, Long, Long, Long, Double, String)]
    val deduped = CdcStream.withEventTime(toChanges(input), "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("pos"))
    val q = deduped.writeStream.format("memory").queryName("dedup_wm")
      .outputMode("append").start()

    input.addData(ev(1, H), ev(1, H)) // in-batch duplicate
    q.processAllAvailable()
    input.addData(ev(1, H + 60L * 1000000000L)) // dup within watermark → dropped
    q.processAllAvailable()
    // advance watermark far past pos-1's state, then redeliver pos 1:
    // its dedup state has been evicted, so the late copy is admitted —
    // exactly the bounded-state contract (dedup guaranteed only within
    // the watermark horizon)
    input.addData(ev(99, 10 * H))
    q.processAllAvailable()
    q.stop()

    val n = spark.table("dedup_wm").filter(col("pos") === 1).count()
    assert(n === 1) // duplicates inside the horizon collapsed
    assert(spark.table("dedup_wm").count() === 2) // pos 1 + pos 99
  }

  test("Complete output mode re-emits the full aggregate each batch") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, String, Long, Long, Long, Double, String)]
    val counts = toChanges(input).groupBy(col("op")).agg(count(lit(1)).as("n"))
    val q = counts.writeStream.format("memory").queryName("complete_counts")
      .outputMode("complete").start()
    input.addData(ev(1, H, "INSERT"), ev(2, H, "INSERT"))
    q.processAllAvailable()
    assert(spark.table("complete_counts").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap === Map("INSERT" -> 2L))
    input.addData(ev(3, H, "DELETE"))
    q.processAllAvailable()
    q.stop()
    // complete mode: the table is the full current aggregate, not a delta
    assert(spark.table("complete_counts").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("INSERT" -> 2L, "DELETE" -> 1L))
  }

  test("D6: streaming dedup collapses redelivered events") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, String, Long, Long, Long, Double, String)]
    val deduped = CdcStream.dedupStream(toChanges(input))
    val q = deduped.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()

    input.addData(ev(1, H), ev(2, H + 1), ev(1, H)) // duplicate in-batch
    q.processAllAvailable()
    input.addData(ev(2, H + 1), ev(3, H + 2))       // duplicate across batches
    q.processAllAvailable()
    q.stop()

    val seen = spark.table("dedup").select("pos").collect().map(_.getLong(0)).sorted
    assert(seen.toSeq === Seq(1L, 2L, 3L))
  }
}
