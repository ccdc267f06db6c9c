package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.CdcStream

/** D13 streaming form — the per-window PSI drift monitor over a TRUE
  * stream: watermark-closed windows emit exactly once, a window whose
  * event mix drifts from the reference raises the alert, and the
  * streamed rows equal the identical function run in batch over the same
  * events (SURVEY §5.4 stream-batch equivalence). */
class StreamingDriftSpec extends SparkSpecBase {

  private val H = 3600L * 1000 * 1000 * 1000
  private val M = 60L * 1000 * 1000 * 1000

  private def ev(pos: Long, tsNs: Long, t: String) =
    ("INSERT", "users", pos, tsNs, pos % 5, 1.0, t)

  private def toChanges(
      ms: MemoryStream[(String, String, Long, Long, Long, Double, String)]) =
    ms.toDF().toDF("op", "tbl", "pos", "ts_ns", "user_id", "value", "event_type")

  test("D13 stream: closed windows emit once; a drifted mix alerts; " +
    "stream ≡ batch on the same events") {
    implicit val sqlc = spark.sqlContext
    import spark.implicits._
    // reference mix: 60% click / 30% view / 10% purchase
    val ref = Seq("click" -> 60L, "view" -> 30L, "purchase" -> 10L)

    // hour 0 mirrors the reference (6/3/1); hour 2 is all purchases
    val hour0 = (1 to 6).map(i => ev(i, i * M, "click")) ++
      (7 to 9).map(i => ev(i, i * M, "view")) :+ ev(10, 10 * M, "purchase")
    val hour2 = (20 to 29).map(i => ev(i, 2 * H + (i - 20) * M, "purchase"))
    val closer = ev(99, 10 * H, "click") // advances the watermark past both

    val input = MemoryStream[(String, String, Long, Long, Long, Double, String)]
    val q = CdcStream.psiDrift(toChanges(input), ref, alertAt = 0.2)
      .writeStream.format("memory").queryName("psi_drift")
      .outputMode("append").start()
    input.addData(hour0: _*); q.processAllAvailable()
    input.addData(hour2: _*); q.processAllAvailable()
    input.addData(closer);    q.processAllAvailable()
    q.stop()

    val out = spark.table("psi_drift").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    // exactly the two closed windows emitted (hour 10 is still open)
    assert(out.keySet === Set(0L, 7200L), s"windows: ${out.keySet}")
    val (n0, psi0, alert0) = out(0L)
    assert(n0 === 10L && !alert0 && math.abs(psi0) < 0.05,
      s"reference-mix window must sit near zero PSI: $psi0")
    val (n2, psi2, alert2) = out(7200L)
    assert(n2 === 10L && alert2 && psi2 > 0.2,
      s"all-purchase window must alert: $psi2")

    // the same function over the same rows in BATCH mode produces the
    // identical statistic for the closed windows
    val batch = CdcStream.psiDrift(
      (hour0 ++ hour2 :+ closer)
        .toDF("op", "tbl", "pos", "ts_ns", "user_id", "value", "event_type"),
      ref, alertAt = 0.2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    assert(batch(0L) === out(0L) && batch(7200L) === out(7200L),
      "stream and batch diverged on identical events")
  }
}
