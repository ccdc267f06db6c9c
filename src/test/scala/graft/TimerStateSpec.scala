package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import org.apache.spark.sql.Encoders

/** Event-time TIMERS in transformWithState — the state-machine surface the
  * ReplicaProcessor spec doesn't touch: a per-user purchase session that
  * EMITS on inactivity (30 min without an event, judged by the watermark)
  * and clears its state, i.e. timeout-driven output rather than
  * input-driven. The stale-timer hazard is handled the standard way: each
  * input re-registers a later timer and expiry only fires the emission if
  * it matches the session's latest deadline. */
object TimerStateSpec {
  case class PRow(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessAgg(total: Double, n: Long, lastMs: Long)
  case class SessionOut(user_id: Long, total: Double, n: Long)

  val GapMs: Long = 30L * 60 * 1000

  class SessionProcessor extends StatefulProcessor[Long, PRow, SessionOut] {
    @transient private var agg: ValueState[SessAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[SessAgg]("sess",
        Encoders.product[SessAgg], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[PRow],
        timerValues: TimerValues): Iterator[SessionOut] = {
      val rs = rows.toSeq
      val cur = Option(agg.get()).getOrElse(SessAgg(0.0, 0L, Long.MinValue))
      val lastMs = math.max(cur.lastMs, rs.map(_.ts.getTime).max)
      agg.update(SessAgg(cur.total + rs.map(_.value).sum, cur.n + rs.size, lastMs))
      // push the session deadline out; superseded timers are deleted so
      // exactly one live deadline exists per key
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(lastMs + GapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
      val cur = Option(agg.get())
      cur match {
        // only the CURRENT deadline closes the session (a stale timer that
        // survived a crash between delete and re-register must be ignored)
        case Some(c) if expiredTimerInfo.getExpiryTimeInMs() >= c.lastMs + GapMs =>
          agg.clear()
          Iterator.single(SessionOut(key, c.total, c.n))
        case _ => Iterator.empty
      }
    }
  }
}

class TimerStateSpec extends SparkSpecBase {
  import TimerStateSpec._

  test("event-time timer closes an idle session and clears its state") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val t0 = 1704067200000L // 2024 anchor, ms
      def ts(minute: Long) = new java.sql.Timestamp(t0 + minute * 60000)
      val input = MemoryStream[PRow]
      val out = input.toDS()
        .withWatermark("ts", "0 seconds")
        .groupByKey(_.user_id)
        .transformWithState(new SessionProcessor, TimeMode.EventTime(), OutputMode.Append())
      val q = out.writeStream.format("memory").queryName("timer_sessions")
        .outputMode("append").start()

      input.addData(PRow(1, ts(0), 10.0), PRow(1, ts(5), 2.5), PRow(2, ts(1), 7.0))
      q.processAllAvailable()
      // user 1 active again at minute 20 (within gap — session extends);
      // watermark moves to minute 20: no session may close yet
      input.addData(PRow(1, ts(20), 1.0))
      q.processAllAvailable()
      assert(spark.table("timer_sessions").isEmpty)
      // minute 95 advances the watermark past BOTH deadlines (u1: 50, u2: 31)
      input.addData(PRow(3, ts(95), 0.0))
      q.processAllAvailable()
      val closed = spark.table("timer_sessions").as[SessionOut].collect()
        .map(s => s.user_id -> ((s.total, s.n))).toMap
      assert(closed === Map(1L -> ((13.5, 3L)), 2L -> ((7.0, 1L))))
      // state was cleared: a fresh event opens a NEW session, closed later
      // with only its own rows
      input.addData(PRow(1, ts(100), 4.0))
      q.processAllAvailable()
      input.addData(PRow(3, ts(200), 0.0))
      q.processAllAvailable()
      q.stop()
      val all = spark.table("timer_sessions").as[SessionOut].collect()
        .filter(_.user_id == 1L).sortBy(_.n)
      assert(all.map(s => (s.total, s.n)).toSeq === Seq((4.0, 1L), (13.5, 3L)).sortBy(_._2))
    } finally {
      prev match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }
}
