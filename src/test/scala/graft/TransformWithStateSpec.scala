package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, ValueState}
import org.apache.spark.sql.Encoders

/** Spark 4's transformWithState — the current arbitrary-state API (successor
  * to flatMapGroupsWithState): the same per-key CDC replica state machine,
  * with explicit typed ValueState. */
object TransformWithStateSpec {
  class ReplicaProcessor extends StatefulProcessor[Long, Change, Snapshot] {
    @transient private var state: ValueState[UserState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserState]("replica",
        Encoders.product[UserState], org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Change],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[Snapshot] = {
      val latest = rows.toSeq.maxBy(_.pos)
      val cur = Option(state.get())
      if (cur.forall(_.pos < latest.pos)) {
        if (latest.op == "DELETE") {
          state.clear()
          Iterator.single(Snapshot(key, latest.pos, latest.value, live = false))
        } else {
          state.update(UserState(latest.pos, latest.value))
          Iterator.single(Snapshot(key, latest.pos, latest.value, live = true))
        }
      } else Iterator.empty
    }
  }
}

class TransformWithStateSpec extends SparkSpecBase {

  test("transformWithState maintains the per-user replica with typed ValueState") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // transformWithState needs multiple column families → RocksDB state store
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try { runScenario() } finally {
      prev match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  private def runScenario(): Unit = {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Change]
    val out = input.toDS()
      .groupByKey(_.user_id)
      .transformWithState(new TransformWithStateSpec.ReplicaProcessor,
        TimeMode.None(), OutputMode.Append())
    val q = out.writeStream.format("memory").queryName("tws_replica")
      .outputMode("append").start()

    input.addData(Change(1, 1, "INSERT", 10.0), Change(2, 2, "INSERT", 20.0))
    q.processAllAvailable()
    input.addData(Change(1, 3, "UPDATE", 11.0), Change(2, 4, "DELETE", 0.0))
    q.processAllAvailable()
    input.addData(Change(1, 0, "UPDATE", 99.0)) // stale — ignored
    q.processAllAvailable()
    q.stop()

    val finals = spark.table("tws_replica").as[Snapshot].collect()
      .groupBy(_.user_id).view.mapValues(_.maxBy(_.pos)).toMap
    assert(finals(1L) === Snapshot(1, 3, 11.0, live = true))
    assert(finals(2L) === Snapshot(2, 4, 0.0, live = false))
    assert(!spark.table("tws_replica").as[Snapshot].collect().exists(_.pos == 0))
  }
}
