package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** SURVEY §2 D8 (custom-state form) — per-key CDC state maintained with
  * flatMapGroupsWithState: the running replica value per user as an explicit
  * state machine (INSERT/UPDATE set it, DELETE clears it), the
  * KeyValueGroupedDataset extension point the module doc calls out. */
// top-level case classes: Spark encoders cannot capture classes nested in a
// test suite (outer-scope instantiation)
case class Change(user_id: Long, pos: Long, op: String, value: Double)
case class UserState(pos: Long, value: Double)
case class Snapshot(user_id: Long, pos: Long, value: Double, live: Boolean)

/** Serializable holder: the state function must not capture the suite. */
object StatefulStreamSpec {
  def applyChanges(
      user: Long, changes: Iterator[Change],
      state: GroupState[UserState]): Iterator[Snapshot] = {
    // latest-wins within the batch, then against retained state (B3/B4
    // semantics expressed as an explicit state transition)
    val latest = changes.toSeq.maxBy(_.pos)
    val cur = state.getOption
    if (cur.forall(_.pos < latest.pos)) {
      if (latest.op == "DELETE") {
        state.remove()
        Iterator.single(Snapshot(user, latest.pos, latest.value, live = false))
      } else {
        state.update(UserState(latest.pos, latest.value))
        Iterator.single(Snapshot(user, latest.pos, latest.value, live = true))
      }
    } else Iterator.empty
  }
}

class StatefulStreamSpec extends SparkSpecBase {
  import StatefulStreamSpec.applyChanges

  test("flatMapGroupsWithState maintains the per-user replica across batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Change]
    val states = input.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(applyChanges)
    val q = states.writeStream.format("memory").queryName("replica_states")
      .outputMode("append").start()

    input.addData(Change(1, 1, "INSERT", 10.0), Change(2, 2, "INSERT", 20.0))
    q.processAllAvailable()
    input.addData(Change(1, 3, "UPDATE", 11.0), Change(2, 4, "DELETE", 0.0))
    q.processAllAvailable()
    // stale change (pos 0 < retained pos 3) must be ignored by the state machine
    input.addData(Change(1, 0, "UPDATE", 99.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("replica_states").as[Snapshot].collect()
      .groupBy(_.user_id).view.mapValues(_.maxBy(_.pos)).toMap
    assert(out(1L) === Snapshot(1, 3, 11.0, live = true))
    assert(out(2L) === Snapshot(2, 4, 0.0, live = false))
    // the stale pos-0 update produced no emission
    assert(!spark.table("replica_states").as[Snapshot].collect().exists(_.pos == 0))
  }
}
