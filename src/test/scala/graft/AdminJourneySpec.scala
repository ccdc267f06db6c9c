package graft

import org.apache.spark.sql.SparkSession

/** The warehouse ADMIN STORY, composed end-to-end and by SQL only, from a
  * session that knows nothing but the two catalog confs — the r7 "what's
  * missing" item: every piece (DDL, constraints, fsck, clone, DML, DROP)
  * has its own cold-session spec, but only one journey running them in
  * sequence through the same session catches conf-wiring gaps BETWEEN
  * them (a procedure that works only after a read warmed some state, a
  * TVF that needs a registry the DDL path happens to initialize, …).
  *
  * The sequence is the day-one operator script: provision → load →
  * declare constraints → watch one get enforced → audit → evolve the
  * schema → snapshot (zero-copy clone) → correct data (UPDATE/DELETE) →
  * verify the snapshot is isolated → audit again → tear down.
  */
class AdminJourneySpec extends SparkSpecBase {

  test("full admin story by SQL from a cold session: DDL → constraint → " +
    "enforcement → fsck → evolve → clone → DML → drop") {
    val wh = tmpDir("admin_journey")
    val s: SparkSession = spark.newSession()
    s.conf.set("spark.sql.catalog.graft", "graft.plans.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft.root", wh)

    // provision + load
    s.sql("""CREATE TABLE graft.lake.users (
      op STRING, tbl STRING, pos BIGINT, ts_ns BIGINT,
      user_id BIGINT, value DOUBLE, event_type STRING)""")
    s.sql("INSERT INTO graft.lake.users VALUES " +
      "('INSERT', 'users', 1, 1, 1, 10.0, 'evt')," +
      "('INSERT', 'users', 2, 2, 2, 20.0, 'evt')," +
      "('INSERT', 'users', 3, 3, 3, 30.0, 'evt')")

    // declare a CHECK; a violating write must be rejected by NAME and
    // commit nothing
    s.sql("CALL graft.system.add_check('lake.users', 'value_nonneg', 'value >= 0')")
    val ex = intercept[Exception] {
      s.sql("INSERT INTO graft.lake.users VALUES " +
        "('INSERT', 'users', 4, 4, 4, -3.0, 'evt')")
    }
    assert(ex.getMessage.contains("value_nonneg"),
      s"rejection must name the constraint: ${ex.getMessage}")
    assert(s.sql("SELECT count(*) FROM graft.lake.users").head().getLong(0) === 3)

    // a clean correction lands through MERGE
    s.sql("SELECT 2L AS user_id, 10L AS pos, 10L AS ts_ns, 25.0 AS value")
      .createOrReplaceTempView("fixes")
    s.sql(
      """MERGE INTO graft.lake.users t USING fixes f ON t.user_id = f.user_id
        |WHEN MATCHED AND f.pos > t.pos THEN
        |  UPDATE SET value = f.value, pos = f.pos, ts_ns = f.ts_ns
        |""".stripMargin)
    assert(s.sql("SELECT value FROM graft.lake.users WHERE user_id = 2")
      .head().getDouble(0) === 25.0)

    // audit: every invariant green, and the declared CHECK is part of it
    val rpt1 = s.sql("SELECT check, ok FROM graft_fsck('lake.users')")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(rpt1.values.forall(identity), s"fsck not green: $rpt1")
    assert(rpt1.keys.exists(_.contains("value_nonneg")),
      s"fsck must audit the declared CHECK: ${rpt1.keys}")

    // schema evolution mid-journey; old rows read NULL, new rows land it
    s.sql("ALTER TABLE graft.lake.users ADD COLUMN note STRING")
    s.sql("INSERT INTO graft.lake.users VALUES " +
      "('INSERT', 'users', 5, 5, 5, 50.0, 'evt', 'backfilled')")
    assert(s.sql("SELECT note FROM graft.lake.users WHERE user_id = 1")
      .head().isNullAt(0))

    // zero-copy snapshot, then correct the source with UPDATE + DELETE
    s.sql("CALL graft.system.clone('lake.users', 'lake.users_snap')")
    val snapBefore = s.sql("SELECT user_id, value FROM graft.lake.users_snap")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(snapBefore === Map(1L -> 10.0, 2L -> 25.0, 3L -> 30.0, 5L -> 50.0))
    s.sql("UPDATE graft.lake.users SET value = 11.0 WHERE user_id = 1")
    s.sql("DELETE FROM graft.lake.users WHERE user_id = 3")
    assert(s.sql("SELECT user_id, value FROM graft.lake.users")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap ===
      Map(1L -> 11.0, 2L -> 25.0, 5L -> 50.0))
    // the snapshot is isolated from the source DML
    assert(s.sql("SELECT user_id, value FROM graft.lake.users_snap")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap === snapBefore)

    // both sides audit green after the journey's writes
    Seq("lake.users", "lake.users_snap").foreach { t =>
      val rpt = s.sql(s"SELECT check, ok FROM graft_fsck('$t')")
        .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
      assert(rpt.values.forall(identity), s"fsck($t) not green: $rpt")
    }

    // tear down: detach + drop the snapshot, then the source; catalog empty
    s.sql("CALL graft.system.detach_clone('lake.users', 'lake.users_snap')")
    s.sql("DROP TABLE graft.lake.users_snap")
    s.sql("DROP TABLE graft.lake.users")
    assert(s.sql("SHOW TABLES IN graft.lake").collect().isEmpty)
  }
}
