package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.{BucketedReplica, CdcStream}

/** CHECK constraints on the replica: declared durably in the table meta,
  * validated against existing rows at declaration, enforced at every
  * commit with ANSI semantics (only FALSE violates; tombstones exempt),
  * reject-the-batch atomicity, and the SQL surface via
  * CALL graft.system.add_check / drop_check. */
class CheckConstraintSpec extends SparkSpecBase {

  private def mkBatch(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), CdcStream.envelopeSchema)

  private def row(op: String, pos: Long, uid: Long, v: Double): Row =
    Row(op, "users", pos, pos, uid, v, "evt")

  private def seeded(): (String, BucketedReplica) = {
    val root = tmpDir("chk") + "/rep"
    val rep = new BucketedReplica(root, nBuckets = 4)
    rep.commit(mkBatch(Seq(row("INSERT", 1L, 1L, 10.0), row("INSERT", 2L, 2L, 20.0))))
    (root, rep)
  }

  test("a violating batch is rejected loudly, names the constraint, and " +
    "commits nothing; a clean batch then lands") {
    val (_, rep) = seeded()
    rep.addCheck(spark, "value_nonneg", "value >= 0")
    assert(rep.checkConstraints === Map("value_nonneg" -> "value >= 0"))
    val v1 = rep.currentVersion.get
    val ex = intercept[IllegalArgumentException] {
      rep.commit(mkBatch(Seq(
        row("UPDATE", 10L, 1L, -5.0), row("INSERT", 11L, 3L, 30.0))))
    }
    assert(ex.getMessage.contains("value_nonneg") &&
      ex.getMessage.contains("1 rows"))
    assert(rep.currentVersion.get === v1, "rejected batch must not publish")
    // the clean row of the same logical content commits fine afterwards
    rep.commit(mkBatch(Seq(row("INSERT", 11L, 3L, 30.0))))
    assert(rep.live(spark).count() === 3)
  }

  test("declaration validates EXISTING rows and refuses when they violate") {
    val (_, rep) = seeded()
    val ex = intercept[IllegalArgumentException] {
      rep.addCheck(spark, "value_small", "value < 15")
    }
    assert(ex.getMessage.contains("1 existing live rows"))
    assert(rep.checkConstraints.isEmpty)
  }

  test("ANSI semantics: NULL (UNKNOWN) passes; DELETE tombstones are " +
    "exempt so keys stay deletable") {
    val (_, rep) = seeded()
    rep.addCheck(spark, "value_nonneg", "value >= 0")
    // a NULL value evaluates UNKNOWN — not a violation (ANSI CHECK)
    rep.commit(mkBatch(Seq(Row("INSERT", "users", 20L, 20L, 4L, null, "evt"))))
    // a tombstone whose payload would violate still deletes its key
    rep.commit(mkBatch(Seq(row("DELETE", 30L, 1L, -1.0))))
    val ids = rep.live(spark).select("user_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(1L) && ids.contains(4L))
  }

  test("dropCheck lifts enforcement; names and expressions survive reopen") {
    val (root, rep) = seeded()
    rep.addCheck(spark, "value_nonneg", "value >= 0")
    // durability: a cold open of the same root sees the constraint
    assert(BucketedReplica.open(root).checkConstraints
      === Map("value_nonneg" -> "value >= 0"))
    rep.dropCheck("value_nonneg")
    rep.commit(mkBatch(Seq(row("INSERT", 40L, 9L, -99.0))))
    assert(rep.live(spark).filter(col("user_id") === 9L).count() === 1)
  }

  test("FOREIGN KEY: orphan batches are rejected against the parent's " +
    "live keys; NULL and tombstones pass; declaration validates existing " +
    "rows; fsck reports conformity") {
    val base = tmpDir("fk")
    val parent = new BucketedReplica(base + "/parent", nBuckets = 4)
    parent.commit(mkBatch(Seq(row("INSERT", 1L, 100L, 1.0),
      row("INSERT", 2L, 200L, 2.0))))
    val child = new BucketedReplica(base + "/child", nBuckets = 4)
    // child rows reference parent keys through the `pos` column
    child.commit(mkBatch(Seq(Row("INSERT", "users", 100L, 1L, 11L, 1.0, "evt"))))
    child.addForeignKey(spark, "pos_ref", "pos", base + "/parent")
    assert(child.fkConstraints === Map("pos_ref" -> (("pos", base + "/parent"))))
    val v = child.currentVersion.get
    val ex = intercept[IllegalArgumentException] {
      child.commit(mkBatch(Seq(Row("INSERT", "users", 999L, 2L, 12L, 2.0, "evt"))))
    }
    assert(ex.getMessage.contains("pos_ref") && ex.getMessage.contains("1 rows"))
    assert(child.currentVersion.get === v)
    // NULL fk passes (MATCH SIMPLE); a tombstone with a dangling fk passes
    child.commit(mkBatch(Seq(Row("INSERT", "users", null, 3L, 13L, 3.0, "evt"))))
    child.commit(mkBatch(Seq(Row("DELETE", "users", 999L, 4L, 11L, null, "evt"))))
    // a valid reference commits
    child.commit(mkBatch(Seq(Row("INSERT", "users", 200L, 5L, 14L, 4.0, "evt"))))
    val fsckRow = child.fsck(spark).collect()
      .find(_.getString(0) == "fk_pos_ref").get
    assert(fsckRow.getBoolean(1), "fsck must report FK conformity")
    // declaring over violating existing rows refuses: delete parent key 200,
    // then try a fresh FK on a new child carrying an orphan
    val ex2 = intercept[IllegalArgumentException] {
      val c2 = new BucketedReplica(base + "/child2", nBuckets = 4)
      c2.commit(mkBatch(Seq(Row("INSERT", "users", 777L, 1L, 21L, 1.0, "evt"))))
      c2.addForeignKey(spark, "p", "pos", base + "/parent")
    }
    assert(ex2.getMessage.contains("1 existing live rows"))
  }

  test("SQL surface: CALL graft.system.add_check enforces on catalog " +
    "INSERT; drop_check lifts it") {
    val wh = tmpDir("chk_cat")
    val s: SparkSession = spark.newSession()
    s.conf.set("spark.sql.catalog.graft", "graft.plans.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft.root", wh)
    s.sql("""CREATE TABLE graft.lake.users (
      op STRING, tbl STRING, pos BIGINT, ts_ns BIGINT,
      user_id BIGINT, value DOUBLE, event_type STRING)""")
    s.sql("INSERT INTO graft.lake.users VALUES " +
      "('INSERT', 'users', 1, 1, 1, 10.0, 'evt')")
    s.sql("CALL graft.system.add_check('lake.users', 'value_nonneg', 'value >= 0')")
    val ex = intercept[Exception] {
      s.sql("INSERT INTO graft.lake.users VALUES " +
        "('INSERT', 'users', 2, 2, 2, -3.0, 'evt')")
    }
    assert(ex.getMessage.contains("value_nonneg"))
    assert(s.sql("SELECT count(*) FROM graft.lake.users").head().getLong(0) === 1L)
    s.sql("CALL graft.system.drop_check('lake.users', 'value_nonneg')")
    s.sql("INSERT INTO graft.lake.users VALUES " +
      "('INSERT', 'users', 2, 2, 2, -3.0, 'evt')")
    assert(s.sql("SELECT count(*) FROM graft.lake.users").head().getLong(0) === 2L)

    // FK via SQL: pos must reference a live parent user_id
    s.sql("""CREATE TABLE graft.lake.parent (
      op STRING, tbl STRING, pos BIGINT, ts_ns BIGINT,
      user_id BIGINT, value DOUBLE, event_type STRING)""")
    s.sql("INSERT INTO graft.lake.parent VALUES " +
      "('INSERT', 'p', 1, 1, 1, 0.0, 'evt'), ('INSERT', 'p', 2, 2, 2, 0.0, 'evt')")
    s.sql("CALL graft.system.add_fk('lake.users', 'pos_ref', 'pos', 'lake.parent')")
    val exFk = intercept[Exception] {
      s.sql("INSERT INTO graft.lake.users VALUES " +
        "('INSERT', 'users', 42, 9, 9, 1.0, 'evt')")
    }
    assert(exFk.getMessage.contains("pos_ref"))
    s.sql("CALL graft.system.drop_fk('lake.users', 'pos_ref')")
    s.sql("INSERT INTO graft.lake.users VALUES " +
      "('INSERT', 'users', 42, 9, 9, 1.0, 'evt')")
    assert(s.sql("SELECT count(*) FROM graft.lake.users").head().getLong(0) === 3L)
  }
}
