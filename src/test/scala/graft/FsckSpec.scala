package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.streaming.{BucketedReplica, CdcStream}
import java.io.File

/** `fsck` — the replica integrity audit (`graft_fsck` TVF): every protocol
  * invariant as a report row, all row-level checks in ONE scan. Healthy
  * tables pass everything; deliberate file surgery is caught. */
class FsckSpec extends SparkSpecBase {

  private def mkBatch(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), CdcStream.envelopeSchema)

  private def row(pos: Long, uid: Long, v: Double): Row =
    Row("INSERT", "users", pos, pos, uid, v, "evt")

  private def report(rep: BucketedReplica): Map[String, (Boolean, String)] =
    rep.fsck(spark).collect()
      .map(r => r.getString(0) -> ((r.getBoolean(1), r.getString(3)))).toMap

  test("healthy replica: every check passes; empty replica is consistent") {
    val root = tmpDir("fsck") + "/rep"
    val rep = new BucketedReplica(root, nBuckets = 4)
    assert(report(rep) === Map(
      "pointer" -> ((true, "no committed version — an empty table is consistent")),
      "control_strays" -> ((true, "none"))))
    rep.addCheck(spark, "value_nonneg", "value >= 0")
    rep.commit(mkBatch((1L to 20L).map(k => row(k, k, k * 1.0))))
    val rpt = report(rep)
    val expected = Set("pointer", "bucket_ids", "files_present", "schema",
      "pk_unique", "bucket_placement", "check_value_nonneg", "control_strays")
    assert(rpt.keySet === expected)
    assert(rpt.forall(_._2._1), s"healthy table failed: ${rpt.filterNot(_._2._1)}")
  }

  test("file surgery is caught: an injected rogue bucket file trips pk " +
    "uniqueness, placement, and CHECK conformity; a deleted file trips presence") {
    val root = tmpDir("fsck_tamper") + "/rep"
    val rep = new BucketedReplica(root, nBuckets = 4)
    rep.addCheck(spark, "value_nonneg", "value >= 0")
    rep.commit(mkBatch((1L to 20L).map(k => row(k, k, k * 1.0))))
    assert(report(rep).forall(_._2._1))

    // rogue file: an existing key (pk dup) with a violating value, injected
    // into TWO bucket dirs (at least one is not key 1's true bucket)
    val rogueDir = tmpDir("fsck_rogue")
    mkBatch(Seq(row(999L, 1L, -5.0))).coalesce(1)
      .write.mode("overwrite").parquet(rogueDir)
    val part = Option(new File(rogueDir).listFiles()).get
      .filter(_.getName.endsWith(".parquet")).head
    val bucketDirs = Option(versionDataDir(root, 1L).listFiles()).get
      .filter(_.getName.startsWith("bucket=")).sortBy(_.getName).take(2)
    assert(bucketDirs.length === 2, "need two populated buckets to tamper")
    bucketDirs.zipWithIndex.foreach { case (d, i) =>
      java.nio.file.Files.copy(part.toPath,
        new File(d, s"rogue_$i.parquet").toPath)
    }
    val rpt = report(rep)
    assert(!rpt("pk_unique")._1, "duplicate key must fail pk_unique")
    assert(!rpt("bucket_placement")._1, "rogue rows must fail placement")
    assert(!rpt("check_value_nonneg")._1, "violating value must fail the CHECK")
    assert(rpt("files_present")._1 && rpt("schema")._1)

    // delete an untampered bucket's data files → presence fails (the dir
    // survives, so existence alone would not catch it)
    val victimDir = Option(versionDataDir(root, 1L).listFiles()).get
      .filter(_.getName.startsWith("bucket=")).sortBy(_.getName).drop(2).head
    Option(victimDir.listFiles()).get
      .filter(_.getName.endsWith(".parquet")).foreach(_.delete())
    assert(!report(rep)("files_present")._1)
  }

  test("SQL surface: SELECT * FROM graft_fsck('ns.t') reports from a cold " +
    "catalog session") {
    val wh = tmpDir("fsck_cat")
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft", "graft.plans.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft.root", wh)
    s.sql("""CREATE TABLE graft.lake.users (
      op STRING, tbl STRING, pos BIGINT, ts_ns BIGINT,
      user_id BIGINT, value DOUBLE, event_type STRING)""")
    s.sql("INSERT INTO graft.lake.users VALUES " +
      "('INSERT', 'users', 1, 1, 1, 10.0, 'evt')")
    val rpt = s.sql("SELECT check, ok FROM graft_fsck('lake.users')")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(rpt.nonEmpty && rpt.values.forall(identity), s"cold fsck failed: $rpt")
    assert(rpt.contains("pk_unique") && rpt.contains("bucket_placement"))

    // the declared contract lists via SQL too (SHOW CONSTRAINTS analog)
    s.sql("CALL graft.system.add_check('lake.users', 'v_pos', 'value >= 0')")
    val cons = s.sql("SELECT * FROM graft_constraints('lake.users')")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(cons.toSeq === Seq(("CHECK", "v_pos", "value >= 0")))
    // and the fsck report now carries the conformity row
    assert(s.sql("SELECT ok FROM graft_fsck('lake.users') " +
      "WHERE `check` = 'check_v_pos'").head().getBoolean(0))
  }
}
