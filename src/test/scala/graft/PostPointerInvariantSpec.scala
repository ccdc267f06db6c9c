package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.streaming.{BucketedReplica, CdcStream, IncrementalAgg}

/** The no-pointer-on-throw invariant, replica side (the r16 mirror of the
  * r15 view-store audit): once a publish's pointer createExclusive lands,
  * NOTHING may throw out of the commit — every retrying caller treats
  * "commit threw" as "the version did not land" and re-commits, and for a
  * read-diff-fold caller (IncrementalAgg) the idempotent re-commit diffs
  * to ZERO, silently losing that batch's view delta forever. So every
  * post-pointer housekeeping step (data GC, control-file sweep, old
  * pointer GC) must be best-effort: a fault there is swallowed, the
  * commit reports success, and the next successful publish re-sweeps. */
class PostPointerInvariantSpec extends SparkSpecBase {

  private def df(rows: Seq[Row]): DataFrame = spark.createDataFrame(
    java.util.Arrays.asList(rows: _*), CdcStream.envelopeSchema)

  private def row(op: String, pos: Long, uid: Long, v: Double, evt: String) =
    Row(op, "users", pos, pos * 1000, uid, v, evt)

  test("an injected I/O fault in the publish's post-pointer GC never " +
    "escapes commit(), and the committed version reads back whole") {
    val root = tmpDir("ppi_commit") + "/rep"
    val rep = new BucketedReplica(root, nBuckets = 4)
    rep.commit(df(Seq(row("INSERT", 1L, 1L, 10.0, "evt0"))))
    var fired = false
    rep.beforeDataGc = () => {
      rep.beforeDataGc = () => ()
      fired = true
      throw new java.io.IOException("injected post-pointer gc fault")
    }
    // must NOT throw: the pointer already landed when the fault fires
    val snap = rep.commit(df(Seq(row("INSERT", 2L, 2L, 20.0, "evt1"))))
    assert(fired, "the injected fault never fired — seam moved?")
    assert(snap.map(_._1).contains(2L), "commit must report the version it published")
    val live = rep.live(spark).select("user_id", "value").orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(live === Seq((1L, 10.0), (2L, 20.0)))
    // the next successful publish re-sweeps what the faulted GC left
    rep.commit(df(Seq(row("INSERT", 3L, 3L, 30.0, "evt2"))))
    assert(rep.live(spark).count() === 3L)
  }

  test("a post-pointer fault under a retrying view maintainer neither " +
    "loses nor double-folds the batch's view delta") {
    val root = tmpDir("ppi_fold")
    val rep = new BucketedReplica(s"$root/replica", nBuckets = 4)
    val agg = new IncrementalAgg(rep, s"$root/agg")
    agg.applyBatch(df(Seq(row("INSERT", 1L, 1L, 10.0, "evt0"))))
    var fired = false
    rep.beforeDataGc = () => {
      rep.beforeDataGc = () => ()
      fired = true
      throw new java.io.IOException("injected post-pointer gc fault")
    }
    // the stress harness's wholesale-retry discipline: if the fold threw,
    // the retry's idempotent re-commit would diff to zero — the exact
    // lost-delta trap the invariant exists to keep closed
    var wholesaleRetries = 0
    var done = false
    while (!done) {
      try { agg.applyBatch(df(Seq(
        row("INSERT", 2L, 2L, 20.0, "evt0"),
        row("INSERT", 3L, 3L, 30.0, "evt1")))); done = true }
      catch { case scala.util.control.NonFatal(_) => wholesaleRetries += 1
        if (wholesaleRetries > 10) throw new IllegalStateException("starved") }
    }
    assert(fired, "the injected fault never fired — seam moved?")
    assert(wholesaleRetries === 0,
      "the fold threw despite a post-pointer-only fault — the invariant " +
        "no longer holds and a retrying caller would lose the view delta")
    val expect = rep.live(spark).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_live"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("sum_value"))
      .orderBy("event_type").collect().toSeq
    val got = agg.read(spark).orderBy("event_type").collect().toSeq
    assert(got === expect, "view diverged from the from-scratch aggregate")
  }
}
