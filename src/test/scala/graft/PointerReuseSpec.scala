package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.streaming.{BucketedReplica, CdcStream, IncrementalAgg, StoreIO}

/** The FREED-NAME laggard interleave, pinned deterministically — the root
  * cause of the r16 stress divergence that survived the link-exclusive
  * pointer fix: version-named pointer files are GC'd, so a committer
  * descheduled across ≥2 foreign commits finds its target name FREE again
  * and lands a "successful" createExclusive BELOW the committed head.
  * Readers resolve the max, so the commit is invisible: a replica
  * maintainer proceeds to fold a view delta for a batch the replica never
  * kept (over-count), and a view fold loses its delta the same way
  * (under-count). Two nets close it:
  *
  *  1. AGE GATE (`StoreIO.ptrGraceMs`): superseded names are freed only
  *     once older than the grace — within it a laggard fails loudly at
  *     the still-present name;
  *  2. ANCESTRY VALIDATION: past the grace, the successor pointer's
  *     `prev=` attempt convicts a freed-name landing (it names the
  *     attempt the REAL version was built on), and the laggard revokes
  *     itself with ConcurrentCommit. Revocation triggers only on PROVEN
  *     non-ancestry — a successor built ON this commit carries our own
  *     attempt and must never cause self-revocation (that would
  *     double-apply downstream).
  *
  * Grace=0 in these tests simulates "past the grace" deterministically. */
class PointerReuseSpec extends SparkSpecBase {

  private def df(rows: Seq[Row]): DataFrame = spark.createDataFrame(
    java.util.Arrays.asList(rows: _*), CdcStream.envelopeSchema)

  private def row(op: String, pos: Long, uid: Long, v: Double, evt: String) =
    Row(op, "users", pos, pos * 1000, uid, v, evt)

  private def withGrace[A](ms: Long)(body: => A): A = {
    val prev = sys.props.get("graft.store.ptrGraceMs")
    sys.props("graft.store.ptrGraceMs") = ms.toString
    try body
    finally prev match {
      case Some(p) => sys.props("graft.store.ptrGraceMs") = p
      case None => sys.props.remove("graft.store.ptrGraceMs"); ()
    }
  }

  test("replica, past the grace: a laggard landing at a freed pointer " +
    "name self-revokes via the successor's prev — never an invisible commit") {
    withGrace(-1L) {
      val root = tmpDir("ptr_reuse_rep") + "/rep"
      val rep = new BucketedReplica(root, nBuckets = 4)
      rep.commit(df(Seq(row("INSERT", 1L, 1L, 10.0, "evt0")))) // v1
      // victim pins v1, will attempt v2; inside its pointer window TWO
      // foreign commits land (v2, v3) and grace-expired GC frees the name v2
      var fired = false
      rep.beforePointerCommit = () => {
        if (!fired) {
          fired = true
          val f = new BucketedReplica(root, nBuckets = 4)
          f.commit(df(Seq(row("INSERT", 2L, 2L, 20.0, "evt1")))) // v2
          f.commit(df(Seq(row("INSERT", 3L, 3L, 30.0, "evt2")))) // v3, frees _PTR-2
          assert(!new java.io.File(root, "_PTR-2").exists(),
            "precondition: grace-expired GC must have freed the victim's target name")
        }
      }
      val e = intercept[StoreIO.ConcurrentCommit] {
        rep.commit(df(Seq(row("INSERT", 4L, 4L, 40.0, "evt3"))))
      }
      assert(fired)
      assert(e.getMessage.contains("freed name"),
        s"must be the freed-name revocation, got: ${e.getMessage}")
      // the revoked pointer must not linger as version 2's name
      assert(!new java.io.File(root, "_PTR-2").exists(),
        "the laggard's stale pointer must be revoked")
      // the caller's wholesale retry converges on top of the real head
      rep.commit(df(Seq(row("INSERT", 4L, 4L, 40.0, "evt3"))))
      val live = rep.live(spark).select("user_id", "value").orderBy("user_id")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(live === Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0)),
        "no commit may be silently lost")
    }
  }

  test("replica, within the grace: the same interleave fails at the " +
    "still-present name — a won version name is never freed early") {
    val root = tmpDir("ptr_keep_rep") + "/rep"
    val rep = new BucketedReplica(root, nBuckets = 4)
    rep.commit(df(Seq(row("INSERT", 1L, 1L, 10.0, "evt0"))))
    var fired = false
    rep.beforePointerCommit = () => {
      if (!fired) {
        fired = true
        val f = new BucketedReplica(root, nBuckets = 4)
        f.commit(df(Seq(row("INSERT", 2L, 2L, 20.0, "evt1"))))
        f.commit(df(Seq(row("INSERT", 3L, 3L, 30.0, "evt2"))))
        assert(new java.io.File(root, "_PTR-2").exists(),
          "within the grace the superseded name must still be on disk")
      }
    }
    intercept[StoreIO.ConcurrentCommit] {
      rep.commit(df(Seq(row("INSERT", 4L, 4L, 40.0, "evt3"))))
    }
    assert(fired)
    rep.commit(df(Seq(row("INSERT", 4L, 4L, 40.0, "evt3"))))
    assert(rep.live(spark).count() === 4L)
  }

  test("view store, past the grace: a fold landing at a freed pointer " +
    "name revokes, re-pins and folds the SAME delta — nothing lost, " +
    "nothing doubled") {
    withGrace(-1L) {
      val root = tmpDir("ptr_reuse_view")
      val rep = new BucketedReplica(s"$root/replica", nBuckets = 8)
      val agg = new IncrementalAgg(rep, s"$root/agg")
      agg.applyBatch(df(Seq(row("INSERT", 1L, 1L, 10.0, "a"))))
      // the EXACT stress schedule: the victim's view data is fully
      // written, then it is descheduled; TWO foreign folds land, the
      // second (grace 0) freeing the victim's target pointer name; the
      // victim's create then SUCCEEDS at the stale name — the ancestry
      // validation must convict it and the retry must carry the victim's
      // delta to the real head
      var fired = false
      agg.beforeViewPointerCommit = () => {
        if (!fired) {
          fired = true
          val rep2 = new BucketedReplica(s"$root/replica", nBuckets = 8)
          val agg2 = new IncrementalAgg(rep2, s"$root/agg")
          agg2.applyBatch(df(Seq(row("INSERT", 10L, 2L, 100.0, "b"))))
          agg2.applyBatch(df(Seq(row("INSERT", 11L, 3L, 7.0, "b"))))
        }
      }
      agg.applyBatch(df(Seq(row("INSERT", 5L, 4L, 42.0, "a"))))
      assert(fired)
      val expect = rep.live(spark).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_live"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("sum_value"))
        .orderBy("event_type").collect().toSeq
      val got = agg.read(spark).orderBy("event_type").collect().toSeq
      assert(got === expect,
        "every maintainer's delta must be reflected exactly once")
      assert(got.map(r => (r.getString(0), r.getDecimal(2).doubleValue)) ===
        Seq(("a", 52.0), ("b", 107.0)))
    }
  }
}
