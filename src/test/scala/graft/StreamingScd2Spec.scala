package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.streaming.CdcStream
import java.io.File

/** Streaming SCD Type 2 (CdcStream.scd2Batch / applyScd2History): the
  * incremental historization must equal the one-shot Cdc.scd2 over the full
  * changelog after any batch sequence honoring per-key ordered delivery,
  * and redelivered batches (foreachBatch retry semantics) must not
  * duplicate or lose closed intervals. */
class StreamingScd2Spec extends SparkSpecBase {

  private def intervals(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Option[Long], String, Boolean)] =
    df.select(col("user_id"), col("valid_from_pos"), col("valid_to_pos"),
        col("op"), col("is_current"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getString(3), r.getBoolean(4)))
      .toSet

  private def expected(ch: org.apache.spark.sql.DataFrame) =
    intervals(Cdc.scd2(ch, Seq("user_id")))

  test("incremental SCD2 over three in-order batches equals the one-shot historization") {
    val root = tmpDir("scd2_3b")
    val rep = s"$root/replica"; val hist = s"$root/history"
    val ch = Cdc.changelog(spark, sfDir).filter(col("user_id") < 20)
    val ps = ch.agg(max(col("pos"))).head().getLong(0)
    val cuts = Seq((-1L, ps / 3), (ps / 3, 2 * ps / 3), (2 * ps / 3, ps))
    cuts.zipWithIndex.foreach { case ((lo, hi), i) =>
      CdcStream.scd2Batch(
        ch.filter(col("pos") > lo && col("pos") <= hi), i.toLong, rep, hist)
      // the invariant holds after EVERY prefix, not just at the end
      val sofar = intervals(CdcStream.historyWithOpen(spark, rep, hist))
      assert(sofar === expected(ch.filter(col("pos") <= hi)),
        s"prefix through batch $i diverged from the batch historization")
    }
  }

  test("a redelivered batch (post-commit retry) neither duplicates nor loses intervals") {
    val root = tmpDir("scd2_retry")
    val rep = s"$root/replica"; val hist = s"$root/history"
    val ch = Cdc.changelog(spark, sfDir).filter(col("user_id") < 20)
    val ps = ch.agg(max(col("pos"))).head().getLong(0)
    val b1 = ch.filter(col("pos") <= ps / 2)
    val b2 = ch.filter(col("pos") > ps / 2)
    CdcStream.scd2Batch(b1, 0L, rep, hist)
    CdcStream.scd2Batch(b2, 1L, rep, hist)
    // crash after the replica commit but before the checkpoint recorded the
    // batch: Structured Streaming redelivers batch 1 wholesale
    CdcStream.scd2Batch(b2, 1L, rep, hist)
    assert(intervals(CdcStream.historyWithOpen(spark, rep, hist)) === expected(ch))
  }

  test("file-stream wrapper converges (ordered files, one per micro-batch)") {
    val root = tmpDir("scd2_stream")
    val in = s"$root/in"; val rep = s"$root/replica"; val hist = s"$root/history"
    val ch = Cdc.changelog(spark, sfDir).filter(col("user_id") < 20)
    val ps = ch.agg(max(col("pos"))).head().getLong(0)
    // two chunk files with forced modification times so the file source's
    // (modTime-ordered) discovery delivers them per-key in-order
    Seq((-1L, ps / 2, 0), (ps / 2, ps, 1)).foreach { case (lo, hi, i) =>
      val dir = s"$root/chunk$i"
      ch.filter(col("pos") > lo && col("pos") <= hi)
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(dir)
      val part = new File(dir).listFiles().filter(_.getName.endsWith(".parquet")).head
      new File(in).mkdirs()
      val dst = new File(in, f"chunk-$i%05d.parquet")
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      dst.setLastModified(1000000000000L + i * 600000L)
      ()
    }
    val q = CdcStream.applyScd2History(
      CdcStream.fileChangelogStream(spark, in), rep, hist, s"$root/ck")
    q.awaitTermination()
    assert(intervals(CdcStream.historyWithOpen(spark, rep, hist)) === expected(ch))
  }

  test("restart with the same checkpoint processes only new files (exactly-once source)") {
    val root = tmpDir("scd2_restart")
    val in = s"$root/in"; val rep = s"$root/replica"; val hist = s"$root/history"
    val ck = s"$root/ck"
    val ch = Cdc.changelog(spark, sfDir).filter(col("user_id") < 20)
    val ps = ch.agg(max(col("pos"))).head().getLong(0)
    def land(lo: Long, hi: Long, i: Int): Unit = {
      val dir = s"$root/chunk$i"
      ch.filter(col("pos") > lo && col("pos") <= hi)
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(dir)
      val part = new File(dir).listFiles().filter(_.getName.endsWith(".parquet")).head
      new File(in).mkdirs()
      java.nio.file.Files.copy(part.toPath, new File(in, f"chunk-$i%05d.parquet").toPath)
      ()
    }
    land(-1L, ps / 2, 0)
    CdcStream.applyScd2History(
      CdcStream.fileChangelogStream(spark, in), rep, hist, ck).awaitTermination()
    assert(intervals(CdcStream.historyWithOpen(spark, rep, hist))
      === expected(ch.filter(col("pos") <= ps / 2)))
    // second run, SAME checkpoint: only the new file may be processed —
    // re-processing chunk 0 against the committed replica would fabricate
    // degenerate intervals
    land(ps / 2, ps, 1)
    CdcStream.applyScd2History(
      CdcStream.fileChangelogStream(spark, in), rep, hist, ck).awaitTermination()
    assert(intervals(CdcStream.historyWithOpen(spark, rep, hist)) === expected(ch))
  }

  /** The merged open rows the scd2 window derives for `open ∪ batch` —
    * exactly what scd2Batch hands to commitMerged. */
  private def openRowsOf(open: org.apache.spark.sql.DataFrame,
                         batch: org.apache.spark.sql.DataFrame) =
    Cdc.scd2(open.unionByName(batch).dropDuplicates("user_id", "pos"),
        Seq("user_id"))
      .filter(col("valid_to_pos").isNull)
      .drop("valid_from_pos", "valid_to_pos", "is_current")

  test("commitMerged: a foreign commit between the open-row read and the " +
    "merged publish loses at the write-once pointer — never silently " +
    "replaced by the stale pre-merge view") {
    val root = tmpDir("scd2_seam") + "/rep"
    val rep = new graft.streaming.BucketedReplica(root, pk = "user_id", nBuckets = 4)
    val ch = Cdc.changelog(spark, sfDir).filter(col("user_id") < 20)
    val ps = ch.agg(max(col("pos"))).head().getLong(0)
    rep.commit(ch.filter(col("pos") <= ps / 2))
    val batch = ch.filter(col("pos") > ps / 2)
      .dropDuplicates("user_id", "pos").persist()
    val touched = rep.touchedBuckets(batch)
    val snap = rep.pinSnapshot()
    val open = rep.readBucketsAt(spark, touched, snap)
    val merged = openRowsOf(open, batch).persist()
    merged.count() // materialize the window BEFORE the foreign commit lands
    // a foreign writer commits a brand-new key while our window ran
    val foreign = batch.limit(1)
      .select(lit("INSERT").as("op"), col("tbl"), (col("pos") + 1).as("pos"),
        col("ts_ns"), lit(9999L).as("user_id"), col("value"), col("event_type"))
    rep.commit(foreign)
    // the merged publish was planned against the pre-foreign snapshot: it
    // must lose loudly at the pointer, not publish stale bucket content
    intercept[graft.streaming.StoreIO.ConcurrentCommit] {
      rep.commitMerged(merged, touched, snap, delta = batch)
    }
    assert(rep.live(spark).filter(col("user_id") === 9999L).count() === 1,
      "the foreign commit's row must survive the defeated merged publish")
    // the streaming retry re-reads at the NEW head and converges
    val snap2 = rep.pinSnapshot()
    val open2 = rep.readBucketsAt(spark, rep.touchedBuckets(batch), snap2)
    rep.commitMerged(openRowsOf(open2, batch), touched, snap2, delta = batch)
    assert(rep.live(spark).filter(col("user_id") === 9999L).count() === 1)
    merged.unpersist(); batch.unpersist()
  }

  test("commitMerged validates the incoming delta only: a stored row " +
    "orphaned by a later parent delete must not wedge the stream") {
    val base = tmpDir("scd2_fkwedge")
    val mk = (rows: Seq[org.apache.spark.sql.Row]) =>
      spark.createDataFrame(java.util.Arrays.asList(rows: _*),
        CdcStream.envelopeSchema)
    val parent = new graft.streaming.BucketedReplica(base + "/parent", nBuckets = 4)
    parent.commit(mk(Seq(
      org.apache.spark.sql.Row("INSERT", "users", 1L, 1L, 100L, 1.0, "evt"),
      org.apache.spark.sql.Row("INSERT", "users", 2L, 2L, 200L, 2.0, "evt"))))
    // nBuckets=1: every key is co-resident, so the merged content always
    // carries the stored row alongside any delta
    val child = new graft.streaming.BucketedReplica(base + "/child", nBuckets = 1)
    child.commit(mk(Seq(
      org.apache.spark.sql.Row("INSERT", "users", 100L, 10L, 11L, 1.0, "evt"),
      org.apache.spark.sql.Row("INSERT", "users", 200L, 11L, 12L, 2.0, "evt"))))
    child.addForeignKey(spark, "pos_ref", "pos", base + "/parent")
    // parent key 200 deleted AFTER child row 12 stored its reference: row 12
    // is now orphaned in place (FKs check at THIS table's commits only)
    parent.commit(mk(Seq(
      org.apache.spark.sql.Row("DELETE", "users", null, 3L, 200L, null, "evt"))))
    // a VALID delta touching the orphan's bucket: delta-only validation
    // commits it; merged-content validation would reject every future batch
    val delta = mk(Seq(
      org.apache.spark.sql.Row("INSERT", "users", 100L, 12L, 13L, 3.0, "evt")))
      .persist()
    val touched = child.touchedBuckets(delta)
    val snap = child.pinSnapshot()
    val open = child.readBucketsAt(spark, touched, snap)
    child.commitMerged(openRowsOf(open, delta), touched, snap, delta = delta)
    val ids = child.live(spark).select("user_id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(11L, 12L, 13L),
      "valid delta lands; the stored orphan stays (no retro-judgment)")
    // the delta itself is still judged: an orphan DELTA is rejected
    val bad = mk(Seq(
      org.apache.spark.sql.Row("INSERT", "users", 999L, 13L, 14L, 4.0, "evt")))
    val snap2 = child.pinSnapshot()
    val open2 = child.readBucketsAt(spark, child.touchedBuckets(bad), snap2)
    intercept[IllegalArgumentException] {
      child.commitMerged(openRowsOf(open2, bad),
        child.touchedBuckets(bad), snap2, delta = bad)
    }
    delta.unpersist()
  }
}
