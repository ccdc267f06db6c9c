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
}
