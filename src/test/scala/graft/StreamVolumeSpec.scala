package graft

import org.apache.spark.sql.functions._
import graft.streaming.CdcStream

/** Volume pass over the real streaming path: the full sf0.01 changelog
  * (10K events, 150 keys) split into file batches, streamed through the
  * foreachBatch merge, must converge to the batch merge of the same log. */
class StreamVolumeSpec extends SparkSpecBase {

  test("10K-event changelog streams to the same replica as the batch merge") {
    val sf = "/root/testdata/sf0.01"
    val in = tmpDir("vol_in")
    val replica = tmpDir("vol_replica") + "/r"
    val staging = tmpDir("vol_staging"); val dlq = tmpDir("vol_dlq")

    // 5 arrival batches in pos order (file mtimes make discovery order
    // irrelevant — merge is order-insensitive anyway, MergePropertySpec)
    val ch = Cdc.changelog(spark, sf)
    (0 until 5).foreach { i =>
      ch.filter(col("pos") % 5 === i).coalesce(1)
        .write.mode("append").parquet(in)
    }

    val ckpt = tmpDir("vol_ckpt")
    val t0 = System.nanoTime()
    val q = CdcStream.applyToReplica(
      CdcStream.fileChangelogStream(spark, in, maxFilesPerTrigger = 1),
      replica, staging, dlq, ckpt)
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9

    val streamed = CdcStream.liveReplica(spark, replica)
      .collect().map(r => r.getLong(4) -> (r.getLong(2), r.getDouble(5))).toMap
    val batch = Cdc.merge(ch, Seq("user_id"))
      .collect().map(r => r.getLong(4) -> (r.getLong(2), r.getDouble(5))).toMap
    assert(streamed === batch)
    assert(spark.read.parquet(staging).count() === ch.count()) // nothing lost
    info(f"streamed 10K events in 5 micro-batches in $secs%.1f s")

    // Incremental-merge property (the 100 TB gate): one more micro-batch
    // containing 3 keys must write bytes ∝ the batch (a few buckets), not
    // re-write the whole replica.
    def dirBytes(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).getOrElse(Array.empty).map(dirBytes).sum
    val dataDir = new java.io.File(replica, "data")
    val replicaBytes = dirBytes(dataDir)
    val versionsBefore = dataDir.listFiles().map(_.getName).toSet
    ch.filter(col("user_id").isin(1L, 2L, 3L)).limit(3).coalesce(1)
      .write.mode("append").parquet(in)
    // SAME checkpoint: the source log skips the 5 already-processed files
    val q2 = CdcStream.applyToReplica(
      CdcStream.fileChangelogStream(spark, in, maxFilesPerTrigger = 1),
      replica, staging, dlq, ckpt)
    q2.awaitTermination()
    val newVersion = dataDir.listFiles()
      .filter(f => !versionsBefore.contains(f.getName))
    assert(newVersion.length >= 1)
    val commitBytes = newVersion.map(dirBytes).sum
    assert(commitBytes < replicaBytes / 4,
      s"3-key micro-batch wrote $commitBytes bytes vs replica $replicaBytes — " +
        "per-batch cost must track batch size, not replica size")
  }
}
