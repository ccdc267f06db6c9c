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

    val t0 = System.nanoTime()
    val q = CdcStream.applyToReplica(
      CdcStream.fileChangelogStream(spark, in, maxFilesPerTrigger = 1),
      replica, staging, dlq, tmpDir("vol_ckpt"))
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9

    val streamed = CdcStream.liveReplica(spark, replica)
      .collect().map(r => r.getLong(4) -> (r.getLong(2), r.getDouble(5))).toMap
    val batch = Cdc.merge(ch, Seq("user_id"))
      .collect().map(r => r.getLong(4) -> (r.getLong(2), r.getDouble(5))).toMap
    assert(streamed === batch)
    assert(spark.read.parquet(staging).count() === ch.count()) // nothing lost
    info(f"streamed 10K events in 5 micro-batches in $secs%.1f s")
  }
}
