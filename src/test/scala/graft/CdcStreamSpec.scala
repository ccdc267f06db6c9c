package graft

import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._
import graft.streaming.CdcStream

/** SURVEY §5.3/§5.4 — CDC end-to-end over real streams: change files arrive
  * incrementally (A5/D1), foreachBatch folds them into the replica (D8),
  * re-delivery is idempotent (D6), unmergeable rows dead-letter (D9/A8),
  * and the streamed result equals the batch merge (stream–batch
  * equivalence). */
class CdcStreamSpec extends SparkSpecBase {

  /** Deterministic 3-batch changelog: inserts, updates, deletes + a poison
    * row with a null key. */
  private def batches: Seq[Seq[Row]] = Seq(
    Seq(
      Row("INSERT", "users", 1L, 1000L, 1L, 10.0, "signup"),
      Row("INSERT", "users", 2L, 2000L, 2L, 20.0, "signup"),
      Row("INSERT", "users", 3L, 3000L, 3L, 30.0, "signup")),
    Seq(
      Row("UPDATE", "users", 4L, 4000L, 1L, 11.0, "purchase"),
      Row(null, "users", null, 5000L, null, 0.0, "garbage"), // → DLQ
      Row("UPDATE", "users", 5L, 5000L, 2L, 22.0, "purchase")),
    Seq(
      Row("DELETE", "users", 6L, 6000L, 3L, 0.0, "error"),
      Row("UPDATE", "users", 7L, 7000L, 1L, 12.0, "purchase"))
  )

  private def writeBatch(dir: String, rows: Seq[Row], idx: Int): Unit =
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), CdcStream.envelopeSchema)
      .coalesce(1).write.mode(SaveMode.Append).parquet(dir)

  private def replicaState(replicaDir: String): Map[Long, (Long, Double)] =
    CdcStream.liveReplica(spark, replicaDir)
      .collect().map(r => r.getLong(4) -> (r.getLong(2), r.getDouble(5))).toMap

  test("D1/D8: incremental file stream converges to the batch merge") {
    val in = tmpDir("cdc_in"); val replica = tmpDir("cdc_replica") + "/r"
    val staging = tmpDir("cdc_staging"); val dlq = tmpDir("cdc_dlq")
    val ckpt = tmpDir("cdc_ckpt")

    batches.zipWithIndex.foreach { case (b, i) => writeBatch(in, b, i) }
    val q = CdcStream.applyToReplica(
      CdcStream.fileChangelogStream(spark, in, maxFilesPerTrigger = 1),
      replica, staging, dlq, ckpt)
    q.awaitTermination()

    // final state: u1 latest pos 7 value 12.0; u2 pos 5 value 22.0; u3 deleted
    assert(replicaState(replica) === Map(1L -> (7L, 12.0), 2L -> (5L, 22.0)))

    // staging kept every good+bad change appended (2-phase write)
    assert(spark.read.parquet(staging).count() === 8)

    // D9: the null-key row went to the DLQ, not down the merge
    val dlqRows = spark.read.parquet(dlq).collect()
    assert(dlqRows.length === 1 && dlqRows(0).getString(6) === "garbage")

    // stream-batch equivalence: same changelog through the batch Cdc.merge
    val batchMerged = Cdc.merge(
      spark.read.schema(CdcStream.envelopeSchema).parquet(in)
        .filter(col("user_id").isNotNull && col("pos").isNotNull),
      Seq("user_id"))
      .collect().map(r => r.getLong(4) -> (r.getLong(2), r.getDouble(5))).toMap
    assert(batchMerged === replicaState(replica))
  }

  test("D1: restart with the same checkpoint processes only new files (exactly-once source)") {
    val in = tmpDir("cdc_in3"); val replica = tmpDir("cdc_replica3") + "/r"
    val staging = tmpDir("cdc_staging3"); val dlq = tmpDir("cdc_dlq3")
    val ckpt = tmpDir("cdc_ckpt3")

    writeBatch(in, batches(0), 0)
    val q1 = CdcStream.applyToReplica(
      CdcStream.fileChangelogStream(spark, in), replica, staging, dlq, ckpt)
    q1.awaitTermination()
    assert(spark.read.parquet(staging).count() === 3) // first batch staged once

    // new file arrives; SAME checkpoint → the file-source log skips the old file
    writeBatch(in, batches(1), 1)
    val q2 = CdcStream.applyToReplica(
      CdcStream.fileChangelogStream(spark, in), replica, staging, dlq, ckpt)
    q2.awaitTermination()
    // staging holds each change exactly once (3 + 3, no reprocessing)
    assert(spark.read.parquet(staging).count() === 6)
    assert(replicaState(replica) === Map(1L -> (4L, 11.0), 2L -> (5L, 22.0), 3L -> (3L, 30.0)))
  }

  test("D8 ingests the nested Datastream envelope (payload + source_metadata)") {
    val in = tmpDir("cdc_nested_in"); val replica = tmpDir("cdc_nested_rep") + "/r"
    val staging = tmpDir("cdc_nested_stg"); val dlq = tmpDir("cdc_nested_dlq")

    // the same 3-batch changelog, re-wrapped in the nested wire shape
    batches.zipWithIndex.foreach { case (rows, i) =>
      val flat = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), CdcStream.envelopeSchema)
      flat.select(
        struct(col("user_id"), col("value"), col("event_type")).as("payload"),
        struct(col("op"), col("tbl"), col("ts_ns").as("source_ts_ns"),
          lit(f"binlog.$i%06d").as("log_file"), col("pos")).as("source_metadata"))
        .coalesce(1).write.mode(SaveMode.Append).parquet(in)
    }
    val q = CdcStream.applyToReplica(
      CdcStream.nestedFileChangelogStream(spark, in, maxFilesPerTrigger = 1),
      replica, staging, dlq, tmpDir("cdc_nested_ckpt"))
    q.awaitTermination()

    // identical final state to the flat-envelope run
    assert(replicaState(replica) === Map(1L -> (7L, 12.0), 2L -> (5L, 22.0)))
    // the null-key poison row still dead-letters after flattening
    assert(spark.read.parquet(dlq).count() === 1)
  }

  test("foreachBatch retry with the same batchId is exactly-once for staging and DLQ") {
    val replica = tmpDir("cdc_retry_rep") + "/r"
    val staging = tmpDir("cdc_retry_stg"); val dlq = tmpDir("cdc_retry_dlq")
    def df(i: Int) = spark.createDataFrame(
      java.util.Arrays.asList(batches(i): _*), CdcStream.envelopeSchema)

    CdcStream.applyBatch(df(0), 0L, replica, staging, dlq)
    val once = spark.read.parquet(staging).count()
    // a mid-batch crash redelivers the SAME batchId: staging must not grow
    CdcStream.applyBatch(df(0), 0L, replica, staging, dlq)
    assert(spark.read.parquet(staging).count() === once)
    assert(replicaState(replica) ===
      Map(1L -> (1L, 10.0), 2L -> (2L, 20.0), 3L -> (3L, 30.0)))
    // the retried batch's DLQ partition is also replace-not-append
    CdcStream.applyBatch(df(1), 1L, replica, staging, dlq)
    CdcStream.applyBatch(df(1), 1L, replica, staging, dlq)
    assert(spark.read.parquet(dlq).count() === 1)
    assert(spark.read.parquet(staging).count() === 6)
    // batch_id is exposed as a partition column for changelog audits
    assert(spark.read.parquet(staging).select("batch_id").distinct().count() === 2)
  }

  test("D6: re-delivery of the whole stream is idempotent") {
    val in = tmpDir("cdc_in2"); val replica = tmpDir("cdc_replica2") + "/r"
    val staging = tmpDir("cdc_staging2"); val dlq = tmpDir("cdc_dlq2")

    batches.zipWithIndex.foreach { case (b, i) => writeBatch(in, b, i) }
    val q1 = CdcStream.applyToReplica(
      CdcStream.fileChangelogStream(spark, in), replica, staging, dlq, tmpDir("ck1"))
    q1.awaitTermination()
    val first = replicaState(replica)

    // redeliver: fresh checkpoint ⇒ the source replays every file (Pub/Sub
    // at-least-once analog); latest-wins merge must converge to the same state
    val q2 = CdcStream.applyToReplica(
      CdcStream.fileChangelogStream(spark, in), replica, staging, dlq, tmpDir("ck2"))
    q2.awaitTermination()
    assert(replicaState(replica) === first)
  }
}
