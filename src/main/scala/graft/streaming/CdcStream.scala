package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.Cdc
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** SURVEY §2 group D — the true streaming half of the CDC chain.
  *
  * Reference topology (README.md:126-208): change files land in a bucket,
  * a notification fires per finalized object (main.tf:169-175), and the
  * streaming merge job folds them into the replica. Spark-first mapping:
  * the Structured Streaming file source's discovery log subsumes the
  * notification hop (A5); `foreachBatch` runs the same latest-wins merge
  * (Cdc.merge) the batch path uses (D8), giving stream–batch equivalence
  * by construction.
  *
  * Scale notes: file-source discovery is O(new files) per micro-batch with
  * `maxFilesPerTrigger` bounding batch size; the replica swap below is a
  * filesystem rename (test-scale stand-in for a transactional table format —
  * at 100 TB the replica would live in a format with atomic commit and the
  * merge would be a keyed MERGE INTO, still driven from foreachBatch).
  */
object CdcStream {

  /** CDC envelope schema for streamed change files (FIXTURES.md §2, flat). */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("op", StringType), StructField("tbl", StringType),
    StructField("pos", LongType), StructField("ts_ns", LongType),
    StructField("user_id", LongType), StructField("value", DoubleType),
    StructField("event_type", StringType)))

  /** A5/D1 — notification-driven incremental ingest: the file source
    * discovers newly-finalized objects each micro-batch. */
  def fileChangelogStream(spark: SparkSession, dir: String,
                          maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(envelopeSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** D2 — event-time watermark over the change stream (ts_ns → micros ts). */
  def withEventTime(changes: DataFrame, watermark: String = "10 minutes"): DataFrame =
    changes
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .withWatermark("ts", watermark)

  /** D8 — stateful upsert per micro-batch: staging-append + latest-wins merge
    * into the running replica (the Cloud_Datastream_to_BigQuery two-phase
    * write, reference README.md:204-205), with D9's dead-letter split for
    * rows that cannot merge (null primary key / position). */
  def applyToReplica(changes: DataFrame, replicaDir: String, stagingDir: String,
                     dlqDir: String, checkpointDir: String): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // two-phase: append the raw batch to the staging changelog first
        batch.write.mode("append").parquet(stagingDir)
        // D9/A8: unmergeable rows aside, never fail the stream
        val bad = batch.filter(col("user_id").isNull || col("pos").isNull)
        if (!bad.isEmpty) bad.write.mode("append").parquet(dlqDir)
        val good = batch.filter(col("user_id").isNotNull && col("pos").isNotNull)
        val current = existingReplica(spark, replicaDir)
        val unioned = current match {
          case Some(cur) => cur.unionByName(good)
          case None      => good
        }
        // Tombstones MUST be retained in the stored replica: with
        // out-of-order arrival across micro-batches, dropping a DELETE's
        // position would let a later batch carrying an OLDER event
        // resurrect the key (found by StreamVolumeSpec). Production GC:
        // tombstones older than the watermark can be compacted away once
        // no earlier positions can still arrive.
        val merged = Cdc.merge(unioned, Seq("user_id"), keepTombstones = true)
          .drop("is_deleted")
        swapWrite(merged, replicaDir)
        ()
      }
      .start()

  /** The analyst-facing view of the replica: tombstoned keys filtered out
    * (the stored form keeps them — see applyToReplica). */
  def liveReplica(spark: SparkSession, replicaDir: String): DataFrame =
    spark.read.schema(envelopeSchema).parquet(replicaDir)
      .filter(col("op") =!= "DELETE")

  private def existingReplica(spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = Paths.get(dir)
    if (Files.isDirectory(p) &&
      Files.list(p).iterator().asScala.exists(_.toString.endsWith(".parquet")))
      Some(spark.read.schema(envelopeSchema).parquet(dir))
    else None
  }

  /** Write-then-rename replica swap (atomic-commit stand-in; see module doc). */
  private def swapWrite(df: DataFrame, dir: String): Unit = {
    val tmp = dir + "__staged"
    df.write.mode("overwrite").parquet(tmp)
    val target = Paths.get(dir)
    deleteRecursively(target)
    Files.move(Paths.get(tmp), target, StandardCopyOption.ATOMIC_MOVE)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
    }

  /** D3 streaming form — tumbling change-volume counts with watermarking;
    * identical logic to the batch twin, run over a stream in tests. */
  def tumblingCounts(changes: DataFrame): DataFrame =
    withEventTime(changes)
      .groupBy(window(col("ts"), "1 hour"), col("op"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast(LongType).as("wstart_s"), col("op"), col("n"))

  /** D6 streaming dedup — at-least-once redelivery collapsed by event id
    * within the watermark horizon. */
  def dedupStream(changes: DataFrame): DataFrame =
    withEventTime(changes).dropDuplicates("pos")
}
