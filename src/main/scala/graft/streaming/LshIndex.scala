package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incrementally-maintained MinHash-LSH near-dup index — the streaming
  * form of the e03 banding queries: documents arrive in micro-batches
  * (the CDC document feed), each batch extends the posting index and
  * emits exactly the NEW candidate pairs it completes, without ever
  * re-banding the existing corpus.
  *
  * Layout (under `root`):
  * {{{
  *   postings/batch_id=<n>/bp=<k>/part-….parquet   // (band, bucket, doc_id)
  *   pairs/batch_id=<n>/part-….parquet             // (d1, d2, n_shared_bands)
  * }}}
  *
  * Scale design:
  *  - postings are append-only (documents are immutable facts; 4 rows per
  *    doc), written per batch under `batch_id=<n>` with overwrite → a
  *    foreachBatch retry replaces its own output, exactly-once like the
  *    staging sink (the stored side of the probe excludes the in-flight
  *    batch_id, so a replay derives the same pairs);
  *  - within each batch the postings are partitioned by
  *    `bp = pmod(xxhash64(bucket), 16)`, and the candidate probe prunes
  *    the stored side to the bp values present in the incoming batch (a
  *    control-plane `isin` over ≤16 ints): per-batch read volume is the
  *    postings CO-BUCKETED with the batch, not the whole index;
  *  - the candidate join is keyed on (band, bucket) — pairs sharing no
  *    bucket are never materialized, the same bucket-local economics as
  *    e03b, now incremental;
  *  - each pair is emitted exactly once, by the batch that completes it
  *    (new-vs-stored, or new-vs-new within the batch), so the pairs sink
  *    is append-only for downstream dedup consumers.
  */
final class LshIndex(root: String, nBp: Int = 16) {

  private def postingsDir = s"$root/postings"
  private def pairsDir = s"$root/pairs"

  private val io = new StoreIO(root, StoreIO.sessionConf())

  private val postingsReadSchema = StructType(Seq(
    StructField("band", IntegerType), StructField("bucket", LongType),
    StructField("doc_id", LongType), StructField("bp", IntegerType),
    StructField("batch_id", LongType)))

  private val pairsReadSchema = StructType(Seq(
    StructField("d1", LongType), StructField("d2", LongType),
    StructField("n_shared_bands", LongType), StructField("batch_id", LongType)))

  /** The stored posting list (all batches; bp/batch_id from the dirs). */
  def postings(spark: SparkSession): DataFrame =
    if (!io.exists(io.path("postings")))
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        postingsReadSchema)
    else spark.read.schema(postingsReadSchema)
      .option("basePath", postingsDir).parquet(postingsDir)

  /** Every candidate pair emitted so far (exactly once each). */
  def pairs(spark: SparkSession): DataFrame =
    if (!io.exists(io.path("pairs")))
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        pairsReadSchema)
    else spark.read.schema(pairsReadSchema)
      .option("basePath", pairsDir).parquet(pairsDir)

  /** Fold one batch of (doc_id, text) documents into the index: write the
    * NEW candidate pairs this batch completes to the pairs sink, then
    * append the batch's postings. Idempotent under foreachBatch retries —
    * both writes overwrite their own batch_id partition, and the stored
    * probe side excludes this batch_id, so a replay derives identical
    * output no matter where the first attempt crashed. */
  def addBatch(docs: DataFrame, batchId: Long): Unit = {
    val spark = docs.sparkSession
    // persisted: the bands feed four actions (bp probe, both sides of the
    // pair join, the postings write)
    val bands = graft.Extensions.minhashBands(docs)
      .withColumn("bp",
        pmod(xxhash64(col("bucket")), lit(nBp.toLong)).cast(IntegerType))
      .persist()
    try {
      // bounded read: only the stored bp partitions this batch touches
      val touchedBp = bands.select(col("bp")).distinct()
        .collect().map(_.getInt(0)).toSeq.sorted
      val stored = postings(spark)
        .filter(col("batch_id") =!= batchId && col("bp").isin(touchedBp: _*))
        .select(col("band"), col("bucket"), col("doc_id").as("old_doc"))
      // new-vs-stored: pairs completed by this batch against the prior corpus
      val vsOld = bands.join(stored, Seq("band", "bucket"))
        .select(least(col("doc_id"), col("old_doc")).as("d1"),
          greatest(col("doc_id"), col("old_doc")).as("d2"))
      // new-vs-new: pairs entirely within this batch
      val vsNew = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      val newPairs = vsOld.unionByName(vsNew)
        .groupBy(col("d1"), col("d2"))
        .agg(count(lit(1)).as("n_shared_bands"))
      // pairs first, postings second: a crash between the two leaves this
      // batch's postings absent, so the retry recomputes the SAME pairs
      // (postings first would make the replay see its own docs as "stored")
      newPairs.write.mode("overwrite").parquet(s"$pairsDir/batch_id=$batchId")
      bands.write.mode("overwrite").partitionBy("bp")
        .parquet(s"$postingsDir/batch_id=$batchId")
    } finally { bands.unpersist(); () }
  }

  /** Offline maintenance (stream paused — same contract as
    * BucketedReplica.compact): fold every posting/pair batch partition into
    * ONE consolidated partition each, collapsing the small-file scatter a
    * long-running ingest accumulates (one dir per micro-batch). The
    * consolidated partition takes a fresh NEGATIVE batch_id, so it can
    * never collide with the checkpoint-driven ids of future stream batches
    * and the probe's `batch_id =!= current` exclusion still holds.
    *
    * Idempotent and crash-converging: the consolidated rows are written
    * DISTINCT (posting and pair rows are unique by construction, so a
    * crash that leaves both sources and the consolidation visible only
    * duplicates rows physically — the next compact() collapses them), and
    * sources are deleted only after the consolidated write completes. */
  def compact(spark: SparkSession): Unit = {
    def consolidate(dir: String, read: DataFrame, partBy: Option[String]): Unit = {
      val sources = io.listDirs(new org.apache.hadoop.fs.Path(dir))
      if (sources.size <= 1) return // nothing to fold
      val ids = sources.map(_.getName.stripPrefix("batch_id=").toLong)
      val nextId = math.min(ids.min, 0L) - 1L
      val out = s"$dir/batch_id=$nextId"
      val w = read.drop("batch_id").distinct()
        .repartition(math.max(1, nBp / 4)).write.mode("overwrite")
      partBy.fold(w)(c => w.partitionBy(c)).parquet(out)
      sources.foreach(io.delete)
    }
    consolidate(postingsDir, postings(spark), Some("bp"))
    consolidate(pairsDir, pairs(spark), None)
  }

  def destroy(): Unit = io.delete(io.root)
}
