package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *   sigs/batch_id=<n>/part-….parquet              // (doc_id, sig0..sig7)
  *   postings/batch_id=<n>/bp=<k>/part-….parquet   // (band, bucket, doc_id)
  *   pairs/batch_id=<n>/part-….parquet             // (d1, d2, n_shared_bands)
  *   _BANDING-<v>                                  // write-once banding commit
  * }}}
  *
  * Scale design:
  *  - signatures are the stored PRIMITIVE (8 longs per doc, banding-
  *    independent); postings/pairs are derived under the CURRENT banding.
  *    That is what makes [[reband]] possible without re-reading the corpus;
  *  - postings are append-only (documents are immutable facts), written per
  *    batch under `batch_id=<n>` with overwrite → a foreachBatch retry
  *    replaces its own output, exactly-once like the staging sink (the
  *    stored side of the probe excludes the in-flight batch_id, so a
  *    replay derives the same pairs);
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

  private def sigsDir = s"$root/sigs"
  private def postingsDir = s"$root/postings"
  private def pairsDir = s"$root/pairs"

  private val io = new StoreIO(root, StoreIO.sessionConf())

  private val sigsReadSchema = StructType(
    StructField("doc_id", LongType) +:
      (0 until 8).map(i => StructField(s"sig$i", LongType)) :+
      StructField("batch_id", LongType))

  private val postingsReadSchema = StructType(Seq(
    StructField("band", IntegerType), StructField("bucket", LongType),
    StructField("doc_id", LongType), StructField("bp", IntegerType),
    StructField("batch_id", LongType)))

  private val pairsReadSchema = StructType(Seq(
    StructField("d1", LongType), StructField("d2", LongType),
    StructField("n_shared_bands", LongType), StructField("batch_id", LongType)))

  /** Current banding: (rows-per-band, bands, validity cut). The validity
    * cut — `Some((consol, cutoff))` after a [[reband]] — marks which
    * posting/pair partitions belong to the current banding generation:
    * `batch_id <= consol` (the migration's consolidated rewrite and any
    * later compaction) or `batch_id > cutoff` (stream batches after the
    * migration). Partitions outside it are the OLD banding's — logically
    * dead the instant the `_BANDING` commit lands, physically GC'd after
    * (correctness never depends on the deletes). No `_BANDING` file =
    * the default 2×4 banding, everything valid. */
  private def banding: (Int, Int, Option[(Long, Long)]) = {
    val vs = io.listFiles(io.root).map(_.getName)
      .filter(_.startsWith("_BANDING-")).map(_.stripPrefix("_BANDING-").toLong)
    if (vs.isEmpty) (2, 4, None)
    else {
      val kv = io.readString(io.path(s"_BANDING-${vs.max}"))
        .linesIterator.filter(_.contains("=")).map { l =>
          val Array(k, v) = l.split("=", 2); k -> v
        }.toMap
      (kv("r").toInt, kv("b").toInt,
        Some((kv("consol").toLong, kv("cutoff").toLong)))
    }
  }

  private def validIn(cut: Option[(Long, Long)]): Column = cut match {
    case Some((consol, cutoff)) =>
      col("batch_id") <= consol || col("batch_id") > cutoff
    case None => lit(true)
  }

  private def readDir(spark: SparkSession, rel: String, dir: String,
                      schema: StructType): DataFrame =
    if (!io.exists(io.path(rel)))
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        schema)
    else spark.read.schema(schema).option("basePath", dir).parquet(dir)

  /** The stored signatures (all batches — banding-independent). */
  def sigs(spark: SparkSession): DataFrame =
    readDir(spark, "sigs", sigsDir, sigsReadSchema)

  /** The stored posting list of the CURRENT banding generation. */
  def postings(spark: SparkSession): DataFrame =
    readDir(spark, "postings", postingsDir, postingsReadSchema)
      .filter(validIn(banding._3))

  /** Every candidate pair of the CURRENT banding generation (exactly once
    * each). */
  def pairs(spark: SparkSession): DataFrame =
    readDir(spark, "pairs", pairsDir, pairsReadSchema)
      .filter(validIn(banding._3))

  private def bpCol: Column =
    pmod(xxhash64(col("bucket")), lit(nBp.toLong)).cast(IntegerType)

  /** Fold one batch of (doc_id, text) documents into the index: write the
    * NEW candidate pairs this batch completes to the pairs sink, then
    * append the batch's postings and signatures. Idempotent under
    * foreachBatch retries — all three writes overwrite their own batch_id
    * partition, and the stored probe side excludes this batch_id, so a
    * replay derives identical output no matter where the first attempt
    * crashed. */
  def addBatch(docs: DataFrame, batchId: Long): Unit = {
    val spark = docs.sparkSession
    val (r, b, _) = banding
    // persisted: the signatures feed five actions (bp probe, both sides of
    // the pair join, the postings write, the sigs write)
    val sig = graft.Extensions.minhashSigs(docs).persist()
    val bands = graft.Extensions.bandsFromSigs(sig, r, b).withColumn("bp", bpCol)
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
      sig.write.mode("overwrite").parquet(s"$sigsDir/batch_id=$batchId")
    } finally { sig.unpersist(); () }
  }

  /** Offline migration (stream paused — same contract as [[compact]]):
    * switch the index to a NEW (r, b) banding — e63's sweep measures which
    * banding a corpus wants; this applies it WITHOUT re-reading the corpus.
    * Postings and pairs are recomputed wholesale from the stored
    * signatures into one consolidated partition each (the compaction
    * path's negative-batch_id convention), then a write-once `_BANDING`
    * commit flips the generation: its validity cut makes the old banding's
    * partitions logically dead at that instant, so the trailing deletes
    * are pure physical GC — a crash anywhere re-runs to convergence, and
    * correctness never depends on the deletes having happened.
    *
    * The one-time cost is a full self-join over the re-banded postings —
    * the same bucket-local economics as the one-shot e03b banding, paid
    * once per migration instead of per batch. */
  def reband(spark: SparkSession, r: Int, b: Int): Unit = {
    require(r > 0 && b > 0 && r * b <= 8, s"reband r=$r b=$b needs r*b <= 8")
    val dirIds = (io.listDirs(new org.apache.hadoop.fs.Path(postingsDir)) ++
      io.listDirs(new org.apache.hadoop.fs.Path(pairsDir)))
      .map(_.getName.stripPrefix("batch_id=").toLong)
    val consol = (dirIds :+ 0L).min - 1L
    val cutoff = (dirIds :+ -1L).max
    val sig = sigs(spark).drop("batch_id").distinct()
    val bands = graft.Extensions.bandsFromSigs(sig, r, b)
      .withColumn("bp", bpCol).persist()
    try {
      bands.repartition(math.max(1, nBp / 4))
        .write.mode("overwrite").partitionBy("bp")
        .parquet(s"$postingsDir/batch_id=$consol")
      val allPairs = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .agg(count(lit(1)).as("n_shared_bands"))
      allPairs.repartition(math.max(1, nBp / 4))
        .write.mode("overwrite").parquet(s"$pairsDir/batch_id=$consol")
    } finally { bands.unpersist(); () }
    // the generation commit: readers/writers flip to the new banding here
    val nextV = 1L + io.listFiles(io.root).map(_.getName)
      .filter(_.startsWith("_BANDING-")).map(_.stripPrefix("_BANDING-").toLong)
      .foldLeft(0L)(math.max)
    io.createExclusive(io.path(s"_BANDING-$nextV"),
      s"r=$r\nb=$b\nconsol=$consol\ncutoff=$cutoff\n")
    // physical GC of the dead generation's partitions
    (io.listDirs(new org.apache.hadoop.fs.Path(postingsDir)) ++
      io.listDirs(new org.apache.hadoop.fs.Path(pairsDir)))
      .filter { p =>
        val id = p.getName.stripPrefix("batch_id=").toLong
        !(id <= consol || id > cutoff)
      }.foreach(io.delete)
  }

  /** Offline maintenance (stream paused — same contract as
    * BucketedReplica.compact): fold every sig/posting/pair batch partition
    * into ONE consolidated partition each, collapsing the small-file
    * scatter a long-running ingest accumulates (one dir per micro-batch).
    * The consolidated partition takes a fresh NEGATIVE batch_id, so it can
    * never collide with the checkpoint-driven ids of future stream batches
    * and the probe's `batch_id =!= current` exclusion still holds.
    *
    * Idempotent and crash-converging: the consolidated rows are written
    * DISTINCT (sig, posting and pair rows are unique by construction, so a
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
    consolidate(sigsDir, sigs(spark), None)
    consolidate(postingsDir, postings(spark), Some("bp"))
    consolidate(pairsDir, pairs(spark), None)
  }

  def destroy(): Unit = io.delete(io.root)
}
