package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ONLINE image near-dup rejection at ingest — the multimodal twin of the
  * text pipeline's `LshIndex.probeNearDups` (see the reference's merge
  * stage only ever deduplicating rows by key: perceptual dedup is an
  * engine extension, reference has no counterpart). A micro-batch of
  * image files is really decoded on executors, each image collapses to a
  * 64-bit perceptual dHash ([[graft.Multimodal.dhash64]]), and a doc is
  * REJECTED when a hamming-≤-t partner exists among (a) images stored by
  * EARLIER committed batches or (b) smaller-id images of the same batch —
  * which makes the accepted set equal to the one-shot batch rule "reject
  * iff a smaller-id near-partner exists", independent of how the stream
  * chunks arrivals (the store keeps EVERY probed hash, accepted or not,
  * exactly like the text ingest keeps every exact-dedup survivor).
  *
  * Candidate generation is 16-bit banding over the hash halves: by
  * pigeonhole, h flipped bits break at most h of the 4 bands, so for the
  * default threshold t ≤ 3 the band join is a LOSSLESS candidate filter —
  * every pair the hamming verifier would reject shares at least one
  * intact band. Never all-pairs: at 100 TB the probe joins the batch's
  * band keys against a store partitioned the same way.
  *
  * Exactly-once: batch output lands as `batch_id=N` partition overwrites
  * (replay rewrites the same files), and the probe's retry fence excludes
  * the in-flight batch's own stored hashes — a foreachBatch replay of an
  * already-committed batch would otherwise see every doc as its own 0-bit
  * partner and self-reject the whole batch.
  */
object ImageDedup {

  /** Decode a (doc_id, payload) batch to one dHash row per image:
    * (doc_id, hi, lo) — hi/lo the two positive 32-bit halves. Decode
    * parallelism = partitions; ONE 2-long row per image leaves the
    * executor. Non-PNG payloads are dropped (triage upstream, e94). */
  def hashes(batch: DataFrame): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    batch.select(col("doc_id").cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, b) =>
          if (!graft.Multimodal.isPngBytes(b)) Iterator.empty
          else {
            val (w, h, _, _) = graft.Multimodal.pngHeader(b)
            val px = graft.Multimodal.decodePngPixels(b)
            val (hi, lo) = graft.Multimodal.dhash64(px, w, h)
            Iterator((id, hi, lo))
          }
        }
      }
      .toDF("doc_id", "hi", "lo")
  }

  /** 4×16-bit band rows (doc_id, band, bkey) of a hash frame. */
  def bands(h: DataFrame): DataFrame =
    h.select(col("doc_id"), explode(array(
        struct(lit(0).as("band"), (col("hi") % 65536).as("bkey")),
        struct(lit(1).as("band"), shiftright(col("hi"), 16).as("bkey")),
        struct(lit(2).as("band"), (col("lo") % 65536).as("bkey")),
        struct(lit(3).as("band"), shiftright(col("lo"), 16).as("bkey"))))
        .as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.bkey"))

  private def hamming(a: String, b: String): Column =
    (bit_count(col(s"$a.hi").bitwiseXOR(col(s"$b.hi"))) +
      bit_count(col(s"$a.lo").bitwiseXOR(col(s"$b.lo")))).cast(LongType)

  /** Rejected doc_ids of `batchHashes` against `storedHashes` (earlier
    * batches) plus smaller-id same-batch partners, at hamming ≤ maxHam.
    * Returns (doc_id, partner, hamming). maxHam ≤ 3 keeps the
    * band filter lossless (see object doc). */
  def rejections(batchHashes: DataFrame, storedHashes: DataFrame,
                 maxHam: Int = 3): DataFrame = {
    require(maxHam >= 0 && maxHam <= 3,
      s"maxHam=$maxHam: above 3 the 4-band filter is no longer lossless")
    val bb = bands(batchHashes)
    val vsStored = bb.join(bands(storedHashes).withColumnRenamed("doc_id", "partner"),
        Seq("band", "bkey"))
      .select(col("doc_id"), col("partner")).distinct()
    val vsBatch = bb.as("x").join(bb.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") > col("y.doc_id"))
      .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("partner"))
      .distinct()
    val all = vsStored.unionByName(vsBatch)
      .select(col("doc_id").as("d"), col("partner").as("p"))
    all
      .join(batchHashes.as("a"), col("d") === col("a.doc_id"))
      .join(batchHashes.unionByName(storedHashes).as("b"),
        col("p") === col("b.doc_id"))
      .select(col("d").as("doc_id"), col("p").as("partner"),
        hamming("a", "b").as("hamming"))
      .filter(col("hamming") <= maxHam)
  }

  private def readStore(spark: SparkSession, dir: String,
                        excludeBatchId: Long): DataFrame = {
    // existence goes through the Hadoop FS resolved from the path itself —
    // writes land via Spark's Hadoop layer, so a java.io.File check would
    // read "absent" forever on any non-local root (hdfs://, s3a://) and
    // silently no-op the cross-batch dedup
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("doc_id", LongType),
          StructField("hi", LongType), StructField("lo", LongType))))
    else
      spark.read.option("basePath", dir).parquet(dir)
        .filter(col("batch_id") =!= excludeBatchId)
        .select(col("doc_id"), col("hi"), col("lo"))
  }

  /** One foreachBatch step: decode → probe committed store (retry-fenced
    * against this batch's own partition) → land ALL hashes + the accepted
    * subset as batch_id-partition overwrites. Replay-idempotent. */
  def ingestBatch(root: String, batch: DataFrame, batchId: Long,
                  maxHam: Int = 3): Unit = {
    val spark = batch.sparkSession
    val h = hashes(batch).localCheckpoint(true)
    val stored = readStore(spark, s"$root/hashes", excludeBatchId = batchId)
    val rej = rejections(h, stored, maxHam)
      .select(col("doc_id")).distinct().localCheckpoint(true)
    h.write.mode("overwrite").parquet(s"$root/hashes/batch_id=$batchId")
    h.join(rej, Seq("doc_id"), "left_anti")
      .write.mode("overwrite").parquet(s"$root/accepted/batch_id=$batchId")
  }

  /** The accepted corpus so far: (doc_id, hi, lo). */
  def accepted(spark: SparkSession, root: String): DataFrame =
    readStore(spark, s"$root/accepted", excludeBatchId = -1L)

  /** One-shot batch twin of the streamed rule, for stream ≡ batch
    * equivalence: reject iff a smaller-id partner within maxHam exists. */
  def batchDedup(all: DataFrame, maxHam: Int = 3): DataFrame = {
    val h = hashes(all)
    val empty = h.filter(lit(false))
    val rej = rejections(h, empty, maxHam).select(col("doc_id")).distinct()
    h.join(rej, Seq("doc_id"), "left_anti")
  }
}

/** The operability handle for an [[ImageDedup]] hash store — audit/vacuum
  * over the `hashes/` + `accepted/` layout, reachable from the cold SQL
  * doors like any index store (`graft_index_audit('<root>')`, `CALL
  * graft.system.index_vacuum('<root>')`).
  *
  * The store is deliberately LOGLESS (the data dirs are the commit;
  * `ImageDedup.ingestBatch` writes `hashes/batch_id=N` then
  * `accepted/batch_id=N`, and a foreachBatch replay overwrites both), so:
  *  - the accepted partition is each batch's commit witness — a hashes dir
  *    with no accepted twin is a crashed-or-in-flight attempt whose
  *    redelivery overwrites it (foreachBatch is sequential, so at most ONE
  *    such frontier dir exists in normal operation; more means the
  *    checkpoint was discarded — reported, operator's call);
  *  - [[vacuum]] reclaims only write-job staging wreckage (`_temporary`
  *    dirs and hidden temp files a killed Spark write job leaves INSIDE a
  *    batch dir — Spark never reads them back, so they are provably not
  *    part of any committed batch). Unpaired hashes dirs are NOT swept:
  *    with no log there is no fence distinguishing a crashed attempt from
  *    a live one, and the redelivery overwrite already heals the crashed
  *    case. Quiesced-only is therefore advisory here, not enforced — the
  *    worst a racing writer suffers is a loud task failure when its own
  *    `_temporary` dir vanishes, healed by the same redelivery. */
final class ImageHashStore(root: String) extends MaintainableStore {

  private val io = new StoreIO(root, StoreIO.sessionConf())
  private val dataDirs = Seq("hashes", "accepted")

  private def batchIds(d: String): Set[Long] =
    io.listDirs(io.path(d)).flatMap(p => OpLog.batchIdOf(p.getName)).toSet

  /** All rows of one dataset dir with their batch_id (the
    * [[ImageDedup.readStore]] shape, no batch filter). */
  private def readAll(spark: SparkSession, d: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$root/$d")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("doc_id", LongType),
          StructField("hi", LongType), StructField("lo", LongType),
          StructField("batch_id", LongType))))
    else spark.read.option("basePath", s"$root/$d").parquet(s"$root/$d")
      .select(col("doc_id"), col("hi"), col("lo"), col("batch_id"))
  }

  /** Leaked Spark write-job staging inside the batch dirs: `_temporary`
    * children — a killed write job's wreckage. ONLY that name: committed
    * output legitimately holds `_SUCCESS` markers and hidden `.crc`
    * checksum sidecars, which are nobody's to sweep. */
  private def stagingWreckage: Seq[org.apache.hadoop.fs.Path] =
    dataDirs.flatMap { d =>
      io.listDirs(io.path(d)).flatMap(b =>
        io.listDirs(b).filter(_.getName == "_temporary"))
    }

  def audit(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.Row
    val reportSchema = StructType(Seq(
      StructField("check", StringType, nullable = false),
      StructField("ok", BooleanType, nullable = false),
      StructField("observed", StringType, nullable = false),
      StructField("details", StringType, nullable = false)))
    val rows = scala.collection.mutable.Buffer[Row]()
    val (hIds, aIds) = (batchIds("hashes"), batchIds("accepted"))
    rows += Row("layout", hIds.nonEmpty || aIds.nonEmpty,
      s"${hIds.size} hash batches / ${aIds.size} accepted",
      "hashes/ holds every probed perceptual hash; accepted/ is each " +
        "batch's commit witness")
    // an accepted dir with no hashes twin cannot come from the protocol
    // (hashes are written FIRST) — manual surgery or a partial restore
    val unbacked = (aIds -- hIds).toSeq.sorted
    rows += Row("accepted_ids_in_hashes", unbacked.isEmpty,
      s"${unbacked.size}",
      if (unbacked.isEmpty) "every accepted batch has its hash partition"
      else s"accepted batch(es) with NO hash partition — the dedup probe " +
        s"cannot see their images: ${unbacked.mkString(",")}")
    def scanRow(check: String, detail: String)(cnt: => Long): Unit =
      rows += (scala.util.Try(cnt) match {
        case scala.util.Success(n) => Row(check, n == 0L, s"$n", detail)
        case scala.util.Failure(e) => Row(check, false, "scan failed",
          s"$detail — scan threw ${e.getClass.getSimpleName}: " +
            s"${String.valueOf(e.getMessage).take(200)}")
      })
    scanRow("accepted_rows_in_hashes",
      "every accepted row must be a stored probe hash, bit-identical " +
        "(accepted is a SUBSET of hashes by construction)") {
      readAll(spark, "accepted")
        .join(readAll(spark, "hashes"),
          Seq("doc_id", "hi", "lo", "batch_id"), "left_anti").count()
    }
    // the crashed-or-in-flight frontier: hashes landed, accepted did not
    // sequential foreachBatch leaves at most ONE unpaired frontier batch
    // (mid-ingest or crashed, redelivery's to heal — ok); more than one
    // means the checkpoint was discarded and the extras are PERMANENTLY
    // orphaned, a real failure an ok-filtering consumer must see
    val unpaired = (hIds -- aIds).toSeq.sorted
    rows += Row("unpaired_hash_batches", unpaired.size <= 1,
      s"${unpaired.size}",
      if (unpaired.isEmpty) "none"
      else if (unpaired.size == 1)
        s"batch ${unpaired.head} is mid-ingest or crashed; its redelivery " +
          "overwrites both partitions (foreachBatch contract)"
      else "MULTIPLE unpaired batches — sequential foreachBatch leaves at " +
        "most one; a discarded checkpoint orphaned these permanently: " +
        unpaired.mkString(","))
    val wreck = stagingWreckage
    rows += Row("staging_wreckage", true, s"${wreck.size}",
      if (wreck.isEmpty) "none"
      else "killed write jobs' _temporary staging; vacuum() reclaims: " +
        wreck.map(_.getName).sorted.mkString(","))
    val strays = dataDirs.flatMap { d =>
      io.listDirs(io.path(d))
        .filter(p => OpLog.batchIdOf(p.getName).isEmpty &&
          p.getName != "_temporary")
        .map { p =>
          val bearing = io.listFiles(p).nonEmpty || io.listDirs(p).nonEmpty
          (s"$d/${p.getName}", bearing)
        }
    }
    val bearing = strays.collect { case (n, true) => n }
    rows += Row("unrecognized_entries", bearing.isEmpty, s"${strays.size}",
      if (strays.isEmpty) "none"
      else if (bearing.isEmpty)
        "empty dirs outside the store's naming; inert — operator's to " +
          s"remove: ${strays.map(_._1).sorted.mkString(",")}"
      else "CONTENT-BEARING dirs outside the store's naming break " +
        "partition discovery for every reader — move them out: " +
        bearing.sorted.mkString(","))
    spark.createDataFrame(java.util.Arrays.asList(rows.toSeq: _*), reportSchema)
  }

  /** See the class doc: reclaims ONLY write-job staging wreckage — the one
    * class provably outside every committed batch in a logless store.
    * AGE-GATED: a `_temporary` younger than the gate may belong to a LIVE
    * write job (the store is logless, so there is no lease to check) — a
    * routine SQL-door vacuum deleting it would fail the in-flight batch
    * (loudly, and redelivery heals it, but a maintenance command should
    * not induce avoidable failures). Real crash wreckage is, by
    * definition, old by the time an operator vacuums; anything younger
    * is reported by audit() and reclaimed on the next pass. Knob:
    * `-Dgraft.image.stagingGraceMs` (default 10 min — longer than any
    * healthy micro-batch write, far shorter than an operator's cadence). */
  def vacuum(): Seq[String] = {
    val grace = sys.props.get("graft.image.stagingGraceMs")
      .flatMap(_.toLongOption).getOrElse(10L * 60 * 1000)
    val now = System.currentTimeMillis()
    stagingWreckage
      .filter(p => io.mtime(p).exists(m => now - m > grace))
      .map { p => io.delete(p); p.toString }
  }
}
