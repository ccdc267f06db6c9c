package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.ImageDedup

/** E5 × E1 × D — ONLINE image near-dup rejection at ingest: the perceptual
  * (dHash) twin of the text pipeline's near-dup rejection protocol.
  * Pins: twin rejection, unrelated acceptance, replay idempotence (retry
  * fence), and chunking invariance (stream ≡ one-shot batch rule). */
class ImageDedupSpec extends SparkSpecBase {
  import spark.implicits._

  // 6 images: 0 base, 1 = perturbed twin of 0, 2 unrelated, 3 unrelated,
  // 4 = exact re-encode of 2 (hamming 0), 5 unrelated. Ids are global
  // arrival order, so the batch rule must accept {0, 2, 3, 5}.
  private def corpus: Seq[(Long, Array[Byte])] = Seq(
    0L -> Multimodal.encodePng(40, 30, seed = 9L),
    1L -> Multimodal.encodePngPerturbed(40, 30, seed = 9L, mod = 997),
    2L -> Multimodal.encodePng(35, 28, seed = 21L),
    3L -> Multimodal.encodePng(40, 30, seed = 77L),
    4L -> Multimodal.encodePng(35, 28, seed = 21L),
    5L -> Multimodal.encodePng(29, 33, seed = 123L))

  private def df(rows: Seq[(Long, Array[Byte])]): DataFrame =
    rows.toDF("doc_id", "payload")

  private def acceptedIds(root: String): Seq[Long] =
    ImageDedup.accepted(spark, root).select("doc_id")
      .collect().map(_.getLong(0)).toSeq.sorted

  test("one-shot batch rule: twins rejected against smaller-id partners") {
    val kept = ImageDedup.batchDedup(df(corpus))
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(kept === Seq(0L, 2L, 3L, 5L))
  }

  test("streamed ingest: later-batch twin rejected against the store; " +
    "accepted set equals the one-shot rule") {
    val root = tmpDir("imgdedup")
    val (b0, b1, b2) = (corpus.slice(0, 1), corpus.slice(1, 4), corpus.slice(4, 6))
    ImageDedup.ingestBatch(root, df(b0), 0L)
    ImageDedup.ingestBatch(root, df(b1), 1L) // twin of 0 arrives later
    ImageDedup.ingestBatch(root, df(b2), 2L) // exact dup of 2 arrives later
    assert(acceptedIds(root) === Seq(0L, 2L, 3L, 5L))
  }

  test("replay of a committed batch is a no-op (retry fence): the batch " +
    "does not self-reject against its own stored hashes") {
    val root = tmpDir("imgdedup_replay")
    ImageDedup.ingestBatch(root, df(corpus.slice(0, 3)), 0L)
    ImageDedup.ingestBatch(root, df(corpus.slice(3, 6)), 1L)
    val before = acceptedIds(root)
    ImageDedup.ingestBatch(root, df(corpus.slice(3, 6)), 1L) // foreachBatch replay
    assert(acceptedIds(root) === before)
    assert(before === Seq(0L, 2L, 3L, 5L))
  }

  test("chunking invariance: every split of the arrival order accepts the " +
    "same set") {
    val splits = Seq(
      Seq(corpus),
      Seq(corpus.slice(0, 2), corpus.slice(2, 6)),
      Seq(corpus.slice(0, 3), corpus.slice(3, 5), corpus.slice(5, 6)),
      corpus.map(Seq(_)))
    val results = splits.map { chunks =>
      val root = tmpDir("imgdedup_chunk")
      chunks.zipWithIndex.foreach { case (c, i) =>
        ImageDedup.ingestBatch(root, df(c), i.toLong)
      }
      acceptedIds(root)
    }
    assert(results.distinct.size === 1, s"chunking changed acceptance: $results")
    assert(results.head === Seq(0L, 2L, 3L, 5L))
  }

  test("binaryFile STREAM wrapper: foreachBatch ingest over a landing dir " +
    "accepts the same set as the one-shot rule, across micro-batch cuts") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = tmpDir("imgdedup_in")
    val ckpt = tmpDir("imgdedup_ckpt")
    val root = tmpDir("imgdedup_store")
    corpus.foreach { case (id, b) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, f"img_$id%04d.png"), b)
    }
    val schema = spark.read.format("binaryFile").load(dir).schema
    val q = spark.readStream.format("binaryFile").schema(schema)
      .option("maxFilesPerTrigger", 2).load(dir)
      .select(
        regexp_extract(col("path"), "img_(\\d+)\\.png$", 1)
          .cast("long").as("doc_id"),
        col("content").as("payload"))
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, id: Long) =>
        ImageDedup.ingestBatch(root, df, id)
      }
      .start()
    // awaitTermination's RESULT matters: under full-suite memory/GC
    // pressure an AvailableNow run can outlive the wait, and asserting
    // on the store then reports a phantom acceptance divergence instead
    // of the real condition (seen once in a 331-test run; standalone
    // 20/20 green). Fail diagnostically on the timeout itself.
    assert(q.awaitTermination(240000),
      "AvailableNow ingest stream did not terminate within 240s")
    // lexicographic file order = id order, 2 files per micro-batch — a
    // chunking of the arrival order, so acceptance must match the batch rule
    assert(acceptedIds(root) === Seq(0L, 2L, 3L, 5L))
  }

  test("band candidate filter is lossless at hamming <= 3: rejection pairs " +
    "carry the verified hamming and the twin pair is within threshold") {
    val h = ImageDedup.hashes(df(corpus))
    val empty = h.filter(lit(false))
    val rej = ImageDedup.rejections(h, empty, maxHam = 3)
      .select("doc_id", "partner", "hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exact dup pair (4, 2) must be hamming 0; twin pair (1, 0) <= 3
    assert(rej.exists { case (d, p, hm) => d == 4L && p == 2L && hm == 0L })
    assert(rej.exists { case (d, p, hm) => d == 1L && p == 0L && hm <= 3L })
    // nothing unrelated sneaks in
    assert(rej.map(_._1).toSet === Set(1L, 4L))
  }
}
