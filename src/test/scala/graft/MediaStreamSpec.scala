package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import scala.collection.mutable

/** Kind-dispatched REAL decode, shared by the streamed and batch passes.
  * Lives on an object so executor closures bind it statically — no spec
  * instance is captured. Returns (kind, checksum, size): PNG → decoded
  * pixel sum + pixel count, WAV → exact PCM sample sum + sample count,
  * GVID → frame-0 pixel sum + frame count. */
private object MediaStreamSpec {
  def decode(b: Array[Byte]): (String, Long, Long) =
    if (Multimodal.isPngBytes(b)) {
      val px = Multimodal.decodePngPixels(b)
      ("png", px.foldLeft(0L)((a, v) => a + (v & 0xff)), px.length.toLong)
    } else if (Multimodal.isWavBytes(b)) {
      // total dispatch: a RIFF/WAVE payload that is not well-formed 16-bit
      // PCM (compressed, 24-bit, hostile chunk table) classifies opaque
      // instead of killing the task
      Multimodal.wavPcmStatsOpt(b) match {
        case Some(st) => ("wav", st.sum, st.n)
        case None     => ("opaque", b.length.toLong, 0L)
      }
    } else if (Multimodal.isGvidBytes(b)) {
      val (off, len) = Multimodal.gvidFrameAt(b, 0)
      val px = Multimodal.decodePngPixels(b.slice(off, off + len))
      ("gvid", px.foldLeft(0L)((a, v) => a + (v & 0xff)),
        Multimodal.gvidFrameCountBytes(b).toLong)
    } else ("opaque", b.length.toLong, 0L)
}

/** E5 × D1 — multimodal payloads through Structured Streaming: a
  * binaryFile file stream ingests mixed media (PNG / WAV / GVID), every
  * micro-batch REALLY decodes its files on executors (inflate+unfilter,
  * PCM sample walk, container index seek), and the streamed feature set
  * equals the one-shot batch pass over the same directory. This is the
  * continuous form of the e14/e70/e72 scan: at 100 TB the same query
  * tails a landing bucket and decode parallelism stays = partitions. */
class MediaStreamSpec extends SparkSpecBase {

  test("binaryFile stream decodes mixed media per micro-batch; streamed = batch") {
    import spark.implicits._
    val dir = tmpDir("media_in")
    val ckpt = tmpDir("media_ckpt")
    val files: Seq[(String, Array[Byte])] = Seq(
      "img_1.png" -> Multimodal.encodePng(21, 13, 1L),
      "img_2.png" -> Multimodal.encodePng(33, 9, 2L),
      "img_3.png" -> Multimodal.encodePng(17, 17, 3L),
      "aud_1.wav" -> Multimodal.encodeWav(500, 8000, 4L),
      "aud_2.wav" -> Multimodal.encodeWav(701, 16000, 5L),
      "vid_1.gvid" -> Multimodal.encodeVideo(3, 14, 10, 6L),
      "vid_2.gvid" -> Multimodal.encodeVideo(5, 11, 8, 7L))
    files.foreach { case (n, b) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, n), b)
    }

    val schema = spark.read.format("binaryFile").load(dir).schema
    val got = mutable.Map[String, (String, Long, Long)]()
    val batchIds = mutable.Set[Long]()
    val q = spark.readStream.format("binaryFile").schema(schema)
      .option("maxFilesPerTrigger", 3).load(dir)
      .select(col("path"), col("content"))
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, id: Long) =>
        batchIds.synchronized { batchIds += id }
        // decode runs on EXECUTORS (the streaming form of the
        // per-partition batch-decode pipeline); only features return
        val feats = df.as[(String, Array[Byte])]
          .mapPartitions(_.map { case (p, b) =>
            val (kind, sum, n) = MediaStreamSpec.decode(b)
            (p.substring(p.lastIndexOf('/') + 1), kind, sum, n)
          })
          .collect()
        got.synchronized {
          feats.foreach(f => got(f._1) = (f._2, f._3, f._4))
        }
        ()
      }
      .start()
    q.awaitTermination()

    assert(batchIds.size >= 2, s"expected multiple micro-batches, got $batchIds")
    assert(got.size === files.size)

    // streamed features equal the one-shot batch pass over the same dir
    val batch = spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .collect().map { case (p, b) =>
        val (kind, sum, n) = MediaStreamSpec.decode(b)
        p.substring(p.lastIndexOf('/') + 1) -> ((kind, sum, n))
      }.toMap
    assert(got.toMap === batch)

    // and the streamed values are the REAL decode results, not stubs
    assert(got("img_1.png")._1 === "png")
    assert(got("img_1.png")._3 === 21L * 13 * 3) // pixel count
    assert(got("aud_1.wav")._3 === 500L) // sample count from the data chunk
    assert(got("aud_2.wav")._3 === 701L)
    assert(got("vid_1.gvid")._3 === 3L) // frame count from the index
    assert(got("vid_2.gvid")._3 === 5L)
    // frame-0 checksum matches a direct decode of the same closed form
    val f0 = Multimodal.decodePngPixels(Multimodal.encodePng(11, 8, 7L * 100))
    assert(got("vid_2.gvid")._2 === f0.foldLeft(0L)((a, v) => a + (v & 0xff)))
  }
}
