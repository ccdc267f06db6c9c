package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2 E5 — multimodal columns: image/audio/video carried as opaque
  * binary payloads with typed metadata, processed by per-partition batch
  * decode (the Scala analog of a pandas-batch UDF: one codec init per
  * partition, rows streamed through it).
  *
  * The decode itself is a STUB — no image/audio codec ships in this
  * container — implemented as a deterministic fake over the bytes
  * (`decodeStub`). Everything around it is real and tested: the binary
  * column plumbing, the typed schema, the partition-batched execution
  * shape, and the frame-sampling layout.
  *
  * Scale notes: payloads stay opaque binary end-to-end (no driver
  * materialization); decode parallelism = partition count; at 100 TB the
  * payload column would be parquet binary with a bucketed doc_id so decode
  * and join stages co-partition.
  */
object Multimodal {

  /** A multimodal row: payload is opaque bytes; kind tags the modality. */
  case class Media(doc_id: Long, kind: String, payload: Array[Byte],
                   lang: String, n_chars: Long)

  /** Decoded per-item features (what a real codec would produce). */
  case class Features(doc_id: Long, kind: String, n_bytes: Int,
                      width: Int, height: Int,
                      resized_w: Int, resized_h: Int, mean_byte: Double,
                      frame_offsets: Seq[Int])

  /** Documents table lifted to a multimodal dataset: the text bytes stand in
    * for an encoded media payload. */
  def fromDocuments(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), lit("image").as("kind"),
        col("text").cast("binary").as("payload"), col("lang"), col("n_chars"))
      .as[Media]
  }

  /** STUB decoder — deterministic fake of an image decode: "dimensions" and
    * "pixel mean" derived from the bytes. A real deployment swaps only this
    * function for an actual codec; the pipeline shape is unchanged. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Double) = {
    val n = payload.length
    val width = 16 + (n % 64)
    val height = if (width == 0) 0 else (n / math.max(width, 1)) + 1
    val mean = if (n == 0) 0.0 else payload.map(_.toInt & 0xff).sum.toDouble / n
    (width, height, mean)
  }

  /** Frame sampling layout: k evenly-spaced byte offsets (what frame-sample
    * on video would produce). */
  def frameOffsets(nBytes: Int, k: Int = 4): Seq[Int] =
    if (nBytes <= 0) Seq.empty else (0 until k).map(i => (i * nBytes) / k)

  /** STUB resize — aspect-preserving fit into a target box (the geometry is
    * real; only the pixel resampling would come from a codec). */
  def resizeStub(w: Int, h: Int, maxSide: Int = 224): (Int, Int) =
    if (w <= 0 || h <= 0) (0, 0)
    else {
      val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
      (math.max(1, math.round(w * scale).toInt),
        math.max(1, math.round(h * scale).toInt))
    }

  /** Per-partition batch decode — one "codec" init per partition, rows
    * streamed through; this is the execution shape that matters (mapInPandas
    * analog), not row-at-a-time UDF calls. */
  def extractFeatures(media: Dataset[Media]): Dataset[Features] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens here (a real codec would open once)
      rows.map { m =>
        val (w, h, mean) = decodeStub(m.payload)
        val (rw, rh) = resizeStub(w, h)
        Features(m.doc_id, m.kind, m.payload.length, w, h, rw, rh, mean,
          frameOffsets(m.payload.length))
      }
    }
  }
}
