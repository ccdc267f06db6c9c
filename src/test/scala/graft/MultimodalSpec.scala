package graft

import org.apache.spark.sql.functions._

/** E5 multimodal plumbing: binary payload column, typed metadata, and the
  * per-partition batch decode shape (stubbed codec, real pipeline). */
class MultimodalSpec extends SparkSpecBase {

  test("documents lift to a binary-payload media dataset with typed schema") {
    val media = Multimodal.fromDocuments(spark, sfDir)
    val schema = media.schema
    assert(schema("payload").dataType.typeName === "binary")
    assert(media.count() === 500)
    // payload bytes round-trip the source text exactly
    val r = media.filter(col("doc_id") === 0).head()
    val text = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") === 0).head().getAs[String]("text")
    assert(new String(r.payload, "UTF-8") === text)
  }

  test("per-partition batch decode produces deterministic features") {
    val media = Multimodal.fromDocuments(spark, sfDir).repartition(4)
    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() === 500)
    val f = feats.filter(col("doc_id") === 0).head()
    // stub decode is deterministic: recompute driver-side and compare
    val payload = Multimodal.fromDocuments(spark, sfDir)
      .filter(col("doc_id") === 0).head().payload
    val (w, h, mean) = Multimodal.decodeStub(payload)
    assert(f.n_bytes === payload.length)
    assert((f.width, f.height) === ((w, h)))
    assert((f.resized_w, f.resized_h) === Multimodal.resizeStub(w, h))
    assert(math.max(f.resized_w, f.resized_h) <= 224)
    assert(math.abs(f.mean_byte - mean) < 1e-12)
    assert(f.frame_offsets === Multimodal.frameOffsets(payload.length))
    assert(f.frame_offsets.length === 4 && f.frame_offsets.head === 0)
  }

  test("features survive a shuffle and join back to metadata") {
    val media = Multimodal.fromDocuments(spark, sfDir)
    val feats = Multimodal.extractFeatures(media).toDF()
    val joined = feats.join(media.toDF().select("doc_id", "lang"), "doc_id")
      .groupBy("lang").agg(count(lit(1)).as("n"), sum("n_bytes").as("bytes"))
    val total = joined.agg(sum("n")).head().getLong(0)
    assert(total === 500)
  }
}
