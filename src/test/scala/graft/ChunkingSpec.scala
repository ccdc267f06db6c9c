package graft

import org.apache.spark.sql.functions._

/** e16 chunking invariants: windows cover every token, overlap is exactly
  * the stride complement, and the chunks reassemble to the original
  * document. */
class ChunkingSpec extends SparkSpecBase {

  private val SIZE = 32
  private val STRIDE = 24

  test("chunks reconstruct the original token sequence") {
    val docs = Tables.load(spark, sfDir, "documents").filter(col("doc_id") < 25)
    val chunks = docs
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"), col("tk"),
        explode(sequence(lit(1), greatest(size(col("tk")), lit(1)), lit(STRIDE))).as("start"))
      .select(col("doc_id"), expr("start div 24").cast("int").as("chunk_idx"),
        slice(col("tk"), col("start"), lit(SIZE)).as("chunk"))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(_.getSeq[String](2)).toSeq).toMap

    val originals = docs.select(col("doc_id"), split(col("text"), " ").as("tk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap

    originals.foreach { case (id, toks) =>
      val cs = chunks(id)
      // reconstruction: first chunk whole, then the non-overlapping suffix
      val rebuilt = cs.head ++ cs.tail.flatMap(_.drop(SIZE - STRIDE))
      assert(rebuilt === toks, s"doc $id failed to reassemble")
      // window starts advance by exactly the stride, so a full predecessor
      // shares its last SIZE-STRIDE tokens with the next chunk's head
      // (tail-adjacent chunks may be partial — stride < size)
      cs.sliding(2).foreach {
        case Seq(a, b) if a.length == SIZE =>
          assert(a.takeRight(SIZE - STRIDE) === b.take(math.min(SIZE - STRIDE, b.length)))
        case _ =>
      }
    }
  }
}
