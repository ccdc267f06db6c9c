package graft

import org.apache.spark.sql.DataFrame
import graft.streaming.ImageDedup
import scala.util.Random

/** Randomized differential for the ONLINE image near-dup protocol: random
  * corpora (exact dups, perturbed twins at varying density, unrelated
  * images, shared dims) × random micro-batch chunkings, checked against a
  * sequential plain-Scala reference whose hashes come from the CLOSED-FORM
  * pixel stream — the engine decodes real PNG bytes (inflate + unfilter),
  * the reference never touches a PNG, so the differential covers the
  * decode, the hash, the band-candidate join, the store protocol, and the
  * chunking in one property. */
class RandomizedImageDedupSpec extends SparkSpecBase {
  import spark.implicits._

  /** dHash from the closed-form LCG stream — independent of the PNG
    * decode path (no inflate, no filter reversal, no header parse). */
  private def refHash(w: Int, h: Int, seed: Long, mod: Int): (Long, Long) = {
    def px(gi: Int): Int = {
      val y = gi / (w * 3); val x = gi % (w * 3)
      val base = ((((seed + y.toLong * 7919L + x) * 1103515245L + 12345L)
        >>> 16) & 0xff).toInt
      if (mod > 0 && gi % mod == 0) (base + 1) % 256 else base
    }
    def gray(tx: Int, ty: Int): Int = {
      val sx = tx * w / 9; val sy = ty * h / 8
      val gi = (sy * w + sx) * 3
      (px(gi) + px(gi + 1) + px(gi + 2)) / 3
    }
    var hi = 0L; var lo = 0L
    for (ty <- 0 until 8; i <- 0 until 8)
      if (gray(i + 1, ty) > gray(i, ty)) {
        val idx = ty * 8 + i
        if (idx < 32) hi |= 1L << idx else lo |= 1L << (idx - 32)
      }
    (hi, lo)
  }

  private def ham(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)

  test("random corpora x random chunkings: streamed acceptance equals the " +
    "sequential closed-form reference and the one-shot batch rule") {
    (1 to 3).foreach { trial =>
      val rnd = new Random(4200 + trial)
      // images: (id, w, h, seed, mod); twins reuse an earlier image's
      // (w, h, seed) with a sparse perturbation, exact dups reuse verbatim
      val imgs = scala.collection.mutable.Buffer[(Long, Int, Int, Long, Int)]()
      (0 until 8 + rnd.nextInt(4)).foreach { i =>
        val kind = if (imgs.isEmpty) 0 else rnd.nextInt(3)
        if (kind == 0) // fresh unrelated image
          imgs += ((i.toLong, 16 + rnd.nextInt(40), 16 + rnd.nextInt(30),
            1000L * trial + i, 0))
        else {
          val (_, w, h, s, _) = imgs(rnd.nextInt(imgs.size))
          val mod = if (kind == 1) 0 else 499 + rnd.nextInt(999)
          imgs += ((i.toLong, w, h, s, mod)) // dup (mod=0) or perturbed twin
        }
      }
      val bytes = imgs.map { case (id, w, h, s, mod) =>
        id -> (if (mod == 0) Multimodal.encodePng(w, h, s)
               else Multimodal.encodePngPerturbed(w, h, s, mod))
      }
      // sequential reference over closed-form hashes: reject iff ANY
      // smaller-id image (accepted or not) is within hamming <= 3
      val hashes = imgs.map { case (_, w, h, s, mod) => refHash(w, h, s, mod) }
      val refAccepted = imgs.indices.filter { i =>
        !(0 until i).exists(j => ham(hashes(i), hashes(j)) <= 3)
      }.map(_.toLong)

      // one-shot batch rule over really-decoded bytes
      val all = bytes.toSeq.toDF("doc_id", "payload")
      val batchKept = ImageDedup.batchDedup(all)
        .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
      assert(batchKept === refAccepted,
        s"trial $trial: batch rule diverged from closed-form reference")

      // streamed over a random chunking of the arrival order
      val root = tmpDir(s"imgrand_$trial")
      var rest = bytes.toSeq
      var batchId = 0L
      while (rest.nonEmpty) {
        val k = 1 + rnd.nextInt(rest.size)
        ImageDedup.ingestBatch(root, rest.take(k).toDF("doc_id", "payload"), batchId)
        rest = rest.drop(k); batchId += 1
      }
      val streamed = ImageDedup.accepted(spark, root)
        .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
      assert(streamed === refAccepted,
        s"trial $trial: streamed acceptance diverged (chunked into $batchId batches)")
    }
  }
}
