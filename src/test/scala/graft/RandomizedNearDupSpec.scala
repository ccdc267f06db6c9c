package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import graft.streaming.CorpusIngest

/** Randomized differential for the online near-dup rejection rule: the
  * streaming ingest (any chunking) must produce exactly the acceptance set
  * of a SEQUENTIAL reference pass — docs in arrival order, reject when >= m
  * of 8 MinHash components agree with ANY previously seen doc (accepted or
  * rejected), where the reference computes signatures with its own plain-
  * Scala reimplementation of the md5 token-hash family (not the engine's).
  *
  * Corpora are generated from a small vocabulary so near-dup collisions are
  * COMMON (most random pairs share many tokens), exercising chains, stars,
  * and cross-batch orderings far beyond the fixture scenarios. Seeds are
  * fixed — failures reproduce. */
class RandomizedNearDupSpec extends SparkSpecBase {

  private val inSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val P = 2147483647L
  private val A = Seq(7L, 11L, 13L, 17L, 19L, 23L, 29L, 31L)
  private val B = Seq(3L, 5L, 59L, 61L, 67L, 71L, 73L, 79L)

  /** Reference signature: independent reimplementation (JDK MessageDigest,
    * BigInt parse) of H(t) = int(md5(t)[0:8]) and sig_i = min(aH+b mod P). */
  private def refSigs(text: String): Seq[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = text.split(" ").filter(_.nonEmpty).distinct.toSeq.map { t =>
      val hex = md.digest(t.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    A.zip(B).map { case (a, b) => hs.map(h => (h * a + b) % P).min }
  }

  /** Sequential reference: arrival order, first-arrival wins, the seen set
    * grows by every doc regardless of its verdict. */
  private def refAccepted(docs: Seq[(Long, String)], m: Int): Set[Long] = {
    val seenSigs = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    val seenTexts = scala.collection.mutable.Set.empty[String]
    val out = scala.collection.mutable.Set.empty[Long]
    docs.foreach { case (id, t) =>
      if (!seenTexts.contains(t)) { // exact dedup runs first
        seenTexts += t
        val s = refSigs(t)
        val nd = seenSigs.exists(p => p.zip(s).count { case (x, y) => x == y } >= m)
        seenSigs += s
        if (!nd) out += id
      }
    }
    out.toSet
  }

  private def genDocs(seed: Long, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "mu", "nu", "xi", "pi", "rho", "tau")
    (0 until n).map { i =>
      val len = 6 + rnd.nextInt(6)
      val toks = Seq.fill(len)(vocab(rnd.nextInt(vocab.size)))
      (i.toLong, toks.mkString(" "))
    }
  }

  private def df(rows: Seq[(Long, String)]): DataFrame =
    spark.createDataFrame(java.util.Arrays.asList(rows.map { case (id, t) =>
      Row(id, t, "en", "srcX", t.length.toLong)
    }: _*), inSchema)

  test("random corpora, random chunkings: ingest == sequential reference") {
    for (seed <- Seq(11L, 23L, 47L)) {
      val docs = genDocs(seed, 40)
      val expect = refAccepted(docs, 6)
      val rnd = new scala.util.Random(seed * 31)
      // random chunking into 1-4 batches, arrival order preserved
      val cuts = (0 +: Seq.fill(rnd.nextInt(3))(rnd.nextInt(docs.size)).sorted
        :+ docs.size).distinct.sorted
      val root = tmpDir(s"ndr_$seed") + "/s"
      val ing = new CorpusIngest(root, nearDupMinSig = Some(6))
      cuts.sliding(2).zipWithIndex.foreach { case (Seq(a, b), bi) =>
        if (b > a) ing.ingestBatch(df(docs.slice(a, b)), bi.toLong)
      }
      val got = ing.corpus(spark).collect().map(_.getLong(0)).toSet
      assert(got === expect,
        s"seed=$seed cuts=$cuts: ingest ${got.toSeq.sorted} != " +
          s"reference ${expect.toSeq.sorted}")
      ing.destroy()
    }
  }

  test("stricter m=8 only drops exact signature twins") {
    val docs = genDocs(101L, 30)
    val expect = refAccepted(docs, 8)
    val root = tmpDir("ndr_m8") + "/s"
    val ing = new CorpusIngest(root, nearDupMinSig = Some(8))
    ing.ingestBatch(df(docs.take(15)), 0L)
    ing.ingestBatch(df(docs.drop(15)), 1L)
    assert(ing.corpus(spark).collect().map(_.getLong(0)).toSet === expect)
    ing.destroy()
  }
}
