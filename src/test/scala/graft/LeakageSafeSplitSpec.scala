package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Randomized differential for e113_leakage_safe_split: on corpora of random
  * base docs plus perturbed near-copies (1 of ~10 tokens changed → 3-gram
  * shingle Jaccard ≈ 0.54 ≥ 0.5, a verified edge), the query's per-split
  * volumes, cluster counts, and leak counts must equal an independent
  * plain-Scala reference (JDK md5 shingle hashes, exact-Jaccard edges,
  * union-find closure, the same component-label hash split) — and the leak
  * count must be ZERO by construction, on every corpus, while the same
  * reference shows a doc-id-hash split WOULD leak those pairs. Seeds fixed —
  * failures reproduce. */
class LeakageSafeSplitSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Independent tokenHash twin: int(md5(t)[0:8], 16), as in the engine's
    * conv(substring(md5, 1, 8), 16, 10). */
  private def h(t: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(8)
    java.lang.Long.parseLong(hex, 16)
  }

  private def shingles(text: String): Set[Long] =
    text.split(" ").toSeq.sliding(3).filter(_.size == 3)
      .map(w => h(w.mkString(" "))).toSet

  /** Sequential reference: exact shingle-Jaccard ≥ 0.5 edges over all pairs
    * (the spec corpus is small; the engine's inverted index prunes, never
    * changes, this set), union-find closure with min-doc_id labels, split =
    * md5-hash of the component label's decimal string mod 100. */
  private def reference(docs: Seq[(Long, String)])
      : (Map[Long, Long], Set[(Long, Long)]) = {
    val sh = docs.map { case (id, t) => id -> shingles(t) }.toMap
    val ids = docs.map(_._1)
    val edges = for {
      i <- ids.indices; j <- (i + 1) until ids.size
      a = ids(i); b = ids(j)
      if sh(a).nonEmpty && sh(b).nonEmpty
      inter = (sh(a) & sh(b)).size
      if inter.toDouble / (sh(a).size + sh(b).size - inter) >= 0.5
    } yield (math.min(a, b), math.max(a, b))
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (ids.map(i => i -> find(i)).toMap, edges.toSet)
  }

  private def split(label: Long): String = {
    val v = h(label.toString) % 100
    if (v < 80) "train" else if (v < 90) "val" else "test"
  }

  /** Base docs from a 40-word vocabulary (random pairs rarely clear 0.5
    * shingle Jaccard) plus perturbed copies (one mid-token swapped: Jaccard
    * ≈ 0.54, a guaranteed verified edge), plus a couple of sub-3-token docs
    * to exercise the singleton path. */
  private def gen(seed: Long, nBase: Int, nCopies: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = (0 until 40).map(i => s"w$i")
    val base = (0 until nBase).map { i =>
      val len = 8 + rnd.nextInt(5)
      i.toLong -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val copies = (0 until nCopies).map { i =>
      val (_, t) = base(rnd.nextInt(nBase))
      val w = t.split(" ").toBuffer
      // even copies: last token swapped — exactly one shingle changes, so
      // J=(n-1)/(n+1) >= 0.5 ALWAYS, a guaranteed verified edge. Odd
      // copies: middle token swapped — 3 shingles change, which clears 0.5
      // only for the longer docs: real sub-threshold boundary cases.
      val p = if (i % 2 == 0) w.size - 1 else w.size / 2
      w(p) = vocab(rnd.nextInt(vocab.size))
      (1000L + i) -> w.mkString(" ")
    }
    base ++ copies :+ (2000L -> "w0 w1") :+ (2001L -> "w2")
  }

  private def writeFixture(docs: Seq[(Long, String)]): String = {
    val dir = tmpDir("e113")
    spark.createDataFrame(java.util.Arrays.asList(docs.map { case (id, t) =>
      Row(id, t, "en", "srcX", t.length.toLong)
    }: _*), schema).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("hot-bucket cap: a giant identical cluster's m² pair blowup is cut " +
    "while small buckets are untouched, and capped ⊆ uncapped") {
    import spark.implicits._
    // 20 IDENTICAL shingle sets → identical signatures → one 20-doc bucket
    // in EVERY band (the boilerplate-cluster shape); plus one small pair
    val hotCluster = (0 until 20).map(i => (100L + i, Seq(1L, 2L, 3L, 4L, 5L)))
    val smallPair = Seq((1L, Seq(10L, 11L, 12L)), (2L, Seq(10L, 11L, 12L)))
    val sets = (hotCluster ++ smallPair).toDF("doc_id", "g")
    def pairs(cap: Long): Set[(Long, Long)] =
      Extensions.lshBandCandidates(sets, maxBucket = cap).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(128L)
    val capped = pairs(8L)
    // uncapped: all C(20,2)=190 hot pairs + the small pair
    assert(uncapped.size === 191)
    assert(uncapped.contains((1L, 2L)))
    // capped: the hot bucket (m=20 > 8) drops from every band; the small
    // bucket (m=2) is untouched
    assert(capped === Set((1L, 2L)))
    assert(capped.subsetOf(uncapped), "capping must only REMOVE candidates")
  }

  test("random perturbed-copy corpora: query == plain-Scala reference, " +
    "zero leaks by construction, doc-hash split would have leaked") {
    for (seed <- Seq(7L, 19L, 42L)) {
      val docs = gen(seed, 30, 12)
      val (comp, edges) = reference(docs)
      assert(edges.nonEmpty, s"seed=$seed generated no verified near-dup pair")

      // what the query must compute
      val bySplit = comp.groupBy { case (_, c) => split(c) }
      val expRows = bySplit.map { case (s, m) =>
        (s, m.size.toLong, m.values.toSet.size.toLong, 0L)
      }.toSet

      val dir = writeFixture(docs)
      val got = SparkEntry.queries("e113_leakage_safe_split")(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(got === expRows,
        s"seed=$seed: query $got != reference $expRows")
      assert(got.forall(_._4 == 0L), s"seed=$seed: leaked pairs in $got")

      // the discipline matters: a doc-id-hash split leaks on this corpus
      val docHashLeaks = edges.count { case (a, b) =>
        split(a) != split(b) // same hash family applied to doc ids
      }
      assert(docHashLeaks > 0,
        s"seed=$seed: corpus cannot distinguish the split disciplines")
    }
  }

  test("dense corpus (chained copies merging clusters): still exact and leak-free") {
    // copies of copies chain components together — deeper closures than the
    // star shapes of the randomized test
    val rnd = new scala.util.Random(99L)
    val vocab = (0 until 40).map(i => s"w$i")
    val base = (0 until 12).map { i =>
      val len = 9 + rnd.nextInt(4)
      i.toLong -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    var pool = base
    val chained = (0 until 25).map { i =>
      val (_, t) = pool(rnd.nextInt(pool.size))
      val w = t.split(" ").toBuffer
      w(w.size - 1) = vocab(rnd.nextInt(vocab.size)) // guaranteed edge
      val d = (3000L + i) -> w.mkString(" ")
      pool = pool :+ d // next copy may perturb THIS copy
      d
    }
    val docs = base ++ chained
    val (comp, edges) = reference(docs)
    assert(edges.nonEmpty && comp.values.toSet.size < docs.size)
    val expRows = comp.groupBy { case (_, c) => split(c) }.map { case (s, m) =>
      (s, m.size.toLong, m.values.toSet.size.toLong, 0L)
    }.toSet
    val got = SparkEntry.queries("e113_leakage_safe_split")(spark, writeFixture(docs))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === expRows, s"query $got != reference $expRows")
  }
}
