package graft

/** Randomized differential test for the PPJoin prefix filter (e55): on a
  * seeded corpus with planted near-duplicates, the prefix-filtered join
  * must return EXACTLY the pairs the dense all-pairs join returns at the
  * same threshold — losslessness of the prefix lemma as implemented, not
  * just as stated, and on data the fixed fixtures never exercise. The
  * reference is computed in plain Scala set arithmetic, sharing no code
  * with the query under test.
  */
class PrefixFilterPropertySpec extends SparkSpecBase {

  test("prefix-filtered join equals the dense join on a randomized corpus") {
    val rnd = new scala.util.Random(42)
    val vocab = (1 to 40).map(i => s"w$i")
    val base = (0 until 60).map { i =>
      val len = 5 + rnd.nextInt(20)
      (i.toLong, if (i % 2 == 0) "en" else "de",
        Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // planted near-dups: ~1/10 tokens rewritten, parity preserved so the
    // (orig, copy) pair survives the query's doc_id%2 sample
    val mutated = base.take(30).map { case (id, lang, text) =>
      val t2 = text.split(" ").map(t =>
        if (rnd.nextInt(10) == 0) vocab(rnd.nextInt(vocab.size)) else t)
      (id + 1000, lang, t2.mkString(" "))
    }
    val dir = tmpDir("prefix_prop")
    import spark.implicits._
    (base ++ mutated).toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("e55_jaccard_prefix")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    val sets = (base ++ mutated).filter(_._1 % 2 == 0).map { case (id, lang, text) =>
      (id, lang, text.split(" ").sliding(2).map(_.mkString(" ")).toSet)
    }
    val expected = (for {
      (i1, l1, s1) <- sets
      (i2, l2, s2) <- sets
      if l1 == l2 && i1 < i2
      inter = (s1 & s2).size
      if inter.toDouble / (s1.size + s2.size - inter) >= 0.5
    } yield (l1, i1, i2)).toSet

    assert(expected.nonEmpty, "generator must plant at least one qualifying pair")
    assert(got === expected,
      "prefix filtering must be lossless: dense and filtered results differ")
  }
}
