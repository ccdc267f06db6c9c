package graft

/** Independent (driver-side Scala) recomputations of the round-3 text
  * pipeline operators — e39 dup-span scan, e40 BM25 retrieval, e41 bigram-LM
  * scoring — so correctness is proven against straight-line reference code,
  * not just the DuckDB oracle twin. */
class TextPipelineSpec extends SparkSpecBase {

  private def docs: Seq[(Long, Array[String])] =
    Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")).toSeq

  test("e39_dup_spans matches a straight-line rolling-window recount") {
    val got = Extensions.queries("e39_dup_spans")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    assert(got.forall(_._1.split(" ").length == 8))
    assert(got.forall(_._2 >= 2))
    // reference: all spans from all docs, counted in plain Scala
    val all = for {
      (id, ts) <- docs if ts.length >= 8
      i <- 0 to ts.length - 8
    } yield (ts.slice(i, i + 8).mkString(" "), id)
    val byDocs = all.groupBy(_._1).map { case (s, xs) =>
      s -> (xs.map(_._2).distinct.size.toLong, xs.size.toLong)
    }
    val expect = byDocs.toSeq.collect { case (s, (nd, no)) if nd >= 2 => (s, nd, no) }
      .sortBy { case (s, nd, no) => (-nd, -no, s) }.take(20)
    assert(got.toSeq == expect)
  }

  test("e40_bm25 top score matches a straight-line BM25 recomputation") {
    val terms = Seq("spark", "merge", "vector")
    val ds = docs
    val n = ds.size.toDouble
    val avgdl = ds.map(_._2.length.toLong).sum.toDouble / n
    val dft = terms.map(t => t -> ds.count(_._2.contains(t)).toDouble).toMap
    def score(ts: Array[String]): Double = {
      val s = terms.map { t =>
        val tf = ts.count(_ == t).toDouble
        if (tf == 0) 0.0
        else math.log(1.0 + (n - dft(t) + 0.5) / (dft(t) + 0.5)) *
          ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * ts.length / avgdl)))
      }.sum
      math.rint(s * 1e6) / 1e6
    }
    val got = Extensions.queries("e40_bm25")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.length == 10)
    // descending, tie-broken by doc_id
    assert(got.sliding(2).forall { case Array(a, b) =>
      a._2 > b._2 || (a._2 == b._2 && a._1 < b._1) })
    val byId = ds.toMap
    got.foreach { case (id, sc) =>
      assert(math.abs(sc - score(byId(id))) < 1e-6, s"doc $id")
    }
  }

  test("e42_dup_coverage matches a straight-line coverage recomputation") {
    val ds = docs.filter(_._2.length >= 8)
    val spanDocs = (for {
      (id, ts) <- ds; i <- 0 to ts.length - 8
    } yield (ts.slice(i, i + 8).mkString(" "), id))
    val dup = spanDocs.groupBy(_._1).collect {
      case (s, xs) if xs.map(_._2).distinct.size >= 2 => s
    }.toSet
    val expect = ds.map { case (id, ts) =>
      val cov = (for {
        i <- 0 to ts.length - 8
        if dup.contains(ts.slice(i, i + 8).mkString(" "))
        q <- i to i + 7
      } yield q).distinct.size
      (id, ts.length.toLong, cov.toLong,
        math.rint(cov.toDouble / ts.length * 1e6) / 1e6)
    }.sortBy { case (id, _, _, f) => (-f, id) }.take(25)
    val got = Extensions.queries("e42_dup_coverage")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expect)
    assert(got.exists(_._3 > 0)) // the metric is non-vacuous on the fixture
  }

  test("e41_bigram_lm matches a straight-line bigram-LM recomputation") {
    val ds = docs.filter(_._2.length >= 2)
    val bgs = ds.flatMap { case (_, ts) => ts.sliding(2).map(_.mkString(" ")) }
    val c2 = bgs.groupBy(identity).map { case (k, v) => k -> v.size.toDouble }
    val c1 = ds.flatMap { case (_, ts) => ts.dropRight(1) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toDouble }
    def avgLp(ts: Array[String]): Double = {
      // mirror the engine's exact-decimal sum: per-term round to 9, sum, /n
      val lps = ts.sliding(2).map { w =>
        val lp = math.log(c2(w.mkString(" ")) / c1(w(0)))
        BigDecimal(lp).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.toSeq
      val avg = (lps.sum / (ts.length - 1)).toDouble
      math.rint(avg * 1e6) / 1e6
    }
    val got = Extensions.queries("e41_bigram_lm")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 25)
    assert(got.sliding(2).forall { case Array(a, b) =>
      a._3 < b._3 || (a._3 == b._3 && a._1 < b._1) })
    val byId = ds.toMap
    got.foreach { case (id, nb, lp) =>
      assert(nb == byId(id).length - 1, s"doc $id n_bigrams")
      assert(math.abs(lp - avgLp(byId(id))) < 2e-6, s"doc $id avg_lp $lp vs ${avgLp(byId(id))}")
      assert(lp <= 0.0)
    }
  }
}
