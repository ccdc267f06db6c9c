package graft

import org.apache.spark.sql.functions._

/** Mutual-consistency gates across the dedup/audit query family. Every
  * query is individually oracle-gated (Verify ≡ DuckDB), but nothing
  * there stops two green queries from quietly disagreeing about the SAME
  * underlying quantity — e.g. the e59 histogram drifting off the e21
  * labels it summarizes after a refactor touches one but not the other.
  * These tests pin the cross-query contracts a downstream pipeline
  * actually composes on:
  *
  *  - e59's size histogram IS the e21 component table, aggregated;
  *  - e101's per-language effective dataset size IS Σ ⌊10⁹/k⌋ over the
  *    e21 cluster sizes;
  *  - e115's final checkpoint and e52's raw funnel stage agree on the
  *    corpus totals, and both match the raw table;
  *  - e22 and e113 split volumes each cover the corpus exactly.
  */
class CrossQueryConsistencySpec extends SparkSpecBase {

  private def q(n: String) = SparkEntry.queries(n)(spark, sfDir)
  private lazy val nDocs = Tables.load(spark, sfDir, "documents").count()

  test("e59 cluster-size histogram ≡ e21 component table, aggregated") {
    val comp = q("e21_dedup_components").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val hist = q("e59_cluster_sizes").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nClusters = hist.map(_._2).sum
    assert(hist.map { case (s, n, _) => s * n }.sum === comp.length.toLong,
      "histogram mass != labeled docs")
    assert(nClusters === comp.map(_._2).distinct.length.toLong,
      "cluster count != distinct labels")
    assert(comp.count(_._3).toLong === nClusters,
      "canonical-doc count != cluster count")
    hist.foreach { case (s, n, r) =>
      assert(r === (s - 1) * n, s"docs_removable wrong for size-$s row") }
    val fromLabels = comp.groupBy(_._2).map(_._2.length.toLong)
      .groupBy(identity).map { case (s, g) => (s, g.size.toLong) }
    assert(fromLabels === hist.map { case (s, n, _) => (s, n) }.toMap,
      "histogram shape != label-derived shape")
  }

  test("e101 per-language effective size ≡ Σ floor(1e9/k) over e21 clusters") {
    val comp = q("e21_dedup_components").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val k = comp.groupBy(_._2).map { case (c, g) => (c, g.length.toLong) }
    val lang = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val expect = comp.groupBy(p => lang(p._1)).map { case (lg, ds) =>
      (lg, ds.map(p => 1000000000L / k(p._2)).sum) }
    val got = q("e101_dup_weights").collect()
      .map(r => (r.getString(0), r.getLong(3))).toMap
    expect.foreach { case (lg, v) =>
      assert(got.get(lg).contains(v), s"lang=$lg effective size ${got.get(lg)} != $v") }
  }

  test("e115 final checkpoint ≡ raw corpus totals ≡ e52 raw funnel stage") {
    val heaps = q("e115_heaps_curve").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(heaps.map(_._1).toSeq === (1 to 10))
    // cumulative columns must be monotone non-decreasing
    heaps.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 <= b._2 && a._3 <= b._3 && a._4 <= b._4) }
    val last = heaps.last
    assert(last._2 === nDocs, "final cum_docs != corpus size")
    val tk = Tables.load(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
    assert(last._3 === tk.count(), "final cum_tokens != raw instance count")
    assert(last._4 === tk.distinct().count(), "final cum_vocab != distinct types")
    val funnel = q("e52_yield_funnel").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(funnel.head === (("1_raw", nDocs, last._3)),
      "e52 raw stage disagrees with e115/corpus totals")
    funnel.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2 && b._3 <= a._3, "funnel stage not non-increasing") }
  }

  test("e22 and e113 split volumes each cover the corpus exactly") {
    assert(q("e22_split_assign").collect().map(_.getLong(2)).sum === nDocs)
    assert(q("e113_leakage_safe_split").collect().map(_.getLong(1)).sum === nDocs)
  }

  test("e116 ablation ≡ e81 rule suite, aggregated across languages") {
    val e81 = q("e81_gopher_rules").collect()
    val failByRule = Map(
      "1_len" -> e81.map(_.getLong(2)).sum,
      "2_word_len" -> e81.map(_.getLong(3)).sum,
      "3_stop_ratio" -> e81.map(_.getLong(4)).sum,
      "4_repetition" -> e81.map(_.getLong(5)).sum)
    val nPass = e81.map(_.getLong(6)).sum
    val abl = q("e116_gate_ablation").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(abl.map(_._1).sorted.toSeq === failByRule.keys.toSeq.sorted)
    abl.foreach { case (rule, nFail, nOnly, passIfDropped) =>
      assert(nFail === failByRule(rule), s"$rule n_fail != e81 rollup")
      assert(nOnly <= nFail, s"$rule marginal exceeds total")
      assert(passIfDropped === nPass + nOnly,
        s"$rule pass-if-dropped != e81 n_pass + marginal")
    }
    // marginal counts are disjoint doc sets, so they can never overshoot
    // the docs currently failing at least one rule
    assert(abl.map(_._3).sum <= nDocs - nPass)
  }

  // ---- similarity family (round 11): the recall/audit queries compose
  // on the SAME truth and candidate artifacts — pin them to each other.

  test("e58 ≡ e63's r2xb4 row: same artifacts, identical audit numbers") {
    val e58 = q("e58_lsh_recall").collect()
    assert(e58.length === 1)
    val a = e58.head
    val r2b4 = q("e63_lsh_sweep").collect()
      .filter(_.getString(0) == "r2xb4")
    assert(r2b4.length === 1)
    val b = r2b4.head
    // n_truth, n_cand, tp — and the derived doubles bit-for-bit (same
    // integer inputs, same one-division arithmetic)
    assert(a.getLong(0) === b.getLong(1), "n_truth differs")
    assert(a.getLong(1) === b.getLong(2), "n_cand differs")
    assert(a.getLong(2) === b.getLong(3), "tp differs")
    assert(java.lang.Double.doubleToRawLongBits(a.getDouble(5)) ===
      java.lang.Double.doubleToRawLongBits(b.getDouble(4)), "precision differs")
    assert(java.lang.Double.doubleToRawLongBits(a.getDouble(6)) ===
      java.lang.Double.doubleToRawLongBits(b.getDouble(5)), "recall differs")
  }

  test("e58 counts ≡ direct recount of the truth/candidate artifacts") {
    val truth = Extensions.sampledTruthPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Extensions.lshCandidates(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = q("e58_lsh_recall").collect().head
    assert(a.getLong(0) === truth.size.toLong, "n_truth != artifact")
    assert(a.getLong(1) === cand.size.toLong, "n_cand != artifact")
    assert(a.getLong(2) === (truth & cand).size.toLong, "tp != |truth ∩ cand|")
    assert(a.getLong(3) === (cand -- truth).size.toLong, "fp")
    assert(a.getLong(4) === (truth -- cand).size.toLong, "fn")
  }

  test("e06 top-10 ≡ the e111-style windowed brute-force truth for probe 0") {
    // e06 ranks via orderBy+limit, e111's truth via row_number over a
    // window — two ranking paths that MUST agree on ties and scores for
    // any shared probe. Probe 0 is e06's.
    graft.functions.VectorExpressions.register(spark)
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.load(spark, sfDir, "embeddings")
    val probe = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("pid"), col("embedding").as("pemb"))
    val wt = Window.partitionBy(col("pid"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    val truth10 = emb.crossJoin(broadcast(probe))
      .filter(col("vec_id") =!= col("pid"))
      .select(col("pid"), col("vec_id"),
        Similarity.cosine(col("embedding"), col("pemb")).as("sim"))
      .withColumn("rn", row_number().over(wt)).filter(col("rn") <= 10)
      .orderBy(col("rn"))
      .collect().map(r => (r.getLong(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2))))
    val e06 = q("e06_cosine_topk").collect().map(r => (r.getLong(0),
      java.lang.Double.doubleToRawLongBits(r.getDouble(2))))
    assert(e06.toSeq === truth10.toSeq,
      "e06's orderBy+limit ranking disagrees with the e111 window ranking")
  }

  test("e111 self-consistency: recall arithmetic and candidate bounds") {
    val rows = q("e111_ann_recall").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 4L))
    val nEmb = Tables.load(spark, sfDir, "embeddings").count()
    rows.foreach { case (np, nProbes, nCand, nHits, rec) =>
      assert(rec === math.rint(nHits.toDouble / (nProbes * 10) * 1e6) / 1e6,
        s"nprobe=$np recall_at_10 != n_hits/(n_probes*10)")
      assert(nHits <= nProbes * 10, s"nprobe=$np hits exceed k*probes")
      assert(nCand <= nProbes * np * nEmb, s"nprobe=$np candidate overrun")
    }
    // nested candidate sets: counts and hits monotone in nprobe
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 <= b._3 && a._4 <= b._4, "nprobe sweep not monotone") }
  }

  test("e114b ≡ e114 where they overlap: bit-identical cosine, dominated " +
    "margins, and the real (non-)containment pinned") {
    def byPair(n: String) = q(n).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getDouble(3))))
      .toMap
    val dense = byPair("e114_bitext_margin")
    val buck = byPair("e114b_bitext_bucketed")
    // 1. overlap pairs — the same (x,y) accepted by both miners — must
    //    carry the IDENTICAL c6 cosine: both snap cos·10⁶ once through
    //    the same fold, so any drift here means the bucketed pipeline
    //    rescored rather than restricted.
    val ov = dense.keySet intersect buck.keySet
    assert(ov.nonEmpty, "no overlapping accepts — gate would be vacuous")
    ov.foreach { k =>
      assert(dense(k)._1 === buck(k)._1, s"cos_sim differs for pair $k") }
    // 2. on those overlap pairs the bucketed margin must DOMINATE the
    //    dense one: the NN-4 masses are sums over bucket-RESTRICTED
    //    neighborhoods, and on this fixture every omitted neighbor
    //    contributes a non-negative cosine, so restriction can only
    //    shrink the denominator (masses differ by design — the margins
    //    are NOT asserted equal).
    ov.foreach { k =>
      assert(buck(k)._2 >= dense(k)._2,
        s"bucketed margin below dense for pair $k") }
    // 3. provable dominance, not fixture luck: for every source x BOTH
    //    miners accept (with whatever partner), the dense partner's
    //    cosine >= the bucketed partner's — the dense forward-best is an
    //    argmax over a SUPERSET of the bucket-local candidates.
    val denseByX = dense.map { case ((x, _), (c, _)) => x -> c }
    val buckByX = buck.map { case ((x, _), (c, _)) => x -> c }
    val sharedX = denseByX.keySet intersect buckByX.keySet
    assert(sharedX.nonEmpty)
    sharedX.foreach { x =>
      assert(denseByX(x) >= buckByX(x),
        s"bucket-local best beats the dense best for x=$x") }
    // 4. the containment relationship, pinned HONESTLY: neither accept
    //    set contains the other. Bucketing LOSES sources (the dense-best
    //    partner sits out-of-bucket and the in-bucket replacement fails
    //    the ratio) and GAINS sources (restricted masses shrink both
    //    denominators, so borderline pairs clear 1.10). Both differences
    //    are nonempty on the fixtures — a blind "e114b ⊆ e114" claim
    //    would be false, which is exactly why it is not asserted.
    assert((denseByX.keySet diff buckByX.keySet).nonEmpty,
      "expected dense-only sources (out-of-bucket best partners)")
    assert((buckByX.keySet diff denseByX.keySet).nonEmpty,
      "expected bucketed-only sources (shrunken hubness denominators)")
  }

  test("e113b ≡ e113 structurally: both cover the corpus; the LSH twin's " +
    "edges are a subset, so it can only have MORE clusters") {
    val exact = q("e113_leakage_safe_split").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val lsh = q("e113b_leakage_split_lsh").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(exact.map(_._1).sorted.toSeq === Seq("test", "train", "val"))
    assert(lsh.map(_._1).sorted.toSeq === Seq("test", "train", "val"))
    // both splitters must place every document exactly once
    assert(exact.map(_._2).sum === nDocs, "e113 volumes don't cover the corpus")
    assert(lsh.map(_._2).sum === nDocs, "e113b volumes don't cover the corpus")
    // PROVABLE containment (unlike e114b's): e113 verifies EVERY
    // co-shingle pair with the same ≥0.5 predicate, and any e113b-accepted
    // edge shares ≥1 shingle — so e113b's verified edge set ⊆ e113's, and
    // closure over fewer edges can only merge less: total clusters are
    // monotone. (Equality on these fixtures means the 2×4 banding missed
    // nothing at the 0.5 threshold — also fine.)
    assert(lsh.map(_._3).sum >= exact.map(_._3).sum,
      "LSH-restricted closure produced FEWER clusters than the exact one — " +
        "its edge set cannot be a superset, so something rescored")
    // the exact splitter's leak count is constructively zero (its split
    // keys on its own closure); the LSH twin's leaks come only from edges
    // banding missed, and both engines computed the same misses
    assert(exact.map(_._4).sum === 0L, "e113 must be leak-free by construction")
  }
}
