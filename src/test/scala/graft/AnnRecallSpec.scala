package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions

/** Measured ANN quality (not just plumbing): recall@5 of the IVF index —
  * k-means centroids (sampled seeds + 2 Lloyd iterations), nprobe=2 —
  * against exact brute-force cosine top-5 on the sf0.01 embeddings corpus.
  *
  * The fixture vectors are weakly clustered (near-random), which bounds what
  * ANY partition-based ANN can achieve: measured sweep on this corpus gives
  * recall ≈ probed-fraction × ~1.6 (k=8 nprobe=2 → 0.400 recall at 0.25 of
  * the corpus probed; nprobe=3 → 0.500 at 0.375). The pipeline is fully
  * deterministic (hash-sampled seeds, no RNG), so the measured value is
  * stable; the assertions pin (a) an absolute floor below it and (b) that
  * the index genuinely beats random pruning — recall must exceed the probed
  * fraction, which is what an uninformative index would score. */
class AnnRecallSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.01"
  private def cos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    Similarity.cosine(a, b)

  test("IVF (k-means centroids, nprobe=2) recall@5 beats floor and random-pruning baseline") {
    VectorExpressions.register(spark)
    val emb = Tables.load(spark, dir, "embeddings")
    val probes = emb.filter(col("vec_id") % 37 === 1)
      .select(col("vec_id").as("pid"), col("embedding").as("pemb"))
    assert(probes.count() >= 5)

    def top5(pairs: DataFrame): Set[(Long, Long)] = {
      val w = Window.partitionBy(col("pid"))
        .orderBy(col("sim").desc, col("vec_id").asc)
      pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select("pid", "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }

    // exact ground truth: every probe against the full corpus
    val truth = top5(emb.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("pid"))
      .select(col("pid"), col("vec_id"),
        cos(col("embedding"), col("pemb")).as("sim")))

    // IVF: train centroids, assign corpus, probe its 2 nearest clusters only
    val cents = Similarity.kmeansCentroids(spark, emb, k = 8, iters = 2)
    assert(cents.count() === 8)
    val assigned = Similarity.ivfAssign(emb, cents).persist()
    val wp = Window.partitionBy(col("pid")).orderBy(col("csim").desc, col("cid").asc)
    val probeCids = probes.crossJoin(broadcast(cents))
      .select(col("pid"), col("pemb"), col("cid"),
        cos(col("pemb"), col("cemb")).as("csim"))
      .withColumn("rn", row_number().over(wp)).filter(col("rn") <= 2)
      .select(col("pid"), col("pemb"), col("cid"))
    val got = top5(assigned.join(probeCids, "cid")
      .filter(col("vec_id") =!= col("pid"))
      .select(col("pid"), col("vec_id"),
        cos(col("embedding"), col("pemb")).as("sim")))

    val perProbe = truth.groupBy(_._1).map { case (p, t) =>
      val hit = t.count(got.contains); hit.toDouble / t.size
    }
    val recall = perProbe.sum / perProbe.size
    // probed fraction: candidate pairs actually scored / full-scan pairs
    val corpusN = emb.count()
    val candN = assigned.join(probeCids.select("pid", "cid"), "cid").count()
    val frac = candN.toDouble / (corpusN * probes.count())
    info(f"recall@5 = $recall%.3f over ${perProbe.size} probes, probed $frac%.3f of corpus")
    assert(recall >= 0.35, f"recall@5 $recall%.3f below floor 0.35")
    // the index must beat random pruning: an uninformative index scores
    // recall ≈ probed fraction
    assert(recall > frac * 1.2,
      f"recall $recall%.3f vs probed fraction $frac%.3f — index adds no signal")
    assert(frac < 0.35, f"nprobe=2 probed $frac%.3f of the corpus — no pruning")
    assigned.unpersist()
  }

  test("e111 nprobe sweep: recall monotone in nested candidate sets, " +
    "every point beats its random-pruning baseline") {
    val rows = SparkEntry.queries("e111_ann_recall")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 4L))
    val nProbes = rows.head._2
    assert(nProbes > 0 && rows.forall(_._2 == nProbes))
    // internal consistency: the recall column IS hits/(probes*10)
    rows.foreach { case (_, np, _, hits, rec) =>
      assert(math.abs(rec - hits.toDouble / (np * 10)) < 1e-6)
    }
    // nested candidate sets (nprobe=1 ⊂ 2 ⊂ 4) + one shared total order
    // (sim desc, vec_id asc) make hits provably monotone: every truth row
    // precedes every non-truth row in that order, so top-10 of a superset
    // can only gain truth members. Candidate volume must grow too.
    assert(rows.sliding(2).forall { case Array(a, b) =>
      a._3 < b._3 && a._5 <= b._5 })
    // each sweep point must beat an uninformative index, which scores
    // recall ≈ probed fraction = nprobe/8 (measured margins 2.5×/2.1×/1.5×
    // at sf0.01 — the 1.2× floor leaves headroom, not slack)
    rows.foreach { case (np, _, _, _, rec) =>
      assert(rec > np / 8.0 * 1.2,
        f"nprobe=$np recall $rec%.3f ≤ 1.2× random-pruning ${np / 8.0}%.3f")
    }
  }
}
