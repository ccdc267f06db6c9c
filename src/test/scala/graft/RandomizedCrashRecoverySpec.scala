package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.streaming.{BucketedReplica, CdcStream, IncrementalAgg, LshIndex,
  StoreIO}

/** Crash ACCUMULATION stress — the axis the per-point sweeps
  * (CrashSweepSpec) don't cover: a long-lived pipeline that keeps
  * crashing and recovering, so every recovery runs against the GARBAGE of
  * all the previous ones (orphan attempt dirs, leaked pins, stale tmps,
  * duplicate-tagged versions) rather than against a pristine store.
  * Seeded RNG picks which steps crash and at which mutation; every crash
  * is a faithful process death ([[StoreIO.Faults]]: all later I/O under
  * the store fails, finally-block cleanup included), followed by the
  * redelivery a checkpointed stream would issue. The terminal state must
  * equal a NEVER-CRASHED control build, and the stores must stay
  * audit/fsck-clean throughout. */
class RandomizedCrashRecoverySpec extends SparkSpecBase {

  private def env(rows: Seq[(String, Long, Long, Double, String)]): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (o, pos, uid, v, e) =>
        Row(o, "users", pos, pos * 1000L, uid, v, e) }: _*),
      CdcStream.envelopeSchema)

  private def randomBatch(rnd: scala.util.Random, startPos: Long,
                          n: Int): Seq[(String, Long, Long, Double, String)] =
    (0 until n).map { i =>
      val op = rnd.nextInt(10) match {
        case 0 => "DELETE"
        case k if k < 5 => "INSERT"
        case _ => "UPDATE"
      }
      (op, startPos + i, rnd.nextInt(25).toLong,
        math.rint(rnd.nextDouble() * 10000) / 100, s"evt${rnd.nextInt(4)}")
    }

  /** Run `op`; with probability `pCrash` a process death is injected at a
    * random mutation index first, and the op is then re-run (the
    * redelivery) until it completes uninjected. Returns crashes seen. */
  private def withCrashes(rnd: scala.util.Random, root: String,
                          pCrash: Double)(op: () => Unit): Int = {
    var crashes = 0
    var delivered = false
    while (!delivered) {
      val inject = crashes < 3 && rnd.nextDouble() < pCrash
      if (inject) StoreIO.Faults.armAt(root, 1 + rnd.nextInt(14),
        torn = rnd.nextBoolean())
      try { op(); delivered = true }
      catch { case t: Throwable =>
        val (fired, _) = StoreIO.Faults.disarm()
        if (!fired) throw t // a real failure, not our injection
        crashes += 1
      }
      finally { StoreIO.Faults.disarm(); () }
    }
    crashes
  }

  test("20 exactly-once folds with random process deaths and redeliveries " +
    "converge to the never-crashed build (audit + fsck clean throughout)") {
    val rnd = new scala.util.Random(20260816L)
    val parent = tmpDir("rcrash_agg")
    val ctlParent = tmpDir("rcrash_agg_ctl")
    def agg(p: String) = new IncrementalAgg(
      new BucketedReplica(s"$p/replica", nBuckets = 4), s"$p/view")
    val batches = (0 until 20).map(b => randomBatch(rnd, 100L * b, 8))
    var totalCrashes = 0
    batches.zipWithIndex.foreach { case (b, i) =>
      totalCrashes += withCrashes(rnd, parent, pCrash = 0.45)(
        () => agg(parent).applyBatch(env(b), i.toLong))
      // the view must never lag silently, no matter the crash history
      assert(agg(parent).audit(spark).isEmpty,
        s"view lagged after batch $i (crash history: $totalCrashes)")
      // occasional maintenance between deliveries, crash-injected too
      if (i % 6 == 5) totalCrashes += withCrashes(rnd, parent, pCrash = 0.3)(
        () => new BucketedReplica(s"$parent/replica", nBuckets = 4)
          .compact(spark))
    }
    assert(totalCrashes >= 5, s"seed produced only $totalCrashes crashes — " +
      "the stress degenerated; adjust pCrash or seed")
    info(s"$totalCrashes injected process deaths across 20 folds")
    // terminal state ≡ the never-crashed control
    batches.zipWithIndex.foreach { case (b, i) =>
      agg(ctlParent).applyBatch(env(b), i.toLong) }
    def viewOf(p: String) = agg(p).read(spark)
      .collect().map(_.toString).sorted.toSeq
    def liveOf(p: String) = new BucketedReplica(s"$p/replica", nBuckets = 4)
      .live(spark).collect().map(_.toString).sorted.toSeq
    assert(liveOf(parent) === liveOf(ctlParent),
      "replica diverged from the never-crashed build")
    assert(viewOf(parent) === viewOf(ctlParent),
      "view diverged from the never-crashed build")
    val bad = new BucketedReplica(s"$parent/replica", nBuckets = 4)
      .fsck(spark).filter(!col("ok")).collect()
    assert(bad.isEmpty, s"fsck failures after the crash history: ${bad.mkString(";")}")
  }

  test("an LSH ingest with random process deaths, redeliveries, and a " +
    "crash-injected reband converges to the never-crashed build") {
    val rnd = new scala.util.Random(42L)
    val root = tmpDir("rcrash_lsh") + "/idx"
    val ctl = tmpDir("rcrash_lsh_ctl") + "/idx"
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 60)
    def slice(i: Int) = docs.filter(col("doc_id") % 6 === i)
    var crashes = 0
    (0 until 6).foreach { i =>
      crashes += withCrashes(rnd, root, pCrash = 0.5)(
        () => new LshIndex(root).addBatch(slice(i), i.toLong))
      if (i == 3) crashes += withCrashes(rnd, root, pCrash = 0.5)(
        () => new LshIndex(root).reband(spark, 4, 2))
    }
    crashes += withCrashes(rnd, root, pCrash = 0.5)(
      () => new LshIndex(root).compact(spark))
    assert(crashes >= 2, s"seed produced only $crashes crashes")
    info(s"$crashes injected process deaths across the ingest")
    val c = new LshIndex(ctl)
    (0 until 6).foreach { i =>
      c.addBatch(slice(i), i.toLong)
      if (i == 3) c.reband(spark, 4, 2)
    }
    c.compact(spark)
    def digest(r: String): Seq[String] = {
      val idx = new LshIndex(r)
      (idx.postings(spark).select("band", "bucket", "doc_id")
        .collect().map("P|" + _.toString) ++
        idx.pairs(spark).select("d1", "d2", "n_shared_bands")
          .collect().map("C|" + _.toString)).sorted.toSeq
    }
    assert(digest(root) === digest(ctl),
      "crash-recovered index diverged from the never-crashed build")
    val rep = new LshIndex(root).audit(spark)
      .filter(!col("ok") && col("check") =!= "orphan_partitions").collect()
    assert(rep.isEmpty, s"audit failures: ${rep.mkString(";")}")
    // the crash history's orphans are reclaimable and reclaim-only
    new LshIndex(root).vacuum()
    assert(digest(root) === digest(ctl), "vacuum touched committed state")
  }
}
