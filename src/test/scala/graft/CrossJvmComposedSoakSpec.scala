package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.{BucketedReplica, CdcStream, CorpusIngest, IncrementalAgg, IvfIndex}

/** The composed chaos soak promoted to TRUE process death — the last
  * daylight between [[ComposedChaosSoakSpec]]'s oracle (injected
  * control-plane crashes) and reality: a child JVM runs the full composed
  * pipeline step schedule (ingest fold + IVF + fan-out views + interleaved
  * reband / seen-store compaction), the parent SIGKILLs it at random
  * instants mid-step, relaunches from the ack floor (redelivering the one
  * possibly-torn step — the checkpointed-source contract), and the final
  * state must equal the ONE-SHOT algebraic control that ingests everything
  * as a single batch. Same convergence oracle as the in-process soak; what
  * this adds is the data-plane wreckage only a real kill produces
  * (half-committed parquet jobs, `_temporary` staging, torn part files). */
class CrossJvmComposedSoakSpec extends SparkSpecBase {

  private val rnd = new scala.util.Random(20260816L)

  private def auditOk(df: DataFrame, what: String): Unit =
    df.collect().foreach(r => assert(r.getBoolean(1),
      s"$what audit check ${r.getString(0)} failed: ${r.getString(2)}"))

  test("kill -9 the composed pipeline mid-step, redeliver, converge: " +
    "final state equals the one-shot algebraic control, audits green, " +
    "vacuum reclaims the kill wreckage") {
    val dir = tmpDir("xjvm_soak")
    val root = s"$dir/pipe"
    val ingest = new CorpusIngest(s"$root/ingest",
      cleanInput = true, nearDupMinSig = Some(6))
    val ivf = new IvfIndex(s"$root/ivf")
    ivf.create(KillStoreSteps.ivfCents(spark, 0))
    KillStoreSteps.composedStep(spark, root, ingest, ivf, 0L) // seed
    val progress = Paths.get(dir, "progress")
    Files.write(progress, "0".getBytes)
    var acked = 0L
    (1 to 2).foreach { round =>
      acked = KillStoreSteps.killRound("graft.CrossJvmKillComposedMain",
        Seq(root, progress.toString, acked.toString), s"$dir/soak$round.log",
        progress, acked, rnd.nextInt(800).toLong)
      assert(acked >= round, s"round $round: child acked nothing new")
    }
    // redeliver the possibly-torn frontier step and extend to the horizon
    // in-process (the parent is as valid a redeliverer as a relaunched
    // child — same ids, same deterministic schedule)
    val horizon = acked + 2
    ((acked + 1) to horizon).foreach(i =>
      KillStoreSteps.composedStep(spark, root, ingest, ivf, i))
    info(s"$acked steps acked under kills; horizon $horizon")

    // ---- the one-shot algebraic control ---------------------------------
    val ctl = tmpDir("xjvm_soak_ctl")
    val ctlIngest = new CorpusIngest(s"$ctl/ingest",
      cleanInput = true, nearDupMinSig = Some(6))
    ctlIngest.ingestBatch((0L to horizon)
      .map(KillStoreSteps.composedDocs(spark, _)).reduce(_ unionByName _), 0L)
    val ctlIvf = new IvfIndex(s"$ctl/ivf")
    ctlIvf.create(KillStoreSteps.ivfCents(spark, 0))
    ctlIvf.addBatch((0L to horizon)
      .map(KillStoreSteps.ivfVecs(spark, _)).reduce(_ unionByName _), 0L)
    val fanApplied = (0L to horizon).filter(_ % 3 == 2).map(_ / 3)
    fanApplied.foreach(fi =>
      CdcStream.applyTablesWithAggViews(KillStoreSteps.fanBatch(spark, fi), fi,
        s"$ctl/reps", s"$ctl/aggs", s"$ctl/staging", s"$ctl/dlq"))

    // align derived layouts, then compare logical state exactly
    ingest.lsh.reband(spark, 2, 4); ctlIngest.lsh.reband(spark, 2, 4)
    ivf.recenter(spark, KillStoreSteps.ivfCents(spark, 0))
    ctlIvf.recenter(spark, KillStoreSteps.ivfCents(spark, 0))

    def docSet(df: DataFrame): Seq[String] =
      df.select("doc_id", "text", "lang", "source")
        .collect().map(_.toString).sorted.toSeq
    assert(docSet(ingest.corpusCommitted(spark)) ===
      docSet(ctlIngest.corpus(spark)),
      "accepted corpus diverged from the one-shot build")
    assert(docSet(ingest.rejects(spark)) === docSet(ctlIngest.rejects(spark)),
      "quality-reject set diverged")
    def ndSet(ci: CorpusIngest): Seq[String] =
      ci.nearDupRejects(spark).select("doc_id", "partner", "n_sig_match")
        .collect().map(_.toString).sorted.toSeq
    assert(ndSet(ingest) === ndSet(ctlIngest),
      "near-dup verdicts are not kill-invariant")
    def lshDigest(ci: CorpusIngest): Seq[String] =
      (ci.lsh.postings(spark).select("band", "bucket", "doc_id")
        .collect().map("P|" + _.toString) ++
        ci.lsh.pairs(spark).select("d1", "d2", "n_shared_bands")
          .collect().map("C|" + _.toString) ++
        ci.lsh.sigs(spark).drop("batch_id").collect().map("S|" + _.toString))
        .sorted.toSeq
    assert(lshDigest(ingest) === lshDigest(ctlIngest),
      "LSH index diverged from the one-shot build")
    def assignment(x: IvfIndex): Seq[String] =
      x.index(spark).select("vec_id", "cid")
        .collect().map(_.toString).sorted.toSeq
    assert(assignment(ivf) === assignment(ctlIvf), "IVF assignment diverged")

    // fan-out lane: frontier, replicas, views — equal and audit-clean
    assert(CdcStream.appliedFrontier(s"$root/reps") === Some(fanApplied.max))
    Seq("events", "pets", "users").foreach { t =>
      def live(r: String) = new BucketedReplica(s"$r/$t").live(spark)
        .select("user_id", "value", "event_type")
        .collect().map(_.toString).sorted.toSeq
      assert(live(s"$root/reps") === live(s"$ctl/reps"), s"$t replica diverged")
      def view(base: String) = new IncrementalAgg(
        new BucketedReplica(s"$base/reps/$t"), s"$base/aggs/$t").read(spark)
        .collect().map(_.toString).sorted.toSeq
      assert(view(root) === view(ctl), s"$t reporting view diverged")
      assert(new IncrementalAgg(new BucketedReplica(s"$root/reps/$t"),
        s"$root/aggs/$t").audit(spark).isEmpty, s"$t view audit not clean")
      val bad = new BucketedReplica(s"$root/reps/$t").fsck(spark)
        .filter(!col("ok")).collect()
      assert(bad.isEmpty, s"$t fsck failures: ${bad.mkString(";")}")
    }

    // the kill wreckage is reclaimable and the stores audit green after
    val reclaimed = ingest.vacuum() ++ ivf.vacuum()
    info(s"final vacuum reclaimed ${reclaimed.size} wreckage paths")
    auditOk(ingest.audit(spark), "final ingest")
    auditOk(ivf.audit(spark), "final ivf")
  }
}

/** Child: the composed pipeline step loop (see KillStoreSteps.composedStep). */
object CrossJvmKillComposedMain {
  def main(args: Array[String]): Unit = {
    val Array(root, progress, startS) = args
    val spark = KillStoreSteps.childSession()
    val ingest = new CorpusIngest(s"$root/ingest",
      cleanInput = true, nearDupMinSig = Some(6))
    val ivf = new IvfIndex(s"$root/ivf")
    KillStoreSteps.ackLoop(startS.toLong, progress.toString)(i =>
      KillStoreSteps.composedStep(spark, root, ingest, ivf, i))
  }
}
