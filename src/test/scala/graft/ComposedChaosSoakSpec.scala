package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.{BucketedReplica, CdcStream, CorpusIngest, IncrementalAgg, IvfIndex, StoreIO}

/** Long-horizon COMPOSED chaos soak — every other stress suite exercises
  * one store; this one runs the full training-data pipeline per step
  * (CorpusIngest clean → quality/exact/near-dup reject → LshIndex, an
  * IvfIndex follow, and the multi-table fan-out with per-table agg views
  * and the consistent-frontier marker) for many batches with:
  *
  *   - randomized INJECTED crashes mid-step (control-plane deaths at
  *     seeded-random mutation counts, torn writes included) healed by
  *     redelivering the same step — the checkpointed-source contract;
  *   - racing MAINTENANCE between steps (reband/compact on the LSH,
  *     recenter/compact on the IVF, the ingest's seen-store fold), itself
  *     crash-injected at random;
  *   - quiesced-window vacuum() calls under the enforced lease.
  *
  * The convergence oracle is ALGEBRAIC, not a replay: every store here
  * claims batch-composition invariance (first-arrival dedup is min-id per
  * hash; the near-dup rule keeps rejected docs' signatures probe-visible
  * precisely so chunking cannot change verdicts; reband/recenter derive
  * postings/assignments wholesale from the stored primitive; latest-wins
  * replica merge is an order-free fold; the agg view is audited against a
  * recompute of live state). So the N-step chaos build must equal a
  * ONE-SHOT build that ingests everything as a single batch — a stronger
  * statement than equality with an N-step crash-free control, and O(1)
  * oracle cost instead of O(N).
  *
  * Step count: `GRAFT_SOAK_STEPS=N sbt "testOnly graft.ComposedChaosSoakSpec"`
  * (env var — sbt forks the test JVM, so a `-D` on the sbt launcher
  * would not reach it; the environment does). Default sized to keep
  * `sbt test` inside its wall budget; 200 is the full soak — the loop
  * is linear in N and nothing else changes. */
class ComposedChaosSoakSpec extends SparkSpecBase {

  private val steps = sys.env.get("GRAFT_SOAK_STEPS")
    .orElse(sys.props.get("graft.soak.steps"))
    .flatMap(_.toIntOption).getOrElse(48)

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** 8 docs per batch, engineered to exercise every reject lane:
    * a 4-sentence pool makes cross-batch EXACT dups (same pool+tail),
    * tails make NEAR dups (same pool, different tail — high MinHash
    * agreement), markup noise on every 3rd doc makes cleaning
    * load-bearing for both, and every 8th doc is a quality reject. */
  private def docs(spark: SparkSession, i: Long): DataFrame = {
    val pools = Seq(
      "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
        "kilo lima mike november oscar papa quebec romeo sierra tango",
      "one two three four five six seven eight nine ten eleven twelve " +
        "thirteen fourteen fifteen sixteen seventeen eighteen nineteen",
      "red orange yellow green blue indigo violet crimson amber teal " +
        "magenta cyan maroon olive navy silver golden copper bronze",
      "north south east west up down left right forward backward " +
        "inward outward clockwise widdershins sunwise leftward rightward")
    val rows = (0 until 8).map { j =>
      val id = i * 8 + j
      val base =
        if (j == 7) "" // quality reject: empty after cleaning
        else {
          val t = s"${pools((id % 4).toInt)} tail${id % 7}"
          // cleans back to exactly t — dedup must see through the markup
          if (id % 3 == 0) s"<p>  <b>$t</b> </p>" else t
        }
      Row(id, base, "en", s"src${id % 3}", base.length.toLong)
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), docSchema)
  }

  /** The one-shot twin: all batches' docs as a single frame. */
  private def allDocs(spark: SparkSession): DataFrame =
    (0L until steps.toLong).map(docs(spark, _)).reduce(_ unionByName _)

  private val fanTbls = Seq("events", "pets")

  /** Two-table envelope batch for the fan-out lane (6 rows per table). */
  private def fanBatch(spark: SparkSession, i: Long): DataFrame = {
    val rows = for {
      (t, ti) <- fanTbls.zipWithIndex
      j <- 0 until 6
    } yield {
      val uid = (i * 6 + j + ti * 3) % 13
      val op = if ((i + j + ti) % 7 == 0) "DELETE"
        else if (j % 2 == 0) "INSERT" else "UPDATE"
      Row(op, t, i * 100 + ti * 10 + j, (i * 100 + ti * 10 + j) * 1000L,
        uid, (i + j) * 1.25, s"e${(i + j) % 3}")
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*),
      CdcStream.envelopeSchema)
  }

  private def auditOk(df: DataFrame, what: String): Unit =
    df.collect().foreach(r => assert(r.getBoolean(1),
      s"$what audit check ${r.getString(0)} failed: ${r.getString(2)}"))

  test(s"composed soak, $steps chaos batches vs the one-shot algebraic " +
    "control: ingest + LSH + IVF + fan-out views converge exactly, every " +
    "audit and fsck green, vacuum reclaims the accumulated wreckage") {
    val rnd = new scala.util.Random(20260816L)
    val root = tmpDir("soak")
    val ingest = new CorpusIngest(s"$root/ingest",
      cleanInput = true, nearDupMinSig = Some(6))
    val ivf = new IvfIndex(s"$root/ivf")
    ivf.create(KillStoreSteps.ivfCents(spark, 0))

    var fanApplied = -1L // fan-out lane runs every 4th step, own id series
    def step(i: Long): Unit = {
      ingest.ingestBatch(docs(spark, i), i)
      ivf.addBatch(KillStoreSteps.ivfVecs(spark, i), i)
      if (i % 4 == 3) {
        val fi = i / 4
        CdcStream.applyTablesWithAggViews(fanBatch(spark, fi), fi,
          s"$root/reps", s"$root/aggs", s"$root/staging", s"$root/dlq")
        fanApplied = fi
      }
    }
    def maintenance(pick: Int): Unit = pick % 5 match {
      // reband only between bandings LOSSLESS for the ingest's minSig=6
      // probe (2 mismatching components break ≤2 bands, so ≥6/8 always
      // keeps a full band under 2x4 or 1x8 — NOT under 4x2): near-dup
      // verdicts must stay banding-independent or the one-shot control
      // comparison would be measuring the banding, not the chaos
      case 0 => ingest.lsh.reband(spark, if (pick % 2 == 0) 1 else 2,
        if (pick % 2 == 0) 8 else 4)
      case 1 => ingest.lsh.compact(spark)
      case 2 => ivf.recenter(spark, KillStoreSteps.ivfCents(spark, pick % 2))
      case 3 => ivf.compact(spark)
      case 4 => ingest.compact(spark) // quiesced: we are between steps
    }

    // run `op` with an optional injected crash (control-plane death at a
    // random mutation count, torn half the time), then redeliver to done —
    // the crash-accumulation discipline of RandomizedCrashRecoverySpec,
    // here over the COMPOSED step
    var crashes = 0
    def chaotically(what: String, inject: Boolean)(op: => Unit): Unit = {
      var attempts = 0
      var done = false
      while (!done) {
        attempts += 1
        assert(attempts <= 6, s"$what did not converge after 5 redeliveries")
        // k sized to the COMPOSED step's control-plane op count (parquet
        // writes don't route through StoreIO): a plain step commits ~4-6
        // mutations (lsh + ivf log commits), a fan-out step dozens
        val armed = inject && attempts == 1
        if (armed) StoreIO.Faults.armAt(root, 1 + rnd.nextInt(8),
          torn = rnd.nextBoolean())
        var err: Option[Throwable] = None
        try { op; done = true }
        catch { case t: Throwable => err = Some(t) }
        val (fired, _) = StoreIO.Faults.disarm()
        err.foreach { t =>
          if (!fired) throw t // a real failure, not our injection
          crashes += 1; done = false
        }
      }
    }

    (0L until steps.toLong).foreach { i =>
      chaotically(s"step $i", inject = rnd.nextInt(4) == 0)(step(i))
      if (i % 7 == 3)
        chaotically(s"maintenance@$i", inject = rnd.nextInt(2) == 0)(
          maintenance(rnd.nextInt(1000)))
      if (i % 13 == 5) { // quiesced vacuum window under the enforced lease
        ingest.lsh.vacuum(); ivf.vacuum(); ()
      }
      if (i % 16 == 9) { // periodic health gates, not just at the end
        auditOk(ingest.lsh.audit(spark), s"lsh@$i")
        auditOk(ivf.audit(spark), s"ivf@$i")
      }
    }
    assert(crashes >= steps / 12,
      s"only $crashes injected crashes across $steps steps — the soak " +
        "is not exercising the crash axis (reseed or raise the rate)")
    info(s"$steps composed steps, $crashes injected crashes, " +
      s"maintenance races + vacuum windows interleaved")

    // ---- the one-shot algebraic control --------------------------------
    val ctl = tmpDir("soak_ctl")
    val ctlIngest = new CorpusIngest(s"$ctl/ingest",
      cleanInput = true, nearDupMinSig = Some(6))
    ctlIngest.ingestBatch(allDocs(spark), 0L)
    val ctlIvf = new IvfIndex(s"$ctl/ivf")
    ctlIvf.create(KillStoreSteps.ivfCents(spark, 0))
    ctlIvf.addBatch((0L until steps.toLong)
      .map(KillStoreSteps.ivfVecs(spark, _)).reduce(_ unionByName _), 0L)
    (0L to fanApplied).foreach(fi =>
      CdcStream.applyTablesWithAggViews(fanBatch(spark, fi), fi,
        s"$ctl/reps", s"$ctl/aggs", s"$ctl/staging", s"$ctl/dlq"))

    // align the derived layouts, then compare logical state exactly
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
      "near-dup verdicts are not chunking-invariant under chaos")
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

    // fan-out lane: frontier at its own horizon, per-table replica + view
    // equal to the control replay, every integrity surface green
    assert(CdcStream.appliedFrontier(s"$root/reps") === Some(fanApplied))
    fanTbls.foreach { t =>
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
    // the SQL fsck twin reaches the same tables cold
    val cold = spark.newSession()
    cold.conf.set("spark.sql.catalog.graft", "graft.plans.GraftCatalog")
    cold.conf.set("spark.sql.catalog.graft.root", s"$root/reps")
    assert(cold.sql(s"SELECT * FROM graft_fsck('${fanTbls.head}')")
      .filter(!col("ok")).isEmpty, "cold graft_fsck found failures")

    // final quiesced vacuum: the chaos run's accumulated wreckage is
    // reclaimable, and the stores audit green with zero orphans after
    val reclaimed = ingest.lsh.vacuum() ++ ivf.vacuum()
    info(s"final vacuum reclaimed ${reclaimed.size} wreckage paths")
    Seq("lsh" -> ingest.lsh.audit(spark), "ivf" -> ivf.audit(spark))
      .foreach { case (w, rep) =>
        auditOk(rep, s"final $w")
        val orphans = rep.filter(col("check") === "orphan_partitions")
          .collect()(0).getString(2)
        assert(orphans === "0", s"final $w audit still reports $orphans orphans")
      }
  }
}
