package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.streaming.{BucketedReplica, CdcStream, CorpusIngest, IncrementalAgg, IvfIndex, LshIndex}

/** TRUE process-death chaos for the stores CrossJvmKillSpec does not
  * reach: the LSH/IVF index stores (append + online reband/recenter),
  * the catalog's DDL protocols (CREATE/DROP/commit cycles, DROP
  * NAMESPACE CASCADE), and the multi-table fan-out with per-table
  * reporting views and the consistent-frontier marker.
  *
  * Why kill -9 on top of the injected sweeps (CrashSweepSpec /
  * CatalogCrashSweepSpec): the in-process injector models every
  * CONTROL-PLANE prefix, but a SIGKILL inside a Spark parquet task
  * leaves data-plane wreckage the injector cannot produce — half-written
  * part files, `_temporary` staging, torn footers — exactly what these
  * stores' "pre-commit output is structurally invisible" arguments must
  * survive. The bar is the CrossJvmKillSpec bar: after every kill a
  * fresh reader sees exactly-pre-or-post state and audits green, nothing
  * durably ACKED is lost, the deterministic redelivery converges to the
  * never-crashed control, and vacuum reclaims the wreckage.
  *
  * Each child acks a step ONLY after its last durable call returned, so
  * a kill may eat at most the one unacked step — which the schedule then
  * redelivers with the same id, the checkpointed-source contract. */
class CrossJvmKillStoresSpec extends SparkSpecBase {

  private val rnd = new scala.util.Random(20260814L)

  private def killRound(cls: String, args: Seq[String], log: String,
                        progress: java.nio.file.Path, acked: Long): Long =
    KillStoreSteps.killRound(cls, args, log, progress, acked,
      rnd.nextInt(400).toLong)

  private def lshDigest(root: String): Seq[String] = {
    val idx = new LshIndex(root)
    (idx.postings(spark).select("band", "bucket", "doc_id")
      .collect().map("P|" + _.toString) ++
      idx.pairs(spark).select("d1", "d2", "n_shared_bands")
        .collect().map("C|" + _.toString) ++
      idx.sigs(spark).drop("batch_id").collect().map("S|" + _.toString))
      .sorted.toSeq
  }

  private def auditOk(df: DataFrame, what: String): Unit =
    df.collect().foreach(r => assert(r.getBoolean(1),
      s"$what audit check ${r.getString(0)} failed: ${r.getString(2)}"))

  test("kill -9 the LSH index's append + online reband loop: every " +
    "wreckage state audits green, acked batches keep their signatures, " +
    "and the redelivered schedule converges to the never-crashed control") {
    val dir = tmpDir("xjvm_lsh")
    val root = s"$dir/idx"
    new LshIndex(root).addBatch(KillStoreSteps.lshDocs(spark, 0L), 0L) // seed
    val progress = Paths.get(dir, "progress")
    var acked = 0L
    (1 to 2).foreach { round =>
      acked = killRound("graft.CrossJvmKillLshMain",
        Seq(root, progress.toString, acked.toString), s"$dir/lsh$round.log",
        progress, acked)
      assert(acked >= round, s"round $round: child acked nothing new")
      // fresh reader over the wreckage: all invariants hold, and every
      // acked batch's docs still carry stored signatures (signatures are
      // banding-independent, so they survive whatever rebands landed)
      val idx = new LshIndex(root)
      auditOk(idx.audit(spark), s"round $round")
      val sigDocs = idx.sigs(spark).select("doc_id").collect()
        .map(_.getLong(0)).toSet
      (0L to acked).foreach { i =>
        KillStoreSteps.lshDocs(spark, i).select("doc_id").collect()
          .map(_.getLong(0)).foreach(d => assert(sigDocs.contains(d),
            s"round $round: acked batch $i lost doc $d's signature"))
      }
    }
    // redeliver the schedule to a fixed horizon, land a known final
    // banding, and vacuum — the index must equal the never-crashed build
    val horizon = acked + 2
    ((acked + 1) to horizon).foreach(i =>
      KillStoreSteps.lshStep(new LshIndex(root), spark, i))
    new LshIndex(root).reband(spark, 2, 4)
    val reclaimed = new LshIndex(root).vacuum()
    info(s"$acked acked under kills; vacuum reclaimed ${reclaimed.size} paths")
    auditOk(new LshIndex(root).audit(spark), "post-vacuum")
    val ctlRoot = s"$dir/ctl"
    val ctl = new LshIndex(ctlRoot)
    (0L to horizon).foreach(i => ctl.addBatch(KillStoreSteps.lshDocs(spark, i), i))
    ctl.reband(spark, 2, 4)
    assert(lshDigest(root) === lshDigest(ctlRoot),
      "killed-and-redelivered index diverged from the never-crashed control")
  }

  test("kill -9 the IVF index's append + online recenter loop: wreckage " +
    "audits green, acked vectors stay searchable, redelivery converges") {
    val dir = tmpDir("xjvm_ivf")
    val root = s"$dir/idx"
    val seedIdx = new IvfIndex(root)
    seedIdx.create(KillStoreSteps.ivfCents(spark, 0))
    seedIdx.addBatch(KillStoreSteps.ivfVecs(spark, 0L), 0L)
    val progress = Paths.get(dir, "progress")
    var acked = 0L
    (1 to 2).foreach { round =>
      acked = killRound("graft.CrossJvmKillIvfMain",
        Seq(root, progress.toString, acked.toString), s"$dir/ivf$round.log",
        progress, acked)
      assert(acked >= round, s"round $round: child acked nothing new")
      val idx = new IvfIndex(root)
      auditOk(idx.audit(spark), s"round $round")
      val stored = idx.index(spark).select("vec_id").collect()
        .map(_.getLong(0)).toSet
      (0L to acked).foreach { i =>
        (0 until 8).foreach(j => assert(stored.contains(i * 8 + j),
          s"round $round: acked batch $i lost vector ${i * 8 + j}"))
      }
    }
    val horizon = acked + 2
    ((acked + 1) to horizon).foreach(i =>
      KillStoreSteps.ivfStep(new IvfIndex(root), spark, i))
    // land the known final generation, vacuum the wreckage, compare
    new IvfIndex(root).recenter(spark, KillStoreSteps.ivfCents(spark, 0))
    val reclaimed = new IvfIndex(root).vacuum()
    info(s"$acked acked under kills; vacuum reclaimed ${reclaimed.size} paths")
    auditOk(new IvfIndex(root).audit(spark), "post-vacuum")
    val ctlRoot = s"$dir/ctl"
    val ctl = new IvfIndex(ctlRoot)
    ctl.create(KillStoreSteps.ivfCents(spark, 0))
    (0L to horizon).foreach(i => ctl.addBatch(KillStoreSteps.ivfVecs(spark, i), i))
    ctl.recenter(spark, KillStoreSteps.ivfCents(spark, 0))
    def assignment(r: String): Seq[String] =
      new IvfIndex(r).index(spark).select("vec_id", "cid")
        .collect().map(_.toString).sorted.toSeq
    assert(assignment(root) === assignment(ctlRoot),
      "killed-and-redelivered assignment diverged from the control")
  }

  test("kill -9 the catalog's DDL loop (DROP + CREATE + commit, plus a " +
    "namespace CASCADE cycle): every table is fully visible and fsck-green " +
    "or an invisible remnant; the redelivered schedule converges") {
    val dir = tmpDir("xjvm_ddl")
    val wh = s"$dir/wh"
    KillStoreSteps.catalogOn(wh).createNamespace(Array("ns"), java.util.Map.of())
    val progress = Paths.get(dir, "progress")
    var acked = 0L
    (1 to 2).foreach { round =>
      acked = killRound("graft.CrossJvmKillDdlMain",
        Seq(wh, progress.toString, acked.toString), s"$dir/ddl$round.log",
        progress, acked)
      assert(acked >= round, s"round $round: child acked nothing new")
      // the crash-visibility contract, now under real data-plane wreckage:
      // a visible table opens with full contract and fsck-green content;
      // an invisible one must not open at all (remnants stay invisible)
      val cat = KillStoreSteps.catalogOn(wh)
      (0 until 4).foreach { s =>
        val id = Identifier.of(Array("ns"), s"t$s")
        if (cat.tableExists(id)) {
          val rep = BucketedReplica.open(s"$wh/ns/t$s")
          val bad = rep.fsck(spark).filter(!col("ok")).collect()
          assert(bad.isEmpty,
            s"round $round: visible ns.t$s fails fsck: ${bad.mkString(";")}")
          rep.read(spark).collect() // readable (0 rows = killed pre-commit)
        } else intercept[Exception] {
          BucketedReplica.open(s"$wh/ns/t$s")
        }
      }
      // scratch namespace (CASCADE-dropped every 3rd step): same contract
      val sid = Identifier.of(Array("scratch"), "s0")
      if (cat.tableExists(sid)) {
        val bad = BucketedReplica.open(s"$wh/scratch/s0")
          .fsck(spark).filter(!col("ok")).collect()
        assert(bad.isEmpty, s"round $round: scratch.s0 fails fsck")
      } else intercept[Exception] { BucketedReplica.open(s"$wh/scratch/s0") }
    }
    // the deterministic redelivery: one step per slot converges every
    // slot to its known final content, whatever the kills left behind
    val horizon = acked + 4
    ((acked + 1) to horizon).foreach(i =>
      KillStoreSteps.ddlStep(KillStoreSteps.catalogOn(wh), wh, spark, i))
    val cat = KillStoreSteps.catalogOn(wh)
    (0 until 4).foreach { s =>
      // the slot's last step in (acked, horizon] — every slot got exactly one
      val i = ((acked + 1) to horizon).filter(_ % 4 == s).max
      val rep = BucketedReplica.open(s"$wh/ns/t$s")
      assert(rep.fsck(spark).filter(!col("ok")).isEmpty)
      val got = rep.read(spark).select("user_id", "value")
        .collect().map(_.toString).sorted.toSeq
      val want = Cdc.merge(KillStoreSteps.ddlBatch(spark, i), Seq("user_id"))
        .select("user_id", "value").collect().map(_.toString).sorted.toSeq
      assert(got === want, s"slot t$s did not converge to step $i's content")
    }
    info(s"$acked steps acked under kills; converged at $horizon")
    // and the final CASCADE leaves nothing half-dropped
    assert(cat.dropNamespace(Array("ns"), true))
    assert(!new java.io.File(s"$wh/ns").exists(), "CASCADE left the dir")
  }

  test("kill -9 the multi-table fan-out with per-table agg views: the " +
    "consistent frontier never exposes a torn batch mid-crash, and the " +
    "redelivered stream self-heals every table and view") {
    val dir = tmpDir("xjvm_fanout")
    val root = s"$dir/reps"; val aggRoot = s"$dir/aggs"
    val staging = s"$dir/staging"; val dlq = s"$dir/dlq"
    val ctlDir = s"$dir/ctl"
    val tbls = Seq("events", "pets", "users")
    def applyMain(i: Long): Unit = CdcStream.applyTablesWithAggViews(
      KillStoreSteps.fanBatch(spark, i), i, root, aggRoot, staging, dlq)
    def applyCtl(i: Long): Unit = CdcStream.applyTablesWithAggViews(
      KillStoreSteps.fanBatch(spark, i), i, s"$ctlDir/reps", s"$ctlDir/aggs",
      s"$ctlDir/staging", s"$ctlDir/dlq")
    applyMain(0L); applyCtl(0L) // seed both pipelines
    var ctlApplied = 0L
    val progress = Paths.get(dir, "progress")
    var acked = 0L
    (1 to 2).foreach { round =>
      acked = killRound("graft.CrossJvmKillFanoutMain",
        Seq(root, aggRoot, staging, dlq, progress.toString, acked.toString),
        s"$dir/fan$round.log", progress, acked)
      assert(acked >= round, s"round $round: child acked nothing new")
      // THE FRONTIER INVARIANT, MID-CRASH, BEFORE ANY HEALING: the marker
      // never runs ahead of a fully-applied batch, never behind an acked
      // one, and the consistent cut at the frontier reads every table at
      // exactly the control's ≤-frontier state — a kill inside table B's
      // fold (A committed, B torn, marker absent) must be invisible here
      val f = CdcStream.appliedFrontier(root).getOrElse(
        fail(s"round $round: no frontier marker survived the kill"))
      assert(f >= acked, s"round $round: frontier $f behind ack $acked")
      while (ctlApplied < f) { ctlApplied += 1; applyCtl(ctlApplied) }
      val (cut, vers) = CdcStream.consistentCutVersions(root, tbls)
      assert(cut === f)
      val (_, ctlVers) = CdcStream.consistentCutVersions(s"$ctlDir/reps", tbls)
      tbls.foreach { t =>
        def rowsAt(r: String, v: Option[Long]): Seq[String] = v match {
          case None => Seq.empty
          case Some(ver) => new BucketedReplica(s"$r/$t")
            .liveAt(spark, ver).select("user_id", "value", "event_type")
            .collect().map(_.toString).sorted.toSeq
        }
        assert(rowsAt(root, vers(t)) === rowsAt(s"$ctlDir/reps", ctlVers(t)),
          s"round $round: table $t's consistent cut at $f is torn")
      }
      // heal: redeliver at the frontier's edge (batch f+1 is the only
      // batch the kill can have left torn — applies are sequential, so
      // anything beyond it never started; same id = checkpoint contract),
      // after which every view audit must be clean
      applyMain(f + 1)
      acked = math.max(acked, f + 1)
      Files.write(progress, acked.toString.getBytes)
      tbls.foreach { t =>
        assert(new IncrementalAgg(new BucketedReplica(s"$root/$t"),
          s"$aggRoot/$t").audit(spark).isEmpty,
          s"round $round: $t's view did not self-heal on redelivery")
      }
    }
    // converge both pipelines to one horizon and compare everything
    val horizon = acked + 1
    ((acked + 1) to horizon).foreach(applyMain)
    while (ctlApplied < horizon) { ctlApplied += 1; applyCtl(ctlApplied) }
    assert(CdcStream.appliedFrontier(root) === Some(horizon))
    tbls.foreach { t =>
      def live(r: String) = new BucketedReplica(s"$r/$t").live(spark)
        .select("user_id", "value", "event_type")
        .collect().map(_.toString).sorted.toSeq
      assert(live(root) === live(s"$ctlDir/reps"), s"$t replica diverged")
      def view(r: String, a: String) = new IncrementalAgg(
        new BucketedReplica(s"$r/$t"), s"$a/$t").read(spark)
        .collect().map(_.toString).sorted.toSeq
      assert(view(root, aggRoot) === view(s"$ctlDir/reps", s"$ctlDir/aggs"),
        s"$t reporting view diverged")
    }
    info(s"$acked batches acked under kills; frontier + views consistent")
  }
}

/** Deterministic step schedules shared by parent and children — the
  * redelivery contract of a checkpointed source (same id ⇒ same data,
  * same maintenance decision). */
object KillStoreSteps {

  /** Launch a child JVM on the test classpath (the cross-JVM kill
    * harness's process factory — shared by every true-process-death spec). */
  def launch(cls: String, args: Seq[String], log: String): Process = {
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx1g", "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"), cls) ++ args
    new ProcessBuilder(cmd: _*)
      .redirectOutput(new java.io.File(log))
      .redirectErrorStream(true)
      .start()
  }

  /** Run one kill round: launch the child, wait until it acks something
    * NEW, kill -9 `sleepMs` later, return the new ack floor. */
  def killRound(cls: String, args: Seq[String], log: String,
                progress: java.nio.file.Path, acked: Long,
                sleepMs: Long): Long = {
    val child = launch(cls, args, log)
    try {
      def readAck(): Long =
        try new String(Files.readAllBytes(progress)).trim.toLong
        catch { case _: Exception => acked }
      val deadline = System.currentTimeMillis() + 180000L
      while (readAck() <= acked && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      Thread.sleep(sleepMs)
      child.destroyForcibly()
      child.waitFor()
      readAck()
    } finally { if (child.isAlive) { child.destroyForcibly(); () } }
  }

  def catalogOn(wh: String): graft.plans.GraftCatalog = {
    val c = new graft.plans.GraftCatalog()
    c.initialize("graft_kill",
      new CaseInsensitiveStringMap(java.util.Map.of("root", wh)))
    c
  }

  /** 12 docs per batch; ids sharing `id % 5` get near-identical text, so
    * every batch completes candidate pairs against the stored corpus. */
  def lshDocs(spark: SparkSession, i: Long): DataFrame = {
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val rows = (0 until 12).map { j =>
      val id = i * 12 + j
      Row(id, s"$base variant${id % 5} $base tail${id % 3}")
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
  }

  /** addBatch every step; every 4th step also rebands, alternating the
    * layout — the online-migration race under real process death. */
  def lshStep(idx: LshIndex, spark: SparkSession, i: Long): Unit = {
    idx.addBatch(lshDocs(spark, i), i)
    if (i % 4 == 0) {
      val (r, b) = if ((i / 4) % 2 == 0) (4, 2) else (2, 4)
      idx.reband(spark, r, b)
    }
  }

  /** 8 deterministic unit-ish vectors per batch (dim 6). */
  def ivfVecs(spark: SparkSession, i: Long): DataFrame = {
    val rows = (0 until 8).map { j =>
      val id = i * 8 + j
      Row(id, (0 until 6).map(d =>
        math.cos(0.37 * (id + d * 7)).toFloat).toSeq)
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
  }

  /** Two alternating deterministic centroid sets (4 each). */
  def ivfCents(spark: SparkSession, g: Int): DataFrame = {
    val rows = (0 until 4).map { k =>
      Row(k.toLong, (0 until 6).map(d =>
        math.sin(0.51 * (g * 31 + k * 5 + d)).toFloat).toSeq)
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*),
      StructType(Seq(StructField("cid", LongType),
        StructField("cemb", ArrayType(FloatType)))))
  }

  def ivfStep(idx: IvfIndex, spark: SparkSession, i: Long): Unit = {
    idx.addBatch(ivfVecs(spark, i), i)
    if (i % 4 == 0) idx.recenter(spark, ivfCents(spark, ((i / 4) % 2).toInt))
  }

  private val declared = StructType(Seq(
    StructField("op", StringType), StructField("tbl", StringType),
    StructField("pos", LongType), StructField("ts_ns", LongType),
    StructField("user_id", LongType), StructField("value", DoubleType),
    StructField("event_type", StringType)))

  private def props: java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String]()
    m.put("pk", "user_id"); m.put("nBuckets", "4"); m
  }

  def ddlBatch(spark: SparkSession, i: Long): DataFrame = {
    val rows = (0 until 5).map { k =>
      Row("INSERT", "t", i * 10 + k, (i * 10 + k) * 1000L,
        i * 100 + k, (i + k) * 0.5, s"e${(i + k) % 3}")
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), declared)
  }

  /** One DDL step: retire the slot's previous incarnation (sweeping any
    * crashed-DROP remnants), provision it fresh, commit a batch; every
    * 3rd step also runs a scratch-namespace create + CASCADE cycle. */
  def ddlStep(cat: graft.plans.GraftCatalog, wh: String,
              spark: SparkSession, i: Long): Unit = {
    val id = Identifier.of(Array("ns"), s"t${i % 4}")
    cat.dropTable(id) // visible drop, remnant sweep, or absent no-op
    cat.createTable(id, declared,
      Array.empty[org.apache.spark.sql.connector.expressions.Transform], props)
    BucketedReplica.open(s"$wh/ns/t${i % 4}").commit(ddlBatch(spark, i))
    if (i % 3 == 0) {
      cat.createNamespace(Array("scratch"), java.util.Map.of())
      val sid = Identifier.of(Array("scratch"), "s0")
      cat.dropTable(sid)
      cat.createTable(sid, declared,
        Array.empty[org.apache.spark.sql.connector.expressions.Transform], props)
      BucketedReplica.open(s"$wh/scratch/s0").commit(ddlBatch(spark, i))
      cat.dropNamespace(Array("scratch"), true)
      ()
    }
  }

  /** One fan-out batch: 6 envelope rows for each of 3 tables, mixed ops. */
  def fanBatch(spark: SparkSession, i: Long): DataFrame = {
    val rows = for {
      (t, ti) <- Seq("events", "pets", "users").zipWithIndex
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

  /** The composed-pipeline document schedule (the ComposedChaosSoakSpec
    * family): 8 docs per batch with exact-dup, near-dup, markup-noise and
    * quality-reject lanes, engineered so every reject path fires. */
  def composedDocs(spark: SparkSession, i: Long): DataFrame = {
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
          if (id % 3 == 0) s"<p>  <b>$t</b> </p>" else t
        }
      Row(id, base, "en", s"src${id % 3}", base.length.toLong)
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("lang", StringType),
        StructField("source", StringType), StructField("n_chars", LongType))))
  }

  /** One composed-pipeline step: the ingest fold (clean → gate → exact
    * dedup → near-dup reject → LSH), an IVF append, every 3rd step the
    * multi-table fan-out lane, and a deterministic maintenance pass every
    * 4th (reband alternating the two minSig=6-lossless layouts; the
    * ingest's quiesced seen-store fold every 8th). Deterministic per id —
    * the redelivery contract. */
  def composedStep(spark: SparkSession, root: String, ingest: CorpusIngest,
                   ivf: IvfIndex, i: Long): Unit = {
    ingest.ingestBatch(composedDocs(spark, i), i)
    ivf.addBatch(ivfVecs(spark, i), i)
    if (i % 3 == 2) {
      val fi = i / 3
      CdcStream.applyTablesWithAggViews(fanBatch(spark, fi), fi,
        s"$root/reps", s"$root/aggs", s"$root/staging", s"$root/dlq")
    }
    if (i % 4 == 3) {
      val (r, b) = if ((i / 4) % 2 == 0) (2, 4) else (1, 8)
      ingest.lsh.reband(spark, r, b)
    }
    if (i % 8 == 5) ingest.compact(spark)
  }

  def childSession(): SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def ackLoop(start: Long, progress: String)(step: Long => Unit): Unit = {
    var i = start + 1
    while (true) {
      step(i)
      // ack AFTER the step's last durable call returned: the parent's
      // loss checks count only acked steps
      Files.write(Paths.get(progress), i.toString.getBytes)
      i += 1
    }
  }
}

/** Child: LSH append + periodic reband loop (see KillStoreSteps.lshStep). */
object CrossJvmKillLshMain {
  def main(args: Array[String]): Unit = {
    val Array(root, progress, startS) = args
    val spark = KillStoreSteps.childSession()
    val idx = new LshIndex(root)
    KillStoreSteps.ackLoop(startS.toLong, progress)(i =>
      KillStoreSteps.lshStep(idx, spark, i))
  }
}

/** Child: IVF append + periodic recenter loop. */
object CrossJvmKillIvfMain {
  def main(args: Array[String]): Unit = {
    val Array(root, progress, startS) = args
    val spark = KillStoreSteps.childSession()
    val idx = new IvfIndex(root)
    KillStoreSteps.ackLoop(startS.toLong, progress)(i =>
      KillStoreSteps.ivfStep(idx, spark, i))
  }
}

/** Child: catalog DDL cycle loop. */
object CrossJvmKillDdlMain {
  def main(args: Array[String]): Unit = {
    val Array(wh, progress, startS) = args
    val spark = KillStoreSteps.childSession()
    val cat = KillStoreSteps.catalogOn(wh)
    KillStoreSteps.ackLoop(startS.toLong, progress)(i =>
      KillStoreSteps.ddlStep(cat, wh, spark, i))
  }
}

/** Child: multi-table fan-out with per-table agg views + frontier marker. */
object CrossJvmKillFanoutMain {
  def main(args: Array[String]): Unit = {
    val Array(root, aggRoot, staging, dlq, progress, startS) = args
    val spark = KillStoreSteps.childSession()
    KillStoreSteps.ackLoop(startS.toLong, progress)(i =>
      CdcStream.applyTablesWithAggViews(
        KillStoreSteps.fanBatch(spark, i), i, root, aggRoot, staging, dlq))
  }
}
