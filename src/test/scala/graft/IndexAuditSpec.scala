package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.{IvfIndex, LshIndex, StoreIO}

/** The index stores' audit()/vacuum() pair — the fsck twin for LSH/IVF.
  *
  * Contract under test: a healthy store audits all-ok; the orphan
  * partitions real crashes leak (a crashed append that never retried, a
  * migration whose post-commit GC thunk died, a stale centroid
  * generation) are REPORTED but never affect readers; vacuum() reclaims
  * exactly them without touching committed state; and the detectors have
  * teeth — hand-broken invariants (a deleted committed dir, a partition
  * committed under a dead centroid generation) fail their rows rather
  * than pass vacuously. */
class IndexAuditSpec extends SparkSpecBase {

  private def docs: DataFrame = Tables.load(spark, sfDir, "documents")
    .select(col("doc_id"), col("text")).filter(col("doc_id") < 40)

  private def emb: DataFrame = Tables.load(spark, sfDir, "embeddings")
    .select(col("vec_id"), col("embedding")).filter(col("vec_id") < 48)

  /** The store's lease entries (versioned `_VACUUM-<n>` plus the legacy
    * bare `_VACUUM` form), name-sorted. */
  private def leaseFiles(root: String): Seq[java.io.File] =
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName == "_VACUUM" || f.getName.matches("_VACUUM-\\d+"))
      .sortBy(_.getName).toSeq

  /** Lease entries whose head state is `held` (the live-or-crashed-holder
    * form — content line 3 is `held`, or absent in the legacy layout). */
  private def heldLease(root: String): Option[java.io.File] =
    leaseFiles(root).sortBy(f =>
      f.getName.stripPrefix("_VACUUM").stripPrefix("-").toLongOption
        .getOrElse(0L)).lastOption
      .filter(f => !java.nio.file.Files.readString(f.toPath)
        .linesIterator.toSeq.drop(2).headOption.map(_.trim).contains("released"))

  private def report(df: DataFrame): Map[String, (Boolean, String)] =
    df.collect().map(r =>
      r.getString(0) -> (r.getBoolean(1), r.getString(2))).toMap

  private def allOk(rep: Map[String, (Boolean, String)]): Unit =
    rep.foreach { case (check, (ok, obs)) =>
      assert(ok, s"audit check $check failed: $obs") }

  private def lshDigest(root: String): Seq[String] = {
    val idx = new LshIndex(root)
    (idx.postings(spark).select("band", "bucket", "doc_id")
      .collect().map("P|" + _.toString) ++
      idx.pairs(spark).select("d1", "d2", "n_shared_bands")
        .collect().map("C|" + _.toString) ++
      idx.sigs(spark).drop("batch_id").collect().map("S|" + _.toString))
      .sorted.toSeq
  }

  test("LSH: healthy store audits all-ok with zero orphans, through a reband") {
    val root = tmpDir("audit_lsh") + "/idx"
    val idx = new LshIndex(root)
    idx.addBatch(docs.filter(col("doc_id") % 2 === 0), 0L)
    idx.addBatch(docs.filter(col("doc_id") % 2 === 1), 1L)
    val r1 = report(idx.audit(spark))
    allOk(r1)
    assert(r1("orphan_partitions")._2 === "0")
    idx.reband(spark, 4, 2)
    val r2 = report(new LshIndex(root).audit(spark))
    allOk(r2)
    assert(r2("orphan_partitions")._2 === "0")
    assert(new LshIndex(root).vacuum().isEmpty,
      "vacuum on a healthy store must delete nothing")
  }

  test("LSH: a crashed append's orphans are reported ok, vacuumed exactly, " +
    "and the batch's retry still converges") {
    val root = tmpDir("audit_lsh_crash") + "/idx"
    new LshIndex(root).addBatch(docs.filter(col("doc_id") % 2 === 0), 0L)
    val before = lshDigest(root)
    // die at the FIRST control mutation = the log commit's tmp write: the
    // batch's three data partitions are fully on disk, no entry names them
    StoreIO.Faults.armAt(root, 1)
    intercept[StoreIO.Faults.InjectedCrash] {
      new LshIndex(root).addBatch(docs.filter(col("doc_id") % 2 === 1), 1L)
    }
    val (fired, _) = StoreIO.Faults.disarm()
    assert(fired)
    assert(lshDigest(root) === before, "orphans leaked into reader state")
    val rep = report(new LshIndex(root).audit(spark))
    allOk(rep) // orphans are ok=true — invisible, vacuum's to reclaim
    assert(rep("orphan_partitions")._2 === "3",
      s"expected the crashed batch's 3 partition dirs, got $rep")
    val deleted = new LshIndex(root).vacuum()
    assert(deleted.size === 3, s"vacuum deleted $deleted")
    assert(report(new LshIndex(root).audit(spark))("orphan_partitions")._2 === "0")
    assert(lshDigest(root) === before, "vacuum touched committed state")
    // the stream's eventual retry of the batch rewrites from scratch
    new LshIndex(root).addBatch(docs.filter(col("doc_id") % 2 === 1), 1L)
    val control = tmpDir("audit_lsh_ctl") + "/idx"
    val ctl = new LshIndex(control)
    ctl.addBatch(docs.filter(col("doc_id") % 2 === 0), 0L)
    ctl.addBatch(docs.filter(col("doc_id") % 2 === 1), 1L)
    assert(lshDigest(root) === lshDigest(control),
      "retry after vacuum diverged from the never-crashed build")
  }

  test("LSH detector teeth: a hand-deleted committed sigs partition fails " +
    "committed_dirs_present and postings_docs_in_sigs") {
    val root = tmpDir("audit_lsh_teeth") + "/idx"
    val idx = new LshIndex(root)
    idx.addBatch(docs.filter(col("doc_id") % 2 === 0), 0L)
    idx.addBatch(docs.filter(col("doc_id") % 2 === 1), 1L)
    val dir = new java.io.File(s"$root/sigs/batch_id=1")
    assert(dir.exists)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(); ()
    }
    rm(dir)
    val rep = report(new LshIndex(root).audit(spark))
    assert(!rep("committed_dirs_present")._1, s"missing dir not flagged: $rep")
    assert(!rep("postings_docs_in_sigs")._1,
      s"posted docs with no stored signature not flagged: $rep")
  }

  test("IVF: a recenter whose post-commit GC died leaks exactly the dead " +
    "partitions and the stale generation — reported, searchable, vacuumable") {
    val root = tmpDir("audit_ivf") + "/idx"
    def cents(n: Int): DataFrame = emb.filter(col("vec_id") < n)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
    val idx = new IvfIndex(root)
    idx.create(cents(4))
    idx.addBatch(emb.filter(col("vec_id") % 2 === 0), 0L)
    idx.addBatch(emb.filter(col("vec_id") % 2 === 1), 1L)
    allOk(report(idx.audit(spark)))
    // the GC thunk dies right after the migration's log entry commits
    idx.log.beforeMigrateGc = () => throw new RuntimeException("gc died")
    intercept[RuntimeException] { idx.recenter(spark, cents(6)) }
    idx.log.beforeMigrateGc = () => ()
    val rep = report(new IvfIndex(root).audit(spark))
    allOk(rep) // committed state is fine; the leaks are invisible orphans
    assert(rep("orphan_partitions")._2 === "3",
      s"expected 2 dead batch dirs + 1 stale generation, got $rep")
    val assigned = new IvfIndex(root).index(spark)
      .select("vec_id", "cid").collect().map(_.toString).sorted.toSeq
    val deleted = new IvfIndex(root).vacuum()
    assert(deleted.size === 3, s"vacuum deleted $deleted")
    assert(report(new IvfIndex(root).audit(spark))("orphan_partitions")._2 === "0")
    assert(new IvfIndex(root).index(spark)
      .select("vec_id", "cid").collect().map(_.toString).sorted.toSeq === assigned,
      "vacuum touched the committed index")
  }

  test("stray dirs that don't parse as batch_id=<n> (manual copy, backup " +
    "suffix) are reported, skipped by vacuum, and never crash the audit") {
    val root = tmpDir("audit_strays") + "/idx"
    val idx = new LshIndex(root)
    idx.addBatch(docs.filter(col("doc_id") % 2 === 0), 0L)
    val before = lshDigest(root)
    // the post-incident states audit is documented for: a backup-suffixed
    // copy of a partition and a hand-dropped dir that isn't ours at all
    def plant(p: String): Unit =
      assert(new java.io.File(p).mkdirs(), s"fixture mkdir failed: $p")
    plant(s"$root/postings/batch_id=0.bak")
    plant(s"$root/sigs/manual_restore")
    val rep = report(new LshIndex(root).audit(spark)) // must not throw
    allOk(rep)
    assert(rep("unrecognized_entries")._2 === "2",
      s"both strays must be reported: $rep")
    assert(new LshIndex(root).vacuum().isEmpty,
      "vacuum must skip entries it cannot claim as the store's own")
    assert(new java.io.File(s"$root/postings/batch_id=0.bak").exists &&
      new java.io.File(s"$root/sigs/manual_restore").exists,
      "strays are the operator's to remove, not vacuum's")
    // maintenance keeps working around them (no NumberFormatException in
    // freshNegativeId / gcSnapshot), and readers never saw them
    new LshIndex(root).addBatch(docs.filter(col("doc_id") % 2 === 1), 1L)
    new LshIndex(root).compact(spark)
    allOk(report(new LshIndex(root).audit(spark)))
    assert(lshDigest(root).size > before.size)

    // a stray LOG name (`_LOG-3.bak` manual copy — the same post-incident
    // surgery class) must not wedge the store: versions()/state() skip it
    // (toLongOption, the ONE stray-tolerant name rule), every verb keeps
    // working, and the audit surfaces the skipped name instead of hiding it
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/_LOG-3.bak"), "manual copy")
    val repLog = report(new LshIndex(root).audit(spark)) // must not throw
    allOk(repLog)
    assert(repLog("unrecognized_entries")._2 === "3",
      s"the skipped stray log name must surface in the audit: $repLog")
    assert(lshDigest(root).size > before.size, "reads wedged by a stray log name")
    new LshIndex(root).addBatch(docs.filter(col("doc_id") < 5), 2L)
    // vacuum is the one verb that must NOT tolerate a stray log name:
    // reads skip it, but a `_LOG-5.bak` may be an operator's displaced
    // copy of the only entry referencing batch 5 — sweeping "unreferenced"
    // dirs under that skip would destroy committed data, so the
    // irreversible pass refuses until the stray is restored or removed
    val eStray = intercept[IllegalStateException](new LshIndex(root).vacuum())
    assert(eStray.getMessage.contains("stray entry names") &&
      eStray.getMessage.contains("_LOG-3.bak"),
      s"vacuum must refuse over a stray log name: ${eStray.getMessage}")
    assert(new java.io.File(s"$root/_LOG-3.bak").exists,
      "the stray log copy is the operator's to remove")
    // and the refusal must not wedge the store: the lease was released,
    // so writers proceed immediately
    new LshIndex(root).addBatch(docs.filter(col("doc_id") >= 5 &&
      col("doc_id") < 8), 3L)
    // operator surgery removes the stray; vacuum works again (and the
    // content-bearing section below keeps its exact stray counts)
    assert(new java.io.File(s"$root/_LOG-3.bak").delete())
    assert(new LshIndex(root).vacuum().isEmpty)

    val ivfRoot = tmpDir("audit_strays_ivf") + "/idx"
    val ivf = new IvfIndex(ivfRoot)
    ivf.create(emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb")))
    ivf.addBatch(emb.filter(col("vec_id") % 2 === 0), 0L)
    plant(s"$ivfRoot/index/batch_id=0.bak")
    val irep = report(new IvfIndex(ivfRoot).audit(spark))
    allOk(irep)
    assert(irep("unrecognized_entries")._2 === "1", s"stray not reported: $irep")
    assert(new IvfIndex(ivfRoot).vacuum().isEmpty)
    assert(new java.io.File(s"$ivfRoot/index/batch_id=0.bak").exists)

    // a CONTENT-BEARING stray (cp -r of a partition) is a different
    // class: it poisons the dataset dir's partition discovery for every
    // reader. The audit must still COMPLETE — flagging the stray as the
    // cause (ok=false) and failing the scans as rows — never abort.
    java.nio.file.Files.writeString(java.nio.file.Paths.get(
      s"$root/postings/batch_id=0.bak/junk.txt"), "not parquet")
    val rep2 = report(new LshIndex(root).audit(spark))
    assert(!rep2("unrecognized_entries")._1,
      s"a content-bearing stray must flag the audit: $rep2")
    assert(rep2("unrecognized_entries")._2 === "2")
    assert(new LshIndex(root).vacuum().isEmpty,
      "vacuum must still refuse to touch strays, content-bearing or not")
    // removing it restores a clean audit
    assert(new java.io.File(s"$root/postings/batch_id=0.bak/junk.txt").delete())
    allOk(report(new LshIndex(root).audit(spark)))
  }

  test("vacuum's quiesced-only contract is ENFORCED: the lease refuses " +
    "writers, and a writer already in flight loses at the log — the " +
    "deleted-then-committed interleave is impossible") {
    val root = tmpDir("vacuum_lease") + "/idx"
    val idx = new LshIndex(root)
    idx.addBatch(docs.filter(col("doc_id") % 2 === 0), 0L)
    idx.addBatch(docs.filter(col("doc_id") % 3 === 1), 1L)
    // a crashed append's orphans give vacuum something to fence
    StoreIO.Faults.armAt(root, 1)
    intercept[StoreIO.Faults.InjectedCrash] {
      new LshIndex(root).addBatch(docs.filter(col("doc_id") % 2 === 1), 2L)
    }
    StoreIO.Faults.disarm()

    // (a) a live lease refuses every mutating verb loudly, BEFORE any write
    val leaseTok = idx.log.acquireVacuumLease()
    try {
      val filesBefore = Option(new java.io.File(root).list()).get.sorted.toSeq
      def refused(what: String)(op: => Unit): Unit = {
        val e = intercept[IllegalStateException](op)
        assert(e.getMessage.contains("vacuum"), s"$what: ${e.getMessage}")
      }
      refused("addBatch")(
        new LshIndex(root).addBatch(docs.filter(col("doc_id") % 2 === 1), 2L))
      refused("reband")(new LshIndex(root).reband(spark, 4, 2))
      refused("compact")(new LshIndex(root).compact(spark))
      assert(Option(new java.io.File(root).list()).get.sorted.toSeq
        === filesBefore, "a refused writer mutated the store")
      // a second vacuum cannot share the lease
      intercept[IllegalStateException](idx.log.acquireVacuumLease())
      // and a WRONG token cannot release it (a holder lapped past its
      // TTL must not disturb a successor's lease on its way out)
      idx.log.releaseVacuumLease("not-the-owner")
      assert(heldLease(root).isDefined,
        "a non-owner release un-held the lease")
    } finally idx.log.releaseVacuumLease(leaseTok)

    // (b) deterministic seam: an append fully written and paused at its
    // commit; vacuum runs to completion in between (lease + log entry +
    // sweep of the paused append's own dirs); the resumed commit MUST
    // lose — it can never publish the paths vacuum just deleted
    val victim = new LshIndex(root)
    victim.log.beforeAppendCommit = () => {
      val v = new LshIndex(root).vacuum()
      assert(v.nonEmpty, "vacuum found nothing to fence against")
      victim.log.beforeAppendCommit = () => ()
    }
    intercept[StoreIO.ConcurrentCommit] {
      victim.addBatch(docs.filter(col("doc_id") % 2 === 1), 2L)
    }
    // nothing dead remains, nothing committed names a swept path
    val repB = report(new LshIndex(root).audit(spark))
    allOk(repB)
    assert(repB("orphan_partitions")._2 === "0",
      s"the fenced append's dirs must be gone: $repB")
    // (c) the defeated batch's retry converges to the never-crashed control
    new LshIndex(root).addBatch(docs.filter(col("doc_id") % 2 === 1), 2L)
    val control = tmpDir("vacuum_lease_ctl") + "/idx"
    val ctl = new LshIndex(control)
    ctl.addBatch(docs.filter(col("doc_id") % 2 === 0), 0L)
    ctl.addBatch(docs.filter(col("doc_id") % 3 === 1), 1L)
    ctl.addBatch(docs.filter(col("doc_id") % 2 === 1), 2L)
    assert(lshDigest(root) === lshDigest(control),
      "retry after a fenced vacuum diverged from the never-crashed build")

    // (d) reverse seam: vacuum pauses before ITS entry; an append (a
    // pre-lease straggler — its state read AND post-read probe both ran
    // before the lease landed, modeled by lifting the lease file for the
    // straggler's window) commits first; vacuum must lose that round and
    // re-derive — the now-committed batch's partitions survive the sweep
    StoreIO.Faults.armAt(root, 1)
    intercept[StoreIO.Faults.InjectedCrash] {
      new LshIndex(root).addBatch(docs.filter(col("doc_id") < 10), 3L)
    }
    StoreIO.Faults.disarm()
    val vac = new LshIndex(root)
    var raced = false
    vac.log.beforeMigrateCommit = () => {
      if (!raced) { raced = true
        leaseFiles(root).foreach(f => assert(f.delete()))
        new LshIndex(root).addBatch(docs.filter(col("doc_id") < 10), 3L)
        // a stand-in lease for the remainder of the vacuum (its own
        // release is token-checked, so the stand-in outlives it; the
        // legacy bare name reads as lease version 0, held)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$root/_VACUUM"),
          s"${System.currentTimeMillis()}\nstand-in\n")
      }
    }
    val deleted = vac.vacuum()
    vac.log.beforeMigrateCommit = () => ()
    assert(raced, "the race seam never fired")
    assert(heldLease(root).exists(_.delete()),
      "the token check must have left the stand-in lease for us to sweep")
    assert(!deleted.exists(_.contains("batch_id=3")),
      s"vacuum swept a committed batch after losing the race: $deleted")
    val repD = report(new LshIndex(root).audit(spark))
    allOk(repD)
    assert(new LshIndex(root).sigs(spark)
      .filter(col("batch_id") === 3L).count() > 0,
      "the race-winning batch's committed partitions must survive")
  }

  test("cold SQL surface: graft_index_audit and CALL graft.system." +
    "index_vacuum reach both store kinds by path or by catalog name") {
    val wh = tmpDir("sql_index_audit")
    // LSH under the warehouse (name-addressable) with a crashed append
    val lshRoot = s"$wh/idx/docs_lsh"
    new LshIndex(lshRoot).addBatch(docs.filter(col("doc_id") % 2 === 0), 0L)
    StoreIO.Faults.armAt(lshRoot, 1)
    intercept[StoreIO.Faults.InjectedCrash] {
      new LshIndex(lshRoot).addBatch(docs.filter(col("doc_id") % 2 === 1), 1L)
    }
    StoreIO.Faults.disarm()
    // IVF OUTSIDE the warehouse (path-addressable) with a stale generation
    val ivfRoot = tmpDir("sql_index_ivf") + "/emb_ivf"
    val ivf = new IvfIndex(ivfRoot)
    ivf.create(emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb")))
    ivf.addBatch(emb.filter(col("vec_id") % 2 === 0), 0L)
    ivf.log.beforeMigrateGc = () => throw new RuntimeException("gc died")
    intercept[RuntimeException] { ivf.recenter(spark, emb
      .filter(col("vec_id") < 6)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))) }
    ivf.log.beforeMigrateGc = () => ()

    // a session knowing ONLY the catalog confs — the operator's cold shell
    val cold = spark.newSession()
    cold.conf.set("spark.sql.catalog.graft", "graft.plans.GraftCatalog")
    cold.conf.set("spark.sql.catalog.graft.root", wh)
    def audit(arg: String): Map[String, (Boolean, String)] =
      cold.sql(s"SELECT * FROM graft_index_audit('$arg')").collect()
        .map(r => r.getString(0) -> (r.getBoolean(1), r.getString(2))).toMap

    val byName = audit("idx.docs_lsh") // catalog-root-relative dotted name
    allOk(byName)
    assert(byName("orphan_partitions")._2 === "3",
      s"the crashed append's 3 dirs must be visible from SQL: $byName")
    assert(audit(lshRoot) === byName, "path and name forms must agree")
    val ivfRep = audit(ivfRoot) // absolute path, store kind sniffed as IVF
    allOk(ivfRep)
    assert(ivfRep("orphan_partitions")._2 === "2",
      s"dead batch dir + stale generation expected: $ivfRep")
    assert(ivfRep.contains("centroids_present"), "IVF sniffing failed")

    // reclaim both from SQL, then the audits read clean
    cold.sql("CALL graft.system.index_vacuum('idx.docs_lsh')")
    cold.sql(s"CALL graft.system.index_vacuum('$ivfRoot')")
    assert(audit("idx.docs_lsh")("orphan_partitions")._2 === "0")
    assert(audit(ivfRoot)("orphan_partitions")._2 === "0")
    // committed state untouched: the stores still read and extend
    new LshIndex(lshRoot).addBatch(docs.filter(col("doc_id") % 2 === 1), 1L)
    assert(new LshIndex(lshRoot).sigs(spark).count() > 0)
    assert(new IvfIndex(ivfRoot).index(spark).count() > 0)

    // loud on nonsense: no store, and a name with no catalog root conf
    val e = intercept[Exception](audit(tmpDir("sql_index_empty")))
    assert(e.getMessage.contains("no index store"),
      s"empty root must refuse loudly: ${e.getMessage}")

    // path-traversal refusals: a RELATIVE path with separators would
    // bypass the dotted-name branch's '..' check and reach the vacuum's
    // delete pass outside the warehouse root — both doors must refuse
    // incl. the scheme-glued relative forms ('file:../x'): the '..' rides
    // inside the 'file:..' split segment, so only a URI-path check sees it
    for (bad <- Seq("../outside", "a/../../x", s"$wh/idx/../../etc",
        "file:../outside", "file:relative/store", s"file:$wh/idx/../../etc")) {
      val et = intercept[Exception](audit(bad))
      assert(et.getMessage.contains("illegal store path"),
        s"traversal arg '$bad' must refuse: ${et.getMessage}")
      val ev = intercept[Exception](
        cold.sql(s"CALL graft.system.index_vacuum('$bad')"))
      assert(ev.getMessage.contains("illegal store path"),
        s"traversal arg '$bad' must refuse at the procedure: ${ev.getMessage}")
    }
  }

  test("a vacuum that CRASHES mid-delete leaves its lease blocking writers " +
    "until the TTL, past which writers proceed and a successor retires it") {
    val root = tmpDir("vacuum_crash") + "/idx"
    val idx = new LshIndex(root)
    idx.addBatch(docs.filter(col("doc_id") % 2 === 0), 0L)
    // orphans for the vacuum to be mid-deleting when it dies
    StoreIO.Faults.armAt(root, 1)
    intercept[StoreIO.Faults.InjectedCrash] {
      new LshIndex(root).addBatch(docs.filter(col("doc_id") % 2 === 1), 1L)
    }
    StoreIO.Faults.disarm()
    // kill the vacuum at its FIRST delete after lease + log entry: the
    // lease file is on disk, the sweep is incomplete — the crashed-holder
    // state the TTL exists for. (Every vacuum mutation routes through
    // StoreIO, so the injector reaches all of them; the lease write is
    // ops 1-2, the entry commit 3-4, deletes follow.)
    StoreIO.Faults.armAt(root, 5)
    intercept[StoreIO.Faults.InjectedCrash] { new LshIndex(root).vacuum() }
    StoreIO.Faults.disarm()
    assert(heldLease(root).isDefined,
      "the crash must have happened with the lease held")

    // within the TTL every writer refuses loudly — the crashed vacuum
    // may still be alive as far as any other process can prove
    val e = intercept[IllegalStateException] {
      new LshIndex(root).addBatch(docs.filter(col("doc_id") % 2 === 1), 1L)
    }
    assert(e.getMessage.contains("vacuum"), e.getMessage)

    // past the TTL the lease is provably stale: the next writer IGNORES
    // it and proceeds — writers never delete lease state (the
    // sweep-TOCTOU fix: a blind delete could remove a successor vacuum's
    // FRESH lease); the expired entry stays until a later vacuum's
    // release GCs it. A re-run vacuum converges and the store audits clean
    val prev = sys.props.put("graft.index.vacuumTtlMs", "1")
    try {
      Thread.sleep(5)
      new LshIndex(root).addBatch(docs.filter(col("doc_id") % 2 === 1), 1L)
      assert(heldLease(root).isDefined,
        "the expired lease is ignored, never swept, by writers")
      // a successor vacuum acquires OVER the expired entry (next lease
      // version) and its release GCs everything below — the one actor
      // that ever deletes lease state, and only behind its own
      // write-once claim
      new LshIndex(root).vacuum()
      assert(heldLease(root).isEmpty,
        "the successor vacuum's release must retire the crashed lease")
    } finally {
      prev match {
        case Some(v) => sys.props.put("graft.index.vacuumTtlMs", v)
        case None => sys.props.remove("graft.index.vacuumTtlMs")
      }
      ()
    }
    val rep = report(new LshIndex(root).audit(spark))
    allOk(rep)
    assert(rep("orphan_partitions")._2 === "0",
      s"the re-run vacuum must finish the crashed one's sweep: $rep")
  }

  test("a garbled _VACUUM lease (manual edit — a crash cannot tear it) " +
    "wedges writers for at most one TTL via the mtime fallback, not forever") {
    val root = tmpDir("vacuum_garbled") + "/idx"
    val idx = new LshIndex(root)
    idx.addBatch(docs.filter(col("doc_id") % 2 === 0), 0L)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/_VACUUM"), "no timestamp here")
    // fresh by mtime: refused, with the expiry remedy actually reachable
    val e = intercept[IllegalStateException] {
      new LshIndex(root).addBatch(docs.filter(col("doc_id") % 2 === 1), 1L)
    }
    assert(e.getMessage.contains("vacuum"), e.getMessage)
    val prev = sys.props.put("graft.index.vacuumTtlMs", "1")
    try {
      Thread.sleep(10)
      new LshIndex(root).addBatch(docs.filter(col("doc_id") % 2 === 1), 1L)
      // the expired garbled entry is IGNORED (not re-aged to zero, not
      // swept — writers never delete lease state); a vacuum acquires
      // right over it and its release retires it
      new LshIndex(root).vacuum()
      assert(heldLease(root).isEmpty,
        "the successor vacuum's release must retire the garbled lease")
    } finally {
      prev match {
        case Some(v) => sys.props.put("graft.index.vacuumTtlMs", v)
        case None => sys.props.remove("graft.index.vacuumTtlMs")
      }
      ()
    }
  }

  test("IVF detector teeth: a partition committed under a dead generation's " +
    "cids fails cids_in_generation") {
    val root = tmpDir("audit_ivf_teeth") + "/idx"
    val idx = new IvfIndex(root)
    idx.create(emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb")))
    idx.addBatch(emb.filter(col("vec_id") % 2 === 0), 0L)
    // hand-surgery: a partition full of cids no current centroid has,
    // committed for real through the log — the unsearchable-vector hazard
    emb.filter(col("vec_id") % 2 === 1)
      .withColumn("cid", lit(999L))
      .write.partitionBy("cid").parquet(s"$root/index/batch_id=1")
    idx.log.commitAt(idx.log.state.version + 1,
      Map("type" -> "append", "batch" -> "1"))
    val rep = report(new IvfIndex(root).audit(spark))
    assert(!rep("cids_in_generation")._1,
      s"dead-generation cid not flagged: $rep")
  }
}
