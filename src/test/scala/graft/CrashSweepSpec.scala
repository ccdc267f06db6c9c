package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.streaming.{BucketedReplica, CdcStream, IncrementalAgg, IvfIndex,
  LshIndex, StoreIO}

/** Exhaustive crash-injection sweep over every durable store protocol.
  *
  * The round's randomized stresses (ConcurrentWritersSpec,
  * IndexStoreStressSpec, IncrementalAggStressSpec) found two real
  * delete-races by exploring interleavings; this spec explores the other
  * failure axis systematically: PROCESS DEATH at every point of a
  * protocol's control-plane mutation sequence. [[StoreIO.Faults]] arms a
  * crash at the k-th mutating op (write / visibility rename / delete /
  * mkdir) under one store root — op k and everything after it throw, so
  * compensating catch blocks cannot "un-crash" the disk. Sweeping k from 1
  * until the operation completes uninjected therefore visits EVERY durable
  * prefix a real crash can leave (the disk state between two consecutive
  * mutations is constant, so read-op crash points add nothing), and a torn
  * variant additionally leaves HALF of op k's bytes when op k is a file
  * write — the mid-write death the pointer tmp-rename and the
  * overwriteSafe terminator exist for.
  *
  * Contract asserted at every crash point, for every protocol:
  *   1. READERS SURVIVE — a fresh instance reads the store without error;
  *   2. ATOMICITY — the logical state is exactly the pre-op state or the
  *      post-op state, never a mixture (IncrementalAgg's documented
  *      exception: replica committed + view not yet folded, the gap its
  *      audit()/rebuild() pair exists for);
  *   3. RECOVERY CONVERGES — re-running the operation (the stream's
  *      foreachBatch redelivery / the caller's retry) lands the exact
  *      post-op state, and the replica's fsck reports every invariant ok.
  *
  * Data-plane (parquet) writes do not route through StoreIO, but every
  * protocol writes data strictly BEFORE its first control mutation, so a
  * crash inside the data job is state-equivalent to crash point 1 plus an
  * unreferenced orphan dir — covered by the planted-garbage test at the
  * bottom. Logical digests deliberately exclude version numbers, attempt
  * suffixes, consolidation batch ids, and commit timestamps: those differ
  * between a clean run and a crash-then-retry run by design.
  */
class CrashSweepSpec extends SparkSpecBase {

  // ---------------------------------------------------------------- utils

  private def deleteTree(p: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => { Files.delete(f); () })
      finally s.close()
    }
  }

  private def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    if (!Files.exists(src)) return
    val s = Files.walk(src)
    try s.forEach { (f: Path) =>
      val t = dst.resolve(src.relativize(f))
      if (Files.isDirectory(f)) { Files.createDirectories(t); () }
      else { Files.createDirectories(t.getParent)
        Files.copy(f, t, java.nio.file.StandardCopyOption.REPLACE_EXISTING); () }
    } finally s.close()
  }

  /** See class doc. `armRoot` scopes injection; `stateRoot` is the
    * directory snapshotted/restored between crash points (a parent of
    * every store the op touches). Returns the number of crash points
    * swept (≥ 1 proves the sweep exercised the protocol at all). */
  private def sweep(label: String,
                    armRoot: String, stateRoot: String,
                    op: () => Unit,
                    state: () => Seq[String],
                    healthy: () => Unit = () => (),
                    validAfterCrash: (Seq[String], Seq[String], Seq[String]) => Boolean =
                      (s, pre, post) => s == pre || s == post,
                    converge: Option[() => Unit] = None,
                    torn: Boolean = false): Int = {
    val rootPath = java.nio.file.Paths.get(stateRoot)
    val pre = state()
    val snap = java.nio.file.Files.createTempDirectory("crash_snap")
    copyTree(rootPath, snap)
    op() // clean run defines the post-op state
    val post = state()
    healthy()
    var k = 1
    var points = 0
    var done = false
    while (!done) {
      assert(k <= 200, s"$label: op still injecting at k=$k — runaway sweep")
      deleteTree(rootPath); copyTree(snap, rootPath)
      StoreIO.Faults.armAt(armRoot, k, torn)
      var err: Option[Throwable] = None
      try op() catch { case t: Throwable => err = Some(t) }
      val (fired, _) = StoreIO.Faults.disarm()
      err match {
        case None =>
          assert(!fired, s"$label: op reported success though crash $k fired")
          assert(state() == post,
            s"$label: uninjected rerun (k=$k past the op's mutation count) " +
              "diverged from the clean run")
          done = true
        case Some(t) =>
          if (!fired) throw new AssertionError(
            s"$label: REAL failure (no injection fired) at point $k", t)
          points += 1
          val s = state() // readers must survive the crash state
          assert(validAfterCrash(s, pre, post),
            s"$label crash@$k${if (torn) " torn" else ""}: post-crash state " +
              s"is neither pre nor post:\n  got   $s\n  pre   $pre\n  post  $post")
          healthy() // committed state must audit clean even mid-garbage
          converge.getOrElse(op)()
          assert(state() == post,
            s"$label crash@$k${if (torn) " torn" else ""}: retry did not " +
              "converge to the post-op state")
          healthy()
      }
      k += 1
    }
    deleteTree(snap)
    info(s"$label: ${points} crash points swept${if (torn) " (torn)" else ""}")
    points
  }

  // ------------------------------------------------------------- fixtures

  private def env(rows: Seq[(String, Long, Long, Double, String)]): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (o, pos, uid, v, e) =>
        Row(o, "users", pos, pos * 1000L, uid, v, e) }: _*),
      CdcStream.envelopeSchema)

  private val batch1 = Seq(
    ("INSERT", 1L, 10L, 5.00, "a"), ("INSERT", 2L, 11L, 7.25, "b"),
    ("INSERT", 3L, 12L, 1.50, "a"), ("INSERT", 4L, 13L, 9.00, "c"))
  private val batch2 = Seq(
    ("UPDATE", 5L, 10L, 6.00, "a"), ("DELETE", 6L, 11L, 0.0, "b"),
    ("INSERT", 7L, 14L, 3.75, "b"))

  private def replicaRows(root: String): Seq[String] =
    new BucketedReplica(root, nBuckets = 4).read(spark)
      .collect().map(_.toString).sorted.toSeq

  private def fsckOk(root: String): Unit = {
    val bad = new BucketedReplica(root, nBuckets = 4).fsck(spark)
      .filter(!col("ok")).collect()
    assert(bad.isEmpty, s"fsck failures: ${bad.mkString("; ")}")
  }

  // ----------------------------------------------------------- the sweeps

  test("replica commit survives a crash at every control mutation — " +
    "first commit, follow-up commit, and torn-write variants") {
    val root = tmpDir("crash_rep") + "/t"
    // first commit on an empty store (meta + manifest + schema + pointer
    // all created for the first time)
    val p1 = sweep("replica first commit", root, root,
      () => { new BucketedReplica(root, nBuckets = 4).commit(env(batch1)); () },
      () => replicaRows(root), healthy = () => fsckOk(root))
    assert(p1 >= 4, s"first-commit sweep covered only $p1 mutation points")
    // follow-up commit with a tag + GC horizon (tag/time files, data GC and
    // control-file sweep of the now-superseded version all on the path)
    val p2 = sweep("replica second commit", root, root,
      () => { new BucketedReplica(root, nBuckets = 4)
        .commit(env(batch2), tombstoneGcHorizon = Some(0L), tag = Some(42L)); () },
      () => replicaRows(root), healthy = () => fsckOk(root))
    assert(p2 >= 5, s"second-commit sweep covered only $p2 mutation points")
    // torn variant: every write point re-swept with half the bytes durable.
    // Reset to the post-batch1 state first — the plain sweep's final clean
    // run left batch2 applied, which would degenerate this sweep's pre.
    deleteTree(java.nio.file.Paths.get(root))
    new BucketedReplica(root, nBuckets = 4).commit(env(batch1))
    val p3 = sweep("replica second commit (torn)", root, root,
      () => { new BucketedReplica(root, nBuckets = 4)
        .commit(env(batch2), tombstoneGcHorizon = Some(0L), tag = Some(42L)); () },
      () => replicaRows(root), healthy = () => fsckOk(root), torn = true)
    assert(p3 >= 5, s"torn sweep covered only $p3 mutation points")
  }

  test("replica compact and rebucket survive a crash at every mutation") {
    val root = tmpDir("crash_maint") + "/t"
    val rep0 = new BucketedReplica(root, nBuckets = 4)
    rep0.commit(env(batch1)); rep0.commit(env(batch2))
    // compaction: live rows are invariant (pre == post), so the sweep's
    // teeth here are reader survival, fsck, and retry convergence
    val pc = sweep("replica compact", root, root,
      () => new BucketedReplica(root, nBuckets = 4).compact(spark),
      () => replicaRows(root), healthy = () => fsckOk(root))
    assert(pc >= 4, s"compact sweep covered only $pc mutation points")
    val pr = sweep("replica rebucket 4→8", root, root,
      () => new BucketedReplica(root, nBuckets = 4).rebucket(spark, 8),
      () => new BucketedReplica(root, nBuckets = 8).read(spark)
        .collect().map(_.toString).sorted.toSeq,
      healthy = () => { val bad = new BucketedReplica(root, nBuckets = 8)
        .fsck(spark).filter(!col("ok")).collect()
        assert(bad.isEmpty, s"fsck failures: ${bad.mkString("; ")}") })
    assert(pr >= 4, s"rebucket sweep covered only $pr mutation points")
  }

  test("incremental-agg fold: every crash point lands pre, post, or the " +
    "documented replica-committed gap — and audit()+rebuild() repairs it") {
    val parent = tmpDir("crash_agg")
    val repRoot = s"$parent/replica"; val viewRoot = s"$parent/view"
    def agg() = new IncrementalAgg(
      new BucketedReplica(repRoot, nBuckets = 4), viewRoot)
    agg().applyBatch(env(batch1)) // seeded pre-state: replica + view live
    def state(): Seq[String] = {
      val r = replicaRows(repRoot).map("R|" + _)
      val v = agg().read(spark).collect().map("V|" + _.toString).sorted.toSeq
      r ++ v
    }
    def part(s: Seq[String], p: String) = s.filter(_.startsWith(p))
    val points = sweep("incremental-agg fold", parent, parent,
      () => agg().applyBatch(env(batch2)),
      () => state(), healthy = () => fsckOk(repRoot),
      validAfterCrash = (s, pre, post) =>
        s == pre || s == post ||
          // the one documented gap: replica commit landed, view fold lost
          (part(s, "R|") == part(post, "R|") && part(s, "V|") == part(pre, "V|")),
      converge = Some(() => {
        val a = agg()
        a.applyBatch(env(batch2)) // the stream's redelivery
        // redelivery diffs an idempotent re-commit to zero: if the view
        // still lags, audit() must SAY so and rebuild() must repair it
        if (!a.audit(spark).isEmpty) a.rebuild(spark)
        assert(a.audit(spark).isEmpty, "view inconsistent even after rebuild")
      }))
    assert(points >= 8, s"agg-fold sweep covered only $points mutation points")
    // torn twin over the same protocol (pins, view pointer, _META writes);
    // reset to the post-batch1 state the plain sweep's clean run rolled past
    deleteTree(java.nio.file.Paths.get(parent))
    agg().applyBatch(env(batch1))
    sweep("incremental-agg fold (torn)", parent, parent,
      () => agg().applyBatch(env(batch2)),
      () => state(), healthy = () => fsckOk(repRoot),
      validAfterCrash = (s, pre, post) =>
        s == pre || s == post ||
          (part(s, "R|") == part(post, "R|") && part(s, "V|") == part(pre, "V|")),
      converge = Some(() => {
        val a = agg()
        a.applyBatch(env(batch2))
        if (!a.audit(spark).isEmpty) a.rebuild(spark)
        assert(a.audit(spark).isEmpty, "view inconsistent even after rebuild")
      }), torn = true)
  }

  test("exactly-once fold (batch-id path): EVERY crash point self-heals " +
    "via the plain redelivery — no audit, no rebuild") {
    val parent = tmpDir("crash_agg_eo")
    val repRoot = s"$parent/replica"; val viewRoot = s"$parent/view"
    def agg() = new IncrementalAgg(
      new BucketedReplica(repRoot, nBuckets = 4), viewRoot)
    agg().applyBatch(env(batch1), 1L)
    def state(): Seq[String] = {
      val r = replicaRows(repRoot).map("R|" + _)
      val v = agg().read(spark).collect().map("V|" + _.toString).sorted.toSeq
      r ++ v
    }
    def part(s: Seq[String], p: String) = s.filter(_.startsWith(p))
    val points = sweep("exactly-once agg fold", parent, parent,
      () => agg().applyBatch(env(batch2), 2L),
      () => state(), healthy = () => fsckOk(repRoot),
      validAfterCrash = (s, pre, post) =>
        s == pre || s == post ||
          (part(s, "R|") == part(post, "R|") && part(s, "V|") == part(pre, "V|")),
      // converge = the op itself: the redelivery must fence or repair,
      // with no operator intervention — the round-13 self-heal contract
      converge = None)
    assert(points >= 8,
      s"exactly-once fold sweep covered only $points mutation points")
  }

  private def docs: DataFrame = Tables.load(spark, sfDir, "documents")
    .select(col("doc_id"), col("text")).filter(col("doc_id") < 40)

  /** Digest excludes batch_id: consolidation ids differ clean-vs-retry. */
  private def lshState(root: String): Seq[String] = {
    val idx = new LshIndex(root)
    (idx.postings(spark).select("band", "bucket", "doc_id")
      .collect().map("P|" + _.toString) ++
      idx.pairs(spark).select("d1", "d2", "n_shared_bands")
        .collect().map("C|" + _.toString) ++
      idx.sigs(spark).drop("batch_id").collect().map("S|" + _.toString))
      .sorted.toSeq
  }

  test("LSH index: append commit, reband, and compact survive every crash point") {
    val root = tmpDir("crash_lsh") + "/idx"
    new LshIndex(root).addBatch(docs.filter(col("doc_id") % 2 === 0), 0L)
    val pa = sweep("lsh addBatch", root, root,
      () => new LshIndex(root).addBatch(docs.filter(col("doc_id") % 2 === 1), 1L),
      () => lshState(root))
    assert(pa >= 2, s"addBatch sweep covered only $pa mutation points")
    val pb = sweep("lsh reband 2x4→4x2", root, root,
      () => new LshIndex(root).reband(spark, 4, 2),
      () => lshState(root))
    assert(pb >= 2, s"reband sweep covered only $pb mutation points")
    // compact no-ops on a single consolidated partition — land one more
    // append so the fold has ≥2 valid ids to collapse
    new LshIndex(root).addBatch(docs.filter(col("doc_id") % 7 === 3), 2L)
    val pcp = sweep("lsh compact", root, root,
      () => new LshIndex(root).compact(spark),
      () => lshState(root))
    assert(pcp >= 2, s"compact sweep covered only $pcp mutation points")
  }

  test("IVF index: append commit and recenter survive every crash point") {
    val root = tmpDir("crash_ivf") + "/idx"
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).filter(col("vec_id") < 48)
    def cents(n: Int): DataFrame = emb.filter(col("vec_id") < n)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
    val idx0 = new IvfIndex(root)
    idx0.create(cents(4))
    idx0.addBatch(emb.filter(col("vec_id") % 2 === 0), 0L)
    def state(): Seq[String] = new IvfIndex(root).index(spark)
      .select("vec_id", "cid").collect().map(_.toString).sorted.toSeq
    val pa = sweep("ivf addBatch", root, root,
      () => new IvfIndex(root).addBatch(emb.filter(col("vec_id") % 2 === 1), 1L),
      () => state())
    assert(pa >= 2, s"addBatch sweep covered only $pa mutation points")
    val pr = sweep("ivf recenter", root, root,
      () => new IvfIndex(root).recenter(spark, cents(6)),
      () => state())
    assert(pr >= 2, s"recenter sweep covered only $pr mutation points")
  }

  test("planted crash garbage — orphan data dirs, stale pointer tmps, torn " +
    "side files — is invisible to readers and swept by the next commit") {
    val root = tmpDir("crash_garbage") + "/t"
    val rep = new BucketedReplica(root, nBuckets = 4)
    rep.commit(env(batch1))
    val before = replicaRows(root)
    // what real crashes leave: an attempt dir no manifest references (died
    // in the data job), a hidden pointer tmp (died before the rename), a
    // torn _META side file (died mid-overwriteSafe, no terminator)
    // v2 = the version the NEXT commit takes, so its crashed-attempt orphan
    // sits at the GC ceiling and is sweepable; a HIGHER-version orphan
    // (e.g. v9) is deliberately untouchable — it could be a winning
    // in-flight writer (the round-13 data-GC ceiling fix)
    val f = new java.io.File(s"$root/data/v2-deadbeef/bucket=0")
    f.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/data/v2-deadbeef/bucket=0/part-0.parquet"),
      "not parquet")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/._PTR-9.tmp-deadbeef"), "v9 junk")
    // a manual backup copy of a pointer (post-incident surgery): not a
    // name the protocol wrote — must be ignored, not parsed as a version
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/_PTR-1.bak"), "manual copy")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/_META.next"), "pk=user_id") // no \n
    // what a kill -9 mid-parquet-write leaves: a version dir whose ONLY
    // child is Spark's _temporary staging (no bucket= payload at all) —
    // the CrossJvmKillSpec find, pinned deterministically here
    val tmpOnly = new java.io.File(s"$root/data/v2-cafebabe/_temporary/0")
    tmpOnly.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"${tmpOnly.getPath}/task-attempt.parquet"),
      "half a parquet")
    assert(replicaRows(root) === before, "garbage changed what readers see")
    fsckOk(root)
    rep.commit(env(batch2))
    fsckOk(root)
    assert(!new java.io.File(s"$root/data/v2-deadbeef").exists(),
      "next commit's GC must sweep the crashed attempt dir at its version")
    // the _temporary-only dir at the JUST-published version ages one cycle:
    // an identical-looking dir could be a LIVE same-version racer mid-
    // parquet-write (not a crash), and sweeping its staging would fail its
    // write job with a raw SparkException instead of the clean write-once
    // pointer defeat — so same-version bucket-less dirs are the NEXT
    // commit's to judge (strictly-below-ceiling cut)
    assert(new java.io.File(s"$root/data/v2-cafebabe").exists(),
      "same-version _temporary wreckage must age one cycle (live-racer guard)")
    assert(replicaRows(root).nonEmpty)
    fsckOk(root)
    rep.commit(env(batch1))
    assert(!new java.io.File(s"$root/data/v2-cafebabe").exists(),
      "a _temporary-only wreckage dir must not leak past the second GC")

    // the one stray the tolerant name-parse alone would HIDE: a pointer
    // name whose digits exceed the committed head is evidence that a
    // newer version's canonical pointer was renamed away (rolled-back
    // head) — fsck must flag it, and only it, as a failure
    def strayRow() = rep.fsck(spark)
      .filter(col("check") === "control_strays").collect()(0)
    assert(strayRow().getBoolean(1) && strayRow().getString(2) === "1",
      "the benign _PTR-1.bak stray must be reported ok") // planted above
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/_PTR-99.bak"), "renamed head?")
    val flagged = strayRow()
    assert(!flagged.getBoolean(1) && flagged.getString(3).contains("rolled"),
      s"a stray pointer above the head must flag fsck: $flagged")
    assert(new java.io.File(s"$root/_PTR-99.bak").delete())
    fsckOk(root)
  }
}
