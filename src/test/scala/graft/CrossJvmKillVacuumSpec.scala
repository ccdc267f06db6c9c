package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import graft.streaming.{IvfIndex, LshIndex, StoreIO}

/** TRUE process death for the one protocol CrossJvmKillStoresSpec's
  * children never ran: the index stores' vacuum() itself — the pass whose
  * failure mode (irreversible deletes mid-flight plus a lease wedging
  * every writer for a TTL) most wants a real SIGKILL rather than an
  * injected seam (IndexAuditSpec covers the seam form).
  *
  * Child protocol: loop { plant orphan wreckage; vacuum() }, with the
  * OpLog `beforeMigrateGc` seam writing a marker file and sleeping —
  * so the parent can kill at controlled offsets: inside the held-lease
  * window before any delete (round 1, deterministic), and around the
  * delete pass / release / next acquire (later rounds). The bar, after
  * every kill:
  *   - committed state is bit-identical (no committed id ever names a
  *     deleted path);
  *   - while the crashed holder's lease is live, every mutating verb
  *     refuses loudly;
  *   - past the TTL a successor vacuum retires the stale lease, finishes
  *     the sweep, and the store audits green with zero orphans;
  *   - writers proceed normally afterwards. */
class CrossJvmKillVacuumSpec extends SparkSpecBase {

  /** Offsets from the marker (written at the gc seam, before a 400 ms
    * sleep): 60 ms = mid-sleep, lease held, zero deletes yet (the
    * deterministic held-lease round); 450/700 ms = around the delete
    * pass, the release, and the next iteration's acquire. */
  private val killOffsetsMs = Seq(60L, 450L, 700L)

  private def lshDigest(root: String): Seq[String] = {
    val idx = new LshIndex(root)
    (idx.postings(spark).select("band", "bucket", "doc_id")
      .collect().map("P|" + _.toString) ++
      idx.pairs(spark).select("d1", "d2", "n_shared_bands")
        .collect().map("C|" + _.toString) ++
      idx.sigs(spark).drop("batch_id").collect().map("S|" + _.toString))
      .sorted.toSeq
  }

  /** Head lease entry if it is in `held` state (versioned `_VACUUM-<n>`
    * layout; line 3 `released` means free). */
  private def heldLease(root: String): Option[java.io.File] =
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName == "_VACUUM" || f.getName.matches("_VACUUM-\\d+"))
      .sortBy(f => f.getName.stripPrefix("_VACUUM").stripPrefix("-")
        .toLongOption.getOrElse(0L)).lastOption
      .filter(f => !Files.readString(f.toPath)
        .linesIterator.toSeq.drop(2).headOption.map(_.trim).contains("released"))

  private def auditOk(df: DataFrame, what: String): Unit =
    df.collect().foreach(r => assert(r.getBoolean(1),
      s"$what audit check ${r.getString(0)} failed: ${r.getString(2)}"))

  private def orphanCount(df: DataFrame): String =
    df.collect().find(_.getString(0) == "orphan_partitions").get.getString(2)

  /** One kill round against a store whose child loops plant+vacuum. */
  private def runRounds(childCls: String, root: String, dir: String,
                        writerRefused: Int => Unit,
                        digest: () => Seq[String],
                        audit: () => DataFrame,
                        successorVacuum: () => Seq[String]): Unit = {
    val committed = digest()
    var heldObserved = 0
    killOffsetsMs.zipWithIndex.foreach { case (offset, round) =>
      val marker = Paths.get(dir, s"marker$round")
      val child = KillStoreSteps.launch(childCls,
        Seq(root, marker.toString), s"$dir/vac$round.log")
      try {
        val deadline = System.currentTimeMillis() + 120000L
        while (!Files.exists(marker) && System.currentTimeMillis() < deadline)
          Thread.sleep(10)
        assert(Files.exists(marker), s"round $round: child never reached gc")
        Thread.sleep(offset)
        child.destroyForcibly(); child.waitFor()
      } finally { if (child.isAlive) { child.destroyForcibly(); () } }

      // committed state is bit-identical under whatever the kill left
      assert(digest() === committed,
        s"round $round: the killed vacuum touched committed state")
      // while the crashed holder's lease lives, writers refuse loudly
      if (heldLease(root).isDefined) {
        heldObserved += 1
        writerRefused(round)
      }
      auditOk(audit(), s"round $round post-kill")
      // past the TTL, a successor vacuum retires the stale lease and
      // finishes the sweep; nothing committed goes with it
      val prevTtl = sys.props.put("graft.index.vacuumTtlMs", "1")
      try {
        Thread.sleep(5) // age the crashed lease past the 1 ms test TTL
        val swept = successorVacuum()
        info(s"round $round: successor vacuum swept ${swept.size} paths")
      } finally prevTtl match {
        case Some(v) => sys.props.put("graft.index.vacuumTtlMs", v); ()
        case None => sys.props.remove("graft.index.vacuumTtlMs"); ()
      }
      val rep = audit()
      auditOk(rep, s"round $round post-successor")
      assert(orphanCount(rep) === "0",
        s"round $round: successor vacuum left orphans")
      assert(digest() === committed,
        s"round $round: the successor vacuum touched committed state")
    }
    assert(heldObserved >= 1,
      "no round observed the held-lease window — the schedule lost its teeth")
    info(s"${killOffsetsMs.size} kills, $heldObserved held-lease windows")
  }

  test("kill -9 the LSH vacuum mid-pass: the lease blocks writers until " +
    "TTL, a successor sweeps to zero orphans, committed state bit-identical") {
    val dir = tmpDir("xjvm_vac_lsh")
    val root = s"$dir/idx"
    val idx = new LshIndex(root)
    idx.addBatch(KillStoreSteps.lshDocs(spark, 0L), 0L)
    idx.addBatch(KillStoreSteps.lshDocs(spark, 1L), 1L)
    runRounds("graft.CrossJvmKillVacuumLshMain", root, dir,
      writerRefused = round => {
        val e = intercept[IllegalStateException] {
          new LshIndex(root).addBatch(
            KillStoreSteps.lshDocs(spark, 50L + round), 50L + round)
        }
        assert(e.getMessage.contains("vacuum holds"),
          s"round $round: wrong refusal: ${e.getMessage}")
      },
      digest = () => lshDigest(root),
      audit = () => new LshIndex(root).audit(spark),
      successorVacuum = () => new LshIndex(root).vacuum())
    // writers proceed normally once the wreckage era is over
    new LshIndex(root).addBatch(KillStoreSteps.lshDocs(spark, 2L), 2L)
    auditOk(new LshIndex(root).audit(spark), "final")
  }

  test("kill -9 the IVF vacuum mid-pass: same bar, including a planted " +
    "stale centroid generation in the wreckage") {
    val dir = tmpDir("xjvm_vac_ivf")
    val root = s"$dir/idx"
    val idx = new IvfIndex(root)
    idx.create(KillStoreSteps.ivfCents(spark, 0))
    idx.addBatch(KillStoreSteps.ivfVecs(spark, 0L), 0L)
    def assignment(): Seq[String] =
      new IvfIndex(root).index(spark).select("vec_id", "cid")
        .collect().map(_.toString).sorted.toSeq
    runRounds("graft.CrossJvmKillVacuumIvfMain", root, dir,
      writerRefused = round => {
        val e = intercept[IllegalStateException] {
          new IvfIndex(root).addBatch(
            KillStoreSteps.ivfVecs(spark, 50L + round), 50L + round)
        }
        assert(e.getMessage.contains("vacuum holds"),
          s"round $round: wrong refusal: ${e.getMessage}")
      },
      digest = () => assignment(),
      audit = () => new IvfIndex(root).audit(spark),
      successorVacuum = () => new IvfIndex(root).vacuum())
    new IvfIndex(root).addBatch(KillStoreSteps.ivfVecs(spark, 1L), 1L)
    auditOk(new IvfIndex(root).audit(spark), "final")
  }
}

/** Deterministic wreckage the vacuum children re-plant each iteration:
  * orphan `batch_id=<n>` dirs at ids far above any committed append (and,
  * for IVF, a stale centroid generation dir) — enough entries that the
  * delete pass has real width for a kill to land inside. Raw file I/O:
  * orphans are never read, only audited and deleted. */
object KillVacuumSteps {
  private def plantDir(path: String): Unit = {
    val d = Paths.get(path)
    Files.createDirectories(d)
    Files.write(d.resolve("junk"), "wreck".getBytes)
    ()
  }

  // orphan files land at each dataset's REAL leaf depth (postings carry a
  // bp= level, the IVF index a cid= level) — a mixed-depth plant would
  // break partition discovery for every reader, which is the audit's
  // content-bearing-stray failure class, not the orphan class under test
  def plantLsh(root: String, i: Long): Unit =
    (0 until 50).foreach { j =>
      val id = 100000 + i * 1000 + j
      plantDir(s"$root/postings/batch_id=$id/bp=0")
      plantDir(s"$root/pairs/batch_id=$id")
      plantDir(s"$root/sigs/batch_id=$id")
    }

  def plantIvf(root: String, i: Long): Unit = {
    (0 until 120).foreach(j =>
      plantDir(s"$root/index/batch_id=${100000 + i * 1000 + j}/cid=0"))
    plantDir(s"$root/centroids_gen=${900 + i}")
  }
}

/** Child: plant LSH wreckage, vacuum, repeat — marker + 400 ms sleep at
  * the gc seam gives the parent a deterministic held-lease kill window. */
object CrossJvmKillVacuumLshMain {
  def main(args: Array[String]): Unit = {
    val Array(root, marker) = args
    val idx = new LshIndex(root)
    idx.log.beforeMigrateGc = () => {
      Files.write(Paths.get(marker), "gc".getBytes)
      Thread.sleep(400)
    }
    var i = 0L
    while (true) { KillVacuumSteps.plantLsh(root, i); idx.vacuum(); i += 1 }
  }
}

/** Child: the IVF twin. */
object CrossJvmKillVacuumIvfMain {
  def main(args: Array[String]): Unit = {
    val Array(root, marker) = args
    val idx = new IvfIndex(root)
    idx.log.beforeMigrateGc = () => {
      Files.write(Paths.get(marker), "gc".getBytes)
      Thread.sleep(400)
    }
    var i = 0L
    while (true) { KillVacuumSteps.plantIvf(root, i); idx.vacuum(); i += 1 }
  }
}
