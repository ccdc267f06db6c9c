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
