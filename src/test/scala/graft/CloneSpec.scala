package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.streaming.{BucketedReplica, CdcStream}
import java.io.File

/** Shallow table clone (BigQuery table clones / Delta shallow-clone
  * semantics on the BucketedReplica): zero data bytes at creation, full
  * independence afterwards, copy-on-write materialization, and — unlike
  * Delta's documented "vacuum breaks clones" caveat — GC SAFETY by
  * protocol: the source's GC keep-set unions every bucket file a
  * registered clone still references. */
class CloneSpec extends SparkSpecBase {

  private def mkBatch(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), CdcStream.envelopeSchema)

  private def row(op: String, pos: Long, ts: Long, uid: Long, v: Double): Row =
    Row(op, "users", pos, ts, uid, v, "evt")

  private def dataFiles(root: String): Seq[String] = {
    def walk(f: File): Seq[File] =
      if (f.isFile) Seq(f)
      else Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
    val d = new File(root, "data")
    if (!d.exists()) Seq.empty
    else walk(d).filter(_.getName.endsWith(".parquet")).map(_.getPath)
  }

  private def state(r: BucketedReplica): Map[Long, (Long, Double)] =
    r.live(spark).collect()
      .map(x => x.getLong(4) -> (x.getLong(2), x.getDouble(5))).toMap

  test("clone reads the source version with ZERO copied data files") {
    val sroot = tmpDir("cl_src") + "/rep"
    val src = new BucketedReplica(sroot, nBuckets = 4)
    src.commit(mkBatch((1L to 30L).map(k => row("INSERT", k, k, k, k * 1.0))))
    val before = state(src)
    val clone = src.cloneShallow(tmpDir("cl_dst") + "/rep")
    assert(state(clone) === before)
    assert(dataFiles(clone.root).isEmpty, "shallow clone copied data files")
    assert(clone.externalRefs > 0)
    assert(src.registeredClones === Seq(clone.root))
  }

  test("divergence: commits to either side never affect the other") {
    val src = new BucketedReplica(tmpDir("cl_div_s") + "/rep", nBuckets = 4)
    src.commit(mkBatch((1L to 20L).map(k => row("INSERT", k, k, k, k * 1.0))))
    val atClone = state(src)
    val clone = src.cloneShallow(tmpDir("cl_div_d") + "/rep")
    src.commit(mkBatch(Seq(row("UPDATE", 100L, 100L, 3L, 333.0),
      row("INSERT", 101L, 101L, 77L, 77.0))))
    clone.commit(mkBatch(Seq(row("UPDATE", 200L, 200L, 5L, 555.0),
      row("DELETE", 201L, 201L, 9L, 0.0))))
    val s = state(src); val c = state(clone)
    assert(s(3L) === ((100L, 333.0)) && s.contains(77L) && s(5L)._1 === 5L)
    assert(c(5L) === ((200L, 555.0)) && !c.contains(9L) && c(3L)._1 === 3L)
    assert(!c.contains(77L))
    assert((atClone - 9L - 5L).forall { case (k, v) => c(k) == v })
  }

  test("copy-on-write: a clone commit materializes ONLY touched buckets") {
    val src = new BucketedReplica(tmpDir("cl_cow_s") + "/rep", nBuckets = 4)
    src.commit(mkBatch((1L to 40L).map(k => row("INSERT", k, k, k, k * 1.0))))
    val clone = src.cloneShallow(tmpDir("cl_cow_d") + "/rep")
    val extBefore = clone.externalRefs
    clone.commit(mkBatch(Seq(row("UPDATE", 500L, 500L, 7L, 7.7))))
    assert(dataFiles(clone.root).nonEmpty)
    assert(clone.externalRefs === extBefore - 1,
      "exactly the touched bucket should have gone local")
    // full materialization via compact → no external refs left
    clone.compact(spark)
    assert(clone.externalRefs === 0)
    // after detach the source no longer tracks it
    src.detachClone(clone.root)
    assert(src.registeredClones.isEmpty)
    // and the materialized clone still reads correctly on its own
    assert(state(clone)(7L) === ((500L, 7.7)))
  }

  test("source GC keeps clone-referenced files alive across many commits") {
    val src = new BucketedReplica(tmpDir("cl_gc_s") + "/rep", nBuckets = 4)
    src.commit(mkBatch((1L to 40L).map(k => row("INSERT", k, k, k, k * 1.0))))
    val atClone = state(src)
    val clone = src.cloneShallow(tmpDir("cl_gc_d") + "/rep")
    // many commits touching EVERY bucket: without clone protection the
    // v1 bucket files fall out of cur+prev manifests and get GC'd
    (1 to 4).foreach { i =>
      src.commit(mkBatch((1L to 40L).map(k =>
        row("UPDATE", 1000L * i + k, 1000L * i + k, k, k * 2.0))))
    }
    assert(state(clone) === atClone,
      "clone lost data after source GC — protection failed")
    // control: detach, then roll the source again — the old files may go;
    // the clone must now FAIL loudly rather than read wrong data
    src.detachClone(clone.root)
    (5 to 6).foreach { i =>
      src.commit(mkBatch((1L to 40L).map(k =>
        row("UPDATE", 1000L * i + k, 1000L * i + k, k, k * 2.0))))
    }
    val survived = try { state(clone) === atClone } catch { case _: Throwable => false }
    assert(!survived,
      "detached clone still read the GC'd version — detach should have " +
        "lifted protection (destroy or materialize before detaching)")
  }

  test("clone creation is crash-retryable; provisioned tables are protected") {
    val src = new BucketedReplica(tmpDir("cl_cr_s") + "/rep", nBuckets = 4)
    src.commit(mkBatch((1L to 10L).map(k => row("INSERT", k, k, k, k * 1.0))))
    val destRoot = tmpDir("cl_cr_d") + "/rep"
    // simulate a first attempt that crashed AFTER meta+manifest+register
    // but BEFORE the pointer landed: never readable, retry must succeed
    val dio = new graft.streaming.StoreIO(destRoot,
      graft.streaming.StoreIO.sessionConf())
    dio.writeString(dio.path("_META"), "nBuckets=4\npk=user_id\n")
    dio.writeString(dio.path("manifest-1.tsv"), "#n=4\n")
    // ... and had already registered on the source before crashing
    val metaF = java.nio.file.Paths.get(src.root, "_META")
    java.nio.file.Files.writeString(metaF,
      java.nio.file.Files.readString(metaF) + s"clone.1=$destRoot\n")
    val clone = src.cloneShallow(destRoot)
    assert(state(clone) === state(src))
    // registration did not duplicate across the retry
    assert(src.registeredClones.count(_ == destRoot) === 1)
    // a PROVISIONED empty table (meta, no clone manifest) refuses clobber
    val provRoot = tmpDir("cl_cr_p") + "/rep"
    val pio = new graft.streaming.StoreIO(provRoot,
      graft.streaming.StoreIO.sessionConf())
    pio.writeString(pio.path("_META"), "nBuckets=4\npk=user_id\n")
    intercept[IllegalArgumentException](src.cloneShallow(provRoot))
    // a LIVE replica refuses too
    intercept[IllegalArgumentException](src.cloneShallow(clone.root))
  }

  test("a clone with live external refs refuses to be cloned again") {
    val src = new BucketedReplica(tmpDir("cl_cc_s") + "/rep", nBuckets = 4)
    src.commit(mkBatch((1L to 10L).map(k => row("INSERT", k, k, k, k * 1.0))))
    val clone = src.cloneShallow(tmpDir("cl_cc_d") + "/rep")
    intercept[IllegalArgumentException] {
      clone.cloneShallow(tmpDir("cl_cc_g") + "/rep")
    }
    // materialized, it may be cloned
    clone.compact(spark)
    val grand = clone.cloneShallow(tmpDir("cl_cc_g2") + "/rep")
    assert(state(grand) === state(clone))
  }
}
