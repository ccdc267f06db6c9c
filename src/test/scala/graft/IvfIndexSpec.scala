package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.IvfIndex

/** Incremental IVF index: batched appends must equal the one-shot
  * assignment, probes must stay partition-pruned to one cluster, and a
  * replayed batch must change nothing. */
class IvfIndexSpec extends SparkSpecBase {

  private def emb: DataFrame =
    Tables.load(spark, sfDir, "embeddings").select(col("vec_id"), col("embedding"))

  private def cents: DataFrame = emb.filter(col("vec_id") < 8)
    .select(col("vec_id").as("cid"), col("embedding").as("cemb"))

  private def assignedSet(idx: IvfIndex): Set[(Long, Long)] =
    idx.index(spark).select("vec_id", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def oneShot: Set[(Long, Long)] =
    Similarity.ivfAssign(emb, cents).select("vec_id", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("three incremental batches assign exactly like the one-shot IVF build") {
    val idx = new IvfIndex(tmpDir("ivf_idx") + "/idx")
    idx.create(cents)
    idx.addBatch(emb.filter(col("vec_id") % 3 === 0), 0L)
    idx.addBatch(emb.filter(col("vec_id") % 3 === 1), 1L)
    idx.addBatch(emb.filter(col("vec_id") % 3 === 2), 2L)
    assert(assignedSet(idx) === oneShot)
  }

  test("a replayed batch is a no-op; search reads one pruned cluster and matches in-cluster brute force") {
    val idx = new IvfIndex(tmpDir("ivf_replay") + "/idx")
    idx.create(cents)
    idx.addBatch(emb.filter(col("vec_id") % 2 === 0), 0L)
    idx.addBatch(emb.filter(col("vec_id") % 2 === 1), 1L)
    val before = assignedSet(idx)
    idx.addBatch(emb.filter(col("vec_id") % 2 === 1), 1L) // retry replay
    assert(assignedSet(idx) === before)

    val probe = emb.filter(col("vec_id") === 42)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    val got = idx.search(spark, probe, 5)
    got.collect() // execute for the scan metric
    val scan = got.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.metrics("numFiles").value < idx.index(spark).inputFiles.length,
      "probe must scan only its cluster's partition, not the whole index")

    // in-cluster brute force twin
    graft.functions.VectorExpressions.register(spark)
    val assigned = Similarity.ivfAssign(emb, cents)
    val probeCid = assigned.filter(col("vec_id") === 42)
      .select("cid").collect()(0).getLong(0)
    val expect = assigned.filter(col("cid") === probeCid)
      .select(col("vec_id"),
        call_function("graft_cosine", col("embedding"),
          typedLit(probe.toSeq)).as("cs"))
      .orderBy(col("cs").desc, col("vec_id").asc).limit(5)
      .collect().map(_.getLong(0)).toSeq
    assert(got.collect().map(_.getLong(0)).toSeq === expect)
  }

  test("centroids are pinned: re-creating over an existing index fails loudly") {
    val idx = new IvfIndex(tmpDir("ivf_pin") + "/idx")
    idx.create(cents)
    intercept[IllegalArgumentException] { idx.create(cents) }
  }

  test("recenter migrates to a new centroid set; later appends and probes follow it") {
    val idx = new IvfIndex(tmpDir("ivf_recenter") + "/idx")
    idx.create(cents)
    idx.addBatch(emb.filter(col("vec_id") % 3 === 0), 0L)
    idx.addBatch(emb.filter(col("vec_id") % 3 === 1), 1L)
    // distribution drift: re-fit to a different centroid set and migrate
    val cents2 = emb.filter(col("vec_id") >= 100 && col("vec_id") < 110)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
    idx.recenter(spark, cents2)
    // post-migration stream batch (checkpoint kept: ids continue past cutoff)
    idx.addBatch(emb.filter(col("vec_id") % 3 === 2), 2L)
    // stored assignments equal the one-shot assignment under the NEW set —
    // any stale old-generation partition surviving the validity cut would
    // surface here as a (vec_id, old_cid) extra
    val expect = Similarity.ivfAssign(emb, cents2).select("vec_id", "cid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(assignedSet(idx) === expect)

    // probes rank against the new generation's centroids
    val probe = emb.filter(col("vec_id") === 42).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    graft.functions.VectorExpressions.register(spark)
    val assigned = Similarity.ivfAssign(emb, cents2)
    val probeCid = assigned.filter(col("vec_id") === 42)
      .select("cid").collect()(0).getLong(0)
    val expectTop = assigned.filter(col("cid") === probeCid)
      .select(col("vec_id"),
        call_function("graft_cosine", col("embedding"),
          typedLit(probe.toSeq)).as("cs"))
      .orderBy(col("cs").desc, col("vec_id").asc).limit(5)
      .collect().map(_.getLong(0)).toSeq
    assert(idx.search(spark, probe, 5).collect().map(_.getLong(0)).toSeq === expectTop)

    // a second migration (generation 2) converges the same way
    idx.recenter(spark, cents)
    val expect2 = Similarity.ivfAssign(emb, cents).select("vec_id", "cid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(assignedSet(idx) === expect2)
  }
}
