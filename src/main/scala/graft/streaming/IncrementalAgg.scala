package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental maintenance of a grouped aggregate view over the live
  * replica — the reference's reporting layer (main.tf:188-195, "Reporting
  * data from the CloudSQL menagerie DB") kept fresh per micro-batch without
  * rescanning the table it reports on.
  *
  * Maintains `agg(group) = (n_live, sum_value)` over `rep.live`. Each
  * [[applyBatch]] diffs the replica state of ONLY the batch's keys around
  * the replica commit it performs:
  *
  *  1. old = live rows of batch keys (bucket-pruned [[BucketedReplica.readTouched]])
  *  2. `rep.commit(batch)` (latest-wins, tombstone-aware — all ordering
  *     corner cases live there, not here)
  *  3. new = live rows of batch keys
  *  4. delta = new − old per group; store ← (store ∪ delta) summed,
  *     zero-count groups dropped.
  *
  * Because the delta is a state diff (not an interpretation of the batch's
  * ops), out-of-order and duplicate deliveries are absorbed by the replica's
  * own merge semantics: whatever the commit did to the live state is exactly
  * what the aggregate absorbs.
  *
  * Scale: per-batch cost is O(touched buckets + touched groups), never
  * O(replica) — the reporting view over a 100 TB replica updates by reading
  * the few bucket files the batch's keys hash into. The pre-commit read
  * stays valid after the commit because the replica retains the previous
  * version's files (bounded staleness), so no eager materialization is
  * needed. Sums are exact DECIMAL(18,2) (the determinism contract), re-cast
  * on store so the schema is commit-count-invariant; a deployment sizes the
  * decimal to its value domain (ANSI mode fails loudly on overflow).
  *
  * The store itself follows the replica's pointer-commit pattern: versioned
  * directory + write-once `_PTR-<v>` pointer file (creation is atomic;
  * readers resolve the max), so readers never see a partial view.
  */
final class IncrementalAgg(
    rep: BucketedReplica,
    root: String,
    groupCol: String = "event_type",
    valueCol: String = "value",
    pk: String = "user_id",
    opCol: String = "op") {

  private val storeSchema = StructType(Seq(
    StructField(groupCol, StringType),
    StructField("n_live", LongType),
    StructField("sum_value", DecimalType(18, 2))))

  /** Same filesystem-agnostic control plane as the replica (see
    * [[StoreIO]]): the view store works on any Hadoop-reachable URI. */
  private val io = new StoreIO(root, StoreIO.sessionConf())

  private def pointerVersions: Seq[Long] =
    io.listFiles(io.root).map(_.getName)
      .filter(_.startsWith("_PTR-")).map(_.stripPrefix("_PTR-").toLong)

  private def currentVersion: Option[Long] = pointerVersions.sorted.lastOption

  /** The maintained aggregate view. */
  def read(spark: SparkSession): DataFrame = currentVersion match {
    case Some(v) => spark.read.schema(storeSchema).parquet(s"$root/v$v")
    case None =>
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), storeSchema)
  }

  /** Commit `batch` to the replica and fold its effect into the aggregate. */
  def applyBatch(batch0: DataFrame): Unit = {
    // the batch feeds three actions (the shared bucket probe, the replica
    // commit's write, the view write) — cache it once
    val batch = batch0.persist()
    try applyBatchCached(batch) finally { batch.unpersist(); () }
  }

  /** Test seam: invoked between the pre-commit read's snapshot and the
    * replica commit — the window a foreign writer can slip into. No-op in
    * production. */
  private[graft] var beforeReplicaCommit: () => Unit = () => ()

  private def applyBatchCached(batch: DataFrame): Unit = {
    val spark = batch.sparkSession
    val keys = batch.filter(col(pk).isNotNull).select(col(pk)).distinct()
    // ONE bucket probe per micro-batch, shared by the before-read, the
    // replica commit, and the after-read (each used to rerun the identical
    // collect — 3 driver actions where 1 suffices; at high trigger rates
    // per-batch actions are the streaming path's scalability tax)
    val touched = rep.touchedBuckets(batch)
    // ONE pinned snapshot anchors the before-read AND the commit: the
    // delta below is before/after state arithmetic, so a foreign commit
    // slipping between the two would have its effect on the batch's keys
    // silently folded into THIS batch's delta — double-counted once the
    // foreign writer's own applyBatch also lands. Serialized at the
    // pointer instead: the interleaved case aborts with ConcurrentCommit
    // and the stream's retry diffs against the post-foreign state.
    val snap = rep.pinSnapshot()
    // live state of the batch's keys; keys ≤ batch size, bounded per
    // micro-batch → broadcast the semi-join probe, never shuffle the buckets
    def keyedLive(at: Option[rep.Snapshot]): DataFrame =
      at.map(s => rep.readBucketsAt(spark, touched, s))
        .getOrElse(rep.readBucketsOf(spark, touched))
        .filter(col(opCol) =!= "DELETE")
        .join(broadcast(keys), Seq(pk), "left_semi")
        .select(col(groupCol), col(valueCol).cast(DecimalType(18, 2)).as("__v"))
    val before = keyedLive(Some(snap)) // pre-commit paths; files retained
    beforeReplicaCommit()
    rep.commit(batch, precomputedTouched = Some(touched), snapAt = Some(snap))
    val after = keyedLive(None)
    // contributions as (count-delta, sum-delta) pairs: −1/−v per old row,
    // +1/+v per new row, n/s verbatim for the existing store
    val delta = before.select(col(groupCol), lit(-1L).as("__dn"),
        (-col("__v")).as("__ds"))
      .union(after.select(col(groupCol), lit(1L).as("__dn"), col("__v").as("__ds")))
    val next = read(spark)
      .select(col(groupCol), col("n_live").as("__dn"), col("sum_value").as("__ds"))
      .union(delta)
      .groupBy(col(groupCol))
      .agg(sum(col("__dn")).as("n_live"),
        sum(col("__ds")).cast(DecimalType(18, 2)).as("sum_value"))
      .filter(col("n_live") =!= 0L)
    write(next)
  }

  private def write(next: DataFrame): Unit = {
    val newV = currentVersion.getOrElse(0L) + 1
    // the view is one row per group — a single right-sized file
    next.coalesce(1).write.mode("overwrite").parquet(s"$root/v$newV")
    io.createExclusive(io.path(s"_PTR-$newV"), newV.toString)
    pointerVersions.filter(_ < newV)
      .foreach(o => io.delete(io.path(s"_PTR-$o")))
    // keep current + previous version DIRS (readers may hold the old version)
    io.delete(io.path(s"v${newV - 2}"))
  }

  def destroy(): Unit = io.delete(io.root)
}
