package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incrementally-maintained IVF (inverted-file) ANN index — the streaming
  * form of the e09c materialized index: embedding vectors arrive in
  * micro-batches, each batch is assigned to its nearest centroid map-side
  * and appended under that centroid's partition; probes keep reading
  * exactly one cluster directory.
  *
  * The centroid set defines the stored layout (like the replica's bucket
  * count and the LSH index's banding), but it is NOT pinned forever: the
  * stored PRIMITIVE is the raw `(vec_id, embedding)` rows — centroid
  * assignment is derived — so [[recenter]] can migrate the index to a new
  * centroid set (e.g. k-means re-fit after the corpus distribution drifts)
  * without re-reading the source corpus, under the same [[OpLog]] commit
  * protocol as `LshIndex.reband` (and the same write-once pointer
  * discipline as `BucketedReplica`).
  *
  * Layout (under `root`):
  * {{{
  *   centroids/part-….parquet                      // generation 0 (cid, cemb)
  *   centroids_gen=<v>/part-….parquet              // generation v, from recenter
  *   index/batch_id=<n>/cid=<k>/part-….parquet     // (vec_id, embedding)
  *   _LOG-<v>                                      // write-once operation log
  * }}}
  *
  * Commit protocol: data is written before its log entry, and readers union
  * exactly the partition ids committed entries name — a recenter that
  * crashes between its consolidated rewrite and its commit leaves only
  * invisible garbage (no id-range cut to leak through), and a recenter
  * racing a LIVE addBatch is serialized by the write-once log version:
  * whichever commits second observes the other and recomputes (the append
  * cleans up its dead-layout output and rethrows for the stream's retry;
  * the migration re-runs its rewrite including the new batch).
  *
  * Scale design:
  *  - assignment is a crossJoin against BROADCAST centroids (k×dim) + a
  *    per-vector argmax — no shuffle of the vectors;
  *  - the index append is batch_id-partitioned with overwrite, so a
  *    foreachBatch retry replaces its own output (exactly-once, the
  *    staging-sink pattern);
  *  - a probe ranks centroids against the broadcast set and scans ONE
  *    cid partition across all batch dirs — partition pruning bounds the
  *    read to 1/k of the corpus no matter how many batches have landed;
  *  - [[recenter]]'s one-time cost is one re-assignment pass over the
  *    stored vectors (broadcast argmax, no shuffle) + one partitioned
  *    rewrite — paid per migration, not per batch.
  */
final class IvfIndex(root: String) extends MaintainableStore {

  private val io = new StoreIO(root, StoreIO.sessionConf())
  private[graft] val log = new OpLog(io)

  private def indexDir = s"$root/index"

  private val indexReadSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("cid", LongType), StructField("batch_id", LongType)))

  /** Centroid dir of the state's current generation. */
  private def centroidDirOf(st: OpLog.State): String =
    st.migration.map(_("dir")).getOrElse("centroids")

  private def idFilter(ids: Seq[Long]): Column =
    if (ids.isEmpty) lit(false) else col("batch_id").isin(ids: _*)

  // the shared partition-naming rule + stray semantics: OpLog.batchIdOf
  private def parseBatchId(name: String): Option[Long] = OpLog.batchIdOf(name)

  private def listedIds: Seq[Long] =
    io.listDirs(new org.apache.hadoop.fs.Path(indexDir))
      .flatMap(p => parseBatchId(p.getName))

  /** Pin the initial centroid set (once, at creation). `cents`: (cid, cemb). */
  def create(cents: DataFrame): Unit = {
    require(!io.exists(io.path("centroids")),
      s"IVF index at $root already has centroids — use recenter() to migrate")
    cents.coalesce(1).write.parquet(s"$root/centroids")
  }

  /** The current generation's centroid set. */
  def centroids(spark: SparkSession): DataFrame =
    spark.read.parquet(s"$root/${centroidDirOf(log.state)}")

  /** The stored index of the CURRENT centroid generation (cid/batch_id from
    * the partition dirs). */
  // once the index dir exists it stays (only destroy removes it): cache
  // the positive probe so steady-state batches pay zero exists round trips
  @volatile private var indexDirKnown = false

  def index(spark: SparkSession): DataFrame =
    if (!indexDirKnown && !io.exists(io.path("index")))
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        indexReadSchema)
    else { indexDirKnown = true
      spark.read.schema(indexReadSchema)
        .option("basePath", indexDir).parquet(indexDir)
        .filter(idFilter(log.state.validIds)) }

  /** Nearest-centroid assignment of `vecs` against `cents` — broadcast
    * argmax, no shuffle of the vectors (shared by [[addBatch]] and
    * [[recenter]]). */
  private def assignTo(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val spark = vecs.sparkSession
    graft.functions.VectorExpressions.register(spark)
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cid").asc)
    vecs.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cid"),
        call_function("graft_cosine", col("embedding"), col("cemb")).as("csim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid"))
  }

  /** Assign `vecs` (vec_id, embedding) to their nearest current-generation
    * centroid and append them under the centroid's partition, then commit
    * the batch to the log. Idempotent under foreachBatch retries (committed
    * replays no-op via the log's maxSeen fence; uncommitted retries
    * overwrite their own partition). Safe against a concurrent [[recenter]]
    * — see the class doc's commit protocol. */
  def addBatch(vecs: DataFrame, batchId: Long): Unit = {
    val spark = vecs.sparkSession
    val st = log.state
    // AFTER the state read, BEFORE any write — see the OpLog lease
    // section's order argument (the LshIndex.addBatch twin)
    log.assertNoLiveVacuum("IvfIndex.addBatch")
    if (batchId <= st.maxSeen) return // committed replay (checkpoint re-run)
    assignTo(vecs, spark.read.parquet(s"$root/${centroidDirOf(st)}"))
      .write.mode("overwrite").partitionBy("cid")
      .parquet(s"$indexDir/batch_id=$batchId")
    log.commitAppend(st.version, batchId,
      () => io.delete(new org.apache.hadoop.fs.Path(s"$indexDir/batch_id=$batchId")))
  }

  /** Migrate the index to a NEW centroid set — e.g. a k-means re-fit over
    * the stored vectors after distribution drift — WITHOUT re-reading the
    * source corpus. The stored vectors are re-assigned wholesale into one
    * consolidated negative-batch_id partition, the new centroids land in a
    * fresh generation dir, then one write-once log entry flips the
    * generation. Pre-commit the consolidated partition is at an id no
    * committed entry names — invisible by construction (the r5 hole closed)
    * — so a crash anywhere re-runs to convergence and the trailing deletes
    * are pure physical GC.
    *
    * ONLINE-safe: no stream-paused contract — a racing addBatch is
    * serialized by the log (see class doc). A stream resuming after the
    * migration keeps its checkpoint so batch ids stay monotone — the same
    * contract every versioned store here shares. */
  def recenter(spark: SparkSession, newCents: DataFrame): Unit = {
    log.migrate("recenter") { st =>
      // in-body (not just pre-loop): a retry body after a lost race could
      // otherwise reuse a consol id a concurrent vacuum is mid-deleting
      log.assertNoLiveVacuum("IvfIndex.recenter")
      // below every id ever used (crashed attempts' garbage included)
      val consol = ((listedIds ++ st.validIds) :+ 0L).min - 1L
      // distinct: a vector double-stored by a crash-retry window collapses here
      val vecs = spark.read.schema(indexReadSchema)
        .option("basePath", indexDir).parquet(indexDir)
        .filter(idFilter(st.validIds))
        .select(col("vec_id"), col("embedding")).distinct()
      assignTo(vecs, newCents)
        .write.mode("overwrite").partitionBy("cid")
        .parquet(s"$indexDir/batch_id=$consol")
      val genDir = s"centroids_gen=${st.version + 1}"
      newCents.coalesce(1).write.mode("overwrite").parquet(s"$root/$genDir")
      // GC set snapshotted PRE-commit — a post-commit listing would race a
      // just-committed concurrent append — and ids above st.maxSeen are
      // excluded: a defeated append's retry REUSES its batch_id dir name,
      // so deleting it races the retry's fresh write (see
      // LshIndex.gcSnapshot, the IndexStoreStressSpec find)
      val dead = io.listDirs(new org.apache.hadoop.fs.Path(indexDir))
        .filter(p => parseBatchId(p.getName)
          .exists(id => id != consol && id <= st.maxSeen))
      (Map("type" -> "migrate", "dir" -> genDir,
        "consol" -> consol.toString, "maxseen" -> st.maxSeen.toString),
        () => dead.foreach(io.delete))
    }
  }

  /** Maintenance: fold every committed batch partition into ONE
    * consolidated partition (keeping the cid sub-layout probes prune on)
    * and the operation log down to a single entry — the small-file
    * compaction a long-running ingest needs. Same online-safe optimistic
    * commit as [[recenter]]: pre-commit output is invisible, a racing
    * append is serialized at the log. The current centroid generation is
    * carried into the compact entry so the layout survives log truncation. */
  def compact(spark: SparkSession): Unit = {
    val pre = log.state
    if (pre.validIds.size <= 1) return // nothing to fold
    log.migrate("compact") { st =>
      log.assertNoLiveVacuum("IvfIndex.compact") // see recenter
      val consol = ((listedIds ++ st.validIds) :+ 0L).min - 1L
      spark.read.schema(indexReadSchema)
        .option("basePath", indexDir).parquet(indexDir)
        .filter(idFilter(st.validIds))
        .drop("batch_id").distinct()
        .write.mode("overwrite").partitionBy("cid")
        .parquet(s"$indexDir/batch_id=$consol")
      // same maxSeen cut as recenter: in-flight append dirs are the
      // retry's to overwrite, never this GC's to delete
      val dead = io.listDirs(new org.apache.hadoop.fs.Path(indexDir))
        .filter(p => parseBatchId(p.getName)
          .exists(id => id != consol && id <= st.maxSeen))
      (Map("type" -> "compact", "dir" -> centroidDirOf(st),
        "consol" -> consol.toString, "auxconsol" -> consol.toString,
        "maxseen" -> st.maxSeen.toString),
        () => dead.foreach(io.delete))
    }
  }

  /** Top-k neighbors of `probeVec` from its nearest centroid's partition
    * only (nprobe=1; the multi-probe lever is a cid IN (…) over the same
    * pruned layout). */
  def search(spark: SparkSession, probeVec: Array[Float], k: Int): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    val pcol = typedLit(probeVec.toSeq)
    val bestCid = centroids(spark)
      .select(col("cid"),
        call_function("graft_cosine", col("cemb").cast(ArrayType(FloatType)), pcol).as("csim"))
      .orderBy(col("csim").desc, col("cid").asc)
      .limit(1).collect()(0).getLong(0) // k rows, control-plane
    index(spark)
      .filter(col("cid") === bestCid) // partition-pruned scan
      .select(col("vec_id"), col("cid"),
        call_function("graft_cosine", col("embedding"), pcol).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Structural integrity audit — one report row per protocol invariant
    * (the [[LshIndex.audit]] twin; see there for the scan-cost contract).
    * The cid-conformity check is the load-bearing one for serving: a
    * stored vector assigned under a DEAD centroid generation would sit in
    * a partition no probe of the current generation ever prunes to —
    * silently unsearchable. */
  def audit(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.Row
    val reportSchema = StructType(Seq(
      StructField("check", StringType, nullable = false),
      StructField("ok", BooleanType, nullable = false),
      StructField("observed", StringType, nullable = false),
      StructField("details", StringType, nullable = false)))
    val rows = scala.collection.mutable.Buffer[Row]()
    scala.util.Try(log.state) match {
      case scala.util.Failure(e) =>
        rows += Row("log_parse", false, "unreadable",
          s"${e.getClass.getSimpleName}: ${e.getMessage}")
      case scala.util.Success(st) =>
        rows += Row("log_parse", true, s"v${st.version}",
          s"${st.validIds.size} valid partitions, " +
            s"generation dir ${centroidDirOf(st)}")
        val have = listedIds.toSet
        val missing = st.validIds.filterNot(have)
        rows += Row("committed_dirs_present", missing.isEmpty,
          s"${st.validIds.size} expected",
          if (missing.isEmpty) "every committed partition dir exists"
          else s"MISSING: ${missing.mkString(",")}")
        val centsOk = io.exists(io.path(centroidDirOf(st)))
        rows += Row("centroids_present", centsOk, centroidDirOf(st),
          "the current generation's centroid set must exist")
        if (centsOk) {
          // Try-wrapped: a scan that cannot run (file-bearing stray
          // poisoning partition discovery) becomes a failing ROW, never
          // an aborted audit — the LshIndex.audit discipline
          rows += (scala.util.Try {
            index(spark).select(col("cid")).distinct()
              .join(centroids(spark).select(col("cid")).distinct(),
                Seq("cid"), "left_anti").count()
          } match {
            case scala.util.Success(badCid) =>
              Row("cids_in_generation", badCid == 0L,
                s"$badCid unknown cids",
                "a vector under a dead generation's cid is unsearchable " +
                  "(probes prune to current-generation partitions only)")
            case scala.util.Failure(e) =>
              Row("cids_in_generation", false, "scan failed",
                s"scan threw ${e.getClass.getSimpleName}: " +
                  s"${String.valueOf(e.getMessage).take(200)}")
          })
        }
        val orphans = (have -- st.validIds).map(i => s"index/$i").toSeq ++
          staleGenDirs(st).map(_.getName)
        rows += Row("orphan_partitions", true, s"${orphans.size}",
          if (orphans.isEmpty) "none"
          else "invisible to readers; vacuum() reclaims: " +
            orphans.sorted.mkString(","))
        // empty strays are inert (ok); content-bearing ones break every
        // reader's partition discovery — flagged as the cause, ok=false
        val strays = io.listDirs(new org.apache.hadoop.fs.Path(indexDir))
          .filter(p => parseBatchId(p.getName).isEmpty)
          .map { p =>
            val bearing = io.listFiles(p).nonEmpty || io.listDirs(p).nonEmpty
            (s"index/${p.getName}", bearing)
          } ++
          // _LOG-prefixed strays (a `_LOG-3.bak` manual copy) that
          // versions() skips — reported here so the skip never hides them
          log.strayLogNames.map(n => (n, false))
        val bearing = strays.collect { case (n, true) => n }
        rows += Row("unrecognized_entries", bearing.isEmpty, s"${strays.size}",
          if (strays.isEmpty) "none"
          else if (bearing.isEmpty)
            "empty dirs outside the store's naming; inert, skipped by " +
              "vacuum — operator's to remove: " +
              strays.map(_._1).sorted.mkString(",")
          else "CONTENT-BEARING dirs outside the store's naming break " +
            "partition discovery for every reader — move them out of the " +
            s"dataset dir: ${bearing.sorted.mkString(",")}")
    }
    spark.createDataFrame(java.util.Arrays.asList(rows.toSeq: _*), reportSchema)
  }

  /** Centroid generation dirs the current state does not reference —
    * leaked by a recenter whose post-commit GC died. */
  private def staleGenDirs(st: OpLog.State): Seq[org.apache.hadoop.fs.Path] = {
    val cur = centroidDirOf(st)
    io.listDirs(io.root).filter { p =>
      val n = p.getName
      n != cur && (n == "centroids" || n.startsWith("centroids_gen="))
    }
  }

  /** Reclaim partitions no committed log entry references — crashed
    * appends that never retried, dead consolidations whose GC thunk died,
    * stale centroid generations, leaked write-once tmps. The quiesced-only
    * contract is ENFORCED via the `_VACUUM` lease + `vacuum` log entry —
    * same protocol and no-silent-loss argument as [[LshIndex.vacuum]]. */
  def vacuum(): Seq[String] = {
    val token = log.acquireVacuumLease()
    try {
      log.assertNoStrayLogNames("IvfIndex.vacuum") // deletes fold on the log
      val tmps = io.listFiles(io.root)
        .filter(_.getName.matches("\\.(_LOG-\\d+|_VACUUM(-\\d+)?)\\.tmp-[0-9a-f]{8}"))
        .map { p => io.delete(p); p.toString }
      def deadAt(st: OpLog.State): Seq[org.apache.hadoop.fs.Path] =
        io.listDirs(new org.apache.hadoop.fs.Path(indexDir))
          .filter(p => parseBatchId(p.getName)
            .exists(id => !st.validIds.contains(id))) ++ staleGenDirs(st)
      // no log fence needed when nothing is dead: tmps are invisible to all
      if (deadAt(log.state).isEmpty) return tmps
      var deleted = Seq.empty[String]
      log.migrate("vacuum") { st =>
        val dead = deadAt(st)
        (Map("type" -> "vacuum"),
          () => deleted = dead.map { p => io.delete(p); p.toString })
      }
      tmps ++ deleted
    } finally log.releaseVacuumLease(token)
  }

  def destroy(): Unit = { indexDirKnown = false; log.reset(); io.delete(io.root) }
}
