package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming training-corpus ingest — the E-series pipeline (quality gate →
  * exact dedup → MinHash-LSH near-dup indexing → shard-ready corpus store)
  * run INCREMENTALLY over a document stream, the way a 100 TB corpus is
  * actually assembled: documents arrive continuously (a crawl feed, the CDC
  * document table), and each micro-batch must be folded in with work
  * bounded by the BATCH, never by the corpus accumulated so far.
  *
  * This is the streaming twin of the batch e25_dedup_corpus pass, composed
  * from the same proven parts: the quality predicate of e15, the
  * content-hash dedup of e01, and the incremental [[LshIndex]] (whose
  * bounded-probe economics LshIndexSpec verifies by scan metrics).
  *
  * Layout (under `root`):
  * {{{
  *   rejects/batch_id=<n>/      docs failing the quality gate (+ reason)
  *   corpus/batch_id=<n>/       accepted docs, append-only
  *   seen/batch_id=<n>/hp=<k>/  content-hash postings (hash, doc_id)
  *   lsh/...                    LshIndex postings + candidate pairs
  * }}}
  *
  * Exactly-once: every writer overwrites its OWN `batch_id=<n>` partition
  * and every probe of stored state excludes the in-flight batch_id, so a
  * foreachBatch retry recomputes byte-identical output no matter where the
  * first attempt crashed (same discipline as the staging sink and
  * [[LshIndex.addBatch]]).
  *
  * Bounded per-batch reads: the exact-dedup probe partitions the seen-hash
  * store by `hp = pmod(xxhash64(content_hash), nHp)` and reads only the hp
  * partitions the incoming batch touches — at a trillion stored hashes the
  * probe cost tracks the batch, not the corpus (the same move LshIndex
  * makes for its postings).
  */
final class CorpusIngest(root: String, nHp: Int = 16,
                         cleanInput: Boolean = false,
                         nearDupMinSig: Option[Int] = None)
    extends MaintainableStore {

  private val io = new StoreIO(root, StoreIO.sessionConf())
  val lsh = new LshIndex(s"$root/lsh")

  // ---- durable layout contract -------------------------------------------
  // The hp partition count is LAYOUT, like the replica's bucket count and
  // the LSH banding: a probe run under a different nHp than the store's
  // writer prunes to the WRONG hp partitions and silently admits stored
  // duplicates. One tiny `_INGEST` meta file (written once, first batch)
  // makes the contract durable: later opens — including the cold SQL
  // audit door, which knows only the root — read the true layout instead
  // of trusting the constructor default.
  private val metaPath = io.path("_INGEST")
  @volatile private var metaChecked = false

  /** The store's durable hp count, if the meta file exists and parses.
    * `Some(Left(raw))` = meta present but GARBLED (manual edit) — callers
    * must refuse/report, never guess a layout from it. */
  private[graft] def storedNHpState: Option[Either[String, Int]] =
    if (!io.existsSafe(metaPath)) None
    else Some {
      val raw = io.readSafe(metaPath)
      raw.linesIterator
        .collectFirst { case l if l.startsWith("nhp=") =>
          l.stripPrefix("nhp=").trim }
        .flatMap(_.toIntOption).filter(_ > 0)
        .toRight(raw.take(80))
    }

  private[graft] def storedNHp: Option[Int] =
    storedNHpState.flatMap(_.toOption)

  /** Verify (or first-write) the layout contract; loud on a mismatched or
    * garbled open — the dedup-probe-prunes-wrong hazard above. The
    * first-write is createExclusive (two processes racing a fresh store
    * with DIFFERENT nHp must not both pass — the loser re-reads and hits
    * the mismatch refusal) and only happens while the seen store is still
    * EMPTY: a pre-meta store that already holds data keeps its layout
    * unknown rather than having this handle's possibly-wrong value
    * stamped as durable truth. */
  private def ensureMeta(): Unit = if (!metaChecked) {
    def verify(state: Either[String, Int]): Unit = state match {
      case Right(stored) => require(stored == nHp,
        s"$root was written with nHp=$stored but opened with nHp=$nHp — " +
          "the exact-dedup probe would prune the wrong hp partitions and " +
          "silently admit stored duplicates; reopen with the stored value")
      case Left(raw) => throw new IllegalStateException(
        s"$root's _INGEST layout meta is garbled ('$raw') — restore it " +
          "(nhp=<n>) before ingesting; guessing a layout would silently " +
          "admit stored duplicates")
    }
    storedNHpState match {
      case Some(state) => verify(state)
      case None =>
        val legacyData = io.listDirs(io.path("seen"))
          .exists(p => OpLog.batchIdOf(p.getName).isDefined)
        if (!legacyData) {
          try io.createExclusive(metaPath, s"nhp=$nHp\n")
          catch { case _: java.io.IOException =>
            // lost the first-write race — the winner's value is the truth
            verify(storedNHpState.getOrElse(Left("missing after race")))
          }
        }
        // pre-meta store with data: leave the layout unknown (pre-r15
        // behavior) instead of stamping this handle's value as truth —
        // the audit's hp_layout/hp_placement rows surface the gap
    }
    metaChecked = true
  }

  /** Test seam: invoked between the batch's side-dir writes (rejects/
    * corpus/seen/neardup) and the delegated [[LshIndex.addBatch]] commit —
    * the window the composed vacuum fence exists for. No-op in production. */
  private[graft] var beforeDelegatedCommit: () => Unit = () => ()

  private val seenReadSchema = StructType(Seq(
    StructField("content_hash", StringType), StructField("doc_id", LongType),
    StructField("hp", IntegerType), StructField("batch_id", LongType)))

  // a sink dir, once present, stays present for the store's life (only
  // destroy removes it) — cache the positive probe so steady-state batches
  // pay zero exists round trips (the replica's exists-pre-probe cut)
  private val knownDirs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def dirReader(spark: SparkSession, rel: String, schema: StructType): DataFrame =
    if (!knownDirs.contains(rel) && !io.exists(io.path(rel)))
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    else { knownDirs.add(rel)
      spark.read.schema(schema).option("basePath", s"$root/$rel").parquet(s"$root/$rel") }

  private val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType), StructField("batch_id", LongType)))

  /** Accepted corpus so far (all batches). READ-UNCOMMITTED fast path: the
    * corpus sinks have no log of their own (the data dir is the commit), so
    * a crashed ingest's partial batch is visible here until its redelivery
    * overwrites it — eventual consistency with zero control-plane reads,
    * right for the monitoring/analytics queries this feeds.
    * [[corpusCommitted]] is the exact twin for consumers that must not see
    * in-flight batches (training-shard export). */
  def corpus(spark: SparkSession): DataFrame = dirReader(spark, "corpus", docSchema)

  /** The corpus restricted to COMMITTED ingest batches. `ingestBatch`
    * commits the delegated [[LshIndex]] LAST, so a batch id at or below
    * the index log's `maxSeen` proves the whole ingest of that batch
    * completed (ids are monotone — the stream's checkpoint contract);
    * a crashed attempt's partial corpus partition always carries an id
    * ABOVE it. One control-plane read (the cached log fold), the same
    * partition-pruned scan otherwise. */
  def corpusCommitted(spark: SparkSession): DataFrame =
    corpus(spark).filter(col("batch_id") <= lsh.log.state.maxSeen)

  /** Quality-gate rejects (audit sink, not a dead letter — these are
    * well-formed rows the POLICY dropped, with the reason recorded). */
  def rejects(spark: SparkSession): DataFrame = dirReader(spark, "rejects",
    docSchema.add(StructField("reject_reason", StringType)))

  /** The content-hash store backing exact dedup. */
  def seen(spark: SparkSession): DataFrame = dirReader(spark, "seen", seenReadSchema)

  /** Online near-dup rejects (audit sink; only written when
    * `nearDupMinSig` is set): one row per rejected doc with its earliest
    * surviving partner and the signature agreement that condemned it. */
  def nearDupRejects(spark: SparkSession): DataFrame =
    dirReader(spark, "neardup", StructType(Seq(
      StructField("doc_id", LongType), StructField("partner", LongType),
      StructField("n_sig_match", IntegerType), StructField("batch_id", LongType))))

  /** Deterministic training-shard view of the accepted corpus: shard is a
    * pure function of doc_id (reproducible under any partitioning; no
    * shuffle — the assignment is map-side, like e22). */
  def shards(spark: SparkSession, nShards: Int): DataFrame =
    corpus(spark).withColumn("shard",
      pmod(xxhash64(col("doc_id")), lit(nShards.toLong)).cast(IntegerType))

  /** Fold one micro-batch of documents into the corpus. Idempotent under
    * retries of the same (docs, batchId). */
  def ingestBatch(rawDocs: DataFrame, batchId: Long): Unit = {
    val spark = rawDocs.sparkSession
    ensureMeta()
    // Composed vacuum fence, captured BEFORE any side-dir write: the dirs
    // this method writes below live OUTSIDE the LSH log's visibility, so
    // without it a vacuum sweeping between the corpus write and the
    // delegated commit would let the commit land with the batch's corpus
    // already deleted (see LshIndex.sideWriteFence). The fenced commit
    // throws ConcurrentCommit instead, and the stream's retry re-runs this
    // whole method — every side dir is rewritten.
    val fence = lsh.sideWriteFence("CorpusIngest.ingestBatch")
    // ---- canonicalization (opt-in; the e77/e78 stages, per-row form) ---
    // Cleaning MUST precede dedup: a markup-wrapped or NFC-decomposed
    // duplicate of a stored doc hashes differently raw and identically
    // clean — running it here is what makes the content-hash store and
    // the LSH signatures see through representation noise.
    val docs = if (cleanInput) CorpusIngest.clean(rawDocs) else rawDocs
    // ---- quality gate (the e15 predicate, per-row form) ----------------
    val reason = when(col("text").isNull || length(col("text")) === 0, "empty_text")
      .when(col("n_chars") =!= length(col("text")), "length_mismatch")
    val gated = docs.select(docCols.map(col) :+ reason.as("reject_reason"): _*)
      .persist() // two consumers: rejects sink + survivor pipeline
    try {
      gated.filter(col("reject_reason").isNotNull)
        .withColumn("batch_id", lit(batchId))
        .write.mode("overwrite").parquet(s"$root/rejects/batch_id=$batchId")

      // ---- exact dedup (content hash, first arrival wins) --------------
      // in-batch: min doc_id per hash (deterministic, order-free);
      // vs corpus: anti-join against ONLY the hp partitions this batch
      // touches — the stored side is partition-pruned, cost ∝ batch
      val hashed = gated.filter(col("reject_reason").isNull)
        .withColumn("content_hash", md5(col("text")))
        .withColumn("hp",
          pmod(xxhash64(col("content_hash")), lit(nHp.toLong)).cast(IntegerType))
      val firstInBatch = hashed
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("content_hash")).orderBy(col("doc_id"))))
        .filter(col("rn") === 1).drop("rn")
        .persist() // consumers: hp probe, anti-join, seen write
      try {
        val touchedHp = firstInBatch.select(col("hp")).distinct()
          .collect().map(_.getInt(0)).toSeq.sorted
        val stored = seen(spark)
          .filter(col("batch_id") =!= batchId && col("hp").isin(touchedHp: _*))
          .select(col("content_hash").as("seen_hash"))
        val fresh = firstInBatch
          .join(stored, col("content_hash") === col("seen_hash"), "left_anti")
          .persist() // consumers: corpus write, seen write, lsh banding
        try {
          // ---- online near-dup REJECTION (opt-in) -----------------------
          // First-arrival wins: a doc is rejected when a verified partner
          // (>= minSig of 8 MinHash components agreeing) exists in the
          // committed index — which holds every exact-dedup survivor seen
          // so far, accepted OR rejected — or earlier (smaller doc_id) in
          // this same batch. Keeping REJECTED docs' signatures in the
          // index is what makes the rule batch-composition-invariant: a
          // chain A~B, B~C (A≁C) rejects C no matter how the stream
          // chunks, because B stays probe-visible after its own
          // rejection. The probe is read-only and bp-pruned; the decision
          // adds no new shuffle class to the batch path.
          val accepted = nearDupMinSig match {
            case None => fresh
            case Some(m) =>
              val verdicts = lsh.probeNearDups(
                fresh.select(col("doc_id"), col("text")), m, Some(batchId))
              val w = org.apache.spark.sql.expressions.Window
                .partitionBy(col("doc_id"))
                .orderBy(col("partner"), col("n_sig_match").desc)
              verdicts.withColumn("rn", row_number().over(w))
                .filter(col("rn") === 1).drop("rn", "stored")
                .withColumn("batch_id", lit(batchId))
                .write.mode("overwrite")
                .parquet(s"$root/neardup/batch_id=$batchId")
              fresh.join(verdicts.select(col("doc_id")).distinct(),
                Seq("doc_id"), "left_anti")
          }
          accepted.select(docCols.map(col): _*)
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite").parquet(s"$root/corpus/batch_id=$batchId")
          fresh.select(col("content_hash"), col("doc_id"), col("hp"))
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite").partitionBy("hp")
            .parquet(s"$root/seen/batch_id=$batchId")
          // ---- near-dup candidates, incrementally -----------------------
          // the index ingests ALL exact-dedup survivors (the SEEN graph);
          // the corpus holds only the accepted ones (the curated output)
          beforeDelegatedCommit()
          lsh.addBatch(fresh.select(col("doc_id"), col("text")), batchId,
            sideFence = Some(fence))
        } finally { fresh.unpersist(); () }
      } finally { firstInBatch.unpersist(); () }
    } finally { gated.unpersist(); () }
  }

  /** Maintenance: fold the seen-hash store's per-batch partitions into one
    * consolidated negative-batch_id partition, keeping the hp layout the
    * dedup probe prunes on — the small-file compaction a long-running
    * ingest needs (the corpus itself is plain parquet data; the a13-style
    * compaction pass applies there). The SEEN-STORE fold requires the
    * stream paused: the store has no operation log (the data dir is the
    * commit), so a fold racing a live ingest could consolidate a
    * half-written batch dir; its crash-safety is idempotent distinct
    * writes (duplicate hash rows are harmless to the anti-join probe and
    * collapse on the next fold). The delegated [[LshIndex.compact]] is
    * ONLINE-safe under its OpLog and needs no pause. */
  def compact(spark: SparkSession): Unit = {
    ensureMeta() // the fold rewrites the hp layout — same mismatch hazard
    val dir = s"$root/seen"
    // strays (manual copy, backup suffix) are nobody's to parse, fold, or
    // delete — the shared OpLog.batchIdOf rule (incl. its caveat: a
    // CONTENT-bearing stray still breaks the seen read's partition
    // discovery; the LSH audit flags that class)
    val sources = io.listDirs(io.path("seen"))
      .flatMap(p => OpLog.batchIdOf(p.getName).map(id => p -> id))
    if (sources.size > 1) {
      val nextId = math.min(sources.map(_._2).min, 0L) - 1L
      seen(spark).drop("batch_id").distinct()
        .repartition(math.max(1, nHp / 4))
        .write.mode("overwrite").partitionBy("hp")
        .parquet(s"$dir/batch_id=$nextId")
      sources.foreach(s => io.delete(s._1))
    }
    lsh.compact(spark)
  }

  /** Structured Streaming wrapper: drain `docs` (a streaming DataFrame of
    * document rows) into the corpus via [[ingestBatch]] per micro-batch. */
  def stream(docs: DataFrame, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId)
      }
      .start()

  private val dataDirs = Seq("corpus", "seen", "rejects", "neardup")

  /** Structural integrity audit — the ingest-store twin of
    * [[LshIndex.audit]] (same report schema, same cost contract: driver-
    * side control-plane checks plus bounded two-column containment scans).
    * The committed frontier is the delegated LSH log's `maxSeen` —
    * `ingestBatch` commits the index LAST, so a batch id at or below it
    * proves the whole composed ingest of that batch completed; side dirs
    * above it are crashed-or-in-flight attempts, invisible to
    * [[corpusCommitted]] and [[vacuum]]'s to reclaim. The delegated LSH
    * substore's own audit folds in as one summary row, so this report is a
    * one-stop health check for the whole composed store. */
  def audit(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.Row
    val reportSchema = StructType(Seq(
      StructField("check", StringType, nullable = false),
      StructField("ok", BooleanType, nullable = false),
      StructField("observed", StringType, nullable = false),
      StructField("details", StringType, nullable = false)))
    val rows = scala.collection.mutable.Buffer[Row]()
    scala.util.Try(lsh.log.state) match {
      case scala.util.Failure(e) =>
        rows += Row("frontier", false, "unreadable",
          s"the delegated LSH log (the ingest's commit witness) cannot be " +
            s"read: ${e.getClass.getSimpleName}: ${e.getMessage}")
      case scala.util.Success(st) =>
        rows += Row("frontier", true, s"${st.maxSeen}",
          "committed ingest frontier (batch ids at or below it completed " +
            "the whole clean->gate->dedup->index fold)")
        val metaState = storedNHpState
        rows += Row("hp_layout", metaState.forall(_.isRight),
          metaState match {
            case Some(Right(n)) => s"nhp=$n"
            case Some(Left(raw)) => s"garbled: $raw"
            case None => "no _INGEST meta"
          },
          metaState match {
            case Some(Right(_)) => "durable hp layout contract present"
            case Some(Left(_)) => "the _INGEST meta does not parse " +
              "(manual edit?) — ingest refuses until restored (nhp=<n>)"
            case None => "store predates the _INGEST meta (pre-r15); " +
              "placement is checked against this handle's nHp"
          })
        val effN = storedNHp.getOrElse(nHp)
        // committed views for the containment scans — ALL cut at the one
        // maxSeen captured above: corpusCommitted re-reads the log at scan
        // time, so a batch committing mid-audit would make the corpus
        // side include docs the seen side's earlier cut excludes, and a
        // healthy store would report corruption
        def committedCorpus = corpus(spark).filter(col("batch_id") <= st.maxSeen)
        def committedSeen = seen(spark).filter(col("batch_id") <= st.maxSeen)
        def scanRow(check: String, detail: String)(cnt: => Long): Unit =
          rows += (scala.util.Try(cnt) match {
            case scala.util.Success(n) => Row(check, n == 0L, s"$n", detail)
            case scala.util.Failure(e) => Row(check, false, "scan failed",
              s"$detail — scan threw ${e.getClass.getSimpleName}: " +
                s"${String.valueOf(e.getMessage).take(200)}")
          })
        scanRow("corpus_docs_in_seen",
          "every committed accepted doc must carry a stored content hash " +
            "(or later duplicates of it would be re-admitted)") {
          committedCorpus.select(col("doc_id")).distinct()
            .join(committedSeen.select(col("doc_id")).distinct(),
              Seq("doc_id"), "left_anti").count()
        }
        scanRow("seen_docs_in_sigs",
          "every exact-dedup survivor must be signature-indexed (the " +
            "near-dup probe reads the index, accepted or rejected)") {
          committedSeen.select(col("doc_id")).distinct()
            .join(lsh.sigs(spark).select(col("doc_id")).distinct(),
              Seq("doc_id"), "left_anti").count()
        }
        scanRow("seen_hash_unique",
          "first-arrival-wins: one doc per stored content hash, ever") {
          committedSeen.groupBy(col("content_hash"))
            .agg(countDistinct(col("doc_id")).as("n"))
            .filter(col("n") > 1).count()
        }
        if (metaState.exists(_.isRight))
          scanRow("hp_placement",
            s"every stored hash must sit in pmod(xxhash64(hash), $effN) — " +
              "a misplaced row is invisible to the pruned dedup probe") {
            committedSeen.filter(col("hp") =!=
              pmod(xxhash64(col("content_hash")), lit(effN.toLong))
                .cast(IntegerType)).count()
          }
        else {
          // pre-meta store (no _INGEST): the true layout is unknowable
          // from here — via the cold SQL door this handle's nHp is just
          // the default, so asserting against it would flag a healthy
          // legacy store as placement-corrupt when it is merely
          // layout-unknown. Report what CAN be said: consistent with
          // this handle's layout (a genuine pass), or indeterminate.
          val mism = scala.util.Try(committedSeen.filter(col("hp") =!=
            pmod(xxhash64(col("content_hash")), lit(effN.toLong))
              .cast(IntegerType)).count())
          rows += (mism match {
            case scala.util.Success(0L) => Row("hp_placement", true, "0",
              s"consistent with this handle's nhp=$effN (no durable meta " +
                "to check against — first post-upgrade ingest writes it)")
            case scala.util.Success(n) => Row("hp_placement", true,
              "indeterminate",
              s"layout unknown (store predates the _INGEST meta) and $n " +
                s"rows do not match this handle's nhp=$effN — open the " +
                "store with its original nHp (which writes the meta) " +
                "before treating placement as verified")
            case scala.util.Failure(e) => Row("hp_placement", false,
              "scan failed", s"placement scan threw " +
                s"${e.getClass.getSimpleName}: " +
                s"${String.valueOf(e.getMessage).take(200)}")
          })
        }
        // side dirs above the frontier: crashed (or in-flight) composed
        // batches — invisible to committed readers, vacuum's to reclaim
        val orphans = dataDirs.flatMap { d =>
          io.listDirs(io.path(d))
            .filter(p => OpLog.batchIdOf(p.getName).exists(_ > st.maxSeen))
            .map(p => s"$d/${p.getName}")
        }
        rows += Row("orphan_partitions", true, s"${orphans.size}",
          if (orphans.isEmpty) "none"
          else "above the committed frontier (crashed or in-flight); " +
            s"vacuum() reclaims: ${orphans.sorted.mkString(",")}")
        val strays = dataDirs.flatMap { d =>
          io.listDirs(io.path(d))
            .filter(p => OpLog.batchIdOf(p.getName).isEmpty)
            .map { p =>
              val bearing = io.listFiles(p).nonEmpty || io.listDirs(p).nonEmpty
              (s"$d/${p.getName}", bearing)
            }
        }
        val bearing = strays.collect { case (n, true) => n }
        rows += Row("unrecognized_entries", bearing.isEmpty, s"${strays.size}",
          if (strays.isEmpty) "none"
          else if (bearing.isEmpty)
            "empty dirs outside the store's naming; inert, skipped by " +
              "vacuum — operator's to remove: " +
              strays.map(_._1).sorted.mkString(",")
          else "CONTENT-BEARING dirs outside the store's naming break " +
            "partition discovery for every reader — move them out of the " +
            s"dataset dirs: ${bearing.sorted.mkString(",")}")
        // the delegated substore, summarized (full detail: audit the
        // <root>/lsh path directly — it is a store of its own)
        val sub = lsh.audit(spark).collect()
        val subBad = sub.filter(!_.getBoolean(1)).map(_.getString(0))
        rows += Row("lsh_substore", subBad.isEmpty, s"${subBad.length} failing",
          if (subBad.isEmpty) s"all ${sub.length} delegated checks ok"
          else s"failing checks: ${subBad.sorted.mkString(",")} — audit " +
            s"$root/lsh directly for detail")
    }
    spark.createDataFrame(java.util.Arrays.asList(rows.toSeq: _*), reportSchema)
  }

  /** Reclaim side dirs above the committed frontier — crashed composed
    * batches that never redelivered — then vacuum the delegated LSH
    * substore. Enforced exclusion rides the SAME lease + log-entry
    * protocol as [[LshIndex.vacuum]] (the lease lives in the LSH log,
    * which is the composed store's single commit point): while the lease
    * is held no ingest can commit (`addBatch` probes it after its state
    * read), and the `vacuum` log entry this pass commits defeats BOTH
    * racing commit classes — an in-flight batch whose state read predates
    * the entry loses the write-once version race, and one whose side dirs
    * predate the entry is refused by the composed fence
    * ([[LshIndex.sideWriteFence]]) even though its commit would not
    * conflict. Either way the batch redelivers wholesale and rewrites
    * every dir this pass deleted. */
  def vacuum(): Seq[String] = {
    val ingestSwept = {
      val token = lsh.log.acquireVacuumLease()
      try {
        // the frontier this sweep cuts on is folded from the same log
        lsh.log.assertNoStrayLogNames("CorpusIngest.vacuum")
        def deadAt(st: OpLog.State): Seq[org.apache.hadoop.fs.Path] =
          dataDirs.flatMap(d => io.listDirs(io.path(d))
            .filter(p => OpLog.batchIdOf(p.getName).exists(_ > st.maxSeen)))
        if (deadAt(lsh.log.state).isEmpty) Seq.empty[String]
        else {
          var deleted = Seq.empty[String]
          lsh.log.migrate("ingest-vacuum") { st =>
            val dead = deadAt(st)
            (Map("type" -> "vacuum"),
              () => deleted = dead.map { p => io.delete(p); p.toString })
          }
          deleted
        }
      } finally lsh.log.releaseVacuumLease(token)
    }
    // the delegated substore's own pass (it re-takes the lease itself)
    ingestSwept ++ lsh.vacuum()
  }

  // the delegated LshIndex's own destroy() clears ITS OpLog entry cache
  // (same version-number-reuse hazard as a directly-destroyed index)
  def destroy(): Unit = {
    knownDirs.clear(); metaChecked = false; lsh.destroy(); io.delete(io.root)
  }
}

object CorpusIngest {
  import org.apache.spark.sql.Column

  /** Canonicalization of one text column — the e78 markup strip (script
    * removal → tag strip → entity decode with &amp; LAST → whitespace
    * collapse) composed with the e77 scrub+NFC (control bytes dropped,
    * canonical composition via the native [[graft.functions.NormalizeNfc]]
    * expression). Idempotent by construction: a second application finds
    * no tags, no entities, no control bytes, and already-composed text.
    * Pure map-side column expressions — the stage adds zero shuffles to
    * the ingest. */
  def cleanText(c: Column): Column = {
    val noScript = regexp_replace(c, "<script[^>]*>.*?</script>", " ")
    val noTags = regexp_replace(noScript, "<[^>]+>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&amp;" -> "&").foldLeft(noTags) { case (x, (e, ch)) =>
      replace(x, lit(e), lit(ch))
    }
    val scrubbed = regexp_replace(decoded, "[\\x01-\\x1F\\x7F]", "")
    trim(regexp_replace(graft.functions.NormalizeNfc(scrubbed), "\\s+", " "))
  }

  /** Apply [[cleanText]] to a document frame, recomputing `n_chars` so the
    * downstream quality gate's length contract holds on the CLEANED text. */
  def clean(df: DataFrame): DataFrame = df
    .withColumn("text", cleanText(col("text")))
    .withColumn("n_chars", length(col("text")).cast(LongType))
}
