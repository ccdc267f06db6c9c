package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.{CorpusIngest, ImageDedup, ImageHashStore, StoreIO}

/** Audit/vacuum for the two stores the r14 operability pass did NOT reach
  * (the advice's gap #2): the corpus ingest's composed store (seen hashes +
  * corpus + rejects + neardup, committed via the delegated LSH log) and the
  * image dedup's logless hash store. Same bar as IndexAuditSpec: healthy
  * stores audit all-ok, real wreckage classes are reported and reclaimed
  * exactly, detectors have teeth, and both stores are reachable from the
  * cold SQL doors (`graft_index_audit` / `CALL graft.system.index_vacuum`)
  * by the widened layout sniff.
  *
  * Plus the protocol hole the extension SURFACED: the ingest writes its
  * side dirs BEFORE its delegated log commit, so a vacuum sweeping between
  * those instants could let the commit land with the batch's corpus
  * already deleted — closed by the composed side-write fence
  * ([[graft.streaming.LshIndex.sideWriteFence]]), pinned here with a
  * deterministic seam test. */
class StoreMaintenanceSpec extends SparkSpecBase {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** 6 docs per batch: ids sharing `id % 3` are near-identical (the LSH
    * lane), every 6th is an exact cross-batch dup, one empty reject. */
  private def docs(i: Long): DataFrame = {
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa"
    val rows = (0 until 6).map { j =>
      val id = i * 6 + j
      val text =
        if (j == 5) "" // quality reject
        else if (j == 4) s"$base exactdup" // same every batch: exact dup lane
        else s"$base variant${id % 3} tail${id % 5}"
      Row(id, text, "en", s"src${id % 2}", text.length.toLong)
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), docSchema)
  }

  private def report(df: DataFrame): Map[String, (Boolean, String)] =
    df.collect().map(r =>
      r.getString(0) -> (r.getBoolean(1), r.getString(2))).toMap

  private def allOk(rep: Map[String, (Boolean, String)]): Unit =
    rep.foreach { case (check, (ok, obs)) =>
      assert(ok, s"audit check $check failed: $obs") }

  private def corpusSet(ing: CorpusIngest): Seq[String] =
    ing.corpusCommitted(spark).select("doc_id", "text")
      .collect().map(_.toString).sorted.toSeq

  test("corpus-ingest: healthy store audits all-ok with zero orphans and a " +
    "moving frontier; vacuum reclaims nothing") {
    val root = tmpDir("ing_audit") + "/ing"
    val ing = new CorpusIngest(root, nearDupMinSig = Some(6))
    ing.ingestBatch(docs(0), 0L)
    ing.ingestBatch(docs(1), 1L)
    val rep = report(ing.audit(spark))
    allOk(rep)
    assert(rep("frontier")._2 === "1")
    assert(rep("orphan_partitions")._2 === "0")
    assert(rep("hp_layout")._2 === "nhp=16", s"meta must be durable: $rep")
    assert(ing.vacuum().isEmpty, "vacuum on a healthy store deleted paths")
    assert(corpusSet(ing).nonEmpty)
  }

  test("corpus-ingest: a crashed composed batch's side dirs audit as " +
    "orphans (ok), vacuum reclaims exactly them, and the redelivery " +
    "converges to the never-crashed control") {
    val root = tmpDir("ing_crash") + "/ing"
    val ing = new CorpusIngest(root, nearDupMinSig = Some(6))
    ing.ingestBatch(docs(0), 0L)
    // die at the delegated log commit: every side dir of batch 1 is on
    // disk (rejects, corpus, seen, neardup, plus the lsh data dirs), no
    // entry names the batch
    StoreIO.Faults.armAt(root, 1)
    intercept[StoreIO.Faults.InjectedCrash] { ing.ingestBatch(docs(1), 1L) }
    val (fired, _) = StoreIO.Faults.disarm()
    assert(fired)
    val rep = report(new CorpusIngest(root, nearDupMinSig = Some(6)).audit(spark))
    allOk(rep) // orphans are ok=true — invisible to committed readers
    assert(rep("frontier")._2 === "0")
    assert(rep("orphan_partitions")._2 === "4",
      s"expected rejects/corpus/seen/neardup dirs of batch 1: $rep")
    val fresh = new CorpusIngest(root, nearDupMinSig = Some(6))
    val deleted = fresh.vacuum()
    // 4 ingest side dirs + the lsh substore's 3 data dirs of the batch
    assert(deleted.size === 7, s"vacuum deleted: $deleted")
    assert(report(fresh.audit(spark))("orphan_partitions")._2 === "0")
    // redelivery converges
    fresh.ingestBatch(docs(1), 1L)
    val ctl = new CorpusIngest(tmpDir("ing_crash_ctl") + "/ing",
      nearDupMinSig = Some(6))
    ctl.ingestBatch(docs(0), 0L); ctl.ingestBatch(docs(1), 1L)
    assert(corpusSet(fresh) === corpusSet(ctl),
      "vacuum + redelivery diverged from the never-crashed build")
  }

  test("the composed vacuum fence: a vacuum sweeping between the side-dir " +
    "writes and the delegated commit forces ConcurrentCommit (never a " +
    "commit over swept dirs), and the redelivery converges") {
    val root = tmpDir("ing_fence") + "/ing"
    val ing = new CorpusIngest(root, nearDupMinSig = Some(6))
    ing.ingestBatch(docs(0), 0L)
    val corpusDir = new java.io.File(s"$root/corpus/batch_id=1")
    var sweptUnderSeam = Seq.empty[String]
    ing.beforeDelegatedCommit = () => {
      assert(corpusDir.exists(), "seam fired before the side dirs landed")
      // a maintenance vacuum runs to completion INSIDE the window: by the
      // time the delegated commit probes the lease it is already released,
      // so only the fence can catch the sweep
      sweptUnderSeam = new CorpusIngest(root, nearDupMinSig = Some(6)).vacuum()
    }
    val e = intercept[StoreIO.ConcurrentCommit] { ing.ingestBatch(docs(1), 1L) }
    ing.beforeDelegatedCommit = () => ()
    assert(e.getMessage.contains("vacuum entry landed after the composed fence"),
      s"wrong refusal class: ${e.getMessage}")
    assert(sweptUnderSeam.exists(_.contains("corpus/batch_id=1")),
      s"the racing vacuum must have swept the in-flight corpus dir: $sweptUnderSeam")
    assert(!corpusDir.exists(), "sweep did not land — the window closed itself")
    // the foreachBatch-contract redelivery rewrites every side dir
    ing.ingestBatch(docs(1), 1L)
    val ctl = new CorpusIngest(tmpDir("ing_fence_ctl") + "/ing",
      nearDupMinSig = Some(6))
    ctl.ingestBatch(docs(0), 0L); ctl.ingestBatch(docs(1), 1L)
    assert(corpusSet(ing) === corpusSet(ctl))
    allOk(report(ing.audit(spark)))
  }

  test("corpus-ingest layout contract: a mismatched-nHp open refuses " +
    "loudly instead of pruning the dedup probe to the wrong partitions") {
    val root = tmpDir("ing_nhp") + "/ing"
    new CorpusIngest(root).ingestBatch(docs(0), 0L)
    val e = intercept[IllegalArgumentException] {
      new CorpusIngest(root, nHp = 8).ingestBatch(docs(1), 1L)
    }
    assert(e.getMessage.contains("nHp=16") && e.getMessage.contains("nHp=8"),
      s"mismatch must name both values: ${e.getMessage}")
    // and compact is guarded the same way
    val e2 = intercept[IllegalArgumentException] {
      new CorpusIngest(root, nHp = 8).compact(spark)
    }
    assert(e2.getMessage.contains("nHp"))
  }

  test("the _INGEST meta's edge contract: a garbled meta refuses ingest " +
    "and fails its audit row; a pre-meta store with data is never stamped " +
    "with the opening handle's value") {
    val root = tmpDir("ing_meta") + "/ing"
    val ing = new CorpusIngest(root)
    ing.ingestBatch(docs(0), 0L)
    // manual edit garbles the meta: ingest must refuse loudly (guessing a
    // layout silently re-admits duplicates), the audit must COMPLETE with
    // hp_layout failing, not crash on the parse
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$root/_INGEST"),
      "nhp=16 # widened\n".getBytes)
    val fresh = new CorpusIngest(root)
    val e = intercept[IllegalStateException] { fresh.ingestBatch(docs(1), 1L) }
    assert(e.getMessage.contains("garbled"), e.getMessage)
    val rep = report(new CorpusIngest(root).audit(spark))
    assert(!rep("hp_layout")._1, s"garbled meta must fail its row: $rep")
    // restore; everything proceeds
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$root/_INGEST"),
      "nhp=16\n".getBytes)
    new CorpusIngest(root).ingestBatch(docs(1), 1L)
    allOk(report(new CorpusIngest(root).audit(spark)))

    // a pre-meta store that already holds data: opening it must NOT stamp
    // this handle's value as durable truth (it may be wrong — the data is
    // the truth); the audit reports the unknown layout, ok=true
    val legacy = tmpDir("ing_meta_legacy") + "/ing"
    new CorpusIngest(legacy).ingestBatch(docs(0), 0L)
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$legacy/_INGEST"))
    new CorpusIngest(legacy).ingestBatch(docs(1), 1L)
    assert(!new java.io.File(s"$legacy/_INGEST").exists(),
      "a data-bearing pre-meta store must keep its layout unknown, not " +
        "get the opening handle's value stamped as truth")
    val lrep = report(new CorpusIngest(legacy).audit(spark))
    allOk(lrep)
    assert(lrep("hp_layout")._2 === "no _INGEST meta", s"$lrep")
  }

  test("vacuum refuses over a stray _LOG name (a displaced entry could " +
    "make committed partitions fold as unreferenced) — ingest door") {
    val root = tmpDir("ing_straylog") + "/ing"
    val ing = new CorpusIngest(root)
    ing.ingestBatch(docs(0), 0L)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/lsh/_LOG-1.bak"), "manual".getBytes)
    val e = intercept[IllegalStateException] { ing.vacuum() }
    assert(e.getMessage.contains("stray entry names"), e.getMessage)
    // audit still completes and surfaces the stray via the substore row
    val rep = report(ing.audit(spark))
    assert(rep.contains("lsh_substore"), s"$rep")
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$root/lsh/_LOG-1.bak"))
    assert(ing.vacuum().isEmpty)
  }

  test("corpus-ingest detector teeth: a deleted committed seen partition, " +
    "a duplicate stored hash, and a content-bearing stray each fail their " +
    "row") {
    val root = tmpDir("ing_teeth") + "/ing"
    val ing = new CorpusIngest(root)
    ing.ingestBatch(docs(0), 0L)
    ing.ingestBatch(docs(1), 1L)
    // duplicate hash: re-store batch 0's hashes under a second committed id
    // (negative ids read as committed — the compact convention)
    val seen0 = spark.read.option("basePath", s"$root/seen")
      .parquet(s"$root/seen/batch_id=0")
    seen0.withColumn("doc_id", col("doc_id") + 1000)
      .drop("batch_id").write.partitionBy("hp")
      .parquet(s"$root/seen/batch_id=-9")
    val rep1 = report(ing.audit(spark))
    assert(!rep1("seen_hash_unique")._1,
      s"duplicate stored hashes must fail: $rep1")
    // now delete a committed seen partition: accepted docs lose their hashes
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec); f.delete()
    }
    deleteRec(new java.io.File(s"$root/seen/batch_id=0"))
    deleteRec(new java.io.File(s"$root/seen/batch_id=-9"))
    val rep2 = report(ing.audit(spark))
    assert(!rep2("corpus_docs_in_seen")._1,
      s"committed corpus docs without stored hashes must fail: $rep2")
    // content-bearing stray dir poisons partition discovery — flagged
    val stray = new java.io.File(s"$root/corpus/batch_id=0.bak")
    stray.mkdirs()
    java.nio.file.Files.write(stray.toPath.resolve("x"), "junk".getBytes)
    val rep3 = report(ing.audit(spark))
    assert(!rep3("unrecognized_entries")._1, s"stray must be flagged: $rep3")
  }

  private def imgCorpus: Seq[(Long, Array[Byte])] = Seq(
    0L -> Multimodal.encodePng(40, 30, seed = 9L),
    1L -> Multimodal.encodePngPerturbed(40, 30, seed = 9L, mod = 997),
    2L -> Multimodal.encodePng(35, 28, seed = 21L),
    3L -> Multimodal.encodePng(40, 30, seed = 77L))

  private def imgDf(rows: Seq[(Long, Array[Byte])]): DataFrame =
    rows.toDF("doc_id", "payload")

  test("image-hash store: healthy audit, the unpaired frontier is reported " +
    "ok, staging wreckage is vacuumed, and the teeth bite") {
    val root = tmpDir("img_audit") + "/img"
    ImageDedup.ingestBatch(root, imgDf(imgCorpus.take(2)), 0L)
    ImageDedup.ingestBatch(root, imgDf(imgCorpus.drop(2)), 1L)
    val store = new ImageHashStore(root)
    val rep = report(store.audit(spark))
    allOk(rep)
    assert(rep("unpaired_hash_batches")._2 === "0")
    assert(store.vacuum().isEmpty)
    // a killed write job's staging: _temporary inside a batch dir
    val wreck = new java.io.File(s"$root/hashes/batch_id=0/_temporary/0")
    wreck.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(wreck, "part-001").toPath, "torn".getBytes)
    val rep2 = report(store.audit(spark))
    allOk(rep2)
    assert(rep2("staging_wreckage")._2 === "1")
    // YOUNG staging is a possibly-LIVE write job's (logless store, no
    // lease to consult): the age-gated vacuum must leave it alone
    assert(store.vacuum().isEmpty,
      "vacuum swept staging younger than the grace — it could be a live " +
        "writer's")
    // once it ages past the grace it is provably wreckage and is swept
    assert(new java.io.File(s"$root/hashes/batch_id=0/_temporary")
      .setLastModified(System.currentTimeMillis() - 11L * 60 * 1000))
    val swept = store.vacuum()
    assert(swept.size === 1 && swept.head.contains("_temporary"), s"$swept")
    assert(!new java.io.File(s"$root/hashes/batch_id=0/_temporary").exists())
    assert(report(store.audit(spark))("staging_wreckage")._2 === "0")
    // committed content untouched by the sweep
    assert(ImageDedup.accepted(spark, root).count() === 3) // 1 is 0's twin
    // frontier: a hashes dir with no accepted twin (crashed mid-batch)
    val h = ImageDedup.hashes(imgDf(imgCorpus.take(1)))
    h.write.parquet(s"$root/hashes/batch_id=2")
    val rep3 = report(store.audit(spark))
    allOk(rep3) // in-flight-or-crashed is ok=true — redelivery's to heal
    assert(rep3("unpaired_hash_batches")._2 === "1")
    // a SECOND unpaired batch is a different class: sequential
    // foreachBatch leaves at most one frontier, so two means a discarded
    // checkpoint permanently orphaned them — ok=false
    h.write.parquet(s"$root/hashes/batch_id=3")
    val rep3b = report(store.audit(spark))
    assert(!rep3b("unpaired_hash_batches")._1,
      s"multiple unpaired batches must fail the row: $rep3b")
    assert(rep3b("unpaired_hash_batches")._2 === "2")
    // teeth: an accepted partition with no hashes twin is protocol-impossible
    h.withColumn("doc_id", col("doc_id") + 50)
      .write.parquet(s"$root/accepted/batch_id=7")
    val rep4 = report(store.audit(spark))
    assert(!rep4("accepted_ids_in_hashes")._1, s"unbacked accepted: $rep4")
    assert(!rep4("accepted_rows_in_hashes")._1, s"unbacked rows: $rep4")
  }

  test("cold SQL doors: the widened sniff reaches the ingest store by name " +
    "and the image store by path; an ambiguous root refuses loudly") {
    val wh = tmpDir("sql_maint")
    val ing = new CorpusIngest(s"$wh/stores/docs_ingest", nearDupMinSig = Some(6))
    ing.ingestBatch(docs(0), 0L)
    StoreIO.Faults.armAt(s"$wh/stores/docs_ingest", 1)
    intercept[StoreIO.Faults.InjectedCrash] { ing.ingestBatch(docs(1), 1L) }
    StoreIO.Faults.disarm()
    val imgRoot = tmpDir("sql_maint_img") + "/img"
    ImageDedup.ingestBatch(imgRoot, imgDf(imgCorpus), 0L)

    val cold = spark.newSession()
    cold.conf.set("spark.sql.catalog.graft", "graft.plans.GraftCatalog")
    cold.conf.set("spark.sql.catalog.graft.root", wh)
    def audit(arg: String): Map[String, (Boolean, String)] =
      cold.sql(s"SELECT * FROM graft_index_audit('$arg')").collect()
        .map(r => r.getString(0) -> (r.getBoolean(1), r.getString(2))).toMap

    val byName = audit("stores.docs_ingest")
    allOk(byName)
    assert(byName.contains("frontier") && byName("orphan_partitions")._2 === "4",
      s"ingest sniff must surface the crashed batch's side dirs: $byName")
    cold.sql("CALL graft.system.index_vacuum('stores.docs_ingest')")
    assert(audit("stores.docs_ingest")("orphan_partitions")._2 === "0")
    // committed state intact and extendable after the SQL vacuum
    new CorpusIngest(s"$wh/stores/docs_ingest", nearDupMinSig = Some(6))
      .ingestBatch(docs(1), 1L)
    assert(audit("stores.docs_ingest")("frontier")._2 === "1")

    val img = audit(imgRoot)
    allOk(img)
    assert(img.contains("unpaired_hash_batches"), s"image sniff failed: $img")
    cold.sql(s"CALL graft.system.index_vacuum('$imgRoot')") // logless: staging only

    // ambiguity: a root carrying TWO kinds' layout dirs is nobody's store
    val ambiguous = tmpDir("sql_maint_ambig")
    new java.io.File(s"$ambiguous/seen").mkdirs()
    new java.io.File(s"$ambiguous/hashes").mkdirs()
    val e = intercept[Exception](audit(ambiguous))
    assert(e.getMessage.contains("MULTIPLE store kinds"), e.getMessage)
  }
}
