package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.streaming.{BucketedReplica, CdcStream}

/** B16, streaming form — frontier-marker consistent reads across the
  * per-table replicas of the multi-table fan-out. Every fan-out commit is
  * tagged with its source batch id; once ALL tables of a batch committed,
  * an `_APPLIED-<id>` marker publishes the consistent frontier. Readers cut
  * at the marker and each table resolves its latest version with tag ≤ cut
  * — provably that table's state at the frontier, torn reads impossible by
  * construction. The replica's current+previous retention exactly covers
  * the one in-flight batch that can sit beyond the frontier.
  */
class ConsistentCutSpec extends SparkSpecBase {

  private def mkBatch(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), CdcStream.envelopeSchema)

  private def row(tbl: String, pos: Long, uid: Long, v: Double): Row =
    Row("INSERT", tbl, pos, pos * 10, uid, v, "evt")

  /** One fan-out batch: per-table commits, then the frontier marker —
    * exactly what applyToReplicasByTable's foreachBatch does. */
  private def applyBatch(root: String, batchId: Long, rows: Seq[Row],
                         mark: Boolean = true): Unit = {
    rows.groupBy(_.getString(1)).toSeq.sortBy(_._1).foreach { case (t, rs) =>
      new BucketedReplica(s"$root/$t", nBuckets = 4)
        .commit(mkBatch(rs), tag = Some(batchId))
    }
    if (mark) CdcStream.markApplied(root, batchId)
  }

  test("a half-applied batch is invisible: the cut stays at the previous frontier") {
    val root = tmpDir("ccut") + "/reps"
    applyBatch(root, 1L, Seq(row("even", 1, 2, 1.0), row("odd", 2, 3, 2.0)))
    applyBatch(root, 2L, Seq(row("even", 3, 4, 3.0), row("odd", 4, 5, 4.0)))
    // a manual backup copy of a marker (post-incident surgery): not a
    // name the protocol wrote — the frontier must ignore it, not parse it
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/_APPLIED-9.bak"), "manual copy")
    // batch 3 crashes after committing odd, before the marker
    applyBatch(root, 3L, Seq(row("odd", 5, 7, 5.0)), mark = false)

    val (cut, vers) = CdcStream.consistentCutVersions(root, Seq("even", "odd"))
    assert(cut === 2L, "un-markered batch must not advance the frontier")

    val evenRows = CdcStream.consistentLiveFor(spark, root, "even", vers)
      .select("user_id").collect().map(_.getLong(0)).sorted
    val oddRows = CdcStream.consistentLiveFor(spark, root, "odd", vers)
      .select("user_id").collect().map(_.getLong(0)).sorted
    assert(evenRows === Array(2L, 4L))
    // the consistent view of odd EXCLUDES the half-applied batch 3 …
    assert(oddRows === Array(3L, 5L))
    // … which odd's torn current view already contains
    val torn = CdcStream.liveReplicaFor(spark, root, "odd")
      .select("user_id").collect().map(_.getLong(0)).sorted
    assert(torn === Array(3L, 5L, 7L))

    // the foreachBatch retry completes batch 3 and re-marks it
    applyBatch(root, 3L, Seq(row("odd", 5, 7, 5.0)))
    val (cut2, vers2) = CdcStream.consistentCutVersions(root, Seq("even", "odd"))
    assert(cut2 === 3L)
    assert(CdcStream.consistentLiveFor(spark, root, "odd", vers2)
      .select("user_id").collect().map(_.getLong(0)).sorted === Array(3L, 5L, 7L))
  }

  test("a table idle across batches reads its current version (nothing was missed)") {
    val root = tmpDir("ccut_idle") + "/reps"
    applyBatch(root, 1L, Seq(row("even", 1, 2, 1.0), row("odd", 2, 3, 2.0)))
    // batches 2 and 3 carry only odd rows: even idles at tag 1 but misses
    // nothing — its tag-1 state IS its state at the frontier
    applyBatch(root, 2L, Seq(row("odd", 4, 5, 4.0)))
    applyBatch(root, 3L, Seq(row("odd", 5, 7, 5.0)))

    val (cut, vers) = CdcStream.consistentCutVersions(root, Seq("even", "odd"))
    assert(cut === 3L)
    assert(CdcStream.consistentLiveFor(spark, root, "even", vers).count() === 1)
    assert(CdcStream.consistentLiveFor(spark, root, "odd", vers)
      .select("user_id").collect().map(_.getLong(0)).sorted
      === Array(3L, 5L, 7L))
  }

  test("a table born in the in-flight batch reads as empty, not as torn") {
    val root = tmpDir("ccut_born") + "/reps"
    applyBatch(root, 1L, Seq(row("odd", 2, 3, 2.0)))
    // even's FIRST rows arrive in batch 2, which crashes before the marker
    applyBatch(root, 2L, Seq(row("even", 3, 4, 3.0), row("odd", 4, 5, 4.0)),
      mark = false)
    val (cut, vers) = CdcStream.consistentCutVersions(root, Seq("even", "odd"))
    assert(cut === 1L)
    assert(vers("even").isEmpty)
    assert(CdcStream.consistentLiveFor(spark, root, "even", vers).count() === 0)
    assert(CdcStream.consistentLiveFor(spark, root, "odd", vers).count() === 1)
  }

  test("a retried commit (same tag) resolves to the newest replay; compaction keeps its tag") {
    val root = tmpDir("ccut_retry") + "/reps"
    applyBatch(root, 1L, Seq(row("even", 1, 2, 1.0), row("odd", 2, 3, 2.0)))
    // foreachBatch redelivery: odd's batch 1 commits again with the same tag
    new BucketedReplica(s"$root/odd", nBuckets = 4)
      .commit(mkBatch(Seq(row("odd", 2, 3, 2.0))), tag = Some(1L))
    CdcStream.markApplied(root, 1L) // re-mark is a no-op
    val (cut, vers) = CdcStream.consistentCutVersions(root, Seq("even", "odd"))
    assert(cut === 1L)
    assert(vers("odd") === Some(2L), "equal tags must resolve to the newest version")
    assert(CdcStream.consistentLiveFor(spark, root, "odd", vers).count() === 1)

    // compaction rewrites files but reflects the same source batch
    val even = new BucketedReplica(s"$root/even", nBuckets = 4)
    even.compact(spark)
    assert(even.retainedTags(even.currentVersion.get) === 1L)
    val (_, vers2) = CdcStream.consistentCutVersions(root, Seq("even", "odd"))
    assert(CdcStream.consistentLiveFor(spark, root, "even", vers2).count() === 1)
  }

  test("an evicted <=cut version throws (retention violated) instead of reading empty") {
    val root = tmpDir("ccut_evict") + "/reps"
    // odd has real data at the frontier (batch 1, markered) …
    applyBatch(root, 1L, Seq(row("even", 1, 2, 1.0), row("odd", 2, 3, 2.0)))
    // … then batch 2 commits to odd but crashes BEFORE the marker,
    // and a compaction runs in the gap: both retained versions of odd now
    // carry tag 2 (compact carries the in-flight tag forward) and the
    // version tagged 1 is evicted by cur+prev retention
    applyBatch(root, 2L, Seq(row("odd", 4, 5, 4.0)), mark = false)
    new BucketedReplica(s"$root/odd", nBuckets = 4).compact(spark)

    // pre-fix this silently read odd as EMPTY at cut 1 — data loss in the
    // consistent view; the durable birth tag (firstTag=1 <= cut) proves a
    // <=cut state existed, so the read must fail loudly
    val e = intercept[IllegalStateException] {
      CdcStream.consistentCutVersions(root, Seq("even", "odd"))
    }
    assert(e.getMessage.contains("retention violated"), e.getMessage)

    // the retry completes batch 2; the frontier advances and reads heal
    applyBatch(root, 2L, Seq(row("odd", 4, 5, 4.0)))
    val (cut, vers) = CdcStream.consistentCutVersions(root, Seq("even", "odd"))
    assert(cut === 2L)
    assert(CdcStream.consistentLiveFor(spark, root, "odd", vers)
      .select("user_id").collect().map(_.getLong(0)).sorted === Array(3L, 5L))
  }

  test("pre-birth-tag replica upgrades via recordFirstTag (no silent empty, no unsound guess)") {
    val root = tmpDir("ccut_upgrade") + "/reps"
    applyBatch(root, 1L, Seq(row("even", 1, 2, 1.0), row("odd", 2, 3, 2.0)))
    // simulate a replica created before birth tags existed: strip firstTag
    val metaPath = java.nio.file.Paths.get(s"$root/odd/_META")
    val stripped = java.nio.file.Files.readString(metaPath)
      .linesIterator.filterNot(_.startsWith("firstTag=")).mkString("", "\n", "\n")
    java.nio.file.Files.writeString(metaPath, stripped)
    // roll odd's retained tags past the cut: batch 2 commits to odd only,
    // no marker, compaction re-tags both retained versions to 2
    applyBatch(root, 2L, Seq(row("odd", 4, 5, 4.0)), mark = false)
    val odd = new BucketedReplica(s"$root/odd", nBuckets = 4)
    odd.compact(spark)

    // no retained tag <= cut, no birth tag: fail loudly with the upgrade
    // procedure in the message (never silently empty, never auto-guessed)
    val e = intercept[IllegalStateException] {
      CdcStream.consistentCutVersions(root, Seq("even", "odd"))
    }
    assert(e.getMessage.contains("recordFirstTag"), e.getMessage)

    // refuses an unsound birth claim: a retained version tagged 2 proves
    // the table existed by batch 2, so birth "at 3" is rejected
    intercept[IllegalArgumentException] { odd.recordFirstTag(3L) }

    // the operator registers the true birth (batch 1, from deployment
    // history): the cut now resolves the ambiguity as retention-violated
    // (a <=cut state provably existed and was evicted) — the sound answer
    odd.recordFirstTag(1L)
    assert(odd.firstTag === Some(1L))
    val e2 = intercept[IllegalStateException] {
      CdcStream.consistentCutVersions(root, Seq("even", "odd"))
    }
    assert(e2.getMessage.contains("retention violated"), e2.getMessage)

    // double registration is refused
    intercept[IllegalArgumentException] { odd.recordFirstTag(1L) }

    // and a table genuinely born AFTER the cut resolves as provably empty
    val root2 = tmpDir("ccut_upgrade2") + "/reps"
    applyBatch(root2, 1L, Seq(row("even", 1, 2, 1.0)))
    applyBatch(root2, 2L, Seq(row("odd", 4, 5, 4.0)), mark = false)
    val odd2 = new BucketedReplica(s"$root2/odd", nBuckets = 4)
    val meta2 = java.nio.file.Paths.get(s"$root2/odd/_META")
    java.nio.file.Files.writeString(meta2,
      java.nio.file.Files.readString(meta2).linesIterator
        .filterNot(_.startsWith("firstTag=")).mkString("", "\n", "\n"))
    odd2.recordFirstTag(2L) // born in the in-flight batch
    val (cut2, vers2) = CdcStream.consistentCutVersions(root2, Seq("even", "odd"))
    assert(cut2 === 1L && vers2("odd").isEmpty)
  }

  test("property: under any batch schedule, the cut view equals the batch-prefix state") {
    // randomized-but-seeded schedules: tables drop in and out of batches,
    // the last batch may be half-applied — the consistent view must always
    // equal a from-scratch merge of the batches up to the frontier
    val rnd = new scala.util.Random(42)
    (0 until 5).foreach { trial =>
      val root = tmpDir(s"ccut_prop$trial") + "/reps"
      val tbls = Seq("t0", "t1", "t2")
      val n = 3 + rnd.nextInt(3)
      var pos = 0L
      val batches: Seq[(Long, Seq[Row])] = (1 to n).map { b =>
        val rows = tbls.filter(_ => rnd.nextBoolean()).flatMap { t =>
          (0 until 1 + rnd.nextInt(2)).map { _ =>
            pos += 1; row(t, pos, rnd.nextInt(5).toLong, pos * 1.0)
          }
        }
        (b.toLong, rows)
      }
      val lastHalf = rnd.nextBoolean() // crash before the final marker?
      batches.foreach { case (b, rows) =>
        applyBatch(root, b, rows, mark = !(lastHalf && b == n))
      }
      val frontier = if (lastHalf) n - 1L else n.toLong
      val applied = batches.filter(_._1 <= frontier).flatMap(_._2)
      val (cut, vers) = CdcStream.consistentCutVersions(root, tbls)
      assert(cut === frontier, s"trial $trial")
      // latest-wins per pk within each table, over exactly the prefix
      val expected = applied.groupBy(_.getString(1)).view.mapValues {
        _.groupBy(_.getLong(4)).view.mapValues(_.map(_.getLong(2)).max).toMap
      }.toMap
      tbls.foreach { t =>
        val got = CdcStream.consistentLiveFor(spark, root, t, vers)
          .select("user_id", "pos").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === expected.getOrElse(t, Map.empty), s"trial $trial table $t")
      }
    }
  }

  test("aligned change feeds move a consumer between torn-free snapshots") {
    val root = tmpDir("ccut_feed") + "/reps"
    applyBatch(root, 1L, Seq(row("even", 1, 2, 1.0), row("odd", 2, 3, 2.0)))
    val (_, v1) = CdcStream.consistentCutVersions(root, Seq("even", "odd"))
    // batch 2: update even's key 2, odd's FIRST sight of key 9; 'born' table
    // late arrives in batch 2 as well
    applyBatch(root, 2L, Seq(
      Row("UPDATE", "even", 3L, 30L, 2L, 9.0, "evt"),
      row("odd", 4, 9, 4.0), row("born", 5, 11, 5.0)))
    val (_, v2) = CdcStream.consistentCutVersions(root, Seq("even", "odd", "born"))

    val feeds = CdcStream.consistentChangeFeeds(spark, root, v1, v2)
    val evenFeed = feeds("even").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(evenFeed === Set((2L, "UPDATE", 3L)))
    val oddFeed = feeds("odd").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(oddFeed === Set((9L, "INSERT", 4L)))
    val bornFeed = feeds("born").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(bornFeed === Set((11L, "INSERT", 5L)))

    // a third frontier with no changes anywhere → all feeds empty
    CdcStream.markApplied(root, 3L)
    val (_, v3) = CdcStream.consistentCutVersions(root, Seq("even", "odd", "born"))
    assert(CdcStream.consistentChangeFeeds(spark, root, v2, v3)
      .values.map(_.count()).sum === 0L)
  }

  test("end-to-end: the streaming fan-out's replicas admit a consistent cut") {
    val root = tmpDir("ccut_e2e")
    val ch = Cdc.changelog(spark, sfDir)
      .withColumn("tbl", when(col("user_id") % 2 === 0, "users_even")
        .otherwise("users_odd"))
    // two change files → two micro-batches (maxFilesPerTrigger = 1)
    ch.filter(col("pos") < 500).coalesce(1)
      .write.mode("append").parquet(s"$root/in")
    ch.filter(col("pos") >= 500).coalesce(1)
      .write.mode("append").parquet(s"$root/in")
    val q = CdcStream.applyToReplicasByTable(
      CdcStream.fileChangelogStream(spark, s"$root/in"),
      s"$root/reps", s"$root/staging", s"$root/dlq", s"$root/ckpt")
    q.awaitTermination()
    val (cut, vers) =
      CdcStream.consistentCutVersions(s"$root/reps", Seq("users_even", "users_odd"))
    assert(cut >= 0L)
    val even = CdcStream.consistentLiveFor(spark, s"$root/reps", "users_even", vers)
    val odd = CdcStream.consistentLiveFor(spark, s"$root/reps", "users_odd", vers)
    // at the final frontier the consistent views equal the current views …
    assert(even.count() > 0 && odd.count() > 0)
    assert(even.count() ===
      CdcStream.liveReplicaFor(spark, s"$root/reps", "users_even").count())
    // … and stay key-disjoint by construction
    assert(even.filter(col("user_id") % 2 =!= 0).count() === 0)
    assert(odd.filter(col("user_id") % 2 === 0).count() === 0)
  }
}
