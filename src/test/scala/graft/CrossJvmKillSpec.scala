package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.{BucketedReplica, CdcStream}

/** TRUE process-death chaos: SIGKILL a committing JVM at random moments.
  *
  * The in-process injector ([[graft.streaming.StoreIO.Faults]]) models
  * every CONTROL-PLANE prefix a crash can leave, but it cannot produce
  * data-plane states — a kill landing inside a Spark parquet task leaves
  * half-written `.snappy.parquet` part files, uncommitted task attempt
  * dirs, and whatever else the OS flushed, none of it routed through
  * StoreIO. This spec kills -9 a real child JVM mid-commit-loop at
  * seeded-random moments, several rounds in a row, and holds the store to
  * the same bar as the injected sweeps:
  *
  *   - after EVERY kill a fresh reader reads and fsck reports every
  *     invariant ok (torn data files are necessarily unreferenced — the
  *     write-before-commit invariant at the FS level);
  *   - every batch the child durably ACKED (progress file written after
  *     commit returned) is present in the live state — kill -9 loses
  *     nothing acknowledged;
  *   - a successor writer commits on top of the wreckage and its GC
  *     sweeps the dead attempt dirs.
  */
class CrossJvmKillSpec extends SparkSpecBase {

  private def launch(cls: String, args: Seq[String], log: String): Process = {
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx1g", "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"), cls) ++ args
    new ProcessBuilder(cmd: _*)
      .redirectOutput(new java.io.File(log))
      .redirectErrorStream(true)
      .start()
  }

  test("kill -9 mid-commit, repeatedly: nothing acknowledged is lost, " +
    "every wreckage state reads clean, and a successor commit sweeps it") {
    val rnd = new scala.util.Random(20260816L)
    val dir = tmpDir("xjvm_kill")
    val root = s"$dir/rep"
    // seed so every round opens an existing replica
    val rep0 = new BucketedReplica(root, nBuckets = 4)
    rep0.commit(spark.createDataFrame(
      java.util.Arrays.asList(Row("INSERT", "users", 0L, 0L, 9000L, 0.0, "seed")),
      CdcStream.envelopeSchema))

    val progress = Paths.get(dir, "progress")
    var acked = 0L
    (1 to 4).foreach { round =>
      val child = launch("graft.CrossJvmKillLoopMain",
        Seq(root, progress.toString, acked.toString), s"$dir/child$round.log")
      try {
        // wait until the child has acked at least one NEW commit, then
        // kill it a random instant later — mid-commit with p ≈ 1
        // racy tiny-file read: a kill or a concurrent write can leave it
        // momentarily empty/partial — fall back to the last stable value
        def readAck(): Long =
          try new String(Files.readAllBytes(progress)).trim.toLong
          catch { case _: Exception => acked }
        val deadline = System.currentTimeMillis() + 120000L
        while (readAck() <= acked && System.currentTimeMillis() < deadline)
          Thread.sleep(20)
        Thread.sleep(rnd.nextInt(400).toLong)
        child.destroyForcibly()
        child.waitFor()
        acked = readAck()
      } finally { if (child.isAlive) { child.destroyForcibly(); () } }
      assert(acked >= round, s"round $round: child acked nothing new")

      // the wreckage must read clean from a FRESH instance
      val rep = new BucketedReplica(root, nBuckets = 4)
      val live = rep.live(spark).collect()
      val bad = rep.fsck(spark).filter(!col("ok")).collect()
      assert(bad.isEmpty, s"round $round fsck failures: ${bad.mkString("; ")}")
      // everything the child ACKED must be durable: batch i inserts key
      // 1000+i — every key ≤ acked present exactly once
      val keys = live.map(_.getLong(live.head.fieldIndex("user_id"))).toSet
      (1L to acked).foreach(i => assert(keys.contains(1000L + i),
        s"round $round: acked batch $i lost by the kill"))
    }
    info(s"4 kills survived; child acked $acked commits total")

    // a successor writer commits on top of the wreckage; its GC must
    // sweep every dead attempt dir (version ≤ the one it publishes)
    val rep = new BucketedReplica(root, nBuckets = 4)
    rep.commit(spark.createDataFrame(
      java.util.Arrays.asList(
        Row("INSERT", "users", 99999L, 99999L, 9001L, 1.0, "after")),
      CdcStream.envelopeSchema))
    val bad = rep.fsck(spark).filter(!col("ok")).collect()
    assert(bad.isEmpty, s"post-successor fsck failures: ${bad.mkString("; ")}")
    val headV = rep.currentVersion.get
    val deadDirs = Option(new java.io.File(s"$root/data").listFiles())
      .getOrElse(Array.empty).map(_.getName)
      .filter { n =>
        val v = n.stripPrefix("v").takeWhile(_.isDigit)
        v.nonEmpty && v.toLong <= headV - 2 // older than cur+prev retention
      }
    // every such dir must still be REFERENCED — by the current version OR
    // the retained previous one (a touched bucket's old file lives in an
    // old dir that prev still names) — or gone; an unreferenced leftover
    // would mean the GC missed wreckage
    def dirsOf(files: Array[String]): Set[String] = files.map(f =>
      f.stripPrefix("file:").split("/data/").last.split("/bucket=").head).toSet
    val referenced = dirsOf(rep.read(spark).inputFiles) ++
      dirsOf(rep.readAt(spark, headV - 1).inputFiles)
    deadDirs.foreach(d => assert(referenced.contains(d),
      s"unreferenced wreckage dir survived the successor's GC: $d"))
  }

  test("kill -9 against the exactly-once agg fold: the restarted stream's " +
    "redelivery self-heals every wreckage state — no audit, no rebuild") {
    val rnd = new scala.util.Random(7L)
    val dir = tmpDir("xjvm_kill_agg")
    val parent = s"$dir/store"
    import graft.streaming.IncrementalAgg
    def agg() = new IncrementalAgg(
      new BucketedReplica(s"$parent/replica", nBuckets = 4), s"$parent/view")
    agg().applyBatch(CrossJvmKillLoopMain.aggBatch(spark, 0L), 0L) // seed
    val progress = Paths.get(dir, "progress")
    var acked = 0L
    (1 to 3).foreach { round =>
      val child = launch("graft.CrossJvmKillAggMain",
        Seq(parent, progress.toString, acked.toString), s"$dir/agg$round.log")
      try {
        def readAck(): Long =
          try new String(Files.readAllBytes(progress)).trim.toLong
          catch { case _: Exception => acked }
        val deadline = System.currentTimeMillis() + 120000L
        while (readAck() <= acked && System.currentTimeMillis() < deadline)
          Thread.sleep(20)
        Thread.sleep(rnd.nextInt(400).toLong)
        child.destroyForcibly()
        child.waitFor()
        acked = readAck()
      } finally { if (child.isAlive) { child.destroyForcibly(); () } }
      assert(acked >= round, s"round $round: child acked nothing new")
      // the restarted stream redelivers from its checkpoint: everything
      // after the last ack, batches regenerated deterministically
      agg().applyBatch(CrossJvmKillLoopMain.aggBatch(spark, acked + 1), acked + 1)
      acked += 1
      Files.write(progress, acked.toString.getBytes)
      assert(agg().audit(spark).isEmpty,
        s"round $round: the redelivery did not heal the kill's view gap")
    }
    info(s"3 kills + redeliveries; view consistent after each, " +
      s"$acked batches folded")
  }
}

/** Child: open the replica, loop commits forever, ack each durable commit
  * by OVERWRITING the progress file with its batch number. The parent
  * kills -9 at a random moment; everything this main does must therefore
  * be crash-safe at every instruction. */
object CrossJvmKillLoopMain {

  /** Deterministic envelope batch `i` — parent and child generate
    * IDENTICAL content, which is exactly the redelivery contract of a
    * checkpointed source (same batch id ⇒ same data). */
  def aggBatch(spark: SparkSession, i: Long): org.apache.spark.sql.DataFrame = {
    val rows = (0 until 5).map { j =>
      val uid = (i * 5 + j) % 17
      val op = if ((i + j) % 7 == 0) "DELETE"
        else if (j % 2 == 0) "INSERT" else "UPDATE"
      Row(op, "users", i * 10 + j, (i * 10 + j) * 1000L, uid,
        (i + j) * 1.25, s"e${(i + j) % 3}")
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*),
      CdcStream.envelopeSchema)
  }

  def main(args: Array[String]): Unit = {
    val Array(root, progressS, startS) = args
    val start = startS.toLong
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rep = BucketedReplica.open(root)
    var i = start + 1
    while (true) {
      val batch = spark.createDataFrame(
        java.util.Arrays.asList(Row("INSERT", "users", i, i * 1000L,
          1000L + i, i * 1.5, s"b$i")),
        CdcStream.envelopeSchema)
      rep.commit(batch)
      // ack AFTER the commit returned: the parent's loss check only counts
      // acked batches, the kill may legitimately eat an unacked one
      java.nio.file.Files.write(java.nio.file.Paths.get(progressS),
        i.toString.getBytes)
      i += 1
    }
  }
}

/** Child for the exactly-once fold round: loop `applyBatch(batch(i), i)`
  * with deterministic batches, acking after each complete fold. */
object CrossJvmKillAggMain {
  def main(args: Array[String]): Unit = {
    val Array(parent, progressS, startS) = args
    val start = startS.toLong
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val agg = new graft.streaming.IncrementalAgg(
      new BucketedReplica(s"$parent/replica", nBuckets = 4), s"$parent/view")
    var i = start + 1
    while (true) {
      agg.applyBatch(CrossJvmKillLoopMain.aggBatch(spark, i), i)
      java.nio.file.Files.write(java.nio.file.Paths.get(progressS),
        i.toString.getBytes)
      i += 1
    }
  }
}
