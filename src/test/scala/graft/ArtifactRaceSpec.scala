package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Concurrent-writer race for the corpus-artifact commit protocol: N
  * threads observe "no _SUCCESS" simultaneously (a start latch pins the
  * interleaving), all N build, and all N race the FileContext
  * no-OVERWRITE rename. The contract under contention: every caller
  * returns the SAME committed content, exactly one writer wins, no
  * defeated tmp tree survives (neither beside the artifact nor nested
  * inside it — the FileSystem.rename failure mode this protocol exists
  * to rule out), and a later call serves the committed artifact without
  * rebuilding. This is the multi-job shape of a shared `graft.artifact
  * .dir`: concurrent pipelines over one corpus snapshot racing the
  * first materialization. */
class ArtifactRaceSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def freshCorpus(): String = {
    val dir = tmpDir("artrace")
    val docs = (0 until 50).map(i => Row(i.toLong, s"tok$i alpha beta", "en",
      "srcX", 15L))
    spark.createDataFrame(java.util.Arrays.asList(docs: _*), schema)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("N racing writers: one commit, identical reads, no tmp survivors, " +
    "no rebuild afterwards") {
    val dir = freshCorpus()
    val name = "race_" + java.util.UUID.randomUUID().toString.take(8)
    val builds = new AtomicInteger(0)
    val start = new CountDownLatch(1)
    def readArtifact(): Seq[(Long, Long)] =
      Extensions.corpusArtifact(spark, dir, name) {
        builds.incrementAndGet()
        // a non-trivial plan so racing writes genuinely overlap
        Tables.load(spark, dir, "documents")
          .groupBy(org.apache.spark.sql.functions.col("lang"))
          .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"),
            org.apache.spark.sql.functions.sum(
              org.apache.spark.sql.functions.col("n_chars")).as("chars"))
          .select(org.apache.spark.sql.functions.col("n"),
            org.apache.spark.sql.functions.col("chars"))
      }.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    val pool = Executors.newFixedThreadPool(3)
    try {
      val futs = (0 until 3).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Seq[(Long, Long)]] {
          def call(): Seq[(Long, Long)] = {
            start.await(30, TimeUnit.SECONDS)
            readArtifact()
          }
        })
      }
      start.countDown()
      val results = futs.map(_.get(120, TimeUnit.SECONDS))
      assert(results.toSet.size === 1,
        s"racing callers read diverging artifact content: $results")
      assert(results.head === Seq((50L, 750L)))
      assert(builds.get() >= 2,
        "race did not actually happen — the latch failed to overlap builders")
    } finally pool.shutdownNow()

    // exactly one committed artifact; no defeated __tmp_ tree beside it
    // or nested inside it
    val tag = dir.replaceAll("[^A-Za-z0-9.]", "_")
    val parent = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_$tag")
    val children = Option(parent.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(name))
    assert(children.length === 1 && !children.head.getName.contains("__tmp_"),
      s"artifact dir not exactly one committed root: ${children.map(_.getName).toSeq}")
    val inside = Option(children.head.listFiles()).getOrElse(Array.empty)
    assert(inside.exists(_.getName == "_SUCCESS"))
    assert(!inside.exists(_.getName.startsWith("__tmp_")),
      "a defeated writer nested its tmp tree inside the committed artifact")

    // steady state: the artifact serves; nobody rebuilds
    val before = builds.get()
    assert(readArtifact() === Seq((50L, 750L)))
    assert(builds.get() === before, "post-commit call re-ran the build")
  }

  test("crashed-writer orphan tmps are GC'd on read: stale siblings go, " +
    "recent ones (a possibly-live writer) stay") {
    val dir = freshCorpus()
    val name = "gc_" + java.util.UUID.randomUUID().toString.take(8)
    def read(): Unit = {
      val r = Extensions.corpusArtifact(spark, dir, name) {
        Tables.load(spark, dir, "documents")
          .select(org.apache.spark.sql.functions.col("doc_id"))
      }
      assert(r.count() === 50L)
    }
    read() // commit the artifact

    val tag = dir.replaceAll("[^A-Za-z0-9.]", "_")
    val parent = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_$tag")
    val root = Option(parent.listFiles()).getOrElse(Array.empty)
      .find(f => f.getName.startsWith(name) && !f.getName.contains("__tmp_"))
      .getOrElse(fail(s"no committed root for $name under $parent"))

    // a writer that crashed 2h ago, and one that may still be writing
    def orphan(suffix: String, ageMs: Long): java.io.File = {
      val d = new java.io.File(parent, root.getName + "__tmp_" + suffix)
      assert(d.mkdir())
      val f = new java.io.File(d, "part-00000")
      java.nio.file.Files.write(f.toPath, "x".getBytes("UTF-8"))
      val t = System.currentTimeMillis() - ageMs
      assert(f.setLastModified(t) && d.setLastModified(t))
      d
    }
    val stale = orphan("crashed", 2L * 60 * 60 * 1000)
    val fresh = orphan("inflight", 0L)

    read() // steady-state read runs the GC
    assert(!stale.exists(), "2h-old crashed-writer tmp survived the GC")
    assert(fresh.exists(), "GC deleted a tmp younger than the age floor")
    read() // artifact still intact after GC
    new java.io.File(fresh, "part-00000").delete()
    fresh.delete()
  }
}
