package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.streaming.{BucketedReplica, CdcStream, IncrementalAgg, StoreIO}

/** Randomized live-threads stress for the incremental aggregate view's
  * full round-13 machinery — pinned before/after snapshots, durable GC
  * pins, the view store's write-once pointer, and the delta-preserving
  * view-fold retry. Three maintainer threads fold disjoint slices of one
  * random changelog into the SAME replica + SAME view while a maintenance
  * thread races compactions; every maintainer retries the whole fold on
  * the protocol's loud replica conflicts (the view-fold race retries
  * internally with the same delta). The final view must equal a
  * from-scratch aggregate of the final replica state — a double-counted
  * foreign delta (the post-commit seam), a lost view write (the view
  * pointer seam), or a GC'd pinned scan would each break the equality. */
class IncrementalAggStressSpec extends SparkSpecBase {

  private def retrying(what: => Unit, label: String): Unit = {
    var tries = 0
    var done = false
    while (!done) {
      try { what; done = true }
      catch {
        // AnalysisException(PATH_NOT_FOUND): the documented lapped-reader
        // retention failure (ReplicaReaderStressSpec's contract) — a fold
        // or compaction whose pinned snapshot rolled out before its pin
        // landed fails LOUDLY at read construction, before anything
        // committed, so the wholesale retry re-pins and converges
        case e @ (_: StoreIO.ConcurrentCommit | _: java.io.IOException |
                  _: IllegalStateException |
                  _: org.apache.spark.SparkException |
                  _: org.apache.spark.sql.AnalysisException) =>
          tries += 1
          if (tries > 80) throw new IllegalStateException(
            s"$label starved after $tries conflict retries", e)
      }
    }
  }

  // Loop knob for soak runs (the r14 verdict's bar: the race fix must hold
  // under a 50-iteration loop, not one green run): GRAFT_AGG_STRESS_ITERS=50
  // runs the scenario over that many DIFFERENT seeds in one JVM. Default 12
  // (seeds 20260815..20260826, the first being the r14/r15-reproducing
  // one): the r15 dual-win regression shipped precisely because a single
  // default iteration could come up green against a ~50%-per-12-iteration
  // window — the standing multi-seed loop (~60 s) makes one lucky run
  // unable to hide a probabilistic race again.
  private val iters = sys.env.get("GRAFT_AGG_STRESS_ITERS")
    .orElse(sys.props.get("graft.agg.stress.iters"))
    .flatMap(_.toIntOption).getOrElse(12)

  test("three racing view maintainers plus a racing compactor converge " +
    "to the from-scratch aggregate — no double count, no lost delta") {
    (0 until iters).foreach { iter =>
      run(20260815L + iter)
      if (iters > 1) info(s"iteration $iter (seed ${20260815L + iter}) green")
    }
  }

  private def run(seed: Long): Unit = {
    val root = tmpDir("agg_stress")
    val rnd = new scala.util.Random(seed)
    val all: IndexedSeq[Row] = (1 to 90).map { pos =>
      val uid = rnd.nextInt(30).toLong
      val op = rnd.nextInt(10) match {
        case 0 => "DELETE"
        case n if n < 4 => "INSERT"
        case _ => "UPDATE"
      }
      Row(op, "users", pos.toLong, pos.toLong * 1000, uid,
        math.rint(rnd.nextDouble() * 10000) / 100,
        s"evt${pos % 4}")
    }
    def df(rows: Seq[Row]): DataFrame = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), CdcStream.envelopeSchema)
    // seed so every thread opens an existing replica
    new IncrementalAgg(new BucketedReplica(s"$root/replica", nBuckets = 4),
      s"$root/agg").applyBatch(df(all.take(1)))
    val slices = (0 until 3).map(w => all.zipWithIndex.collect {
      case (r, i) if i % 3 == w => r
    })
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val writers = slices.zipWithIndex.map { case (slice, w) =>
      new Thread(() => {
        try {
          val rep = new BucketedReplica(s"$root/replica", nBuckets = 4)
          val agg = new IncrementalAgg(rep, s"$root/agg")
          slice.grouped(10).zipWithIndex.foreach { case (batch, i) =>
            retrying(agg.applyBatch(df(batch)), s"maintainer$w batch$i")
          }
        } catch { case t: Throwable => failures.add(t) }
      }, s"maintainer$w")
    }
    val compactor = new Thread(() => {
      try {
        val rep = new BucketedReplica(s"$root/replica", nBuckets = 4)
        (1 to 3).foreach { i =>
          Thread.sleep(200L * i)
          retrying(rep.compact(spark), s"compact$i")
        }
      } catch { case t: Throwable => failures.add(t) }
    }, "compactor")
    (writers :+ compactor).foreach(_.start())
    (writers :+ compactor).foreach(_.join(180000))
    assert(failures.isEmpty, s"thread died: ${failures.peek()}")
    val rep = new BucketedReplica(s"$root/replica", nBuckets = 4)
    val agg = new IncrementalAgg(rep, s"$root/agg")
    val expect = rep.live(spark)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_live"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("sum_value"))
      .orderBy("event_type").collect().toSeq
    val got = agg.read(spark).orderBy("event_type").collect().toSeq
    assert(got === expect,
      "stressed view != from-scratch aggregate of the final replica state")
    // and no stale pin leaked past the folds (every fold unpins in finally)
    val leftoverPins = new java.io.File(s"$root/replica").listFiles()
      .map(_.getName).filter(_.startsWith("_PIN-"))
    assert(leftoverPins.isEmpty,
      s"folds leaked GC pins: ${leftoverPins.mkString(", ")}")
  }
}
