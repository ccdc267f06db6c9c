package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.streaming.{BucketedReplica, CdcStream, StoreIO}

/** Randomized CONCURRENT-writer stress for the replica's optimistic commit
  * protocol — the live-threads complement of the deterministic seam specs
  * (StreamingScd2Spec / DeleteUpdateSqlSpec / IncrementalAggSpec /
  * BucketedReplicaSpec) that round 12 added for each read-modify-publish
  * path. Three writer threads fold disjoint slices of one random changelog
  * into a single replica, retrying on the protocol's LOUD conflicts
  * (ConcurrentCommit, the pointer's write-once IOException), while a
  * maintenance thread races full compactions through the same window. The
  * final live state must equal the sequential latest-wins merge of ALL
  * changes — a single silently-lost update (the seam class the snapshot
  * threading closed) breaks the equality. Latest-wins with retained
  * tombstones tolerates any interleaving of positions by design, so the
  * only thing this test can catch is the protocol losing committed rows. */
class ConcurrentWritersSpec extends SparkSpecBase {

  private def retrying(what: => Unit, label: String): Unit = {
    var tries = 0
    var done = false
    while (!done) {
      try { what; done = true }
      catch {
        // ConcurrentCommit / pointer IOException: defeated at the
        // write-once pointer. IllegalStateException: a reader outpaced by
        // fast flips ("unreadable across 5 rounds") or a snapshot whose
        // manifest rolled past cur+prev mid-commit — both transient for a
        // caller that re-snapshots on retry; a persistent real fault still
        // surfaces as starvation with the cause attached.
        // SparkException: the winner's post-flip sweep may delete this
        // loser's in-flight attempt dir mid-job — loud by design, and the
        // commit is all-or-nothing pre-pointer, so a wholesale retry is
        // exactly right
        case e @ (_: StoreIO.ConcurrentCommit | _: java.io.IOException |
                  _: IllegalStateException |
                  _: org.apache.spark.SparkException) =>
          tries += 1
          if (tries > 80) throw new IllegalStateException(
            s"$label starved after $tries conflict retries", e)
      }
    }
  }

  test("three racing committers plus a racing compactor converge to the " +
    "sequential latest-wins state — no silently lost update") {
    val root = tmpDir("conc_writers") + "/rep"
    val rnd = new scala.util.Random(20260815)
    val all: IndexedSeq[Row] = (1 to 120).map { pos =>
      val uid = rnd.nextInt(40).toLong
      val op = rnd.nextInt(10) match {
        case 0 => "DELETE"
        case n if n < 4 => "INSERT"
        case _ => "UPDATE"
      }
      Row(op, "users", pos.toLong, pos.toLong * 1000, uid,
        math.rint(rnd.nextDouble() * 10000) / 100, "evt")
    }
    def df(rows: Seq[Row]): DataFrame = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), CdcStream.envelopeSchema)
    // round-robin slices → each writer's stream is per-key ordered only by
    // luck; latest-wins with retained tombstones doesn't need order anyway
    val slices = (0 until 3).map(w => all.zipWithIndex.collect {
      case (r, i) if i % 3 == w => r
    })
    new BucketedReplica(root, nBuckets = 4).commit(df(all.take(1))) // seed v1
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val writers = slices.zipWithIndex.map { case (slice, w) =>
      new Thread(() => {
        try {
          val rep = new BucketedReplica(root, nBuckets = 4)
          slice.grouped(10).zipWithIndex.foreach { case (batch, i) =>
            retrying(rep.commit(df(batch)), s"writer$w batch$i")
          }
        } catch { case t: Throwable => failures.add(t) }
      }, s"writer$w")
    }
    val compactor = new Thread(() => {
      try {
        val rep = new BucketedReplica(root, nBuckets = 4)
        (1 to 3).foreach { i =>
          Thread.sleep(150L * i)
          retrying(rep.compact(spark), s"compactor pass$i")
        }
      } catch { case t: Throwable => failures.add(t) }
    }, "compactor")
    (writers :+ compactor).foreach(_.start())
    (writers :+ compactor).foreach(_.join(300000))
    assert(failures.isEmpty, failures.toArray.mkString("; "))

    val rep = new BucketedReplica(root, nBuckets = 4)
    val got = rep.live(spark)
      .select("user_id", "pos", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = Cdc.merge(df(all), Seq("user_id"))
      .select("user_id", "pos", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === want,
      s"concurrent fold diverged from the sequential merge: " +
        s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    // and the store still passes its own integrity audit
    val bad = rep.fsck(spark).filter(!col("ok")).collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }
}
