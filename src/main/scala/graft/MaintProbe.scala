package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.streaming.{LshIndex, StoreIO}

/** Dev tool: vacuum()/audit() cost vs store size with CONSTANT wreckage —
  * the measurement behind SCALE.md's maintenance-invariance table (the r15
  * verdict's ask: "cost ∝ wreckage, not store size" was argued, not
  * measured). Design mirrors the r14 crash-repair table: the LSH store
  * grows 16× in committed batches/docs while the planted wreckage stays
  * fixed (ONE crashed append = 3 orphan partition dirs, injected with the
  * same Faults harness the crash sweeps use); each pass times
  *
  *  - `audit` (full report, collected) — structural rows are control-plane
  *    (log fold + dir listings, O(partitions)); the containment scan rows
  *    are one distributed pass over the committed store BY DESIGN (they
  *    verify membership, which no listing can), so audit wall is expected
  *    to grow with partition count, not stay flat;
  *  - `vacuum` (lease → log entry → delete orphans → release) — the claim
  *    under test: its wall and its control-op counts must track the
  *    3-orphan wreckage, not the store.
  *
  * Usage: tools/run.sh graft.MaintProbe  — one JSON line per measurement
  * with wall seconds and StoreIO op-count deltas. */
object MaintProbe {

  private def probe[A](name: String)(body: => A): (A, Double) = {
    val s0 = StoreIO.Stats.snapshot()
    val t0 = System.nanoTime()
    val r = body
    val sec = (System.nanoTime() - t0) / 1e9
    val sd = StoreIO.Stats.diff(StoreIO.Stats.snapshot(), s0)
    val fs = Seq("reads", "writes", "renames", "exists", "lists", "deletes")
      .map(k => s""""$k":${sd.getOrElse(k, 0L)}""").mkString(",")
    println(f"""{"op":"$name","sec":${math.rint(sec * 1000) / 1000}%s,$fs}""")
    (r, sec)
  }

  /** Deterministic synthetic corpus slice: `n` docs starting at `id0`,
    * shingle-friendly text (distinct per doc so the LSH graph stays
    * sparse and batch cost is uniform across scales). */
  private def docsDf(s: SparkSession, id0: Long, n: Int): DataFrame = {
    import s.implicits._
    (0 until n).map { i =>
      val id = id0 + i
      (id, (0 until 24).map(w => s"w${(id * 31 + w * 7) % 9973}").mkString(" "))
    }.toDF("doc_id", "text")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("maint_probe_").toString
    Seq(1, 4, 16).foreach { scale =>
      val root = s"$base/lsh_$scale"
      val idx = new LshIndex(root)
      val batches = 2 * scale
      val perBatch = 30
      (0 until batches).foreach { b =>
        idx.addBatch(docsDf(spark, b.toLong * perBatch, perBatch), b.toLong)
      }
      // constant wreckage: ONE crashed append (dies at its first control
      // mutation — the log commit's tmp write — leaving its 3 fully
      // written partition dirs orphaned above the frontier)
      StoreIO.Faults.armAt(root, 1)
      try new LshIndex(root)
        .addBatch(docsDf(spark, batches.toLong * perBatch, perBatch), batches.toLong)
      catch { case _: StoreIO.Faults.InjectedCrash => () }
      StoreIO.Faults.disarm()
      val cold = new LshIndex(root)
      probe(s"audit_${scale}x_cold")(cold.audit(spark).collect())
      probe(s"audit_${scale}x_warm")(cold.audit(spark).collect())
      val (deleted, _) = probe(s"vacuum_${scale}x")(new LshIndex(root).vacuum())
      println(s"""{"op":"vacuum_${scale}x_deleted","n":${deleted.size},""" +
        s""""batches":$batches,"docs":${batches * perBatch}}""")
    }
    spark.stop()
  }
}
