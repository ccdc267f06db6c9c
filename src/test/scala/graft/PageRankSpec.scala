package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.operators.PageRank

import scala.util.Random

/** operators/PageRank: bit-exact vs a driver-side reference loop with the
  * same fixed-point integer math, and CONSTANT plan depth per iteration —
  * the scale property the operator exists for (e56's inline loop composed
  * a 15-join lineage; the operator localCheckpoints each round). */
class PageRankSpec extends SparkSpecBase {

  private def edgesDf(pairs: Seq[(Long, Long)]) =
    spark.createDataFrame(
      java.util.Arrays.asList(pairs.map(p => Row(p._1, p._2)): _*),
      StructType(Seq(StructField("a", LongType), StructField("b", LongType))))

  /** Reference loop: identical fixed-point math, plain Scala maps. */
  private def referencePr(directed: Seq[(Long, Long)], iters: Int,
                          scale: Long = 1000000000000L): Map[Long, Long] = {
    val outdeg = directed.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val nodes = outdeg.keys.toSeq.sorted
    val n = nodes.size.toLong
    val base = 15L * scale / (100L * n)
    var pr = nodes.map(_ -> scale / n).toMap
    (1 to iters).foreach { _ =>
      val sc = directed.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) =>
          Math.floorDiv(pr(src), outdeg(src))
        }.sum
      }
      pr = nodes.map(u => u -> (base + Math.floorDiv(85L * sc.getOrElse(u, 0L), 100L))).toMap
    }
    pr
  }

  test("matches the driver-side fixed-point reference on a random undirected graph") {
    val rnd = new Random(20260813L)
    val nodes = (0L until 40L)
    val undirected = (for {
      _ <- 1 to 120
      a = nodes(rnd.nextInt(nodes.size))
      b = nodes(rnd.nextInt(nodes.size))
      if a != b
    } yield (math.min(a, b), math.max(a, b))).distinct
    val directed = undirected ++ undirected.map(_.swap)
    val got = PageRank.run(edgesDf(directed), iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === referencePr(directed, 5))
  }

  test("rank mass is conserved up to floor-division leakage") {
    // Σpr after any round is ≤ SCALE and ≥ SCALE − N·(1 div-loss per node
    // per stage): a cheap global invariant that catches sign/damping bugs.
    val ring = (0L until 16L).map(i => (i, (i + 1) % 16))
    val directed = ring ++ ring.map(_.swap)
    val total = PageRank.run(edgesDf(directed), iterations = 5)
      .agg(sum("pr")).head().getLong(0)
    val scale = 1000000000000L
    assert(total <= scale)
    assert(total >= scale - 16L * 200L, s"lost too much mass: $total")
  }

  test("plan depth is constant in the iteration count (localCheckpoint per round)") {
    val ring = (0L until 8L).map(i => (i, (i + 1) % 8))
    val directed = ring ++ ring.map(_.swap)
    def planLines(iters: Int): Int =
      PageRank.run(edgesDf(directed), iterations = iters)
        .queryExecution.optimizedPlan.numberedTreeString.linesIterator.size
    val d2 = planLines(2)
    val d8 = planLines(8)
    assert(d2 === d8,
      s"plan grew with iterations ($d2 lines at k=2, $d8 at k=8) — lineage not truncated")
  }

  test("reliable checkpointDir: identical ranks, durable round files, constant depth") {
    // the fault-tolerant mode for 1000-executor runs — executor-local
    // blocks die with their executor; df.checkpoint() against storage
    // doesn't. Answers must be bit-identical to the local mode.
    val dir = java.nio.file.Files.createTempDirectory("pr_ckpt").toString
    val ring = (0L until 16L).map(i => (i, (i + 1) % 16))
    val directed = ring ++ ring.map(_.swap)
    val local = PageRank.run(edgesDf(directed), iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reliableDf = PageRank.run(edgesDf(directed), iterations = 4,
      checkpointDir = Some(dir))
    val reliable = reliableDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable === local)
    // rounds actually hit durable storage: rdd-* checkpoint dirs exist
    def rddDirs(f: java.io.File): Int =
      Option(f.listFiles).toSeq.flatten.map(c =>
        (if (c.getName.startsWith("rdd-")) 1 else 0) + rddDirs(c)).sum
    assert(rddDirs(new java.io.File(dir)) > 0, s"no checkpoint files under $dir")
    // truncation property holds in reliable mode too
    val lines = reliableDf.queryExecution.optimizedPlan
      .numberedTreeString.linesIterator.size
    val localLines = PageRank.run(edgesDf(directed), iterations = 4)
      .queryExecution.optimizedPlan.numberedTreeString.linesIterator.size
    assert(lines === localLines,
      s"reliable-mode plan depth $lines != local-mode $localLines")
  }
}
