package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Damped PageRank over an edge list, in FIXED-POINT integer arithmetic —
  * the iteration scaffold shared with [[ConnectedComponents]]: every round
  * is one keyed join + one aggregation (the label-propagation dataflow
  * class), and every round checkpoints its result (policy:
  * [[RoundCheckpointer]]) so the logical plan stays CONSTANT-DEPTH.
  * Without truncation, k iterations compose a 3k-join lineage that the
  * optimizer re-analyzes in full each round — the exact failure mode
  * ConnectedComponents.run documents; at 100 TB (or just k=20) planning
  * stalls long before execution starts. Pass `checkpointDir` (or set
  * `graft.checkpoint.dir`) on cluster runs: executor-local blocks do not
  * survive executor loss, durable checkpoints do.
  *
  * Determinism: rank is scaled by `scale` (default 10^12); contribution is
  * `pr div outdeg` (floor division), damping is `85·sum div 100`. Long
  * floor-division and sums are bit-identical on any engine, where the
  * double/decimal variant drifted one ulp between Spark and DuckDB at
  * sf0.1 (see the e56 query note at graft/Extensions.scala).
  *
  * Input `edges` ("a","b") is taken as the DIRECTED adjacency to walk
  * (pass both orientations for an undirected graph). Nodes = source
  * endpoints of `edges` (an undirected graph has no dangling nodes, so
  * source-set = node-set there). Returns ("node","pr").
  */
object PageRank {

  def run(edges: DataFrame, iterations: Int = 5,
          scale: Long = 1000000000000L,
          checkpointDir: Option[String] = None): DataFrame = {
    val ck = RoundCheckpointer.resolve(edges.sparkSession, checkpointDir)
    // One materialization each: `und` feeds every round's join and `deg`
    // additionally seeds the rank vector; checkpointing (not persist)
    // both caches AND truncates lineage — in local mode the blocks are
    // released by the ContextCleaner when the DataFrame goes out of
    // scope, so there is no session-lifetime cache residue.
    // Lazy truncation throughout: each truncate still cuts the plan to a
    // scan at call time (constant planning depth per round — the point of
    // the checkpoint), but block materialization is deferred. deg.count()
    // materializes und+deg in one job; the fixed-iteration rank chain then
    // materializes as one cascade inside the caller's action instead of
    // one dedicated job per iteration. Blocks persist on first compute,
    // so und/deg are still computed exactly once across all rounds.
    val und = ck.truncateLazy(edges)
    val deg = ck.truncateLazy(und.groupBy(col("a")).agg(count(lit(1)).as("outdeg")))
    val n = deg.count()
    require(n > 0, "PageRank over an empty graph")
    val base = 15L * scale / (100L * n) // (1−d)/N, scaled, exact floor
    var pr = ck.truncateLazy(
      deg.select(col("a").as("node"), lit(scale / n).as("pr")))
    (1 to iterations).foreach { _ =>
      val contrib = und.join(deg, "a")
        .join(pr, col("a") === col("node"))
        .select(col("b"), expr("pr div outdeg").as("c"))
        .groupBy(col("b")).agg(sum(col("c")).as("sc"))
      pr = ck.truncateLazy( // truncate: next round plans from a scan
        deg.select(col("a").as("node"))
          .join(contrib, col("node") === col("b"), "left")
          .select(col("node"),
            (lit(base) + expr("(85 * coalesce(sc, 0L)) div 100")).as("pr")))
    }
    pr
  }
}
