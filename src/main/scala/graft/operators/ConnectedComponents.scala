package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed connected components via alternating large-star / small-star
  * rounds — the 100 TB path for near-dup canonicalization (e21's min-label
  * propagation needs O(component diameter) rounds; this converges in
  * O(log n) rounds on any topology, the property that matters when a dedup
  * graph contains long chains of pairwise-similar documents).
  *
  * Algorithm (public: Kiveris et al., "Connected Components in MapReduce
  * and Beyond", SoCC 2014):
  *  - large-star(u): connect every strictly-larger neighbor of u to
  *    m(u) = min(N(u) ∪ {u});
  *  - small-star(u): connect every smaller-or-equal neighbor, and u itself,
  *    to m(u).
  * Iterating the pair to fixpoint leaves star graphs rooted at each
  * component's minimum node. Every round is two keyed aggregations + joins
  * — shuffle ∝ current edge set, no driver-side graph state.
  */
object ConnectedComponents {

  private def sym(e: DataFrame): DataFrame =
    e.union(e.select(col("b").as("a"), col("a").as("b")))

  /** m(u) = min of u's neighborhood including itself, keyed by u (as "a"). */
  private def neighborhoodMin(und: DataFrame): DataFrame =
    und.groupBy(col("a")).agg(min(col("b")).as("__mnb"))
      .select(col("a"), least(col("a"), col("__mnb")).as("m"))

  private def largeStar(e: DataFrame): DataFrame = {
    val und = sym(e)
    und.join(neighborhoodMin(und), "a")
      .filter(col("b") > col("a"))
      .select(col("b").as("a"), col("m").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
  }

  private def smallStar(e: DataFrame): DataFrame = {
    val und = sym(e)
    val m = neighborhoodMin(und)
    val smaller = und.filter(col("b") <= col("a")).join(m, "a")
      .select(col("b").as("a"), col("m").as("b"))
    val self = m.select(col("a"), col("m").as("b"))
    smaller.union(self)
      .filter(col("a") =!= col("b"))
      .distinct()
  }

  /** Order-insensitive fingerprint of an edge set — one scalar action per
    * round detects the fixpoint. */
  private def checksum(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)), sum(pmod(xxhash64(col("a"), col("b")),
      lit(1000000007L)))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Components of the graph over `nodes` ("node") with undirected `edges`
    * ("a","b"): returns ("node","comp") where comp is the component's
    * minimum node id; isolated nodes are their own component. The returned
    * round count is the number of (large-star, small-star) iterations run
    * (≈ log of the largest component, never its diameter). */
  def run(nodes: DataFrame, edges: DataFrame,
          maxRounds: Int = 50,
          checkpointDir: Option[String] = None): (DataFrame, Int) = {
    val ck = RoundCheckpointer.resolve(edges.sparkSession, checkpointDir)
    // Checkpoint (not persist): each round must TRUNCATE the logical
    // plan, or 10 rounds of join/distinct compose into an exponentially
    // deep lineage that stalls the optimizer long before execution starts.
    // Pass checkpointDir (or set graft.checkpoint.dir) on cluster runs —
    // executor-local blocks die with their executor, durable ones don't.
    // Lazy truncation: every round's checkpoint materializes inside the
    // checksum action that follows it anyway — one scheduler round-trip
    // per iteration instead of two, and the checksum's own count doubles
    // as the emptiness test (no separate isEmpty job).
    var e = ck.truncateLazy(edges
      .select(col("a").cast(LongType).as("a"), col("b").cast(LongType).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct())
    var sig = checksum(e)
    var rounds = 0
    var done = sig._1 == 0L
    while (!done && rounds < maxRounds) {
      val next = ck.truncateLazy(smallStar(largeStar(e)))
      val nsig = checksum(next)
      e = next
      rounds += 1
      if (nsig == sig) done = true else sig = nsig
    }
    // fixpoint edges are (child, root) stars; roots and isolated nodes map
    // to themselves
    val labels = nodes.select(col("node").cast(LongType).as("node"))
      .join(e.select(col("a").as("node"), col("b").as("comp")), Seq("node"), "left")
      .select(col("node"), coalesce(col("comp"), col("node")).as("comp"))
    (labels, rounds)
  }
}
