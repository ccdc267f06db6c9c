package graft

/** Session cache hygiene: the E-family query closures materialize shared
  * intermediates via localCheckpoint (never a bare persist), so their
  * blocks are released by the ContextCleaner once the returned plan is
  * garbage-collected — a long-lived session embedding these functions must
  * NOT accumulate cached blocks query over query (the Verify/Bench
  * clearCache() is belt-and-braces for the harness, not a correctness
  * requirement of the library). */
class CacheHygieneSpec extends SparkSpecBase {

  /** GC + let the ContextCleaner drain until the persistent-RDD map is at
    * or below `target`, or the timeout passes; returns the final count. */
  private def drain(target: Int, timeoutMs: Long): Int = {
    val sc = spark.sparkContext
    val deadline = System.currentTimeMillis + timeoutMs
    var n = sc.getPersistentRDDs.size
    while (n > target && System.currentTimeMillis < deadline) {
      System.gc()
      Thread.sleep(250)
      n = sc.getPersistentRDDs.size
    }
    n
  }

  test("back-to-back E-family queries leave no cached blocks once consumed") {
    spark.catalog.clearCache()
    val baseline = drain(0, 10000) // whatever earlier suites left, post-GC
    // three of the formerly-leaky closures (e55 base, e57 edges, e58's
    // truth + candidate intermediates), run to completion in one session
    // with their results dropped — the embedding-library usage pattern
    Seq("e55_jaccard_prefix", "e57_triangle_count", "e58_lsh_recall")
      .foreach { name =>
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    val after = drain(baseline, 60000)
    assert(after <= baseline,
      s"cached blocks grew $baseline -> $after: a query closure persists " +
        "without a GC-releasable checkpoint — session-lifetime accumulation")
  }
}
