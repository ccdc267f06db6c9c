package graft

/** The shared LSH label artifact is a CACHE, and a cache that serves
  * stale or divergent labels would silently poison its six consumer
  * queries (their oracles recompute the closure, so the driver gate
  * would catch it — but a round later and six rows at a time). This
  * spec pins the two invariants the artifact's correctness rests on:
  * the materialized rows equal the from-scratch fixpoint, and re-reads
  * hit the written copy rather than recomputing. */
class LabelArtifactSpec extends SparkSpecBase {

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("artifact rows equal the from-scratch fixpoint; second read is a " +
    "plain parquet scan of the same content") {
    val fresh = rowsOf(Extensions.lshComponents(spark, sfDir))
    val art1 = rowsOf(Extensions.lshComponentsArtifact(spark, sfDir))
    assert(art1 === fresh, "materialized labels diverged from the fixpoint")
    // the second call must resolve the SAME write-once artifact (content
    // key unchanged) — identical rows, and the plan is a bare file scan
    val df2 = Extensions.lshComponentsArtifact(spark, sfDir)
    assert(rowsOf(df2) === fresh)
    val plan = df2.queryExecution.executedPlan.toString
    assert(plan.contains("FileScan parquet") || plan.contains("Scan parquet"),
      s"artifact re-read must be a parquet scan, got:\n${plan.take(500)}")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("HashAggregate"),
      "artifact re-read recomputed the fixpoint instead of reading the store")
  }
}
