package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.plans.GraftExtensions

/** The SparkSessionExtensions entry point (`spark.sql.extensions=
  * graft.plans.GraftExtensions`) must register the whole custom surface at
  * session build — native function, optimizer rule, both planner
  * strategies — with no per-query install() calls. */
class GraftExtensionsSpec extends SparkSpecBase {

  private def withExtendedSession[A](f: SparkSession => A): A = {
    val base = spark // materialize the shared fixture session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions()(_))
        .getOrCreate()
      assert(s ne base, "extension test must run on a fresh session")
      f(s)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("session built with the extension has the function, rule, and strategies") {
    withExtendedSession { s =>
      // 1. injected function resolves from SQL
      val one = s.sql("SELECT graft_cosine(array(1.0F, 2.0F), array(1.0F, 2.0F)) AS c")
      assert(math.abs(one.head().getDouble(0) - 1.0) < 1e-12)
      // 2. optimizer rule rewrites the degenerate self-cosine
      val emb = Tables.load(s, sfDir, "embeddings")
      val self = emb.select(
        expr("graft_cosine(embedding, embedding)").as("c"))
      assert(self.queryExecution.optimizedPlan.toString.contains("graft_self_cosine"))
      // 3. band join plans through BroadcastRangeJoinExec with NO install()
      val bands = Tables.load(s, sfDir, "region")
        .select(col("r_name"), (col("r_regionkey").cast("long") * 100L).as("lo"),
          (col("r_regionkey").cast("long") * 100L + 149L).as("hi"))
      val docs = Tables.load(s, sfDir, "documents").select(col("doc_id"), col("n_chars"))
      val bj = bands.join(docs,
        col("n_chars") >= col("lo") && col("n_chars") <= col("hi"))
      assert(bj.queryExecution.executedPlan.toString.contains("BroadcastRangeJoin"))
      // 4. both custom strategies are in the session's planner (the as-of
      // public API installs on use; via the extension it is present from
      // session build)
      val planned = s.sessionState.planner.strategies
      assert(planned.exists(_ eq graft.plans.BroadcastRangeJoinStrategy))
      assert(planned.exists(_ eq graft.plans.BroadcastAsofJoinStrategy))
    }
  }
}
