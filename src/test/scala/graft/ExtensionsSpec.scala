package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions
import graft.plans.SelfCosineToOne

/** The injected optimizer rule rewrites degenerate self-cosine to a null-safe
  * constant — asserted on the optimized plan AND on results. */
class ExtensionsSpec extends SparkSpecBase {

  test("SelfCosineToOne folds cosine(x, x) out of the plan") {
    VectorExpressions.register(spark)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ SelfCosineToOne
    try {
      val df = Tables.load(spark, sfDir, "embeddings")
        .select(col("vec_id"), Similarity.cosine(col("embedding"), col("embedding")).as("c"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("graft_cosine"), optimized)
      // results: exactly 1.0 (not ~1.0 — it's now a literal), nulls preserved
      assert(df.collect().forall(r => r.getDouble(1) == 1.0))
      // distinct columns must NOT be rewritten
      val probe = Tables.load(spark, sfDir, "embeddings")
        .filter(col("vec_id") === 0).select(col("embedding").as("p"))
      val two = Tables.load(spark, sfDir, "embeddings").crossJoin(broadcast(probe))
        .select(Similarity.cosine(col("embedding"), col("p")).as("c"))
      assert(two.queryExecution.optimizedPlan.toString.contains("graft_cosine"))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq SelfCosineToOne)
    }
  }
}
