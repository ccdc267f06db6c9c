package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions

/** The native CosineSimilarity expression must be bit-identical to the
  * composed zip_with/aggregate form (same IEEE operation order) — that
  * equivalence is what lets the fused expression keep the DuckDB oracle. */
class VectorExpressionSpec extends SparkSpecBase {

  test("native cosine == composed cosine, bitwise, across the corpus") {
    VectorExpressions.register(spark)
    val emb = Tables.load(spark, sfDir, "embeddings")
    val probe = emb.filter(col("vec_id") === 0).select(col("embedding").as("p"))
    val both = emb.crossJoin(broadcast(probe))
      .select(
        Similarity.cosine(col("embedding"), col("p")).as("native"),
        Similarity.cosineComposed(col("embedding"), col("p")).as("composed"))
      .collect()
    assert(both.length === 500)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("native cosine participates in whole-stage codegen") {
    VectorExpressions.register(spark)
    // distinct args: cosine(x, x) would be rewritten by the session's
    // SelfCosineToOne extension rule (its own test lives in ExtensionsSpec)
    val df = Tables.load(spark, sfDir, "embeddings")
      .select(Similarity.cosine(col("embedding"),
        reverse(col("embedding"))).as("c"))
    df.collect() // finalize the (adaptive) plan
    val plan = df.queryExecution.executedPlan.toString
    // the projection holding graft_cosine must sit inside a WholeStageCodegen
    // region ("*(n)" stage marker in the plan string), not interpreted eval
    assert(plan.contains("*(1) Project [graft_cosine"))
    assert(!plan.toLowerCase.contains("codegenfallback"))
  }

  test("cosine of a vector with itself is 1.0") {
    VectorExpressions.register(spark)
    val emb = Tables.load(spark, sfDir, "embeddings").limit(20)
    emb.select(Similarity.cosine(col("embedding"), col("embedding")).as("c"))
      .collect().foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }
}
