package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}
import graft.functions.VectorExpressions
import graft.plans.SelfCosineToOne

/** The injected optimizer rule rewrites degenerate self-cosine to the
  * single-pass SelfCosine form — asserted on the optimized plan AND on
  * results, including the zero-norm (NaN) and null edge cases the rewrite
  * must preserve. */
class ExtensionsSpec extends SparkSpecBase {

  test("SelfCosineToOne rewrites cosine(x, x) to the single-pass form") {
    VectorExpressions.register(spark)
    def selfCos() = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), Similarity.cosine(col("embedding"), col("embedding")).as("c"))
    // unrewritten reference values (bit patterns — the rewrite contract is
    // bit-identity, not ==1.0: d/(√d·√d) can be 1 ulp off 1.0)
    val plainBits = selfCos().collect()
      .map(r => r.getLong(0) -> java.lang.Double.doubleToRawLongBits(r.getDouble(1))).toMap
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ SelfCosineToOne
    try {
      val df = selfCos()
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("graft_cosine("), optimized)
      assert(optimized.contains("graft_self_cosine"), optimized)
      // results bit-identical to the unrewritten expression for every row
      val gotBits = df.collect()
        .map(r => r.getLong(0) -> java.lang.Double.doubleToRawLongBits(r.getDouble(1))).toMap
      assert(gotBits === plainBits)
      assert(gotBits.values.forall(b =>
        math.abs(java.lang.Double.longBitsToDouble(b) - 1.0) < 1e-12))
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

  test("rewrite preserves NaN for zero/empty vectors and null for null") {
    VectorExpressions.register(spark)
    val edge = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, Seq(0f, 0f, 0f)),            // zero norm → NaN
        org.apache.spark.sql.Row(2L, Seq.empty[Float]),           // empty → NaN
        org.apache.spark.sql.Row(3L, null),                       // null → null
        org.apache.spark.sql.Row(4L, Seq(1f, 2f, 3f))),           // normal → 1.0
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", ArrayType(FloatType)))))
    def results(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Double]] =
      df.collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // unrewritten semantics (no rule installed)
    val plain = results(edge.select(col("id"),
      Similarity.cosine(col("v"), col("v")).as("c")))
    assert(plain(1L).exists(_.isNaN)); assert(plain(2L).exists(_.isNaN))
    assert(plain(3L).isEmpty); assert(plain(4L).contains(1.0))
    // with the rule: bit-identical on every edge case
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ SelfCosineToOne
    try {
      // (no plan assertion here: a LocalRelation input is constant-folded
      // straight through the rewrite — the parquet-backed test above pins
      // the plan shape; this test pins the edge-case VALUES)
      val rewritten = edge.select(col("id"),
        Similarity.cosine(col("v"), col("v")).as("c"))
      val got = results(rewritten)
      assert(got(1L).exists(_.isNaN)); assert(got(2L).exists(_.isNaN))
      assert(got(3L).isEmpty); assert(got(4L).contains(1.0))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq SelfCosineToOne)
    }
  }
}
