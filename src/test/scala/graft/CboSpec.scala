package graft

import org.apache.spark.sql.functions._

/** Cost-based optimization — ANALYZE-collected statistics changing the
  * physical plan. The scenario that matters at 100 TB: a dimension whose
  * FILE size exceeds the broadcast threshold but whose post-filter
  * cardinality is tiny. Without statistics Spark can only price the dim at
  * (a width-scaled fraction of) its file bytes and falls back to a shuffled
  * sort-merge join; with table + column statistics the optimizer prices the
  * filter through the column's distinct count (1500-key table, equality
  * predicate → ~1 row) and broadcasts, deleting the fact-side shuffle. AQE
  * is disabled inside this spec so the choice being asserted is the
  * STATS-driven static one, not a runtime rescue — AQE can only flip the
  * join after the dim was already shuffled once; CBO never shuffles it.
  */
class CboSpec extends SparkSpecBase {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("column stats let the optimizer broadcast a filtered dim it would otherwise shuffle") {
    val db = "graft_cbo"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spark.sql(s"DROP TABLE IF EXISTS $db.ord")
    spark.sql(s"DROP TABLE IF EXISTS $db.li")
    Tables.load(spark, sfDir, "orders").write.saveAsTable(s"$db.ord")
    Tables.load(spark, sfDir, "lineitem").write.saveAsTable(s"$db.li")

    def planFor(): String = {
      val dim = spark.table(s"$db.ord").filter(col("o_custkey") === 7L)
      val fact = spark.table(s"$db.li")
      fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .queryExecution.executedPlan.toString
    }

    try {
      withConf(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.cbo.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "4096") {

        // without ANALYZE the dim is priced from file bytes — over the 4 KB
        // threshold, so the join must sort-merge
        val before = planFor()
        assert(before.contains("SortMergeJoin"), before.take(1500))
        assert(!before.contains("BroadcastHashJoin"), before.take(1500))

        spark.sql(s"ANALYZE TABLE $db.ord COMPUTE STATISTICS")
        spark.sql(
          s"ANALYZE TABLE $db.ord COMPUTE STATISTICS FOR COLUMNS o_custkey, o_orderkey, o_orderpriority")
        spark.sql(s"ANALYZE TABLE $db.li COMPUTE STATISTICS")

        // with row count + per-column ndv the equality filter prices at
        // ~rowCount/ndv rows — far under the threshold — and broadcasts
        val after = planFor()
        assert(after.contains("BroadcastHashJoin"), after.take(1500))
        assert(!after.contains("SortMergeJoin"), after.take(1500))
      }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $db.ord")
      spark.sql(s"DROP TABLE IF EXISTS $db.li")
      spark.sql(s"DROP DATABASE IF EXISTS $db")
    }
  }
}
