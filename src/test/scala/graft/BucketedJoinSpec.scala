package graft

import org.apache.spark.sql.functions._

/** 100 TB co-location story (SURVEY §4): bucketed tables joined on the
  * bucket key need NO exchange — the partitioning is reused across stages.
  * This is the replica layout the CDC merge would use at scale so repeated
  * merges never reshuffle the table. */
class BucketedJoinSpec extends SparkSpecBase {

  test("join of two bucketed tables on the bucket key has no shuffle") {
    val o = Tables.load(spark, sfDir, "orders")
    val li = Tables.load(spark, sfDir, "lineitem")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("bkt_orders")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("bkt_lineitem")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("bkt_lineitem")
        .join(spark.table("bkt_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // the join itself is exchange-free: the only exchange allowed is the
      // single-partition one for the final small aggregate
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"))
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"))
      // correctness unchanged vs the unbucketed join
      val expected = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    }
  }
}
