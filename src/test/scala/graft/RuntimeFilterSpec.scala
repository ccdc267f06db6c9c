package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (Spark's InjectRuntimeFilter) — the
  * 100 TB lever for selective fact⋈dim joins that are too big to
  * broadcast: the optimizer builds a bloom filter over the creation
  * (selective) side's join keys and pushes a `might_contain` probe into the
  * fact scan, so most fact rows die before the shuffle. At fixture scale
  * the thresholds are lowered to force injection; at the target scale the
  * defaults (10 MB creation side / 10 GB probe scan) fire on their own. */
class RuntimeFilterSpec extends SparkSpecBase {

  private def withConfs[T](kv: (String, String)*)(f: => T): T = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def query(): DataFrame = {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  test("a selective non-broadcast join injects a bloom filter probe into the fact scan") {
    val expected = query().collect().toSeq // default path (broadcast join)
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // too big to broadcast
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB") {
      val q = query()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a runtime bloom-filter probe in:\n$plan")
      assert(plan.contains("bloom_filter_agg"))
      assert(q.collect().toSeq === expected) // pruning never changes answers
    }
  }

  test("without a selective predicate no filter is injected") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB") {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val o = spark.read.parquet(s"$sfDir/orders.parquet") // unfiltered
      val q = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      assert(!q.queryExecution.executedPlan.toString.contains("might_contain"))
    }
  }
}
