package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling, observed: a join keyed so 90% of rows share one
  * key gets its hot partition split at runtime (final plan shows skew=true)
  * with correct results. Runtime half of the skew story; b7_merge_salted is
  * the explicit-plan half.
  *
  * Shape notes (hard-won): the hot partition must stay big AFTER column
  * pruning and shuffle compression (incompressible payload that the query
  * actually uses), the build side must reach the join as a bare shuffle
  * stage (a distinct()/aggregate between shuffle and join defeats
  * OptimizeSkewedJoin's pattern), and splitting works at mapper granularity
  * so the stage needs multiple input partitions. */
class SkewJoinSpec extends SparkSpecBase {

  test("AQE splits the skewed partition in a sort-merge join") {
    val confs = Seq(
      "spark.sql.shuffle.partitions" -> "100",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "800",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "800",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      // 90% of left rows share key 0; payload is incompressible (xxhash) and
      // consumed by the aggregate, so the hot shuffle partition stays hot
      val left = spark.range(0, 60000, 1, 10)
        .select(when($"id" < 54000, 0L).otherwise($"id").as("k"),
          xxhash64($"id").as("payload"))
      val right = spark.range(0, 60000, 1, 10).select($"id".as("k"))
      val joined = left.join(right, "k").agg(sum($"payload" % 1000000L).as("n"))
      // collect() finalizes THIS adaptive plan (head() would plan a separate limit)
      val total = joined.collect()(0).getLong(0)
      val expect = left.agg(sum($"payload" % 1000000L)).collect()(0).getLong(0)
      assert(total === expect) // every left row matched exactly once
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(2000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
