package graft

import org.apache.spark.sql.functions._

/** NOT IN three-valued-logic semantics (c38) — the classic silent-wrong-
  * answer hazard: NOT IN over an inner set containing one NULL is NOT an
  * anti join; every non-matching comparison becomes UNKNOWN and the result
  * is empty. Spark plans the correct form as a null-aware anti join
  * (LeftAnti BroadcastHashJoin, isNullAware=true). */
class NullSemanticsSpec extends SparkSpecBase {

  test("c38 plans a single-column null-aware anti join") {
    val q = SparkEntry.queries("c38_not_in")(spark, sfDir)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan.take(1500))
  }

  test("one NULL in the inner set empties a NOT IN result — and NOT EXISTS does not") {
    Tables.load(spark, sfDir, "orders").createOrReplaceTempView("orders_ns")
    Tables.load(spark, sfDir, "customer")
      // poison: one inner row becomes NULL
      .withColumn("c_custkey",
        when(col("c_custkey") === 1, lit(null)).otherwise(col("c_custkey")))
      .createOrReplaceTempView("customer_ns")
    val notIn = spark.sql(
      """SELECT o_orderkey FROM orders_ns
        |WHERE o_custkey NOT IN (SELECT c_custkey FROM customer_ns)""".stripMargin)
    assert(notIn.count() === 0, "NULL ∈ inner ⇒ NOT IN is UNKNOWN everywhere")
    // NOT EXISTS compares with = (never UNKNOWN-poisoned across the set):
    // unmatched outer rows survive
    val notExists = spark.sql(
      """SELECT o_orderkey FROM orders_ns o
        |WHERE NOT EXISTS (SELECT 1 FROM customer_ns c
        |                  WHERE c.c_custkey = o.o_custkey)""".stripMargin)
    val unmatched = spark.sql(
      """SELECT COUNT(*) FROM orders_ns
        |WHERE o_custkey NOT IN (SELECT c_custkey FROM customer_ns
        |                        WHERE c_custkey IS NOT NULL)""".stripMargin)
      .head().getLong(0)
    assert(notExists.count() === unmatched)
  }
}
