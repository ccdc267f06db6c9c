package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.PinnedKey

/** PinnedKey (graft_pin) — the non-foldable identity that keeps deliberate
  * constant window partitions in the physical plan (a bare lit(0) partition
  * is folded away and the window executes — and WARNs — partition-less). */
class PinnedKeySpec extends SparkSpecBase {

  test("a pinned constant partition survives optimization; a bare literal does not") {
    import spark.implicits._
    val df = (1 to 20).map(i => (i.toLong, i * 3 % 7)).toDF("id", "x")

    val bare = df.withColumn("rn",
      row_number().over(Window.partitionBy(lit(0)).orderBy(col("id"))))
    val pinned = df.withColumn("rn",
      row_number().over(Window.partitionBy(PinnedKey.pin(lit(0))).orderBy(col("id"))))

    def partitionSpecSizes(q: org.apache.spark.sql.DataFrame): Seq[Int] =
      q.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
          w.partitionSpec.size
      }
    assert(partitionSpecSizes(bare) === Seq(0),
      "expected the optimizer to fold a bare literal partition away " +
        "(if this starts failing, lit(0) suffices again and PinnedKey can go)")
    assert(partitionSpecSizes(pinned) === Seq(1),
      "graft_pin must keep the declared partition through optimization")

    // and the pinned form computes exactly the same rows
    assert(pinned.collect().toSeq.sortBy(_.getLong(0)) ===
      bare.collect().toSeq.sortBy(_.getLong(0)))
  }

  test("pin is a pure pass-through for column values, including nulls") {
    import spark.implicits._
    val df = Seq(Some(1L), None, Some(5L)).toDF("v")
    val got = df.select(PinnedKey.pin(col("v")).as("p")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq === Seq(Some(1L), None, Some(5L)))
  }

  test("a fixture-literal partition column stays a real partition when pinned (b12 shape)") {
    import spark.implicits._
    val df = (1 to 10).map(i => (i.toLong, "users")).toDF("pos", "tbl")
      .select(col("pos"), lit("users").as("tbl")) // literal-backed, like changelog
    val q = df.withColumn("prev",
      lag(col("pos"), 1).over(
        Window.partitionBy(PinnedKey.pin(col("tbl"))).orderBy(col("pos"))))
    val specs = q.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w.partitionSpec.size
    }
    assert(specs === Seq(1))
    assert(q.filter(col("prev").isNotNull).count() === 9)
  }
}
