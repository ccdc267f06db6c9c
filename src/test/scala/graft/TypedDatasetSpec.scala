package graft

import org.apache.spark.sql.functions._

// top-level for encoder derivation
case class LineItem(l_orderkey: Long, l_quantity: Double, l_extendedprice: Double,
                    l_discount: Double, l_returnflag: String)

/** SURVEY §1.2 — the typed Dataset[T] surface: case-class encoders,
  * compile-time field access, typed groupByKey aggregation; results must
  * coincide with the untyped DataFrame plan. */
class TypedDatasetSpec extends SparkSpecBase {

  test("typed filter/groupByKey matches the DataFrame aggregation") {
    import spark.implicits._
    val li = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_returnflag")
    val ds = li.as[LineItem]

    val typed = ds.filter(_.l_quantity > 30)
      .groupByKey(_.l_returnflag)
      .mapGroups((k, rows) => (k, rows.map(_.l_quantity).sum))
      .collect().toMap

    val untyped = li.filter(col("l_quantity") > 30)
      .groupBy("l_returnflag").agg(sum("l_quantity"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    assert(typed.keySet === untyped.keySet)
    typed.foreach { case (k, v) =>
      assert(math.abs(v - untyped(k)) < 1e-6, s"flag $k: $v vs ${untyped(k)}")
    }
  }

  test("percentile_approx tracks exact percentile within tolerance") {
    val o = Tables.load(spark, sfDir, "orders")
    val r = o.agg(
      expr("percentile(o_totalprice, 0.5)").as("exact"),
      expr("percentile_approx(o_totalprice, 0.5, 10000)").as("approx")).head()
    val exact = r.getDouble(0)
    val approx = r.getDouble(1)
    assert(math.abs(approx - exact) / exact < 0.01, s"approx=$approx exact=$exact")
  }
}
