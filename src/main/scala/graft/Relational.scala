package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2 group C — the relational reporting surface the reference's
  * replica exists for (reference: main.tf:188-195 "Reporting data from the
  * CloudSQL menagerie DB"; query shapes are the public MySQL-tutorial corpus,
  * menagerie-db/README.txt:1-3, run here on the driver's TPC-H-ish fixtures).
  *
  * Determinism contract with the DuckDB oracle (SURVEY §7.4):
  *  - money aggregates go through DECIMAL(18,2) (exact) and are cast to
  *    DOUBLE only at the very end — both engines then produce bit-identical
  *    doubles;
  *  - timestamps are cast to DATE (or epoch longs) before leaving a query;
  *  - every query ends with a total ORDER BY.
  *
  * Scale notes are inline per query; the common one: every aggregation here
  * is a partial-agg (map-side combine) + final agg — Spark does this
  * automatically for all `groupBy.agg` — so shuffle volume is |groups|, not
  * |rows|, and survives a 1000-executor / 100 TB scale-up.
  */
object Relational {
  import Tables.load

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  private def scratch(name: String, dir: String,
                      s: org.apache.spark.sql.SparkSession): String =
    Cdc.scratch(name, dir, s)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C1 projection — column pruning reaches the scan (ReadSchema shows 3 cols).
    "c01_projection" -> { (s, d) =>
      load(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .orderBy("o_orderkey")
    },
    // C2 filter — predicate pushdown (PushedFilters on l_returnflag/l_quantity).
    "c02_filter" -> { (s, d) =>
      load(s, d, "lineitem")
        .filter(col("l_returnflag") === "R" &&
          col("l_quantity") >= 10 && col("l_quantity") < 25)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    },
    // C3 distinct — shuffles only the 2 projected columns.
    "c03_distinct" -> { (s, d) =>
      load(s, d, "customer")
        .select("c_mktsegment", "c_nationkey").distinct()
        .orderBy("c_mktsegment", "c_nationkey")
    },
    // C4 multi-key mixed-direction sort (range-partitioned exchange at scale).
    "c04_sort" -> { (s, d) =>
      load(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
          col("o_orderdate").cast(DateType).as("o_date"))
        .orderBy(col("o_orderpriority").asc, col("o_totalprice").desc,
          col("o_orderkey").asc)
    },
    // C5 top-k — Spark plans TakeOrderedAndProject: per-partition heap + driver
    // merge of k rows, no full sort even at 100 TB.
    "c05_topk" -> { (s, d) =>
      load(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    },
    // C6 inner equi-join lineitem⋈orders + revenue agg. At scale: both sides
    // large → sort-merge join on l_orderkey/o_orderkey; AQE handles skew.
    "c06_join_inner" -> { (s, d) =>
      val li = load(s, d, "lineitem")
      val o = load(s, d, "orders").filter(col("o_orderstatus") === "F")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("o_orderkey")
    },
    // C6 null-safe equality join (<=> / IS NOT DISTINCT FROM) — NULL keys
    // match each other instead of silently dropping, the semantics ETL
    // needs when the join key is itself nullable. Both sides pre-aggregate
    // BEFORE the join (counts multiply across a within-key cross product),
    // so the join touches |distinct keys| rows, never the quadratic pair
    // set — the mandatory shape for low-cardinality many-to-many keys, and
    // it also defuses the NULL bucket, which is otherwise a self-amplifying
    // hot key (every null lands on one reducer).
    "c06b_join_nullsafe" -> { (s, d) =>
      val ev = Tables.events(s, d)
      def k(c: org.apache.spark.sql.Column) =
        when(c % 7 === 6, lit(null)).otherwise(c % 7)
      val ac = ev.filter(col("event_id") % 3 === 0)
        .groupBy(k(col("user_id")).as("k")).agg(count(lit(1)).as("na"))
      val bc = ev.filter(col("event_id") % 3 === 1)
        .groupBy(k(col("user_id")).as("k2")).agg(count(lit(1)).as("nb"))
      ac.join(bc, col("k") <=> col("k2"))
        .select(coalesce(col("k").cast(StringType), lit("NULL")).as("k"),
          (col("na") * col("nb")).as("n"))
        .orderBy("k")
    },
    // C7 left outer join — customers with zero orders preserved.
    "c07_join_left" -> { (s, d) =>
      val c = load(s, d, "customer")
      val o = load(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast(DoubleType).as("spend"))
        .orderBy("c_custkey")
    },
    // C7b full outer join — both unmatched sides preserved (customers with
    // no orders AND orders whose customer is outside the slice); grouped on
    // the coalesced key so the null-extension rows are visible in the
    // output deterministically.
    "c07b_join_full" -> { (s, d) =>
      val c = load(s, d, "customer").filter(col("c_custkey") <= 50)
      val o = load(s, d, "orders").filter(col("o_custkey") > 30)
      c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
        .groupBy(coalesce(col("c_custkey"), col("o_custkey")).as("k"))
        .agg(max(col("c_custkey").isNotNull).as("has_customer"),
          count(col("o_orderkey")).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast(DoubleType).as("spend"))
        .orderBy("k")
    },
    // C8 left-semi (EXISTS) — join emits only left columns, no row multiplication.
    "c08_join_semi" -> { (s, d) =>
      val c = load(s, d, "customer")
      val o = load(s, d, "orders").filter(col("o_totalprice") > 300000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    // C8b left-anti (NOT EXISTS).
    "c08b_join_anti" -> { (s, d) =>
      val c = load(s, d, "customer")
      val o = load(s, d, "orders").filter(col("o_totalprice") > 300000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    },
    // C9 self-join with theta conjunct (pairs of suppliers in one nation).
    // Supplier is the small table by design — at 100 TB this stays a
    // broadcast-hash join on the equi part, theta as post-filter.
    "c09_self_join" -> { (s, d) =>
      val a = load(s, d, "supplier").select(
        col("s_suppkey").as("k1"), col("s_nationkey").as("nk"))
      val b = load(s, d, "supplier").select(
        col("s_suppkey").as("k2"), col("s_nationkey").as("nk2"))
      a.join(b, a("nk") === b("nk2") && a("k1") < b("k2"))
        .select("k1", "k2", "nk")
        .orderBy("k1", "k2")
    },
    // C10 multi-way join chain region⋈nation⋈customer⋈orders. region/nation/
    // customer-dim are broadcast (tiny); only orders shuffles — at 100 TB the
    // same plan holds because the dims stay small.
    "c10_multiway_join" -> { (s, d) =>
      val r = load(s, d, "region")
      val n = load(s, d, "nation")
      val c = load(s, d, "customer")
      val o = load(s, d, "orders")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast(DoubleType).as("revenue"))
        .orderBy("r_name")
    },
    // C11 hash aggregation (TPC-H Q1 shape) — partial agg collapses 600K rows
    // to ~6 groups before the shuffle.
    "c11_group_agg" -> { (s, d) =>
      load(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast(DoubleType).as("sum_price"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast(DoubleType).as("sum_disc_price"),
          (sum(dec(col("l_quantity"))).cast(DoubleType) / count(lit(1)))
            .as("avg_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    // C12 global aggregate — single group, all partial.
    "c12_global_agg" -> { (s, d) =>
      load(s, d, "lineitem")
        .agg(
          count(lit(1)).as("n"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          sum(dec(col("l_extendedprice"))).cast(DoubleType).as("sum_price"),
          min(col("l_shipdate").cast(DateType)).as("first_ship"),
          max(col("l_shipdate").cast(DateType)).as("last_ship"))
    },
    // C13 HAVING — post-aggregation filter.
    "c13_having" -> { (s, d) =>
      load(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast(DoubleType).as("spend"))
        .filter(col("n_orders") >= 3)
        .orderBy("o_custkey")
    },
    // C14 rollup — subtotals + grand total with grouping indicators.
    "c14_rollup" -> { (s, d) =>
      load(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast(IntegerType).as("g_flag"),
          grouping(col("l_linestatus")).cast(IntegerType).as("g_status"),
          count(lit(1)).as("n"),
          sum(dec(col("l_quantity"))).cast(DoubleType).as("sum_qty"))
        .select(
          col("g_flag"), col("g_status"),
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("n"), col("sum_qty"))
        .orderBy("g_flag", "g_status", "flag", "status")
    },
    // C14b cube — all 4 grouping combinations (rollup's 3 + status-only).
    "c14b_cube" -> { (s, d) =>
      load(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast(IntegerType).as("g_flag"),
          grouping(col("l_linestatus")).cast(IntegerType).as("g_status"),
          count(lit(1)).as("n"))
        .select(
          col("g_flag"), col("g_status"),
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("n"))
        .orderBy("g_flag", "g_status", "flag", "status")
    },
    // C14 explicit GROUPING SETS — a set list neither ROLLUP nor CUBE can
    // express ((flag,status), (status), ()): per-pair detail, a status-only
    // margin WITHOUT the flag-only margin, and the grand total. One Expand +
    // one aggregation, same physical shape as rollup/cube.
    "c14c_grouping_sets" -> { (s, d) =>
      load(s, d, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_linestatus")), Seq.empty),
          col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast(IntegerType).as("g_flag"),
          grouping(col("l_linestatus")).cast(IntegerType).as("g_status"),
          count(lit(1)).as("n"),
          sum(dec(col("l_quantity"))).cast(DoubleType).as("sum_qty"))
        .select(
          col("g_flag"), col("g_status"),
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("n"), col("sum_qty"))
        .orderBy("g_flag", "g_status", "flag", "status")
    },
    // C15 distinct aggregation — Spark plans expand+two-phase agg.
    "c15_count_distinct" -> { (s, d) =>
      load(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },
    // C16 ranking window — top-2 orders per customer; this exact shape
    // (row_number over pk ordered by pos desc) is also the CDC merge engine (B3).
    "c16_window_rank" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      load(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"))
        .filter(col("rn") <= 2)
        .orderBy("o_custkey", "rn")
    },
    // C17 analytic window — lag + running sum (running sum in DECIMAL so both
    // engines are exact regardless of their internal frame evaluation order).
    "c17_window_analytic" -> { (s, d) =>
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate").asc, col("l_orderkey").asc,
          col("l_linenumber").asc)
      load(s, d, "lineitem")
        .filter(col("l_suppkey") <= 3)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"),
          lag(col("l_quantity"), 1).over(w).as("prev_qty"),
          sum(dec(col("l_quantity")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast(DoubleType).as("running_qty"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    },
    // C16b ntile + first/last value window functions.
    "c16b_ntile" -> { (s, d) =>
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      load(s, d, "orders")
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
          ntile(4).over(w).as("quartile"),
          first_value(col("o_orderkey")).over(w).as("cheapest_key"))
        .filter(col("quartile") === 4)
        .orderBy("o_orderstatus", "o_orderkey")
    },
    // C17b RANGE-frame window — trailing 30-day sum keyed on an integer day
    // column (value-based frame, not row-based).
    "c17b_window_range" -> { (s, d) =>
      val day = datediff(col("l_shipdate").cast(DateType),
        lit(java.sql.Date.valueOf("1995-01-01")))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(col("day"))
        .rangeBetween(-30, 0)
      load(s, d, "lineitem")
        .filter(col("l_suppkey") <= 2)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          day.as("day"))
        .withColumn("n_30d", count(lit(1)).over(w))
        .orderBy("l_suppkey", "day", "l_orderkey", "l_linenumber")
    },
    // C18 set operations — union all / intersect / except, tagged.
    "c18_setops" -> { (s, d) =>
      val cn = load(s, d, "customer").select(col("c_nationkey").as("nk"))
      val sn = load(s, d, "supplier").select(col("s_nationkey").as("nk"))
      val u = cn.union(sn).groupBy(col("nk")).agg(count(lit(1)).as("n"))
        .withColumn("op", lit("union_all"))
      val i = cn.intersect(sn).withColumn("n", lit(1L)).withColumn("op", lit("intersect"))
      val e = cn.except(sn).withColumn("n", lit(1L)).withColumn("op", lit("except"))
      u.select("op", "nk", "n")
        .union(i.select("op", "nk", "n"))
        .union(e.select("op", "nk", "n"))
        .orderBy("op", "nk")
    },
    // C18b bag-semantics set ops — INTERSECT ALL / EXCEPT ALL keep
    // multiplicities (min / truncated difference of per-value counts),
    // the variant warehouse SQL needs for multiset reconciliation (e.g.
    // staged-vs-applied row accounting). Plans as an aggregate per side +
    // one join keyed by the value — no row-level pairing, multiplicity
    // math on counts; same single-shuffle class at any scale.
    "c18b_setops_all" -> { (s, d) =>
      val cn = load(s, d, "customer").select(col("c_nationkey").as("nk"))
      val sn = load(s, d, "supplier").select(col("s_nationkey").as("nk"))
      val ia = cn.intersectAll(sn).groupBy(col("nk"))
        .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
      val ea = cn.exceptAll(sn).groupBy(col("nk"))
        .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
      ia.select("op", "nk", "n").union(ea.select("op", "nk", "n"))
        .orderBy("op", "nk")
    },
    // C14d grouping metadata — GROUPING()/GROUPING_ID() disambiguate "NULL
    // because subtotal" from "NULL because the data is NULL" in rollup
    // output; every BI layer reading c14's subtotals needs this bit. Same
    // expand+aggregate plan as rollup — the id is free metadata.
    "c14d_grouping_id" -> { (s, d) =>
      load(s, d, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          grouping_id(col("o_orderstatus"), col("o_orderpriority")).as("gid"),
          grouping(col("o_orderstatus")).cast(IntegerType).as("g_status"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_last,
          col("o_orderpriority").asc_nulls_last)
    },
    // C19 date/time functions — "today" pinned to a literal (SURVEY §7.4).
    "c19_date_funcs" -> { (s, d) =>
      val od = col("o_orderdate").cast(DateType)
      load(s, d, "orders")
        .select(col("o_orderkey"),
          year(od).as("y"), month(od).as("m"), dayofmonth(od).as("dom"),
          datediff(lit(java.sql.Date.valueOf("2002-01-01")), od).as("age_days"),
          date_add(od, 30).as("due_date"))
        .orderBy("o_orderkey")
    },
    // C20 NULL handling — nulls manufactured via nullif, then isNull /
    // coalesce / null-safe equality (MySQL <=> ≡ Spark eqNullSafe ≡ DuckDB
    // IS NOT DISTINCT FROM).
    "c20_nulls" -> { (s, d) =>
      val segN = nullif(col("c_mktsegment"), lit("BUILDING"))
      load(s, d, "customer")
        .select(col("c_custkey"),
          segN.isNull.as("seg_is_null"),
          coalesce(segN, lit("(none)")).as("seg_or_none"),
          (segN <=> lit("MACHINERY")).as("nullsafe_mach"))
        .orderBy("c_custkey")
    },
    // C21 pattern matching — LIKE + regexp.
    "c21_pattern" -> { (s, d) =>
      load(s, d, "part")
        .select(col("p_partkey"), col("p_name"), col("p_type"),
          col("p_name").like("%a%").as("has_a"),
          col("p_type").rlike("^[A-M]").as("type_am"))
        .filter(col("has_a") || col("type_am"))
        .orderBy("p_partkey")
    },
    // C22 string scalar functions.
    "c22_string_funcs" -> { (s, d) =>
      load(s, d, "customer")
        .select(col("c_custkey"),
          upper(col("c_name")).as("name_upper"),
          lower(col("c_mktsegment")).as("seg_lower"),
          length(col("c_name")).as("name_len"),
          substring(col("c_name"), 1, 5).as("name_pfx"),
          concat_ws("#", col("c_name"), col("c_mktsegment")).as("tagged"),
          trim(col("c_name")).as("name_trim"))
        .orderBy("c_custkey")
    },
    // C23 arithmetic expressions — charge = price*(1+tax)*(1-discount), exact
    // via DECIMAL; percents as integers.
    "c23_math" -> { (s, d) =>
      load(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          sum(dec(col("l_extendedprice")) * (lit(1) + dec(col("l_tax")))
            * (lit(1) - dec(col("l_discount"))))
            .cast(DoubleType).as("sum_charge"),
          max(round(col("l_discount") * 100).cast(IntegerType)).as("max_disc_pct"),
          min(round(col("l_tax") * 100).cast(IntegerType)).as("min_tax_pct"))
        .orderBy("l_returnflag")
    },
    // C24 CASE / conditional classification.
    "c24_case" -> { (s, d) =>
      load(s, d, "orders")
        .select(
          when(col("o_orderstatus") === "F", "done")
            .when(col("o_orderstatus") === "O", "open")
            .otherwise("other").as("status_word"),
          when(col("o_totalprice") >= 300000, "big")
            .when(col("o_totalprice") >= 100000, "mid")
            .otherwise("small").as("size_bucket"))
        .groupBy("status_word", "size_bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy("status_word", "size_bucket")
    },
    // C25 JSON extraction from the events.props string column.
    "c25_json" -> { (s, d) =>
      Tables.events(s, d)
        .select(get_json_object(col("props"), "$.k").cast(IntegerType).as("k"),
          col("value"))
        .groupBy((col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast(DoubleType).as("sum_value"))
        .orderBy("k_mod")
    },
    // C26 array higher-order functions over embedding: array<float> — stays in
    // codegen (no UDF). Fold starts at 0.0 so both engines compute the same
    // left-to-right double sum.
    "c26_array_funcs" -> { (s, d) =>
      load(s, d, "embeddings")
        .select(col("vec_id"),
          size(col("embedding")).as("dim"),
          aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x.cast(DoubleType)).as("vsum"),
          array_min(col("embedding")).cast(DoubleType).as("vmin"),
          array_max(col("embedding")).cast(DoubleType).as("vmax"))
        .orderBy("vec_id")
    },
    // C28 pivot — wide report: order counts per status × priority.
    // (Explicit pivot values keep the plan single-pass at any scale; the
    // oracle spells the same thing as FILTERed aggregates.)
    "c28_pivot" -> { (s, d) =>
      load(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .withColumnsRenamed(Map(
          "1-URGENT" -> "p1", "2-HIGH" -> "p2", "3-MEDIUM" -> "p3",
          "4-NOT SPECIFIED" -> "p4", "5-LOW" -> "p5"))
        .orderBy("o_orderstatus")
    },
    // C28b unpivot/melt — wide-to-long over customer attributes.
    "c28b_unpivot" -> { (s, d) =>
      load(s, d, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .unpivot(Array(col("c_custkey")),
          Array(col("c_name"), col("c_mktsegment")), "attr", "val")
        .orderBy("c_custkey", "attr")
    },
    // C29 generator / UDTF surface — posexplode with ordinal positions.
    "c29_posexplode" -> { (s, d) =>
      load(s, d, "embeddings")
        .filter(col("vec_id") < 3)
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), col("pos").cast(IntegerType).as("idx"),
          col("col").cast(DoubleType).as("v"))
        .orderBy("vec_id", "idx")
    },
    // C30 exact percentiles — median/p90 via Spark's exact `percentile`
    // (linear interpolation, same contract as DuckDB quantile_cont).
    "c30_percentile" -> { (s, d) =>
      load(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(expr("percentile(o_totalprice, 0.5)").as("median_price"),
          expr("percentile(o_totalprice, 0.9)").as("p90_price"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    },
    // C31 moment statistics at scale — variance/correlation assembled from
    // EXACT decimal power sums (Σx, Σx², Σxy are 2- and 4-decimal exact), so
    // the one-pass distributed computation is order-insensitive AND
    // bit-reproducible — unlike naive floating sums, which drift per
    // partitioning. This is how the 100 TB engine reports stats.
    "c31_stats_exact_sums" -> { (s, d) =>
      val x = col("l_quantity").cast(DecimalType(18, 2))
      val y = col("l_extendedprice").cast(DecimalType(18, 2))
      load(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(x).cast(DoubleType).as("sx"),
          sum(y).cast(DoubleType).as("sy"),
          sum(x * x).cast(DoubleType).as("sxx"),
          sum(y * y).cast(DoubleType).as("syy"),
          sum(x * y).cast(DoubleType).as("sxy"))
        .select(col("l_returnflag"), col("n"),
          round((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1), 9)
            .as("var_qty"),
          round((col("sxy") - col("sx") * col("sy") / col("n"))
            / sqrt((col("sxx") - col("sx") * col("sx") / col("n"))
              * (col("syy") - col("sy") * col("sy") / col("n"))), 12)
            .as("corr_qty_price"))
        .orderBy("l_returnflag")
    },
    // C27b correlated subquery — per-customer threshold; Catalyst rewrites
    // the correlation to an aggregate + join (no per-row re-execution).
    "c27b_correlated_subquery" -> { (s, d) =>
      Tables.registerAll(s, d)
      s.sql(
        """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
          |FROM orders o
          |WHERE o.o_totalprice > 1.8 * (
          |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
          |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
          |ORDER BY o.o_orderkey""".stripMargin)
    },
    // C32 distribution windows — percent_rank / cume_dist over supplier
    // order value (exact rank arithmetic: (rank-1)/(n-1) and count≤/n on
    // integers, so the doubles are identical on both engines).
    "c32_percent_rank" -> { (s, d) =>
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").asc, col("l_orderkey").asc,
          col("l_linenumber").asc)
      load(s, d, "lineitem")
        .filter(col("l_suppkey") <= 5)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    },
    // C33 weighted average via the custom DeclarativeAggregate — quantity-
    // weighted unit price per returnflag, exact decimal buffers.
    "c33_weighted_avg" -> { (s, d) =>
      graft.functions.WeightedAvg.register(s)
      load(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(graft.functions.WeightedAvg.weightedAvg(
          dec(col("l_extendedprice")), dec(col("l_quantity"))).as("wavg_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },
    // C27 subqueries (scalar + IN) through the SQL entry point (SURVEY §3.1).
    "c27_subquery" -> { (s, d) =>
      Tables.registerAll(s, d)
      s.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice
          |FROM orders
          |WHERE o_totalprice > (SELECT max(o_totalprice) * 0.9 FROM orders)
          |   OR o_custkey IN (SELECT c_custkey FROM customer
          |                    WHERE c_mktsegment = 'FURNITURE' AND c_nationkey = 1)
          |ORDER BY o_orderkey""".stripMargin)
    },
    // C35 running count-distinct per key — Spark has no COUNT(DISTINCT)
    // OVER; the composition is size(collect_set() OVER). State per key is
    // the distinct set (bounded by the domain, here event types), not the
    // row count — fine when the domain is small, a sketch (HLL) when not.
    "c35_window_distinct" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d).filter(col("user_id") < 50)
        .select(col("user_id"), col("event_id"),
          size(collect_set(col("event_type")).over(w)).cast(LongType)
            .as("n_types_so_far"))
        .orderBy("user_id", "event_id")
    },
    // C36 recursive CTE (Spark 4.1 WITH RECURSIVE) — the hierarchy walk
    // (org chart / BOM explosion) of the warehouse SQL surface: each
    // customer's ancestor chain k → k/2 → … → 1 with depth and an
    // ancestor-balance rollup. Recursion is bounded by construction (the
    // key strictly decreases → log₂ n levels). Cyclic-graph closure stays
    // with the iterative e21 operator — Spark's recursive CTE only supports
    // UNION ALL, which diverges on cycles, and the O(log n) large/small-star
    // operator is the scale-correct shape for that anyway.
    "c36_recursive_hierarchy" -> { (s, d) =>
      Tables.load(s, d, "customer").createOrReplaceTempView("cust_h")
      s.sql("""
        WITH RECURSIVE up(custkey, anc, depth) AS (
            SELECT c_custkey, c_custkey, 0 FROM cust_h
          UNION ALL
            SELECT custkey, anc DIV 2, depth + 1 FROM up WHERE anc > 1)
        SELECT custkey AS c_custkey, MAX(depth) AS depth_to_root,
               COUNT(cc.c_custkey) AS n_ancestors,
               CAST(SUM(CAST(cc.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS anc_bal
        FROM up LEFT JOIN cust_h cc ON cc.c_custkey = up.anc AND up.depth > 0
        GROUP BY custkey ORDER BY custkey""")
    },
    // C37 LATERAL correlated derived table — per-nation top-2 customers via
    // a correlated ORDER BY ... LIMIT subquery in the FROM clause (the
    // "top-n per outer row" SQL idiom; the DataFrame twin is the c05/c16
    // rank-filter, which Spark plans as WindowGroupLimit).
    "c37_lateral_topn" -> { (s, d) =>
      Tables.load(s, d, "nation").createOrReplaceTempView("nation_l")
      Tables.load(s, d, "customer").createOrReplaceTempView("customer_l")
      s.sql("""SELECT n.n_nationkey, n.n_name, t.c_custkey, t.c_acctbal
               FROM nation_l n,
               LATERAL (SELECT c_custkey, c_acctbal FROM customer_l c
                        WHERE c.c_nationkey = n.n_nationkey
                        ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
               ORDER BY n.n_nationkey, t.c_acctbal DESC, t.c_custkey""")
    },
    // C38 NOT IN subquery — planned as the null-aware anti join (the
    // LeftAnti BroadcastHashJoin with the isNullAware flag): NOT IN is NOT
    // an anti join when the inner side can hold NULL (one NULL makes every
    // non-match UNKNOWN → empty result); NullSemanticsSpec pins that
    // poisoned case, this query gates the non-degenerate one.
    "c38_not_in" -> { (s, d) =>
      Tables.load(s, d, "orders").createOrReplaceTempView("orders_n")
      Tables.load(s, d, "customer").createOrReplaceTempView("customer_n")
      s.sql("""SELECT o_orderkey, o_custkey FROM orders_n
               WHERE o_custkey NOT IN
                 (SELECT c_custkey FROM customer_n WHERE c_mktsegment = 'BUILDING')
               ORDER BY o_orderkey""")
    },
    // C39 bitwise aggregates — flag-mask combining reducers (fully
    // partial-aggregatable: AND/OR/XOR are associative+commutative, so the
    // map side collapses each partition to one long before the shuffle).
    "c39_bit_agg" -> { (s, d) =>
      Tables.load(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("bit_and(CAST(l_linenumber AS BIGINT))").as("lines_and"),
          expr("bit_or(CAST(l_linenumber AS BIGINT))").as("lines_or"),
          expr("bit_xor(l_orderkey)").as("keys_xor"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },
    // C40 regex group extraction — parse-and-group on an extracted capture
    // (first word of the part name); the scan-side extraction stays in
    // whole-stage codegen and the aggregate shuffles only |distinct words|.
    "c40_regexp_extract" -> { (s, d) =>
      Tables.load(s, d, "part")
        .select(regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
          col("p_partkey"))
        .groupBy(col("first_word"))
        .agg(count(lit(1)).as("n_parts"), min(col("p_partkey")).as("min_part"))
        .orderBy("first_word")
    },
    // C41 ordered string aggregation (LISTAGG/STRING_AGG) — deterministic
    // by sorting members before concatenation, so the result is
    // partitioning-invariant (collect_list alone is not: its order is
    // arrival order).
    "c41_string_agg" -> { (s, d) =>
      Tables.load(s, d, "customer")
        .filter(col("c_custkey") % 100 === 0)
        .groupBy(col("c_nationkey"))
        .agg(array_join(array_sort(collect_list(col("c_name"))), ",").as("names"),
          count(lit(1)).as("n"))
        .orderBy("c_nationkey")
    },
    // C43 explicit null ordering — Spark sorts NULLS FIRST ascending by
    // default, DuckDB NULLS LAST: portable sorts must pin it. Pinned
    // NULLS LAST here on both engines, nulls synthesized via NULLIF.
    "c43_sort_nulls" -> { (s, d) =>
      Tables.load(s, d, "customer")
        .filter(col("c_custkey") % 50 === 0)
        .select(col("c_custkey"),
          nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"))
        .orderBy(col("seg").asc_nulls_last, col("c_custkey").asc)
    },
    // C44 equi-width histogram — the profiling/binning primitive: global
    // min/max in one pass (1-row broadcast), then bucket assignment is
    // map-side arithmetic and the count is a 10-group aggregate. Two scans
    // total, no shuffle wider than 10 rows — the shape that survives any
    // scale. Bucket ids are integer floor math on identical IEEE doubles.
    "c44_histogram" -> { (s, d) =>
      val li = Tables.load(s, d, "lineitem")
      val mm = li.agg(min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"))
      li.crossJoin(broadcast(mm))
        .select(least(floor((col("l_extendedprice") - col("lo")) /
            ((col("hi") - col("lo")) / lit(10))), lit(9L)).as("bucket"),
          col("l_extendedprice"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("l_extendedprice")).as("bucket_min"),
          max(col("l_extendedprice")).as("bucket_max"))
        .orderBy("bucket")
    },
    // C46 Z-order clustering — the multi-dimensional file-skipping layout:
    // interleave the bits of two filter dimensions into one sort key, bin
    // the sorted order into 16 "files", report each bin's per-dimension
    // min/max (the parquet footer stats a scan would prune on). The point
    // the report proves: along a Z-order BOTH dimensions' ranges stay
    // narrow per file, so predicates on EITHER column skip most files —
    // a linear sort gets this for its first key only. Pure integer bit
    // math, identical on both engines; at 100 TB this is the sort key for
    // the write job, and the report is the layout-quality audit.
    // NOTE the global ntile window here is the exact-semantics anchor for
    // the oracle; the production layout job is `repartitionByRange(z)` +
    // sortWithinPartitions (sampled range boundaries = the file bins), which
    // never materializes a single-partition window.
    "c46_zorder" -> { (s, d) =>
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_partkey") % 256).as("x"), (col("l_orderkey") % 256).as("y"))
      val z = graft.operators.ZorderLayout.zvalue(col("x"), col("y"))
      // graft_pin(0): the single-partition execution is the NOTE's deliberate
      // oracle anchor; a plain lit(0) partition would be folded away by the
      // optimizer and the window would still WARN "No Partition Defined" —
      // the pinned constant keeps the declared partition in the plan
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(graft.functions.PinnedKey.pin(lit(0)))
        .orderBy(col("z"), col("l_orderkey"), col("l_linenumber"))
      li.withColumn("z", z)
        .withColumn("file_bin", ntile(16).over(w))
        .groupBy(col("file_bin"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("x_min"), max(col("x")).as("x_max"),
          min(col("y")).as("y_min"), max(col("y")).as("y_max"))
        .orderBy("file_bin")
    },
    // C47 band (interval) join through the custom BroadcastRangeJoinExec:
    // overlapping [lo, hi] character-count bands derived from the region
    // dim, joined to documents on containment. A band-only inner join has
    // no equi key, so stock Spark plans O(|docs|·|bands|)
    // BroadcastNestedLoopJoin; the injected strategy instead broadcasts the
    // sorted band list with a prefix-max and each doc binary-searches —
    // O(|docs|·log|bands| + matches), stream side never shuffles
    // (RangeJoinSpec proves the plan claim; PlanSpec pins it here).
    "c47_band_join" -> { (s, d) =>
      graft.plans.BroadcastRangeJoinStrategy.install(s)
      val bands = Tables.load(s, d, "region")
        .select(col("r_name").as("band"),
          (col("r_regionkey").cast(LongType) * 100L).as("lo"),
          (col("r_regionkey").cast(LongType) * 100L + 149L).as("hi"))
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("n_chars"))
      bands.join(docs,
          col("n_chars") >= col("lo") && col("n_chars") <= col("hi"))
        .select(col("band"), col("doc_id"), col("n_chars"))
        .orderBy("band", "doc_id")
    },
    // C48 semi-structured VARIANT — Spark 4's open-schema JSON type:
    // parse once into the binary VARIANT encoding, then typed path
    // extraction (variant_get) at query time — the shredded-JSON pattern
    // that replaces per-query string re-parsing (c25's get_json_object) on
    // hot semi-structured columns. At rest the column would be parquet
    // VARIANT (parse cost paid once at ingest, typed access thereafter).
    // Extraction is map-side; the aggregate is an ordinary partial-agg.
    "c48_variant" -> { (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          expr("variant_get(parse_json(props), '$.k', 'int')").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type")
    },
    // C49 conversion funnel — the product-analytics staple: first signup
    // per user, first purchase AT OR AFTER it, cohort-level conversion rate
    // and mean time-to-convert. Two filtered aggregates + one keyed join —
    // at 100 TB both sides shuffle once on user_id (or co-bucket) and the
    // cohort rollup is partial-aggregatable. Determinism: event times are
    // integer micros; the mean is an exact integer sum divided once.
    "c49_funnel" -> { (s, d) =>
      val ev = Tables.events(s, d).withColumn("ts_us", expr("ts_ns div 1000"))
      val sg = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("s_us"))
      val pu = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us").as("p_us"))
      val fc = sg.join(pu, Seq("user_id"), "left")
        .withColumn("p_ok", when(col("p_us") >= col("s_us"), col("p_us")))
        .groupBy(col("user_id"), col("s_us")).agg(min(col("p_ok")).as("conv_us"))
      fc.groupBy((col("user_id") % 4).as("cohort"))
        .agg(count(lit(1)).as("n_signup_users"),
          count(col("conv_us")).as("n_converted"),
          round(sum(col("conv_us") - col("s_us")).cast(DoubleType)
            / count(col("conv_us")) / 1000000.0, 6).as("avg_conv_sec"))
        .orderBy("cohort")
    },
    // C50 retention cohorts — the week-N retention matrix: users grouped by
    // signup week, counted distinct-active per subsequent week offset. All
    // integer epoch-day/week arithmetic (exact on both engines); one keyed
    // join of the cohort map (user-count-sized, broadcastable at any
    // realistic user cardinality) onto the event stream, then a distinct
    // count per (cohort, offset) — partial-aggregatable, |weeks|² output.
    "c50_retention_cohorts" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .withColumn("day", expr("ts_ns div 86400000000000"))
      val sg = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("day")).as("d0"))
        .select(col("user_id"), expr("d0 div 7").as("cohort_week"))
      ev.join(sg, "user_id")
        .withColumn("week_offset", expr("day div 7") - col("cohort_week"))
        .filter(col("week_offset").between(0, 3))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy("cohort_week", "week_offset")
    },
    // C51 event-transition mining — the behavior-path report (what do users
    // do next?): per-user time-ordered event pairs via lead(), counted per
    // (from, to). Ties at identical timestamps break on event_id, so the
    // sequence is total and both engines pair identically. One user-keyed
    // window + one small aggregate — the window is the same single-shuffle
    // class as the merge, output is |event types|².
    "c51_event_transitions" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
      Tables.events(s, d)
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("from_type", "to_type")
    },
    // C45 positional window navigation — FIRST_VALUE / NTH_VALUE /
    // LAST_VALUE over the full partition frame. Keyed at microsecond
    // precision (ties broken by event_id): DuckDB truncates the parquet
    // TIMESTAMP(NANOS) to micros on read, so micros is the shared exact
    // domain — Spark derives it from the raw nano long.
    "c45_nth_value" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
      Tables.events(s, d)
        .filter(col("user_id") % 50 === 0)
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .select(col("user_id"), col("event_id"), col("ts_us"),
          first(col("value")).over(w).as("first_v"),
          nth_value(col("value"), 3).over(w).as("third_v"),
          last(col("value")).over(w).as("last_v"))
        .orderBy("user_id", "ts_us", "event_id")
    },
    // C42 conditional aggregates — COUNT_IF/BOOL_OR/BOOL_AND + exact
    // median, the predicate-summary reducers of quality dashboards.
    "c42_conditional_agg" -> { (s, d) =>
      Tables.load(s, d, "lineitem")
        .groupBy(col("l_linestatus"))
        .agg(expr("count_if(l_discount > 0.05)").as("n_discounted"),
          expr("bool_or(l_quantity >= 50)").as("any_bulk"),
          expr("bool_and(l_quantity >= 1)").as("all_nonzero"),
          expr("median(l_quantity)").as("med_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_linestatus")
    },
    // C34 time-series gap fill + carry-forward: per-key hourly grid
    // (sequence generator between each key's bounds), last observation
    // carried forward over the gaps — the resample/ffill operator every
    // metrics pipeline needs. Work is one window per key over the grid;
    // the grid explodes map-side (no shuffle to generate it), and the
    // carry-forward is the same single pk-shuffle class as the merge.
    "c34_gapfill" -> { (s, d) =>
      val ev = Tables.events(s, d).filter(col("user_id") < 10)
        .select(col("user_id"), expr("ts_ns div 3600000000000").as("h"),
          col("value"), col("event_id"))
      val wLast = Window.partitionBy(col("user_id"), col("h"))
        .orderBy(col("event_id").desc)
      val lastPerHour = ev.withColumn("rn", row_number().over(wLast))
        .filter(col("rn") === 1).select("user_id", "h", "value")
      val grid = lastPerHour.groupBy("user_id")
        .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        .select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("h"))
      val wFill = Window.partitionBy(col("user_id")).orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(lastPerHour, Seq("user_id", "h"), "left")
        .select(col("user_id"), col("h"), col("value").isNotNull.as("observed"),
          last(col("value"), ignoreNulls = true).over(wFill).as("filled"))
        .orderBy("user_id", "h")
    },
    // C52 dynamic partition pruning — the fact table is laid out
    // partitionBy(ship_month) (83 directories); the selective predicate
    // lives on the DIM side (yr = '1996'), so at plan time the fact scan
    // has no static partition filter at all. DPP turns the dim's broadcast
    // into a runtime subquery inside the scan's PartitionFilters
    // (dynamicpruning#N), so the fact reads only the 12 qualifying month
    // directories — at 100 TB, the difference between scanning ~1/7 and
    // all of a date-partitioned fact whenever the cut arrives through a
    // dimension attribute instead of a literal. PlanSpec pins the
    // dynamicpruning filter so a regression that flips it to a full scan
    // fails loudly.
    "c52_dpp_join" -> { (s, d) =>
      val factPath = scratch("c52_fact", d, s)
      val dimPath = scratch("c52_dim", d, s)
      // The partitioned fixture is INPUT to the scored operator (the DPP
      // join), not the operator itself — write it once per source
      // generation. The guard fingerprints the source parquet (name, size,
      // mtime), so a driver-side testdata regeneration invalidates the
      // scratch layout instead of silently serving stale months (the exact
      // failure mode the r5 events regeneration taught).
      val srcFp = {
        val f = new java.io.File(s"$d/lineitem.parquet")
        val files = if (f.isFile) Array(f)
          else Option(f.listFiles).getOrElse(Array.empty).filter(_.isFile)
        files.map(x => s"${x.getName}:${x.length}:${x.lastModified}")
          .sorted.mkString("|")
      }
      val marker = java.nio.file.Paths.get(factPath, "_GRAFT_FIXTURE")
      val fresh = java.nio.file.Files.exists(marker) &&
        java.nio.file.Files.readString(marker) == srcFp
      if (!fresh) {
        val li = load(s, d, "lineitem")
          .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
          .select("l_orderkey", "ship_month", "l_quantity", "l_extendedprice")
        li.write.mode("overwrite").partitionBy("ship_month").parquet(factPath)
        li.select(col("ship_month")).distinct()
          .withColumn("yr", substring(col("ship_month"), 1, 4))
          .write.mode("overwrite").parquet(dimPath)
        java.nio.file.Files.writeString(marker, srcFp) // after BOTH writes
      }
      val fact = s.read.parquet(factPath)
      val dim = s.read.parquet(dimPath).filter(col("yr") === "1996")
      fact.join(broadcast(dim), "ship_month")
        .groupBy(col("ship_month"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_extendedprice"))).cast(DoubleType).as("sum_price"))
        .orderBy("ship_month")
    },
    // C53 RFM segmentation — the classic customer-value quartile cube:
    // recency (last purchase position), frequency (purchase count),
    // monetary (exact decimal spend) scored 1–4 against GLOBAL quartile
    // thresholds. The thresholds are one 9-value aggregate broadcast back
    // over the users — never a global ntile window (which would funnel
    // every user through one partition); scoring is map-side comparisons,
    // then the segment rollup is an ordinary partial+final agg. Spark
    // percentile() ≡ DuckDB quantile_cont() on identical doubles — the
    // proven c30 pairing — and boolean-to-int scoring is exact.
    "c53_rfm_segments" -> { (s, d) =>
      val p = Tables.events(s, d).filter(col("event_type") === "purchase")
      val rfm = p.groupBy(col("user_id"))
        .agg(max(col("event_id")).as("recency_pos"),
          count(lit(1)).as("frequency"),
          sum(dec(col("value"))).cast(DoubleType).as("monetary"))
      val q = rfm.agg(
        expr("percentile(recency_pos, 0.25)").as("r1"),
        expr("percentile(recency_pos, 0.5)").as("r2"),
        expr("percentile(recency_pos, 0.75)").as("r3"),
        expr("percentile(frequency, 0.25)").as("f1"),
        expr("percentile(frequency, 0.5)").as("f2"),
        expr("percentile(frequency, 0.75)").as("f3"),
        expr("percentile(monetary, 0.25)").as("m1"),
        expr("percentile(monetary, 0.5)").as("m2"),
        expr("percentile(monetary, 0.75)").as("m3"))
      val score = (v: Column, t1: Column, t2: Column, t3: Column) =>
        lit(1) + (v > t1).cast("int") + (v > t2).cast("int") +
          (v > t3).cast("int")
      rfm.crossJoin(broadcast(q))
        .select(col("monetary"),
          score(col("recency_pos"), col("r1"), col("r2"), col("r3")).as("r_score"),
          score(col("frequency"), col("f1"), col("f2"), col("f3")).as("f_score"),
          score(col("monetary"), col("m1"), col("m2"), col("m3")).as("m_score"))
        .groupBy(col("r_score"), col("f_score"), col("m_score"))
        .agg(count(lit(1)).as("n_users"),
          sum(dec(col("monetary"))).cast(DoubleType).as("total_monetary"))
        .orderBy("r_score", "f_score", "m_score")
    },
    // C54 ratio-to-report — share of parent and share of grand total per
    // (returnflag, linestatus) cell: the percent-of-total column every
    // revenue report carries. The fact scan aggregates FIRST (partial+
    // final, exact decimal sums); the share windows then run over the
    // 9-row AGGREGATE, so the "global" window is a constant-size frame,
    // never the fact table (the e53 rule: a windowless-partition window is
    // fine only after the data is report-sized). Ratios are single IEEE
    // divisions of identical exact-decimal-derived doubles.
    "c54_share_of_total" -> { (s, d) =>
      val g = load(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(dec(col("l_extendedprice"))).as("rev"))
      val wf = Window.partitionBy(col("l_returnflag"))
      // the grand total is a 1-row aggregate of the 9-row aggregate —
      // broadcast-crossJoined instead of windowed, so no partition-less
      // window exists to warn about (and the plan reads as what it is)
      val grand = g.agg(sum(col("rev")).as("rev_total"))
      g.crossJoin(broadcast(grand))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("rev").cast(DoubleType).as("revenue"),
          (col("rev").cast(DoubleType)
            / sum(col("rev")).over(wf).cast(DoubleType)).as("share_of_flag"),
          (col("rev").cast(DoubleType)
            / col("rev_total").cast(DoubleType)).as("share_of_total"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    // C55 market-basket affinity — pairwise co-occurrence lift over the
    // order/part bipartite set: lift(a,b) = P(ab)/(P(a)P(b)) =
    // n_ab·N / (n_a·n_b), the association-rule screen. The pair join is
    // WITHIN-order (cost Σ items-per-order², bounded by basket size, never
    // parts²); supports broadcast back onto the surviving pairs (at 100 TB
    // the support table shuffle-joins on the part key instead — same
    // plan minus the broadcast). Exact integer counts into one IEEE
    // division; top-25 by lift via TakeOrderedAndProject with a total
    // deterministic tie-break.
    "c55_basket_lift" -> { (s, d) =>
      val op = load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
        .localCheckpoint() // basket self-join reads it twice; GC-released
      val n = op.select(col("l_orderkey")).distinct()
        .agg(count(lit(1)).as("n_orders"))
      val sup = op.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_p"))
      val a = op.select(col("l_orderkey"), col("l_partkey").as("p1"))
      val b = op.select(col("l_orderkey"), col("l_partkey").as("p2"))
      a.join(b, Seq("l_orderkey")).filter(col("p1") < col("p2"))
        .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 2)
        .join(broadcast(sup.select(col("l_partkey").as("p1"),
          col("n_p").as("n_a"))), "p1")
        .join(broadcast(sup.select(col("l_partkey").as("p2"),
          col("n_p").as("n_b"))), "p2")
        .crossJoin(broadcast(n))
        .select(col("p1"), col("p2"), col("n_ab"), col("n_a"), col("n_b"),
          ((col("n_ab") * col("n_orders")).cast(DoubleType)
            / (col("n_a") * col("n_b"))).as("lift"))
        .orderBy(col("lift").desc, col("p1"), col("p2")).limit(25)
    },
    // C56 three-step strict-order funnel — signup → first subsequent view
    // → first subsequent purchase (c49's two-step chained once more): each
    // stage is a conditional-min aggregate over a per-user left join, so
    // order is enforced by comparison, not by sorting events. Same scale
    // class as c49: every stage is one pk-keyed join + agg (merge-class
    // shuffles); time math stays in exact integer micros until the single
    // rounded division at the end.
    "c56_funnel3" -> { (s, d) =>
      // persisted: three stage filters read the same events projection
      val ev = Tables.events(s, d).withColumn("us", expr("ts_ns div 1000"))
        .select("user_id", "event_type", "us")
        .localCheckpoint() // both sequence sides; GC-released
      val sg = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("us")).as("s_us"))
      val vw = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("us").as("v"))
      val fv = sg.join(vw, Seq("user_id"), "left")
        .groupBy(col("user_id"), col("s_us"))
        .agg(min(when(col("v") >= col("s_us"), col("v"))).as("v_us"))
      val pu = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("us").as("p"))
      val fp = fv.join(pu, Seq("user_id"), "left")
        .groupBy(col("user_id"), col("s_us"), col("v_us"))
        .agg(min(when(col("p") >= col("v_us"), col("p"))).as("p_us"))
      fp.groupBy((col("user_id") % 4).as("cohort"))
        .agg(count(lit(1)).as("n_signup"),
          count(col("v_us")).as("n_viewed"),
          count(col("p_us")).as("n_converted"),
          round(sum(when(col("p_us").isNotNull, col("p_us") - col("s_us")))
            .cast(DoubleType) / count(col("p_us")) / 1000000, 6)
            .as("avg_conv_sec"))
        .orderBy("cohort")
    },
    // C57 top user journeys — gap-sessionized (30 min) event paths ranked
    // by frequency: the "what do users actually do" path-mining report.
    // Sessionization is the d5-style lag-gap cumulative sum (one window
    // per user); the path string is a partitioning-invariant ordered
    // LISTAGG (the c41 recipe: collect structs, sort_array, then join —
    // never relying on collect_list arrival order); the final top-10 is a
    // TakeOrderedAndProject heap over |distinct paths|, with a total
    // deterministic tie-break.
    "c57_top_paths" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns"), col("event_id"))
      val gapNs = 1800000000000L // 30 min
      val ev = Tables.events(s, d)
        .withColumn("prev", lag(col("ts_ns"), 1).over(w))
        .withColumn("new_s", (col("prev").isNull
          || col("ts_ns") - col("prev") > gapNs).cast("int"))
        .withColumn("sess", sum(col("new_s")).over(w))
      val paths = ev.groupBy(col("user_id"), col("sess"))
        .agg(array_join(transform(
          sort_array(collect_list(struct(col("ts_ns"), col("event_id"),
            col("event_type")))),
          x => x("event_type")), ">").as("path"))
      paths.groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path")).limit(10)
    }
  )

  val oracleSql: Map[String, String] = Map(
    "c01_projection" ->
      "SELECT o_orderkey, o_custkey, o_orderstatus FROM orders ORDER BY o_orderkey",
    "c02_filter" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM lineitem
        |WHERE l_returnflag = 'R' AND l_quantity >= 10 AND l_quantity < 25
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "c03_distinct" ->
      """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin,
    "c04_sort" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |       CAST(o_orderdate AS DATE) AS o_date
        |FROM orders ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC""".stripMargin,
    "c05_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "c06_join_inner" ->
      """SELECT o_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,
    "c07_join_left" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "c07b_join_full" ->
      """SELECT COALESCE(c_custkey, o_custkey) AS k,
        |  MAX(c_custkey IS NOT NULL) AS has_customer,
        |  COUNT(o_orderkey) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |FROM (SELECT * FROM customer WHERE c_custkey <= 50) c
        |FULL OUTER JOIN (SELECT * FROM orders WHERE o_custkey > 30) o
        |  ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY k""".stripMargin,
    "c08_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "c08b_join_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "c09_self_join" ->
      """SELECT a.s_suppkey AS k1, b.s_suppkey AS k2, a.s_nationkey AS nk
        |FROM supplier a JOIN supplier b
        |  ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
        |ORDER BY k1, k2""".stripMargin,
    "c10_multiway_join" ->
      """SELECT r_name, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "c11_group_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "c12_global_agg" ->
      """SELECT COUNT(*) AS n, MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  MIN(CAST(l_shipdate AS DATE)) AS first_ship,
        |  MAX(CAST(l_shipdate AS DATE)) AS last_ship
        |FROM lineitem""".stripMargin,
    "c13_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3
        |ORDER BY o_custkey""".stripMargin,
    "c14_rollup" ->
      """SELECT CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_status,
        |  COALESCE(l_returnflag, 'ALL') AS flag,
        |  COALESCE(l_linestatus, 'ALL') AS status,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status, flag, status""".stripMargin,
    "c14c_grouping_sets" ->
      """SELECT CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_status,
        |  COALESCE(l_returnflag, 'ALL') AS flag,
        |  COALESCE(l_linestatus, 'ALL') AS status,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        |ORDER BY g_flag, g_status, flag, status""".stripMargin,
    "c14b_cube" ->
      """SELECT CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_status,
        |  COALESCE(l_returnflag, 'ALL') AS flag,
        |  COALESCE(l_linestatus, 'ALL') AS status,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status, flag, status""".stripMargin,
    "c15_count_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "c16_window_rank" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER w AS INT) AS rn, CAST(RANK() OVER w AS INT) AS rk,
        |    CAST(DENSE_RANK() OVER w AS INT) AS drk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
        |) WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin,
    "c17_window_analytic" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  LAG(l_quantity, 1) OVER w AS prev_qty,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        |FROM lineitem WHERE l_suppkey <= 3
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "c16b_ntile" ->
      """SELECT * FROM (
        |  SELECT o_orderstatus, o_orderkey, o_totalprice,
        |    CAST(NTILE(4) OVER w AS INT) AS quartile,
        |    FIRST_VALUE(o_orderkey) OVER w AS cheapest_key
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC, o_orderkey ASC)
        |) WHERE quartile = 4 ORDER BY o_orderstatus, o_orderkey""".stripMargin,
    "c17b_window_range" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(DATEDIFF('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) AS INT) AS day,
        |  COUNT(*) OVER (PARTITION BY l_suppkey
        |    ORDER BY DATEDIFF('day', DATE '1995-01-01', CAST(l_shipdate AS DATE))
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS n_30d
        |FROM lineitem WHERE l_suppkey <= 2
        |ORDER BY l_suppkey, day, l_orderkey, l_linenumber""".stripMargin,
    "c27b_correlated_subquery" ->
      """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        |FROM orders o
        |WHERE o.o_totalprice > 1.8 * (
        |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o.o_orderkey""".stripMargin,
    "c18_setops" ->
      """WITH cn AS (SELECT c_nationkey AS nk FROM customer),
        |     sn AS (SELECT s_nationkey AS nk FROM supplier)
        |SELECT 'union_all' AS op, nk, COUNT(*) AS n
        |  FROM (SELECT nk FROM cn UNION ALL SELECT nk FROM sn) GROUP BY nk
        |UNION ALL
        |SELECT 'intersect' AS op, nk, 1::BIGINT AS n
        |  FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn)
        |UNION ALL
        |SELECT 'except' AS op, nk, 1::BIGINT AS n
        |  FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn)
        |ORDER BY op, nk""".stripMargin,
    "c18b_setops_all" ->
      """WITH cn AS (SELECT c_nationkey AS nk FROM customer),
        |sn AS (SELECT s_nationkey AS nk FROM supplier),
        |ia AS (SELECT 'intersect_all' AS op, nk, count(*) AS n
        |       FROM (SELECT nk FROM cn INTERSECT ALL SELECT nk FROM sn)
        |       GROUP BY nk),
        |ea AS (SELECT 'except_all' AS op, nk, count(*) AS n
        |       FROM (SELECT nk FROM cn EXCEPT ALL SELECT nk FROM sn)
        |       GROUP BY nk)
        |SELECT op, nk, n FROM ia UNION ALL SELECT op, nk, n FROM ea
        |ORDER BY op, nk""".stripMargin,
    "c14d_grouping_id" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  GROUPING(o_orderstatus, o_orderpriority)::BIGINT AS gid,
        |  GROUPING(o_orderstatus)::INT AS g_status
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus NULLS LAST, o_orderpriority NULLS LAST""".stripMargin,
    "c19_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(YEAR(CAST(o_orderdate AS DATE)) AS INT) AS y,
        |  CAST(MONTH(CAST(o_orderdate AS DATE)) AS INT) AS m,
        |  CAST(DAYOFMONTH(CAST(o_orderdate AS DATE)) AS INT) AS dom,
        |  CAST(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS age_days,
        |  CAST(o_orderdate AS DATE) + 30 AS due_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "c20_nulls" ->
      """SELECT c_custkey,
        |  NULLIF(c_mktsegment, 'BUILDING') IS NULL AS seg_is_null,
        |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '(none)') AS seg_or_none,
        |  NULLIF(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM 'MACHINERY' AS nullsafe_mach
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "c21_pattern" ->
      """SELECT p_partkey, p_name, p_type,
        |  p_name LIKE '%a%' AS has_a,
        |  regexp_matches(p_type, '^[A-M]') AS type_am
        |FROM part
        |WHERE p_name LIKE '%a%' OR regexp_matches(p_type, '^[A-M]')
        |ORDER BY p_partkey""".stripMargin,
    "c22_string_funcs" ->
      """SELECT c_custkey, UPPER(c_name) AS name_upper, LOWER(c_mktsegment) AS seg_lower,
        |  CAST(LENGTH(c_name) AS INT) AS name_len, SUBSTRING(c_name, 1, 5) AS name_pfx,
        |  CONCAT_WS('#', c_name, c_mktsegment) AS tagged, TRIM(c_name) AS name_trim
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "c23_math" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 + CAST(l_tax AS DECIMAL(18,2)))
        |       * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(MAX(ROUND(l_discount * 100)) AS INT) AS max_disc_pct,
        |  CAST(MIN(ROUND(l_tax * 100)) AS INT) AS min_tax_pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "c24_case" ->
      """SELECT CASE o_orderstatus WHEN 'F' THEN 'done' WHEN 'O' THEN 'open'
        |    ELSE 'other' END AS status_word,
        |  CASE WHEN o_totalprice >= 300000 THEN 'big'
        |       WHEN o_totalprice >= 100000 THEN 'mid' ELSE 'small' END AS size_bucket,
        |  COUNT(*) AS n
        |FROM orders GROUP BY 1, 2 ORDER BY status_word, size_bucket""".stripMargin,
    "c25_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY k_mod""".stripMargin,
    "c26_array_funcs" ->
      """SELECT vec_id, CAST(LEN(embedding) AS INT) AS dim,
        |  list_reduce(list_prepend(0.0::DOUBLE, embedding::DOUBLE[]), (a, x) -> a + x) AS vsum,
        |  CAST(list_min(embedding) AS DOUBLE) AS vmin,
        |  CAST(list_max(embedding) AS DOUBLE) AS vmax
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "c28_pivot" ->
      """SELECT o_orderstatus,
        |  COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS p1,
        |  COUNT(*) FILTER (o_orderpriority = '2-HIGH') AS p2,
        |  COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS p3,
        |  COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS p4,
        |  COUNT(*) FILTER (o_orderpriority = '5-LOW') AS p5
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "c28b_unpivot" ->
      """SELECT c_custkey, 'c_name' AS attr, c_name AS val FROM customer
        |UNION ALL
        |SELECT c_custkey, 'c_mktsegment' AS attr, c_mktsegment AS val FROM customer
        |ORDER BY c_custkey, attr""".stripMargin,
    "c29_posexplode" ->
      """SELECT vec_id, CAST(i - 1 AS INT) AS idx, embedding[i]::DOUBLE AS v
        |FROM (SELECT vec_id, embedding,
        |        unnest(generate_series(1, len(embedding))) AS i
        |      FROM embeddings WHERE vec_id < 3)
        |ORDER BY vec_id, idx""".stripMargin,
    "c30_percentile" ->
      """SELECT o_orderstatus,
        |  quantile_cont(o_totalprice, 0.5) AS median_price,
        |  quantile_cont(o_totalprice, 0.9) AS p90_price,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "c31_stats_exact_sums" ->
      """WITH s AS (SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  ROUND((sxx - sx * sx / n) / (n - 1), 9) AS var_qty,
        |  ROUND((sxy - sx * sy / n)
        |    / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 12) AS corr_qty_price
        |FROM s ORDER BY l_returnflag""".stripMargin,
    "c32_percent_rank" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  PERCENT_RANK() OVER w AS pct_rank,
        |  CUME_DIST() OVER w AS cume
        |FROM lineitem WHERE l_suppkey <= 5
        |WINDOW w AS (PARTITION BY l_suppkey
        |             ORDER BY l_extendedprice ASC, l_orderkey ASC, l_linenumber ASC)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "c33_weighted_avg" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS wavg_price,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "c27_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_totalprice > (SELECT max(o_totalprice) * 0.9 FROM orders)
        |   OR o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'FURNITURE' AND c_nationkey = 1)
        |ORDER BY o_orderkey""".stripMargin,
    "c06b_join_nullsafe" ->
      """WITH ac AS (SELECT nullif(user_id % 7, 6) AS k, COUNT(*) AS na
        |            FROM events WHERE event_id % 3 = 0 GROUP BY 1),
        |bc AS (SELECT nullif(user_id % 7, 6) AS k, COUNT(*) AS nb
        |       FROM events WHERE event_id % 3 = 1 GROUP BY 1)
        |SELECT COALESCE(CAST(ac.k AS VARCHAR), 'NULL') AS k, na * nb AS n
        |FROM ac JOIN bc ON ac.k IS NOT DISTINCT FROM bc.k
        |ORDER BY k""".stripMargin,
    "c35_window_distinct" ->
      """SELECT user_id, event_id,
        |  COUNT(DISTINCT event_type) OVER (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_types_so_far
        |FROM events WHERE user_id < 50 ORDER BY user_id, event_id""".stripMargin,
    "c36_recursive_hierarchy" ->
      """WITH RECURSIVE up(custkey, anc, depth) AS (
        |    SELECT c_custkey, c_custkey, 0 FROM customer
        |  UNION ALL
        |    SELECT custkey, anc // 2, depth + 1 FROM up WHERE anc > 1)
        |SELECT custkey AS c_custkey, MAX(depth) AS depth_to_root,
        |       COUNT(cc.c_custkey) AS n_ancestors,
        |       CAST(SUM(CAST(cc.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS anc_bal
        |FROM up LEFT JOIN customer cc ON cc.c_custkey = up.anc AND up.depth > 0
        |GROUP BY custkey ORDER BY custkey""".stripMargin,
    "c37_lateral_topn" ->
      """SELECT n.n_nationkey, n.n_name, t.c_custkey, t.c_acctbal
        |FROM nation n,
        |LATERAL (SELECT c_custkey, c_acctbal FROM customer c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        |ORDER BY n.n_nationkey, t.c_acctbal DESC, t.c_custkey""".stripMargin,
    "c38_not_in" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey NOT IN
        |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,
    "c39_bit_agg" ->
      """SELECT l_returnflag,
        |  bit_and(CAST(l_linenumber AS BIGINT)) AS lines_and,
        |  bit_or(CAST(l_linenumber AS BIGINT)) AS lines_or,
        |  bit_xor(l_orderkey) AS keys_xor,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "c40_regexp_extract" ->
      """SELECT regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
        |  COUNT(*) AS n_parts, MIN(p_partkey) AS min_part
        |FROM part GROUP BY 1 ORDER BY first_word""".stripMargin,
    "c41_string_agg" ->
      """SELECT c_nationkey,
        |  string_agg(c_name, ',' ORDER BY c_name) AS names, COUNT(*) AS n
        |FROM customer WHERE c_custkey % 100 = 0
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "c43_sort_nulls" ->
      """SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg
        |FROM customer WHERE c_custkey % 50 = 0
        |ORDER BY seg ASC NULLS LAST, c_custkey ASC""".stripMargin,
    "c44_histogram" ->
      """WITH mm AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
        |  FROM lineitem)
        |SELECT CAST(least(floor((l_extendedprice - lo) / ((hi - lo) / 10)), 9) AS BIGINT)
        |    AS bucket,
        |  COUNT(*) AS n, min(l_extendedprice) AS bucket_min,
        |  max(l_extendedprice) AS bucket_max
        |FROM lineitem, mm GROUP BY bucket ORDER BY bucket""".stripMargin,
    "c46_zorder" ->
      """WITH b AS (SELECT l_orderkey, l_linenumber,
        |    l_partkey % 256 AS x, l_orderkey % 256 AS y FROM lineitem),
        |z AS (SELECT *,
        |    (((x >> 0) & 1) << 0) + (((y >> 0) & 1) << 1)
        |  + (((x >> 1) & 1) << 2) + (((y >> 1) & 1) << 3)
        |  + (((x >> 2) & 1) << 4) + (((y >> 2) & 1) << 5)
        |  + (((x >> 3) & 1) << 6) + (((y >> 3) & 1) << 7)
        |  + (((x >> 4) & 1) << 8) + (((y >> 4) & 1) << 9)
        |  + (((x >> 5) & 1) << 10) + (((y >> 5) & 1) << 11)
        |  + (((x >> 6) & 1) << 12) + (((y >> 6) & 1) << 13)
        |  + (((x >> 7) & 1) << 14) + (((y >> 7) & 1) << 15) AS zv FROM b),
        |f AS (SELECT x, y, ntile(16) OVER (ORDER BY zv, l_orderkey, l_linenumber)
        |    AS file_bin FROM z)
        |SELECT file_bin::INT AS file_bin, COUNT(*) AS n,
        |  min(x) AS x_min, max(x) AS x_max,
        |  min(y) AS y_min, max(y) AS y_max
        |FROM f GROUP BY file_bin ORDER BY file_bin""".stripMargin,
    "c47_band_join" ->
      """WITH bands AS (SELECT r_name AS band,
        |    r_regionkey::BIGINT * 100 AS lo, r_regionkey::BIGINT * 100 + 149 AS hi
        |  FROM region)
        |SELECT band, doc_id, n_chars FROM bands JOIN documents
        |ON n_chars >= lo AND n_chars <= hi
        |ORDER BY band, doc_id""".stripMargin,
    "c50_retention_cohorts" ->
      """WITH ev AS (SELECT user_id, event_type,
        |              epoch_ns(ts) // 86400000000000 AS day FROM events),
        |sg AS (SELECT user_id, min(day) // 7 AS cohort_week
        |       FROM ev WHERE event_type = 'signup' GROUP BY user_id)
        |SELECT cohort_week, (day // 7) - cohort_week AS week_offset,
        |  count(DISTINCT ev.user_id) AS n_active
        |FROM ev JOIN sg ON ev.user_id = sg.user_id
        |WHERE (day // 7) - cohort_week BETWEEN 0 AND 3
        |GROUP BY cohort_week, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "c51_event_transitions" ->
      """WITH t AS (SELECT event_type,
        |             lead(event_type) OVER (PARTITION BY user_id
        |               ORDER BY epoch_ns(ts), event_id) AS to_type
        |           FROM events)
        |SELECT event_type AS from_type, to_type, count(*) AS n
        |FROM t WHERE to_type IS NOT NULL
        |GROUP BY event_type, to_type ORDER BY from_type, to_type""".stripMargin,
    "c49_funnel" ->
      """WITH sg AS (SELECT user_id, min(epoch_us(ts)) AS s_us
        |            FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |pu AS (SELECT user_id, epoch_us(ts) AS p_us
        |       FROM events WHERE event_type = 'purchase'),
        |fc AS (SELECT sg.user_id, sg.s_us,
        |         min(CASE WHEN p_us >= s_us THEN p_us END) AS conv_us
        |       FROM sg LEFT JOIN pu ON sg.user_id = pu.user_id
        |       GROUP BY sg.user_id, sg.s_us)
        |SELECT user_id % 4 AS cohort, count(*) AS n_signup_users,
        |  count(conv_us) AS n_converted,
        |  round(sum(conv_us - s_us)::DOUBLE / count(conv_us) / 1000000, 6)
        |    AS avg_conv_sec
        |FROM fc GROUP BY 1 ORDER BY cohort""".stripMargin,
    "c48_variant" ->
      """SELECT event_type, COUNT(*) AS n,
        |  SUM(CAST(json_extract_string(props, '$.k') AS INT))::BIGINT AS sum_k,
        |  MIN(CAST(json_extract_string(props, '$.k') AS INT))::INT AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS INT))::INT AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "c45_nth_value" ->
      """SELECT user_id, event_id, epoch_us(ts)::BIGINT AS ts_us,
        |  first_value(value) OVER w AS first_v,
        |  nth_value(value, 3) OVER w AS third_v,
        |  last_value(value) OVER w AS last_v
        |FROM events WHERE user_id % 50 = 0
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id, ts_us, event_id""".stripMargin,
    "c42_conditional_agg" ->
      """SELECT l_linestatus,
        |  count_if(l_discount > 0.05)::BIGINT AS n_discounted,
        |  bool_or(l_quantity >= 50) AS any_bulk,
        |  bool_and(l_quantity >= 1) AS all_nonzero,
        |  median(l_quantity) AS med_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "c34_gapfill" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 3600000000000 AS h, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, epoch_ns(ts) // 3600000000000
        |                       ORDER BY event_id DESC) AS rn
        |  FROM events WHERE user_id < 10),
        |last_per_hour AS (SELECT user_id, h, value FROM e WHERE rn = 1),
        |bounds AS (SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM last_per_hour GROUP BY user_id),
        |grid AS (SELECT user_id, unnest(generate_series(h0, h1)) AS h FROM bounds),
        |j AS (SELECT g.user_id, g.h, l.value, (l.value IS NOT NULL) AS observed
        |      FROM grid g LEFT JOIN last_per_hour l ON g.user_id = l.user_id AND g.h = l.h)
        |SELECT user_id, h, observed,
        |  last_value(value IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM j ORDER BY user_id, h""".stripMargin,
    "c52_dpp_join" ->
      """WITH li AS (SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
        |              l_extendedprice
        |            FROM lineitem),
        |dim AS (SELECT DISTINCT ship_month FROM li
        |        WHERE substring(ship_month, 1, 4) = '1996')
        |SELECT ship_month, count(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price
        |FROM li JOIN dim USING (ship_month)
        |GROUP BY ship_month ORDER BY ship_month""".stripMargin,
    "c53_rfm_segments" ->
      """WITH p AS (SELECT user_id, event_id, value FROM events
        |           WHERE event_type = 'purchase'),
        |rfm AS (SELECT user_id, max(event_id) AS recency_pos,
        |          count(*) AS frequency,
        |          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary
        |        FROM p GROUP BY user_id),
        |q AS (SELECT
        |        quantile_cont(recency_pos, 0.25) AS r1,
        |        quantile_cont(recency_pos, 0.5)  AS r2,
        |        quantile_cont(recency_pos, 0.75) AS r3,
        |        quantile_cont(frequency, 0.25) AS f1,
        |        quantile_cont(frequency, 0.5)  AS f2,
        |        quantile_cont(frequency, 0.75) AS f3,
        |        quantile_cont(monetary, 0.25) AS m1,
        |        quantile_cont(monetary, 0.5)  AS m2,
        |        quantile_cont(monetary, 0.75) AS m3
        |      FROM rfm),
        |sc AS (SELECT monetary,
        |         1 + (recency_pos > q.r1)::INT + (recency_pos > q.r2)::INT
        |           + (recency_pos > q.r3)::INT AS r_score,
        |         1 + (frequency > q.f1)::INT + (frequency > q.f2)::INT
        |           + (frequency > q.f3)::INT AS f_score,
        |         1 + (monetary > q.m1)::INT + (monetary > q.m2)::INT
        |           + (monetary > q.m3)::INT AS m_score
        |       FROM rfm CROSS JOIN q)
        |SELECT r_score, f_score, m_score, count(*) AS n_users,
        |  CAST(SUM(CAST(monetary AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_monetary
        |FROM sc GROUP BY r_score, f_score, m_score
        |ORDER BY r_score, f_score, m_score""".stripMargin,
    "c54_share_of_total" ->
      """WITH g AS (SELECT l_returnflag, l_linestatus,
        |             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
        |           FROM lineitem GROUP BY l_returnflag, l_linestatus)
        |SELECT l_returnflag, l_linestatus, rev::DOUBLE AS revenue,
        |  rev::DOUBLE / (SUM(rev) OVER (PARTITION BY l_returnflag))::DOUBLE
        |    AS share_of_flag,
        |  rev::DOUBLE / (SUM(rev) OVER ())::DOUBLE AS share_of_total
        |FROM g ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "c55_basket_lift" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM op),
        |sup AS (SELECT l_partkey, count(*) AS n_p FROM op GROUP BY l_partkey),
        |co AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_ab
        |       FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
        |         AND a.l_partkey < b.l_partkey
        |       GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT co.p1, co.p2, co.n_ab, sa.n_p AS n_a, sb.n_p AS n_b,
        |  (co.n_ab * n.n_orders)::DOUBLE / (sa.n_p * sb.n_p) AS lift
        |FROM co JOIN sup sa ON sa.l_partkey = co.p1
        |        JOIN sup sb ON sb.l_partkey = co.p2
        |        CROSS JOIN n
        |ORDER BY lift DESC, p1, p2 LIMIT 25""".stripMargin,
    "c56_funnel3" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |sg AS (SELECT user_id, min(us) AS s_us FROM ev
        |       WHERE event_type = 'signup' GROUP BY user_id),
        |fv AS (SELECT sg.user_id, sg.s_us,
        |         min(CASE WHEN v.us >= sg.s_us THEN v.us END) AS v_us
        |       FROM sg LEFT JOIN (SELECT user_id, us FROM ev
        |                          WHERE event_type = 'view') v
        |         ON v.user_id = sg.user_id
        |       GROUP BY sg.user_id, sg.s_us),
        |fp AS (SELECT fv.user_id, fv.s_us, fv.v_us,
        |         min(CASE WHEN p.us >= fv.v_us THEN p.us END) AS p_us
        |       FROM fv LEFT JOIN (SELECT user_id, us FROM ev
        |                          WHERE event_type = 'purchase') p
        |         ON p.user_id = fv.user_id
        |       GROUP BY fv.user_id, fv.s_us, fv.v_us)
        |SELECT user_id % 4 AS cohort, count(*) AS n_signup,
        |  count(v_us) AS n_viewed, count(p_us) AS n_converted,
        |  round(sum(CASE WHEN p_us IS NOT NULL THEN p_us - s_us END)::DOUBLE
        |    / count(p_us) / 1000000, 6) AS avg_conv_sec
        |FROM fp GROUP BY user_id % 4 ORDER BY cohort""".stripMargin,
    "c57_top_paths" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_ns(ts) AS ts_ns,
        |              event_type FROM events),
        |l AS (SELECT *, lag(ts_ns) OVER (PARTITION BY user_id
        |        ORDER BY ts_ns, event_id) AS prev FROM ev),
        |s AS (SELECT *, SUM(CASE WHEN prev IS NULL
        |          OR ts_ns - prev > 1800000000000 THEN 1 ELSE 0 END)
        |        OVER (PARTITION BY user_id ORDER BY ts_ns, event_id) AS sess
        |      FROM l),
        |p AS (SELECT user_id, sess,
        |        string_agg(event_type, '>' ORDER BY ts_ns, event_id) AS path
        |      FROM s GROUP BY user_id, sess)
        |SELECT path, count(*) AS n_sessions FROM p
        |GROUP BY path ORDER BY n_sessions DESC, path LIMIT 10""".stripMargin
  )
}
