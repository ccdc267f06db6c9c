package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2 group D — streaming/CDC-specific operators, batch twins.
  *
  * The reference's merge job runs as a continuously-incremental pipeline
  * (reference: README.md:195-206, --enable-streaming-engine at :198). Spark
  * expresses the same operators once and runs them in either mode; the
  * DuckDB-oracle gate runs the batch form, and StreamingSpec drives the
  * identical logic through MemoryStream/Trigger.AvailableNow (D1/D2/D8/D9,
  * SURVEY §5.4 stream-batch equivalence).
  *
  * Event time comes from the nanosecond changelog (`ts_ns`); bucket math is
  * integer division on epoch-nanos, which both engines compute exactly.
  * Scale: every window/session groupBy shuffles once on (key, bucket); at
  * 100 TB the watermark bounds state, and buckets are monotonically closed.
  */
object StreamingOps {
  import Tables.load

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private val HOUR_NS = 3600L * 1000 * 1000 * 1000

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // D3 tumbling window — change volume per hour (ops reporting over the
    // changelog; the staging dataset exists for this, reference README.md:204).
    // Uses Spark's native window() operator on the microsecond timestamp.
    "d3_tumbling_window" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast(DoubleType).as("sum_value"))
        .select(col("window.start").cast(LongType).as("wstart_s"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("wstart_s", "event_type")
    },
    // D4 sliding window — 1h window sliding 30min: each event lands in 2
    // windows (Spark expands via the same window() operator).
    "d4_sliding_window" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast(DoubleType).as("sum_value"))
        .select(col("window.start").cast(LongType).as("wstart_s"),
          col("n"), col("sum_value"))
        .orderBy("wstart_s")
    },
    // D5 session window — burst-of-changes sessionization per user with a
    // 30-minute gap (events fixture carries user_id/ts, SURVEY D5).
    "d5_session_window" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast(DoubleType).as("sum_value"))
        .select(col("user_id"),
          col("session_window.start").cast(LongType).as("session_start_s"),
          col("n"), col("sum_value"))
        .orderBy("user_id", "session_start_s")
    },
    // D5 dynamic-gap session window — the gap depends on the event itself
    // (a purchase keeps the session alive 1h, anything else 15min): each
    // event extends its session to [ts, ts+gap(event)) and overlapping
    // windows merge. Oracle: island detection with a RUNNING MAX of prior
    // session ends (a fixed gap degenerates to the d5 lag check; a dynamic
    // one does not — a long-gap event can bridge past a short-gap one).
    "d5b_session_dynamic" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"),
          when(col("event_type") === "purchase", lit("1 hour"))
            .otherwise(lit("15 minutes"))), col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast(DoubleType).as("sum_value"))
        .select(col("user_id"),
          col("session_window.start").cast(LongType).as("session_start_s"),
          col("n"), col("sum_value"))
        .orderBy("user_id", "session_start_s")
    },
    // D6 dedup under at-least-once delivery — Pub/Sub redelivery semantics
    // (reference main.tf:169-175): a re-delivered batch (every 7th event)
    // collapses back to exactly-once by event_id.
    "d6_dedup" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val redelivered = ev.filter(col("event_id") % 7 === 0)
      ev.union(redelivered)
        .dropDuplicates("event_id")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast(DoubleType).as("sum_value"))
        .orderBy("event_type")
    },
    // D10 as-of join — for every error event, the latest preceding purchase
    // by the same user. Implemented as the union-scan pattern (one window
    // pass carrying the last purchase forward), NOT a band join: no pair
    // explosion, one shuffle by user — the as-of plan that scales. The
    // oracle is DuckDB's native ASOF JOIN, so our composition is checked
    // against a first-class as-of implementation.
    "d10_asof_join" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("last_purchase_pos",
          last(when(col("event_type") === "purchase", col("event_id")), ignoreNulls = true).over(w))
        .withColumn("last_purchase_value",
          last(when(col("event_type") === "purchase", col("value")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "error" && col("last_purchase_pos").isNotNull)
        .select(col("user_id"), col("event_id").as("error_pos"),
          col("last_purchase_pos"), col("last_purchase_value"))
        .orderBy("user_id", "error_pos")
    },
    // D10b — the same as-of semantics through the custom operator
    // (AsofJoinPlan logical node → BroadcastAsofJoinStrategy →
    // BroadcastAsofJoinExec): broadcast the purchase timeline per user,
    // binary-search per error row. The regime complement of d10's
    // union-scan (big probe × dimension-sized versioned reference, probe
    // never shuffles); identical answers, same DuckDB ASOF oracle.
    "d10b_asof_custom" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select("user_id", "event_id", "ts_ns", "event_type", "value")
      val errors = ev.filter(col("event_type") === "error")
      val purchases = ev.filter(col("event_type") === "purchase")
      graft.plans.AsofJoin
        .broadcastAsof(errors, purchases, "user_id", "ts_ns", "event_id")
        .select(col("user_id"), col("event_id").as("error_pos"),
          col("ref_event_id").as("last_purchase_pos"),
          col("ref_value").as("last_purchase_value"))
        .orderBy("user_id", "error_pos")
    },
    // D7 stream–static join — enrich the change stream with a dimension
    // table; the static side broadcasts (no stream state), the plan that
    // holds at any stream scale.
    // D10 forward variant — next-event-after as-of (time-to-recovery: the
    // first purchase strictly after each error). No new operator needed:
    // backward as-of under time negation IS forward as-of — probe at
    // -(t+1) (micros domain, shared exactly with the oracle) and negate
    // the ref's time and tie columns, so "greatest ≤, ties by greatest"
    // becomes "smallest >, ties by smallest". Same broadcast economics as
    // d10b: the purchase side broadcasts, the error stream never shuffles.
    "d10c_asof_forward" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .select("user_id", "event_id", "ts_us", "event_type", "value")
      val errors = ev.filter(col("event_type") === "error")
        .withColumn("ts_neg", -(col("ts_us") + 1))
      val purchases = ev.filter(col("event_type") === "purchase")
        .withColumn("ts_neg", -col("ts_us"))
        .withColumn("eid_neg", -col("event_id"))
      graft.plans.AsofJoin
        .broadcastAsof(errors, purchases, "user_id", "ts_neg", "eid_neg")
        .select(col("user_id"), col("event_id").as("error_pos"),
          col("ref_event_id").as("next_purchase_pos"),
          col("ref_value").as("next_purchase_value"))
        .orderBy("user_id", "error_pos")
    },
    // D11 batch twin of the stream-stream attribution join
    // (StreamStreamJoinSpec): purchases credited to a signup of the same
    // user within 1 hour after it. The time band lives in the shared exact
    // microsecond domain; left join keeps unconverted signups with NULL
    // sums. In the streaming form both sides are watermarked and the band
    // bounds the join state — here the same condition is one equi+band
    // sort-merge join (user equi key carries the shuffle; the band is a
    // post-join predicate on co-partitioned rows, no extra exchange).
    "d11_interval_join" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .withColumn("ts_us", expr("ts_ns div 1000"))
      val sg = ev.filter(col("event_type") === "signup")
        .select(col("user_id").as("s_user"),
          col("event_id").as("signup_pos"), col("ts_us").as("s_us"))
      val pu = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts_us").as("p_us"),
          col("value"))
      sg.join(pu,
          col("s_user") === col("p_user") &&
            col("p_us") >= col("s_us") &&
            col("p_us") <= col("s_us") + lit(3600000000L), "left")
        .groupBy(col("s_user"), col("signup_pos"))
        .agg(count(col("p_us")).as("n_purchases_1h"),
          sum(col("value").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("sum_value"))
        .select(col("s_user").as("user_id"), col("signup_pos"),
          col("n_purchases_1h"), col("sum_value"))
        .orderBy("user_id", "signup_pos")
    },
    "d7_stream_static_join" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val c = load(s, d, "customer")
      ev.join(broadcast(c), ev("user_id") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast(DoubleType).as("sum_value"))
        .orderBy("c_mktsegment")
    },
    // D12 watermark lateness audit, batch twin — how much data a 10-min
    // watermark WOULD drop, measured per source partition (user_id%8
    // stands in for the Kafka partition; real watermarks advance per
    // partition and the global watermark is their min — exactly this
    // dataflow). Per partition: running max event time in arrival order
    // (event_id), a row is late when it trails that max by > 10 min. One
    // window per source partition — arrival order is only ever needed
    // WITHIN a partition, so nothing global is sorted.
    "d12_late_audit" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("src_part")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val lateUs = 600000000L // 10 min; micros = the shared exact domain
      Tables.events(s, d)
        .select(pmod(col("user_id"), lit(8L)).as("src_part"),
          col("event_id"), expr("ts_ns div 1000").as("ts_us"))
        .withColumn("run_max", max(col("ts_us")).over(w))
        .withColumn("late", (col("ts_us") < col("run_max") - lateUs).cast("int"))
        .groupBy(col("src_part"))
        .agg(count(lit(1)).as("n_events"), sum(col("late")).as("n_late"),
          max(col("ts_us")).as("max_ts_us"))
        .orderBy("src_part")
    },
    // D-series monitoring — WINDOWED drift: per event-time hour, the PSI
    // of that window's event_type distribution against the whole stream's
    // reference distribution — e97's drift statistic turned into the
    // per-window monitor a pipeline alerts on ("which hour drifted?").
    // Same engine-invariance recipe as e97: Laplace +1 shares as exact
    // BIGINT parts-per-billion (clamped at ppb=1 so absent types under a
    // >1e9-event window floor instead of hitting ln(0)), ln over
    // identical integer-valued doubles, per-term round 6 into
    // DECIMAL(18,6), order-free window sum — and the DECIMAL stays
    // internal: the output casts psi to DOUBLE (correctly rounded from
    // the same exact decimal on both engines), keeping the output
    // surface on canonical types. Absent
    // (window, type) cells still contribute their smoothed term — the
    // window×type frame is a cross join of two tiny dimension sets.
    // Scale: one (hour, type) count agg over the stream + |windows|·|types|
    // frame math; reference totals broadcast. The TRUE streaming form
    // (single-aggregate, reference broadcast as literals) is
    // [[graft.streaming.CdcStream.psiDrift]], spec-driven through
    // MemoryStream; this batch form is the oracle-gated semantics anchor.
    "d13_window_psi" -> { (s, d) =>
      val HOUR = 3600L * 1000 * 1000 * 1000
      val ev = Tables.events(s, d)
        .select(expr(s"ts_ns div $HOUR").as("hb"), col("event_type"))
      val ref = ev.groupBy(col("event_type")).agg(count(lit(1)).as("g"))
      val tot = ref.agg(sum(col("g")).as("gt"), count(lit(1)).as("k"))
      val wn = ev.groupBy(col("hb")).agg(count(lit(1)).as("n_events"))
      val frame = wn.crossJoin(broadcast(ref.select(col("event_type"))))
      val wc = ev.groupBy(col("hb"), col("event_type")).agg(count(lit(1)).as("c"))
      frame.join(wc, Seq("hb", "event_type"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
        .join(broadcast(ref), "event_type")
        .crossJoin(broadcast(tot))
        .select(col("hb"), col("n_events"),
          expr("greatest((c + 1) * 1000000000L div (n_events + k), 1L)")
            .as("p_ppb"),
          expr("greatest((g + 1) * 1000000000L div (gt + k), 1L)")
            .as("q_ppb"))
        .select(col("hb"), col("n_events"),
          round(((col("p_ppb") - col("q_ppb")).cast(DoubleType) / lit(1e9))
              * (log(col("p_ppb").cast(DoubleType))
                - log(col("q_ppb").cast(DoubleType))), 6)
            .cast(DecimalType(18, 6)).as("t"))
        .groupBy(col("hb"))
        .agg(max(col("n_events")).as("n_events"),
          sum(col("t")).cast(DecimalType(28, 6)).as("psi"))
        .select(col("hb").as("window_hour"), col("n_events"),
          col("psi").cast(DoubleType).as("psi"))
        .orderBy("window_hour")
    }
  )

  val oracleSql: Map[String, String] = Map(
    "d3_tumbling_window" ->
      """SELECT epoch_ns(ts) // 3600000000000 * 3600 AS wstart_s, event_type,
        |  COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY wstart_s, event_type""".stripMargin,
    "d4_sliding_window" ->
      """WITH b AS (SELECT epoch_ns(ts) // 1800000000000 * 1800 AS b0, value FROM events),
        |w AS (SELECT b0 AS ws, value FROM b UNION ALL SELECT b0 - 1800 AS ws, value FROM b)
        |SELECT ws AS wstart_s, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM w GROUP BY ws ORDER BY ws""".stripMargin,
    "d5_session_window" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tu, value FROM events),
        |l AS (SELECT *, LAG(tu) OVER (PARTITION BY user_id ORDER BY tu) AS ptu FROM e),
        |f AS (SELECT *, CASE WHEN ptu IS NULL OR tu - ptu >= 1800000000 THEN 1 ELSE 0 END AS news FROM l),
        |g AS (SELECT *, SUM(news) OVER (PARTITION BY user_id ORDER BY tu
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM f)
        |SELECT user_id, MIN(tu) // 1000000 AS session_start_s, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM g GROUP BY user_id, sid ORDER BY user_id, session_start_s""".stripMargin,
    "d5b_session_dynamic" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tu, value,
        |    CASE WHEN event_type = 'purchase' THEN 3600000000 ELSE 900000000 END AS g
        |  FROM events),
        |l AS (SELECT *, MAX(tu + g) OVER (PARTITION BY user_id ORDER BY tu
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pend FROM e),
        |f AS (SELECT *, CASE WHEN pend IS NULL OR tu >= pend THEN 1 ELSE 0 END AS news FROM l),
        |s AS (SELECT *, SUM(news) OVER (PARTITION BY user_id ORDER BY tu
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM f)
        |SELECT user_id, MIN(tu) // 1000000 AS session_start_s, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start_s""".stripMargin,
    "d6_dedup" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "d10_asof_join" ->
      """SELECT e.user_id AS user_id, e.event_id AS error_pos,
        |  p.event_id AS last_purchase_pos, p.value AS last_purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY user_id, error_pos""".stripMargin,
    "d10b_asof_custom" ->
      """SELECT e.user_id AS user_id, e.event_id AS error_pos,
        |  p.event_id AS last_purchase_pos, p.value AS last_purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY user_id, error_pos""".stripMargin,
    // window-form twin (not ASOF JOIN): deterministic tie-breaking by
    // (ts, event_id) is explicit, in the shared microsecond domain
    "d10c_asof_forward" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
        |           FROM events WHERE event_type = 'error'),
        |p AS (SELECT user_id, event_id, value, epoch_us(ts) AS ts_us
        |      FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT e.user_id, e.event_id AS error_pos,
        |        p.event_id AS next_purchase_pos, p.value AS next_purchase_value,
        |        ROW_NUMBER() OVER (PARTITION BY e.user_id, e.event_id
        |                           ORDER BY p.ts_us, p.event_id) AS rn
        |      FROM e JOIN p ON e.user_id = p.user_id AND p.ts_us > e.ts_us)
        |SELECT user_id, error_pos, next_purchase_pos, next_purchase_value
        |FROM j WHERE rn = 1 ORDER BY user_id, error_pos""".stripMargin,
    "d11_interval_join" ->
      """WITH s AS (SELECT user_id, event_id AS signup_pos, epoch_us(ts) AS s_us
        |           FROM events WHERE event_type = 'signup'),
        |p AS (SELECT user_id, epoch_us(ts) AS p_us, value
        |      FROM events WHERE event_type = 'purchase')
        |SELECT s.user_id, s.signup_pos, count(p.p_us) AS n_purchases_1h,
        |  CAST(SUM(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s LEFT JOIN p ON s.user_id = p.user_id
        |  AND p.p_us >= s.s_us AND p.p_us <= s.s_us + 3600000000
        |GROUP BY s.user_id, s.signup_pos
        |ORDER BY s.user_id, s.signup_pos""".stripMargin,
    "d7_stream_static_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "d12_late_audit" ->
      """WITH ev AS (SELECT user_id % 8 AS src_part, event_id,
        |              epoch_us(ts) AS ts_us FROM events),
        |r AS (SELECT *, MAX(ts_us) OVER (PARTITION BY src_part
        |        ORDER BY event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_max
        |      FROM ev)
        |SELECT src_part, COUNT(*) AS n_events,
        |  SUM(CASE WHEN ts_us < run_max - 600000000 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_late,
        |  MAX(ts_us) AS max_ts_us
        |FROM r GROUP BY src_part ORDER BY src_part""".stripMargin,
    // e97's exact-ppb recipe per hour window; absent cells contribute
    // their smoothed term via the window x type cross frame
    "d13_window_psi" ->
      """WITH ev AS (SELECT epoch_ns(ts) // 3600000000000 AS hb, event_type
        |            FROM events),
        |ref AS (SELECT event_type, COUNT(*)::BIGINT AS g FROM ev GROUP BY event_type),
        |tot AS (SELECT SUM(g)::BIGINT AS gt, COUNT(*) AS k FROM ref),
        |wn AS (SELECT hb, COUNT(*)::BIGINT AS n_events FROM ev GROUP BY hb),
        |wc AS (SELECT hb, event_type, COUNT(*)::BIGINT AS c
        |       FROM ev GROUP BY hb, event_type),
        |fr AS (SELECT wn.hb, wn.n_events, ref.event_type, ref.g,
        |         COALESCE(wc.c, 0) AS c
        |       FROM wn CROSS JOIN ref
        |       LEFT JOIN wc ON wc.hb = wn.hb AND wc.event_type = ref.event_type),
        |t AS (SELECT hb, n_events,
        |        GREATEST((c + 1) * 1000000000
        |          // (n_events + (SELECT k FROM tot)), 1) AS p_ppb,
        |        GREATEST((g + 1) * 1000000000
        |          // ((SELECT gt FROM tot) + (SELECT k FROM tot)), 1) AS q_ppb
        |      FROM fr),
        |s AS (SELECT hb, n_events,
        |        CAST(round((p_ppb - q_ppb)::DOUBLE / 1000000000.0
        |          * (ln(p_ppb::DOUBLE) - ln(q_ppb::DOUBLE)), 6)
        |          AS DECIMAL(18,6)) AS t
        |      FROM t)
        |SELECT hb AS window_hour, MAX(n_events) AS n_events,
        |  CAST(SUM(t) AS DECIMAL(28,6))::DOUBLE AS psi
        |FROM s GROUP BY hb ORDER BY window_hour""".stripMargin
  )
}
