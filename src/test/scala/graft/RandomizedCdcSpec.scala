package graft

/** Randomized differential tests over a GENERATED events fixture (ts written
  * as a raw epoch-nano Long — the same shape the nanosAsLong read path
  * yields from the driver corpus): the temporal join and the Bloom
  * prefilter are re-checked against independent plain-Scala references on
  * data the fixed fixtures never exercise. */
class RandomizedCdcSpec extends SparkSpecBase {

  private val types = Seq("signup", "view", "purchase", "error", "click")

  private lazy val dir: String = {
    val rnd = new scala.util.Random(7)
    val n = 400
    val ids = rnd.shuffle((1 to n).toList)
    // ±45 min jitter so event time is NOT monotone in arrival order —
    // otherwise the watermark-lateness differential would be vacuous
    val rows = ids.map { eid =>
      (eid.toLong,
        eid.toLong * 1000000000L + (rnd.nextInt(5400) - 2700) * 1000000000L,
        rnd.nextInt(21).toLong,
        types(rnd.nextInt(types.size)),
        math.rint(rnd.nextDouble() * 10000) / 100.0,
        """{"k":1}""")
    }
    val d = tmpDir("rand_cdc")
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    spark.read.parquet(s"$d/events.parquet") // force visible
    d
  }

  private lazy val raw: Seq[(Long, Long, String, Double)] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/events.parquet")
      .select("event_id", "user_id", "event_type", "value")
      .as[(Long, Long, String, Double)].collect().toSeq
  }

  private lazy val rawTs: Seq[(Long, Long, Long, String)] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/events.parquet")
      .select("event_id", "ts", "user_id", "event_type")
      .as[(Long, Long, Long, String)].collect().toSeq
  }

  test("b17 temporal join matches a plain-Scala as-of reference on a random changelog") {
    val chg = raw.map { case (eid, uid, tpe, v) =>
      val op = tpe match {
        case "signup" => "INSERT"; case "error" => "DELETE"; case _ => "UPDATE"
      }
      (uid, eid, op, v) // (user, pos, op, value)
    }
    val byUser = chg.groupBy(_._1).map { case (u, rows) =>
      u -> rows.sortBy(_._2)
    }
    val expected = (for {
      (eid, uid, tpe, v) <- raw if tpe == "purchase"
      versions <- byUser.get(uid).toSeq
      ver <- versions.filter(_._2 <= eid).lastOption.toSeq
    } yield (uid, eid, v, ver._2, ver._3, ver._4)).toSet

    val got = SparkEntry.queries("b17_temporal_join")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getString(4), r.getDouble(5))).toSet
    assert(expected.nonEmpty, "generator must produce joined facts")
    assert(got === expected)
  }

  test("e60 bloom prefilter has zero false negatives on random keys") {
    val bad = raw.collect { case (_, uid, "error", _) if uid % 7 == 0 => uid }.toSet
    val cand = raw.collect { case (_, uid, "purchase", _) => uid }.toSet
    val expectedTrue = (bad & cand).size.toLong

    val row = SparkEntry.queries("e60_bloom_prefilter")(spark, dir).collect().head
    val (nCand, nPass, nTrue) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nCand === cand.size.toLong)
    // no false negatives: every true member of the deny set passes
    assert(nTrue === expectedTrue)
    assert(nPass >= nTrue && nPass <= nCand)
  }

  test("c56 three-step funnel matches a plain-Scala reference on random events") {
    // micros domain, as the query computes it
    val evs = rawTs.map { case (eid, ts, uid, tpe) => (uid, ts / 1000, tpe) }
    val byUser = evs.groupBy(_._1)
    case class F(s: Long, v: Option[Long], p: Option[Long])
    val funnels = byUser.flatMap { case (uid, rows) =>
      val sg = rows.collect { case (_, us, "signup") => us }
      if (sg.isEmpty) None
      else {
        val s = sg.min
        val v = rows.collect { case (_, us, "view") if us >= s => us }
          .minOption
        val p = v.flatMap(vv =>
          rows.collect { case (_, us, "purchase") if us >= vv => us }.minOption)
        Some(uid -> F(s, v, p))
      }
    }
    val expected = funnels.groupBy(_._1 % 4).map { case (cohort, fs) =>
      val l = fs.values.toSeq
      val conv = l.flatMap(f => f.p.map(_ - f.s))
      val avg =
        if (conv.isEmpty) null
        else java.math.BigDecimal.valueOf(conv.sum.toDouble / conv.size / 1e6)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      (cohort, l.size.toLong, l.count(_.v.isDefined).toLong,
        conv.size.toLong, avg)
    }.toSet
    val got = SparkEntry.queries("c56_funnel3")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) null else r.getDouble(4))).toSet
    assert(got === expected)
  }

  test("b18 op-legality audit matches a plain-Scala reference on random events") {
    val byUser = raw.map { case (eid, uid, tpe, _) =>
      val op = tpe match {
        case "signup" => "INSERT"; case "error" => "DELETE"; case _ => "UPDATE"
      }
      (uid, eid, op)
    }.groupBy(_._1)
    val violations = byUser.values.flatMap { rows =>
      val sorted = rows.sortBy(_._2)
      sorted.zip(None +: sorted.map(r => Some(r._3))).flatMap {
        case ((_, pos, op), prev) =>
          val v = (op, prev) match {
            case ("INSERT", Some(p)) if p != "DELETE" => Some("insert_on_live")
            case ("UPDATE", None) => Some("update_on_dead")
            case ("UPDATE", Some("DELETE")) => Some("update_on_dead")
            case ("DELETE", None) => Some("delete_on_dead")
            case ("DELETE", Some("DELETE")) => Some("delete_on_dead")
            case _ => None
          }
          v.map(_ -> pos)
      }
    }.toSeq
    val expected = violations.groupBy(_._1).map { case (v, ps) =>
      (v, ps.size.toLong, ps.map(_._2).min, ps.map(_._2).max)
    }.toSet
    val got = SparkEntry.queries("b18_op_legality")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(expected.nonEmpty, "generator must produce violations")
    assert(got === expected)
  }

  test("d12 lateness audit matches a plain-Scala reference on jittered times") {
    val lateUs = 600000000L
    val expected = rawTs.map { case (eid, ts, uid, _) => (uid % 8, eid, ts / 1000) }
      .groupBy(_._1).map { case (part, rows) =>
        val inArrival = rows.sortBy(_._2).map(_._3)
        val runMax = inArrival.scanLeft(Long.MinValue)(math.max).tail
        val nLate = inArrival.zip(runMax).count { case (ts, m) => ts < m - lateUs }
        (part, rows.size.toLong, nLate.toLong, inArrival.max)
      }.toSet
    val got = SparkEntry.queries("d12_late_audit")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(expected.exists(_._3 > 0), "jitter must produce at least one late row")
    assert(got === expected)
  }

  /** Largest per-task shuffle-read row count observed while running
    * `action` — the direct measurement of reducer skew (a hot key's rows
    * all landing in one task shows up here, where per-operator SQL metric
    * totals would hide it). */
  private def maxTaskShuffleRead(action: => Unit): Long = {
    val maxRecs = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null)
          maxRecs.getAndUpdate(cur => math.max(cur, m.shuffleReadMetrics.recordsRead))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      action
      // the listener bus is async: poll until the max stabilizes
      var prev = -1L
      var settled = 0
      while (settled < 3) {
        Thread.sleep(200)
        val cur = maxRecs.get()
        if (cur == prev) settled += 1 else { settled = 0; prev = cur }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    maxRecs.get()
  }

  test("b7 salted merge bounds the max-task input under a pathologically hot key") {
    // skewed changelog: one key owns 80% of 60k rows — the distribution
    // that breaks a window-per-key merge at scale
    val n = 60000
    val rnd = new scala.util.Random(20260813)
    import spark.implicits._
    val skewDir = tmpDir("rand_skew")
    (1 to n).map { eid =>
      val uid = if (rnd.nextInt(10) < 8) 1L else 2L + rnd.nextInt(500)
      val tpe = types(rnd.nextInt(types.size))
      (eid.toLong, eid.toLong * 1000000000L, uid, tpe,
        math.rint(rnd.nextDouble() * 10000) / 100.0, """{"k":1}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(8) // several map tasks, as a real scan would have
      .write.mode("overwrite").parquet(s"$skewDir/events.parquet")
    val hot = spark.read.parquet(s"$skewDir/events.parquet")
      .filter($"user_id" === 1L).count()

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // correctness first: salted two-phase ≡ the windowed latest-wins merge
    val salted = SparkEntry.queries("b7_merge_salted")(spark, skewDir)
    val windowed = Cdc.merge(Cdc.changelog(spark, skewDir), Seq("user_id"))
      .select($"user_id", $"pos".as("last_pos"), $"value".as("last_value"))
    assert(salted.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      === windowed.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet)

    // skew, measured three ways:
    //  (1) the NAIVE window plan (rank-limit pushdown disabled) funnels
    //      every hot-key row into ONE task — the failure mode salting
    //      exists for;
    //  (2) Spark 4's own WindowGroupLimit mitigates rn=1 merges by keeping
    //      only the per-key top row map-side — worth pinning, because the
    //      plain Cdc.merge leans on it at scale;
    //  (3) the salted two-phase agg bounds the reducer independently of
    //      any rank-limit pushdown (partial aggregation caps what any
    //      reducer sees at keys × salts × map-task partials) — the form
    //      that generalizes to aggregates no group-limit can rescue.
    val maxNaive = {
      spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "-1")
      try maxTaskShuffleRead(noop(windowed))
      finally spark.conf.unset("spark.sql.optimizer.windowGroupLimitThreshold")
    }
    val maxWindowed = maxTaskShuffleRead(noop(windowed))
    val maxSalted = maxTaskShuffleRead(noop(salted))
    assert(maxNaive >= hot,
      s"naive window merge should concentrate the hot key: max-task read " +
        s"$maxNaive < hot $hot — generator or measurement broken")
    assert(maxSalted * 4 <= maxNaive,
      s"salted plan not bounded: max-task read $maxSalted vs naive " +
        s"$maxNaive (hot=$hot)")
    assert(maxWindowed * 4 <= maxNaive,
      s"WindowGroupLimit stopped engaging for the rn=1 merge: " +
        s"$maxWindowed vs naive $maxNaive — the plain merge would " +
        "concentrate hot keys at scale")
    info(s"measured max-task shuffle reads: naive=$maxNaive " +
      s"windowGroupLimit=$maxWindowed salted=$maxSalted hot=$hot n=$n")
  }

  test("c57 top paths matches a plain-Scala sessionizer on jittered times") {
    val gapNs = 1800000000000L
    val paths = rawTs.map { case (eid, ts, uid, tpe) => (uid, ts, eid, tpe) }
      .groupBy(_._1).values.flatMap { rows =>
        val ordered = rows.toSeq.sortBy(r => (r._2, r._3))
        // gap-split into sessions, emit one ">"-joined path per session
        val sessions = ordered.foldLeft(List.empty[List[(Long, Long, String)]]) {
          case (acc, (_, ts, eid, tpe)) =>
            acc match {
              case (cur @ ((lastTs, _, _) :: _)) :: rest
                if ts - lastTs <= gapNs =>
                ((ts, eid, tpe) :: cur) :: rest
              case _ => List((ts, eid, tpe)) :: acc
            }
        }
        sessions.map(_.reverse.map(_._3).mkString(">"))
      }.toSeq
    val expected = paths.groupBy(identity).map { case (p, l) => (p, l.size.toLong) }
      .toSeq.sortBy { case (p, n) => (-n, p) }.take(10)
    val got = SparkEntry.queries("c57_top_paths")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // long random sessions rarely repeat exactly — the differential rides
    // on the count-desc, path-asc total order either way
    assert(expected.size === 10, "generator must produce enough sessions")
    assert(got === expected)
  }
}
