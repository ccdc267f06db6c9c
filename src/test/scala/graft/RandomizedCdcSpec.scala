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
    val rows = ids.map { eid =>
      (eid.toLong, eid.toLong * 1000000000L, rnd.nextInt(21).toLong,
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
}
