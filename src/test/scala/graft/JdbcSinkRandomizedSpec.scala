package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame
import graft.streaming.JdbcSink

/** Randomized multi-writer differential for the JDBC sink (the
  * NearDup/Bpe randomized-oracle pattern applied to the exactly-once
  * ledger): random batches under random 3-thread schedules — including
  * deliberate same-batch replays — must land the target table at exactly
  * the sequential latest-wins merge of the batch union, independent of
  * interleaving. This is the property the point-shaped concurrency tests
  * (JdbcSinkConcurrencySpec) sample; here the schedule space is sampled
  * broadly with a fixed seed. */
class JdbcSinkRandomizedSpec extends SparkSpecBase {

  private def env(rows: Seq[(String, Long, Long, Double, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("op", "pos", "user_id", "value", "event_type")
  }

  test("random batches × random 3-writer schedules (with replays) ≡ " +
    "the sequential latest-wins merge") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 0 until 3) {
      val url = s"jdbc:derby:memory:jsink_rand_$trial;create=true"
      var pos = 0L // globally unique positions keep the winner per key total
      val batches = (0 until 8).map { bid =>
        val nRows = 5 + rnd.nextInt(26)
        val rows = (0 until nRows).map { _ =>
          pos += 1
          val key = rnd.nextInt(25).toLong
          val op = if (rnd.nextInt(100) < 15) "DELETE" else "INSERT"
          (op, pos, key, rnd.nextDouble() * 100, s"t$trial")
        }
        bid.toLong -> env(rows)
      }
      // schedule: every batch once, plus ~3 replayed batchIds (zombie
      // retries), shuffled across a shared queue drained by 3 writers
      val replays = rnd.shuffle(batches).take(3)
      val tasks = new ConcurrentLinkedQueue[(Long, DataFrame)]()
      rnd.shuffle(batches ++ replays).foreach(t => tasks.add(t))
      val errors = new ConcurrentLinkedQueue[Throwable]()
      val writers = (0 until 3).map { _ =>
        new Thread(() => {
          val sink = new JdbcSink(url, "users") // own connections, like a driver
          var t = tasks.poll()
          while (t != null) {
            try sink.applyBatch(t._2, t._1)
            catch { case e: Throwable => errors.add(e) }
            t = tasks.poll()
          }
        })
      }
      writers.foreach(_.start())
      writers.foreach(_.join(180000))
      assert(errors.isEmpty,
        s"trial $trial: writers threw: ${errors.toArray.take(3).mkString("; ")}")

      // oracle: the order-free sequential merge of the distinct batches
      // (tombstone winners are RETAINED in the target; liveSql filters)
      val expected = Cdc.merge(batches.map(_._2).reduce(_ unionByName _),
          Seq("user_id"), keepTombstones = true).drop("is_deleted")
        .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("pos"),
          r.getAs[Double]("value"), r.getAs[String]("op"))).toSet
      val c = java.sql.DriverManager.getConnection(url)
      val got = try {
        val rs = c.createStatement()
          .executeQuery("SELECT user_id, pos, value, op FROM users")
        val b = Set.newBuilder[(Long, Long, Double, String)]
        while (rs.next())
          b += ((rs.getLong(1), rs.getLong(2), rs.getDouble(3), rs.getString(4)))
        b.result()
      } finally c.close()
      assert(got === expected,
        s"trial $trial diverged from the sequential merge " +
          s"(got ${got.size} rows, expected ${expected.size})")
      // exactly-once bookkeeping: all staging slices swept
      val c2 = java.sql.DriverManager.getConnection(url)
      val orphans = try {
        val rs = c2.createStatement()
          .executeQuery("SELECT COUNT(*) FROM users_staging")
        rs.next(); rs.getLong(1)
      } finally c2.close()
      assert(orphans === 0L, s"trial $trial: $orphans staging orphans survived")
    }
  }

  test("a staging table from the pre-attempt layout is widened in place " +
    "(attempt_id migration), not stranded") {
    val url = "jdbc:derby:memory:jsink_migrate;create=true"
    val c = java.sql.DriverManager.getConnection(url)
    try c.createStatement().execute( // the layout the pre-r9 sink provisioned
      "CREATE TABLE users_staging (op VARCHAR(1024), pos BIGINT, " +
        "user_id BIGINT, value DOUBLE, event_type VARCHAR(1024), batch_id BIGINT)")
    finally c.close()
    val sink = new JdbcSink(url, "users")
    assert(sink.applyBatch(env(Seq(("INSERT", 1L, 7L, 7.5, "t"))), 0L),
      "first batch against the legacy staging layout must promote")
    val c2 = java.sql.DriverManager.getConnection(url)
    val got = try {
      val rs = c2.createStatement()
        .executeQuery("SELECT user_id, pos, value FROM users")
      val b = Seq.newBuilder[(Long, Long, Double)]
      while (rs.next()) b += ((rs.getLong(1), rs.getLong(2), rs.getDouble(3)))
      b.result()
    } finally c2.close()
    assert(got === Seq((7L, 1L, 7.5)))
  }
}
