package graft

import java.sql.DriverManager

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.streaming.JdbcSink

/** Randomized differential for the exactly-once JDBC sink: random batch
  * sequences — duplicate keys within a batch, out-of-order positions
  * across batches, tombstones — interleaved with random REPLAYS of
  * already-promoted batches and random CRASH simulations (a staged slice
  * whose promote never ran), checked after every step against
  * `Cdc.merge` over everything promoted so far. The fixed JdbcSinkSpec
  * scenarios pin each mechanism once; this walks their interleavings. */
class JdbcSinkPropertySpec extends SparkSpecBase {

  private def env(rows: Seq[(String, Long, Long, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("op", "pos", "user_id", "value")
      .select(col("op"), col("pos"), col("user_id"), col("value"),
        lit("e").as("event_type"))
  }

  private def liveRows(url: String, sink: JdbcSink): Set[(Long, Long, Double)] = {
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(sink.liveSql)
      val b = Set.newBuilder[(Long, Long, Double)]
      while (rs.next()) b += ((rs.getLong("user_id"), rs.getLong("pos"),
        rs.getDouble("value")))
      b.result()
    } finally c.close()
  }

  test("random batches with replays and crash-replays always equal Cdc.merge") {
    // row content is a pure function of (user, pos): a duplicate delivery
    // of the same change is byte-identical (as in real CDC), so every
    // tie-break — in the sink AND in the model — resolves to the same row
    def rowOf(user: Long, pos: Long): (String, Long, Long, Double) =
      (if ((user + pos) % 5 == 0) "DELETE" else "UPSERT", pos, user,
        ((user * 7 + pos * 13) % 100).toDouble)
    val batchGen: Gen[List[(String, Long, Long, Double)]] = for {
      n <- Gen.choose(1, 7)
      rows <- Gen.listOfN(n, for {
        user <- Gen.choose(0L, 9L)
        pos <- Gen.choose(1L, 50L)
      } yield rowOf(user, pos))
    } yield rows
    val stepGen: Gen[(String, List[(String, Long, Long, Double)])] = Gen.frequency(
      4 -> batchGen.map(("apply", _)),
      1 -> batchGen.map(("crash_then_apply", _)),
      1 -> Gen.const(("replay", Nil)))

    (1 to 5).foreach { run =>
      val url = s"jdbc:derby:memory:jsp_$run;create=true"
      val sink = new JdbcSink(url, "users")
      var applied = Vector.empty[DataFrame]
      var nextId = 0L
      val steps = Gen.listOfN(8, stepGen)
        .apply(Gen.Parameters.default, Seed(7000L + run)).get
      steps.zipWithIndex.foreach { case ((kind, rows), i) =>
        kind match {
          case "apply" =>
            val df = env(rows)
            assert(sink.applyBatch(df, nextId))
            applied :+= df; nextId += 1
          case "crash_then_apply" =>
            val df = env(rows)
            // crashed first attempt: slice staged, promote never ran
            sink.ensureTables(df.schema)
            df.withColumn("batch_id", lit(nextId)).write.mode("append")
              .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
              .jdbc(url, "users_staging", new java.util.Properties())
            assert(sink.applyBatch(df, nextId), s"run $run step $i crash-replay")
            applied :+= df; nextId += 1
          case "replay" if applied.nonEmpty =>
            val id = (7001L * run + i) % nextId // arbitrary promoted batch
            assert(!sink.applyBatch(applied(id.toInt), id),
              s"run $run step $i: replay of batch $id must be a ledger no-op")
          case _ => () // replay before any batch: nothing to do
        }
        if (applied.nonEmpty) {
          // latest-wins with the sink's ACROSS-batch tie rule: within a
          // batch dedupe keeps one row per (key, max pos); across batches
          // an equal position REPLACES (supersede uses >=), so the model
          // breaks position ties by latest batch id
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id"))
            .orderBy(col("pos").desc, col("__b").desc)
          val expected = applied.zipWithIndex
            .map { case (df, b) => df.withColumn("__b", lit(b)) }
            .reduce(_ unionByName _)
            .withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1 && col("op") =!= "DELETE")
            .collect().map(r => (r.getAs[Long]("user_id"),
              r.getAs[Long]("pos"), r.getAs[Double]("value"))).toSet
          assert(liveRows(url, sink) === expected,
            s"run $run step $i diverged after $kind")
        }
      }
    }
  }
}
