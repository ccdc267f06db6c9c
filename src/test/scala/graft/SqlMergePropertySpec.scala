package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.plans.GraftMergeInto
import graft.streaming.{BucketedReplica, CdcStream}

/** Randomized equivalence of the two replica-maintenance surfaces on the
  * canonical in-order staged-batch flow: applying a changelog by
  * `BucketedReplica.commit` (Cdc.merge latest-wins) and by the literal
  * `MERGE INTO` SQL statement must produce the SAME STORED STATE —
  * tombstones included, since a matched DELETE's tombstone records the
  * deleting row (position and all) exactly like Cdc.merge. In-order means
  * each batch's positions exceed everything stored, which is what the
  * staging dedup guarantees in the real pipeline (out-of-order REPLAY
  * protection lives in Cdc.merge and is MergePropertySpec's subject; the
  * SQL surface matches on the live view, so feeding it genuinely stale
  * batches is out of contract). */
class SqlMergePropertySpec extends SparkSpecBase {

  private def forSamples[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(fail(s"gen failed for seed $i")))
    }

  private val eventGen = for {
    user <- Gen.choose(0L, 7L)
    op <- Gen.oneOf("INSERT", "UPDATE", "DELETE")
    value <- Gen.choose(0, 1000).map(_ / 10.0)
  } yield (op, user, value)

  private val logGen: Gen[List[(String, Long, Double)]] =
    Gen.listOfN(36, eventGen)

  private def df(log: Seq[(String, Long, Double)], posBase: Long): DataFrame = {
    val rows = log.zipWithIndex.map { case ((op, u, v), i) =>
      Row(op, "users", posBase + i, (posBase + i) * 1000, u, v, "e")
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), CdcStream.envelopeSchema)
  }

  /** Latest row per key of one batch — the staging dedup every MERGE
    * consumer runs first. */
  private def dedup(batch: DataFrame): DataFrame =
    batch.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("pos").desc)))
      .filter(col("rn") === 1).drop("rn")

  private def stored(rep: BucketedReplica): Set[String] =
    rep.read(spark).collect().map(_.toString).toSet

  test("commit-applied and SQL-MERGE-applied logs land on identical stored state") {
    forSamples(logGen, 6) { log =>
      val repA = new BucketedReplica(tmpDir("smp_a") + "/rep", nBuckets = 4)
      val repB = new BucketedReplica(tmpDir("smp_b") + "/rep", nBuckets = 4)
      val (seed0, rest) = log.splitAt(12)
      val (b1, b2) = rest.splitAt(12)
      repA.commit(df(seed0, 0)); repB.commit(df(seed0, 0))

      GraftMergeInto.register(spark, "smp_replica", repB)
      Seq(df(b1, 100), df(b2, 200)).foreach { batch =>
        repA.commit(batch)
        dedup(batch).createOrReplaceTempView("smp_staged")
        // the final clause inserts a DELETE row for a never-stored key AS
        // the tombstone itself — Cdc.merge's tombstone-retention behavior,
        // expressed in the SQL surface (first matching clause wins, so it
        // only fires when op = 'DELETE')
        spark.sql(
          """MERGE INTO smp_replica t USING smp_staged s ON t.user_id = s.user_id
            |WHEN MATCHED AND s.op = 'DELETE' AND s.pos > t.pos THEN DELETE
            |WHEN MATCHED AND s.pos > t.pos THEN UPDATE SET *
            |WHEN NOT MATCHED AND s.op != 'DELETE' THEN INSERT *
            |WHEN NOT MATCHED THEN INSERT *
            |""".stripMargin)
        assert(stored(repB) === stored(repA),
          "stored state diverged (tombstones included)")
      }
      GraftMergeInto.unregister("smp_replica")
      repA.destroy(); repB.destroy()
    }
  }

  test("the SQL MERGE composes into foreachBatch — the reference's periodic-merge deployment shape") {
    val root = tmpDir("smp_stream")
    val rep = new BucketedReplica(s"$root/rep", nBuckets = 4)
    GraftMergeInto.register(spark, "smp_stream_replica", rep)
    val log = logGen.apply(Gen.Parameters.default, Seed(99L)).get
    // land the changelog as three files → three micro-batches
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    log.grouped(12).zipWithIndex.foreach { case (chunk, i) =>
      val stage = s"$root/stage$i"
      df(chunk, i * 100L).coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(in, f"chunk-$i%05d.parquet").toPath)
    }
    val q = spark.readStream.schema(CdcStream.envelopeSchema)
      .option("maxFilesPerTrigger", 1).parquet(in)
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        dedup(batch).createOrReplaceTempView("smp_stream_staged")
        batch.sparkSession.sql(
          """MERGE INTO smp_stream_replica t USING smp_stream_staged s
            |ON t.user_id = s.user_id
            |WHEN MATCHED AND s.op = 'DELETE' AND s.pos > t.pos THEN DELETE
            |WHEN MATCHED AND s.pos > t.pos THEN UPDATE SET *
            |WHEN NOT MATCHED AND s.op != 'DELETE' THEN INSERT *
            |WHEN NOT MATCHED THEN INSERT *
            |""".stripMargin)
        ()
      }
      .start()
    q.awaitTermination()
    // the streamed periodic MERGE converges to the one-shot batch merge
    val expect = Cdc.merge(df(log.take(12), 0L)
        .unionByName(df(log.slice(12, 24), 100L))
        .unionByName(df(log.drop(24), 200L)),
      Seq("user_id"), keepTombstones = true).drop("is_deleted")
      .collect().map(_.toString).toSet
    assert(stored(rep) === expect)
    GraftMergeInto.unregister("smp_stream_replica")
  }
}
