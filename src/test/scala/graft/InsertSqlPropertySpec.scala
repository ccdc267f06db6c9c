package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.streaming.{BucketedReplica, CdcStream}

/** Randomized differential for the catalog INSERT routing (plans/InsertInto)
  * and the graft_changes TVF: random sequences of change batches — out of
  * order, with duplicate deliveries and tombstones — are applied to one
  * replica via literal `INSERT INTO graft.…` statements and to a twin via
  * the programmatic `commit`, and after every step the live views must be
  * identical AND the SQL change feed between the last two versions must
  * equal the programmatic changeFeed. The fixed GraftCatalogSpec scenario
  * pins one path; this walks the delivery-order space. */
class InsertSqlPropertySpec extends SparkSpecBase {

  private case class R(op: String, pos: Long, user: Long, value: Double) {
    def toRow: Row = Row(op, "users", pos, pos * 1000, user, value, "e")
  }

  /** A step = one batch of rows over a small key space with random ops and
    * positions (collisions and replays included on purpose). */
  private val batchGen: Gen[List[R]] = for {
    n <- Gen.choose(1, 8)
    rows <- Gen.listOfN(n, for {
      user <- Gen.choose(0L, 11L)
      op <- Gen.frequency(4 -> Gen.const("UPSERT"), 1 -> Gen.const("DELETE"))
      pos <- Gen.choose(1L, 60L)
      v <- Gen.choose(0, 99)
    } yield R(op, pos, user, v.toDouble))
  } yield rows

  private def df(rows: Seq[R]): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(_.toRow): _*), CdcStream.envelopeSchema)

  private def liveSet(rep: BucketedReplica): Set[String] =
    rep.live(spark).collect().map(_.toString).toSet

  test("random batch sequences: SQL INSERT ≡ programmatic commit; SQL feed ≡ changeFeed") {
    val wh = tmpDir("isp_wh")
    spark.conf.set("spark.sql.catalog.graft_isp", "graft.plans.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_isp.root", wh)
    // the TVF resolves names under the canonical root conf
    spark.conf.set("spark.sql.catalog.graft.root", wh)
    (1 to 6).foreach { run =>
      val sqlRep = new BucketedReplica(s"$wh/ns/s$run", nBuckets = 4)
      val twin = new BucketedReplica(s"$wh/ns/t$run", nBuckets = 4)
      // the catalog resolves tables by their durable _META, which the first
      // commit writes — seed both identically so the name exists (v1)
      val seedBatch = Seq(R("UPSERT", 1L, 0L, 1.0), R("UPSERT", 1L, 5L, 2.0))
      sqlRep.commit(df(seedBatch)); twin.commit(df(seedBatch))
      val steps = Gen.listOfN(5, batchGen)
        .apply(Gen.Parameters.default, Seed(run.toLong)).get
      steps.zipWithIndex.foreach { case (batch, i) =>
        df(batch).createOrReplaceTempView("isp_staged")
        spark.sql(s"INSERT INTO graft_isp.ns.s$run SELECT * FROM isp_staged")
        twin.commit(df(batch))
        assert(liveSet(sqlRep) === liveSet(twin),
          s"run $run step $i: SQL INSERT diverged from commit\nbatch=$batch")
        val v = sqlRep.currentVersion.get
        if (v >= 2) {
          val sqlFeed = spark.sql(
            s"SELECT * FROM graft_changes('ns.s$run', ${v - 1}, $v)")
            .collect().map(_.toString).toSet
          val progFeed = twin.changeFeed(spark, v - 1, v)
            .collect().map(_.toString).toSet
          assert(sqlFeed === progFeed,
            s"run $run step $i: SQL change feed diverged from changeFeed")
        }
      }
      sqlRep.destroy(); twin.destroy()
    }
  }
}
