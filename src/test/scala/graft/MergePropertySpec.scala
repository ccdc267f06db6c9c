package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.streaming.CdcStream

/** SURVEY §5.5 — merge algebra properties (scalacheck generators with fixed
  * seeds — the scalatest/scalacheck bridge artifact is not in the offline
  * cache, so sampling is driven manually): latest-wins merge is idempotent,
  * insensitive to input row order, and composable (merge of partial merges =
  * merge of the whole log). */
class MergePropertySpec extends SparkSpecBase {

  /** Deterministic forAll over n fixed seeds. */
  private def forSamples[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(fail(s"gen failed for seed $i")))
    }

  private val opGen = Gen.oneOf("INSERT", "UPDATE", "DELETE")
  private val eventGen = for {
    user <- Gen.choose(0L, 5L)
    op <- opGen
    value <- Gen.choose(0, 1000).map(_ / 10.0)
  } yield (op, user, value)

  private val logGen: Gen[List[(String, Long, Double)]] =
    Gen.listOfN(30, eventGen)

  private def df(log: Seq[(String, Long, Double)]) = {
    val rows = log.zipWithIndex.map { case ((op, u, v), i) =>
      Row(op, "users", i.toLong, i.toLong * 1000, u, v, "e")
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), CdcStream.envelopeSchema)
  }

  private def state(m: org.apache.spark.sql.DataFrame): Map[Long, (Long, Double)] =
    m.collect().map(r => r.getLong(4) -> (r.getLong(2), r.getDouble(5))).toMap

  private def referenceState(log: Seq[(String, Long, Double)]): Map[Long, (Long, Double)] =
    log.zipWithIndex
      .groupBy(_._1._2)
      .flatMap { case (u, evs) =>
        val (op, _, v) = evs.maxBy(_._2)._1
        val pos = evs.maxBy(_._2)._2.toLong
        if (op == "DELETE") None else Some(u -> (pos, v))
      }

  test("merge equals a sequential fold of the log (latest-wins)") {
    forSamples(logGen, 10) { log =>
      assert(state(Cdc.merge(df(log), Seq("user_id"))) === referenceState(log))
    }
  }

  test("merge is insensitive to input row order") {
    forSamples(logGen, 5) { log =>
      val shuffled = df(log).orderBy(org.apache.spark.sql.functions.rand(42))
      assert(state(Cdc.merge(shuffled, Seq("user_id"))) === referenceState(log))
    }
  }

  test("merge is idempotent: merge(merge(log) ∪ log) = merge(log)") {
    forSamples(logGen, 5) { log =>
      val once = Cdc.merge(df(log), Seq("user_id"))
      val again = Cdc.merge(once.unionByName(df(log)), Seq("user_id"))
      assert(state(again) === referenceState(log))
    }
  }

  test("merge composes over a log split (snapshot ∪ tail)") {
    forSamples(logGen, 5) { log =>
      val (a, b) = log.splitAt(log.length / 2)
      val partialA = Cdc.merge(df(log).filter(s"pos < ${a.length}"),
        Seq("user_id"), keepTombstones = true)
      val composed = Cdc.merge(
        partialA.drop("is_deleted").unionByName(df(log).filter(s"pos >= ${a.length}")),
        Seq("user_id"))
      assert(state(composed) === referenceState(log))
    }
  }
}
