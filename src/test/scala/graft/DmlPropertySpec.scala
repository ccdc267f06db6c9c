package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.streaming.{BucketedReplica, CdcStream}

/** Randomized differential for the SQL row-level DML surface
  * (plans/GraftDeleteUpdate): random interleavings of change-batch
  * commits, `DELETE FROM … WHERE <random predicate>`, and
  * `UPDATE … SET <random assignments> WHERE <random predicate>` against a
  * catalog replica, checked after EVERY action against an independent
  * local model (plain Scala map — no Catalyst code shared with the path
  * under test). The fixed DeleteUpdateSqlSpec scenarios pin one flow;
  * this walks the predicate × assignment × interleaving space, including
  * the interaction the fixed tests cannot: commits arriving BETWEEN DML
  * statements, with positions racing the tombstones DML wrote. */
class DmlPropertySpec extends SparkSpecBase {

  // model row: user -> (op, pos, value, event_type); tbl/ts_ns derived
  private type State = Map[Long, (String, Long, Double, String)]

  private case class Pred(sql: String, f: (Long, Double, String) => Boolean)
  private case class Setter(sql: String, f: (Double, String) => (Double, String))

  private val preds = Vector(
    Pred("value >= 50", (_, v, _) => v >= 50),
    Pred("user_id % 3 = 1", (u, _, _) => u % 3 == 1),
    Pred("event_type = 'a'", (_, _, e) => e == "a"),
    Pred("value < 25 OR user_id % 4 = 0", (u, v, _) => v < 25 || u % 4 == 0),
    Pred("value > 200", (_, v, _) => v > 200)) // usually empty subject set

  private val setters = Vector(
    Setter("value = value * 2 + 1", (v, e) => (v * 2 + 1, e)),
    Setter("value = 0", (_, e) => (0.0, e)),
    Setter("event_type = concat(event_type, '!')", (v, e) => (v, e + "!")),
    Setter("value = value + 1, event_type = 'x'", (v, _) => (v + 1, "x")))

  // Positions are handed out uniquely per run (no latest-wins ties — tie
  // order is storage-internal and not what this spec tests).
  test("random commit/DELETE/UPDATE interleavings match the local model") {
    val wh = tmpDir("dmlp_wh")
    spark.conf.set("spark.sql.catalog.graft_dmlp", "graft.plans.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_dmlp.root", wh)
    (1 to 6).foreach { run =>
      var pos = 0L
      def nextPos(): Long = { pos += 1; pos }
      val rep = new BucketedReplica(s"$wh/ns/r$run", nBuckets = 4)
      var model: State = Map.empty

      def commitBatch(rows: List[(String, Long, Long, Double, String)]): Unit = {
        // (op, pos, user, value, event_type)
        val df = spark.createDataFrame(
          java.util.Arrays.asList(rows.map { case (op, p, u, v, e) =>
            Row(op, "users", p, p * 1000, u, v, e)
          }: _*), CdcStream.envelopeSchema)
        rep.commit(df)
        rows.foreach { case (op, p, u, v, e) =>
          val win = model.get(u).forall(_._2 < p)
          if (win) model += u -> ((if (op == "DELETE") "DELETE" else op, p, v, e))
        }
      }

      def live(st: State): Set[(String, Long, Double, String, Long)] =
        st.collect { case (u, (op, p, v, e)) if op != "DELETE" =>
          (op, p, v, e, u)
        }.toSet

      // seed so the catalog name resolves
      commitBatch(List(("UPSERT", nextPos(), 0L, 10.0, "a"),
        ("UPSERT", nextPos(), 1L, 60.0, "b")))

      val g = Gen.frequency[Any](
        3 -> (for {
          n <- Gen.choose(1, 6)
          rows <- Gen.listOfN(n, for {
            user <- Gen.choose(0L, 9L)
            op <- Gen.frequency(5 -> Gen.const("UPSERT"), 1 -> Gen.const("DELETE"))
            v <- Gen.choose(0, 99)
            e <- Gen.oneOf("a", "b")
          } yield (op, user, v.toDouble, e))
        } yield ("commit", rows)),
        2 -> Gen.choose(0, preds.size - 1).map(("delete", _)),
        2 -> (for {
          s <- Gen.choose(0, setters.size - 1)
          p <- Gen.choose(0, preds.size - 1)
        } yield ("update", (s, p))))
      val steps = Gen.listOfN(8, g)
        .apply(Gen.Parameters.default, Seed(1000L + run)).get

      steps.zipWithIndex.foreach { case (step, i) =>
        step match {
          case ("commit", rows: List[(String, Long, Double, String) @unchecked]) =>
            commitBatch(rows.map { case (op, u, v, e) => (op, nextPos(), u, v, e) })
          case ("delete", p: Int) =>
            spark.sql(s"DELETE FROM graft_dmlp.ns.r$run WHERE ${preds(p).sql}")
            model = model.map { case (u, (op, ps, v, e)) =>
              u -> (if (op != "DELETE" && preds(p).f(u, v, e)) ("DELETE", ps, v, e)
                    else (op, ps, v, e))
            }
          case ("update", (s: Int, p: Int)) =>
            spark.sql(
              s"UPDATE graft_dmlp.ns.r$run SET ${setters(s).sql} WHERE ${preds(p).sql}")
            model = model.map { case (u, (op, ps, v, e)) =>
              if (op != "DELETE" && preds(p).f(u, v, e)) {
                val (v2, e2) = setters(s).f(v, e)
                u -> ((op, ps, v2, e2))
              } else u -> ((op, ps, v, e))
            }
          case other => fail(s"unexpected step $other")
        }
        val sqlLive = spark.sql(s"SELECT * FROM graft_dmlp.ns.r$run").collect()
          .map(r => (r.getAs[String]("op"), r.getAs[Long]("pos"),
            r.getAs[Double]("value"), r.getAs[String]("event_type"),
            r.getAs[Long]("user_id"))).toSet
        assert(sqlLive === live(model),
          s"run $run step $i diverged after $step")
        // the stored form must carry exactly the model's tombstones too
        val storedDead = rep.read(spark).filter(org.apache.spark.sql.functions
            .col("op") === "DELETE")
          .collect().map(_.getAs[Long]("user_id")).toSet
        assert(storedDead === model.collect {
          case (u, (op, _, _, _)) if op == "DELETE" => u }.toSet,
          s"run $run step $i tombstone set diverged after $step")
      }
      rep.destroy()
    }
  }
}
