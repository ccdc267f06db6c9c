package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.plans.GraftMergeInto
import graft.streaming.{BucketedReplica, CdcStream}

/** Randomized differential for the MERGE INTO clause-dispatch machinery
  * (plans/MergeInto.scala's CASE encoding — the newest nontrivial Catalyst
  * code in the repo): ARBITRARY action sets (matched / not-matched /
  * not-matched-by-source, each with arbitrary conditions from a small
  * grammar, DELETE vs UPDATE SET * vs expression assignments) are rendered
  * both as literal SQL and as a plain-Scala first-matching-action
  * interpreter, and the live view after the SQL MERGE must equal the
  * interpreter's output row-for-row, every column. SqlMergePropertySpec
  * pins the one canonical staged-batch statement; this spec walks the
  * clause space. Scenarios alternate between the registered-view surface
  * and the GraftCatalog name surface, so both target-resolution paths run
  * the same dispatch. */
class MergeActionsPropertySpec extends SparkSpecBase {

  // ---- tiny mirrored grammar: each node renders SQL and evaluates --------

  /** One stored/source row in model space (the envelope columns). */
  private case class R(op: String, tbl: String, pos: Long, ts: Long,
                       user: Long, value: Double, et: String) {
    def toRow: Row = Row(op, tbl, pos, ts, user, value, et)
    override def toString = s"[$op,$tbl,$pos,$ts,$user,$value,$et]"
  }

  private case class Cond(sql: String, eval: (Option[R], Option[R]) => Boolean)

  private val matchedConds: Seq[Cond] = Seq(
    Cond("s.pos > t.pos", (t, s) => s.get.pos > t.get.pos),
    Cond("s.op = 'DELETE'", (_, s) => s.get.op == "DELETE"),
    Cond("s.value > t.value", (t, s) => s.get.value > t.get.value),
    Cond("t.user_id % 2 = 0", (t, _) => t.get.user % 2 == 0))
  private val notMatchedConds: Seq[Cond] = Seq(
    Cond("s.op != 'DELETE'", (_, s) => s.get.op != "DELETE"),
    Cond("s.value > 25", (_, s) => s.get.value > 25),
    Cond("s.user_id % 3 = 0", (_, s) => s.get.user % 3 == 0))
  private val nmbsConds: Seq[Cond] = Seq(
    Cond("t.value < 40", (t, _) => t.get.value < 40),
    Cond("t.user_id % 2 = 1", (t, _) => t.get.user % 2 == 1))

  /** apply(t, s) → Some(result row) or None (deleted from the live view). */
  private case class Act(sql: String, apply: (Option[R], Option[R]) => Option[R])

  private val matchedActs: Seq[Act] = Seq(
    Act("DELETE", (_, _) => None),
    Act("UPDATE SET *", (_, s) => s),
    Act("UPDATE SET value = s.value + t.value",
      (t, s) => Some(t.get.copy(value = s.get.value + t.get.value))),
    Act("UPDATE SET value = s.value, pos = s.pos",
      (t, s) => Some(t.get.copy(value = s.get.value, pos = s.get.pos))))
  private val notMatchedActs: Seq[Act] = Seq(
    Act("INSERT *", (_, s) => s))
  private val nmbsActs: Seq[Act] = Seq(
    Act("DELETE", (_, _) => None),
    Act("UPDATE SET value = t.value * 2",
      (t, _) => Some(t.get.copy(value = t.get.value * 2))))

  private case class Clause(kind: String, cond: Option[Cond], act: Act) {
    def sql: String = {
      val c = cond.map(c => s" AND ${c.sql}").getOrElse("")
      s"WHEN $kind$c THEN ${act.sql}"
    }
    def fires(t: Option[R], s: Option[R]): Boolean =
      cond.forall(_.eval(t, s))
  }

  private case class Scenario(matched: List[Clause], notMatched: List[Clause],
                              nmbs: List[Clause], source: List[R]) {
    def sql(target: String, sourceView: String): String =
      (s"MERGE INTO $target t USING $sourceView s ON t.user_id = s.user_id" ::
        (matched ++ notMatched ++ nmbs).map(_.sql)).mkString("\n")
  }

  private def clauseGen(kind: String, conds: Seq[Cond], acts: Seq[Act]) = for {
    cond <- Gen.option(Gen.oneOf(conds))
    act <- Gen.oneOf(acts)
  } yield Clause(kind, cond, act)

  /** Spark's parser requires every non-last clause of a group to carry a
    * condition; give unconditioned non-last clauses one (the model reads
    * the same Clause objects, so SQL and interpreter stay in lockstep). */
  private def wellFormed(l: List[Clause], conds: Seq[Cond]): List[Clause] =
    l.zipWithIndex.map { case (c, i) =>
      if (i < l.size - 1 && c.cond.isEmpty) c.copy(cond = Some(conds(i % conds.size)))
      else c
    }

  private val scenarioGen: Gen[Scenario] = for {
    m <- Gen.listOfN(3, clauseGen("MATCHED", matchedConds, matchedActs))
      .flatMap(l => Gen.choose(0, 3).map(n => wellFormed(l.take(n), matchedConds)))
    nm <- Gen.listOfN(1, clauseGen("NOT MATCHED", notMatchedConds, notMatchedActs))
      .flatMap(l => Gen.choose(0, 1).map(l.take))
    nb <- Gen.listOfN(1, clauseGen("NOT MATCHED BY SOURCE", nmbsConds, nmbsActs))
      .flatMap(l => Gen.choose(0, 1).map(l.take))
    if m.nonEmpty || nm.nonEmpty || nb.nonEmpty // MERGE needs >= 1 clause
    srcKeys <- Gen.someOf(0L to 14L)
    srcRows <- Gen.sequence[List[R], R](srcKeys.toList.map(k => for {
      op <- Gen.oneOf("UPSERT", "DELETE")
      v <- Gen.choose(0, 99)
    } yield R(op, "users", 100 + k, (100 + k) * 1000, k, v.toDouble, "e")))
  } yield Scenario(m, nm, nb, srcRows)

  // ---- fixture + model ----------------------------------------------------

  /** Stored seed: keys 0..9, every 4th a tombstone (so the not-matched
    * path also runs against stored-dead keys). */
  private val seedRows: List[R] = (0L to 9L).toList.map { k =>
    R(if (k % 4 == 3) "DELETE" else "UPSERT", "users",
      10 + k, (10 + k) * 1000, k, (k * 7 % 97).toDouble, "e")
  }

  /** First-matching-clause interpreter over the LIVE target view — the
    * independent semantics the SQL path must reproduce. */
  private def model(sc: Scenario): Set[String] = {
    val live = seedRows.filter(_.op != "DELETE").map(r => r.user -> r).toMap
    val src = sc.source.map(r => r.user -> r).toMap
    (live.keySet ++ src.keySet).toList.flatMap { k =>
      (live.get(k), src.get(k)) match {
        case (t @ Some(_), s @ Some(_)) =>
          sc.matched.find(_.fires(t, s)) match {
            case Some(c) => c.act.apply(t, s)
            case None    => t
          }
        case (None, s @ Some(_)) =>
          sc.notMatched.find(_.fires(None, s)).flatMap(_.act.apply(None, s))
        case (t @ Some(_), None) =>
          sc.nmbs.find(_.fires(t, None)) match {
            case Some(c) => c.act.apply(t, None)
            case None    => t
          }
        case _ => None
      }
    }.filter(_.op != "DELETE") // live view excludes rows an action tombstoned
      .map(_.toString).toSet
  }

  private def df(rows: Seq[R]): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(_.toRow): _*), CdcStream.envelopeSchema)

  private def liveSet(rep: BucketedReplica): Set[String] =
    rep.live(spark).collect()
      .map(r => s"[${r.toSeq.mkString(",")}]").toSet

  test("arbitrary clause sets: SQL MERGE ≡ the first-matching-clause model, on both target surfaces") {
    val wh = tmpDir("map_wh")
    spark.conf.set("spark.sql.catalog.graft_map", "graft.plans.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_map.root", wh)
    var ran = 0
    (1 to 40).foreach { i =>
      scenarioGen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { sc =>
        ran += 1
        val viaCatalog = i % 2 == 0
        val rep = new BucketedReplica(s"$wh/ns/t$i", nBuckets = 4)
        rep.commit(df(seedRows))
        df(sc.source).createOrReplaceTempView("map_staged")
        val target =
          if (viaCatalog) s"graft_map.ns.t$i"
          else { GraftMergeInto.register(spark, s"map_view_$i", rep); s"map_view_$i" }
        val stmt = sc.sql(target, "map_staged")
        spark.sql(stmt)
        assert(liveSet(rep) === model(sc),
          s"scenario $i (${if (viaCatalog) "catalog" else "view"} surface) diverged:\n$stmt")
        if (!viaCatalog) GraftMergeInto.unregister(s"map_view_$i")
        rep.destroy()
      }
    }
    assert(ran >= 30, s"generator discarded too many scenarios (ran $ran)")
  }
}
