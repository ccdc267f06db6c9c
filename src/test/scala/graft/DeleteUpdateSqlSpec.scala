package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.GraftMergeInto
import graft.streaming.{BucketedReplica, StoreIO}

/** ANSI `DELETE FROM` / `UPDATE` over replica targets
  * (graft.plans.GraftDeleteUpdate): the last two analyst DML verbs. Pins
  * (1) equivalence with the programmatic transformation on both the
  * cold-session catalog surface and the registered-view surface,
  * (2) the storage protocol — deletes are tombstones that keep the row's
  * stored position so older out-of-order CDC batches cannot resurrect the
  * key, co-resident rows and stored tombstones survive the bucket rewrite,
  * (3) the write economics — only touched buckets rewrite, and
  * (4) the refusals: SET pk, SET op, VERSION AS OF targets,
  * nondeterministic predicates. */
class DeleteUpdateSqlSpec extends SparkSpecBase {

  private def coldSession(warehouse: String): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft", "graft.plans.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft.root", warehouse)
    s
  }

  /** Envelope-shaped seed (same flow as MergeIntoSqlSpec). */
  private def seed: DataFrame = {
    val ev = Tables.events(spark, sfDir)
    ev.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts_ns").desc, col("event_id").desc)))
      .filter(col("rn") === 1 && col("user_id") < 40)
      .select(lit("UPSERT").as("op"), lit("events").as("tbl"),
        col("ts_ns").as("pos"), col("ts_ns"), col("user_id"),
        col("value"), col("event_type"))
  }

  private def rowsOf(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("catalog DELETE FROM writes position-keeping tombstones; live ≡ filtered") {
    val wh = tmpDir("dml_del")
    val rep = new BucketedReplica(s"$wh/cdc/users", nBuckets = 8)
    rep.destroy(); rep.commit(seed)
    val cold = coldSession(wh)

    cold.sql("DELETE FROM graft.cdc.users WHERE user_id % 5 = 1")

    val expectedLive = rep.live(spark).filter(!(col("user_id") % 5 === 1))
    assert(rowsOf(cold.sql("SELECT * FROM graft.cdc.users")) === rowsOf(expectedLive),
      "catalog DELETE and predicate-filtered live view diverged")
    // stored form: tombstone keeps the row's own values, position included
    val dead = rep.read(spark).filter(col("op") === "DELETE")
    val expectedDead = seed.filter(col("user_id") % 5 === 1)
      .withColumn("op", lit("DELETE"))
    assert(rowsOf(dead) === rowsOf(expectedDead),
      "DELETE tombstones must keep the deleted row's stored values")
  }

  test("an older out-of-order batch cannot resurrect a SQL-deleted key; a newer one can") {
    val wh = tmpDir("dml_resur")
    val rep = new BucketedReplica(s"$wh/cdc/users", nBuckets = 4)
    rep.destroy(); rep.commit(seed)
    val key = seed.select(min(col("user_id"))).collect()(0).getLong(0)
    val storedPos = seed.filter(col("user_id") === key)
      .select(col("pos")).collect()(0).getLong(0)
    coldSession(wh).sql(s"DELETE FROM graft.cdc.users WHERE user_id = $key")

    // stale change (pos < tombstone's) loses against the delete
    rep.commit(seed.filter(col("user_id") === key)
      .withColumn("pos", lit(storedPos - 1L)).withColumn("value", lit(999.0)))
    assert(rep.live(spark).filter(col("user_id") === key).isEmpty,
      "an older-position change resurrected a deleted key")
    // genuinely newer change wins
    rep.commit(seed.filter(col("user_id") === key)
      .withColumn("pos", lit(storedPos + 1L)))
    assert(!rep.live(spark).filter(col("user_id") === key).isEmpty,
      "a newer-position insert must revive the key")
  }

  test("catalog UPDATE ≡ programmatic transformation; tombstones and non-subjects carried") {
    val wh = tmpDir("dml_upd")
    val rep = new BucketedReplica(s"$wh/cdc/users", nBuckets = 8)
    rep.destroy(); rep.commit(seed)
    // pre-existing tombstone in some bucket: must survive the UPDATE rewrite
    val maxPos = seed.agg(max(col("pos"))).collect()(0).getLong(0)
    rep.commit(seed.filter(col("user_id") % 7 === 3)
      .withColumn("op", lit("DELETE")).withColumn("pos", lit(maxPos + 1)))
    val before = rep.read(spark)
    val subject = col("op") =!= "DELETE" && col("value") >= 50
    val expected = before.withColumn("value",
        when(subject, col("value") * 2 + 1).otherwise(col("value")))
      .withColumn("event_type",
        when(subject, concat(lit("adj_"), col("event_type")))
          .otherwise(col("event_type")))
      .collect().map(_.toString).toSet

    coldSession(wh).sql(
      """UPDATE graft.cdc.users
        |SET value = value * 2 + 1, event_type = concat('adj_', event_type)
        |WHERE value >= 50""".stripMargin)

    assert(rowsOf(rep.read(spark)) === expected,
      "catalog UPDATE and the programmatic transformation diverged on stored rows")
  }

  test("registered-view DELETE works and refreshes the view") {
    val rep = new BucketedReplica(tmpDir("dml_view") + "/rep", nBuckets = 4)
    rep.commit(seed)
    GraftMergeInto.register(spark, "dml_replica_view", rep)
    try {
      spark.sql("DELETE FROM dml_replica_view WHERE event_type = 'error'")
      assert(rowsOf(spark.table("dml_replica_view")) ===
        rowsOf(rep.live(spark)),
        "registered view must refresh to the post-DELETE version")
      assert(spark.table("dml_replica_view")
        .filter(col("event_type") === "error").isEmpty)
    } finally GraftMergeInto.unregister("dml_replica_view")
  }

  test("DELETE with a subquery predicate (SupportsSubquery surface)") {
    val wh = tmpDir("dml_subq")
    val rep = new BucketedReplica(s"$wh/cdc/users", nBuckets = 4)
    rep.destroy(); rep.commit(seed)
    val cold = coldSession(wh)
    cold.sql(
      """DELETE FROM graft.cdc.users WHERE user_id IN
        |  (SELECT user_id FROM graft.cdc.users WHERE value < 30)""".stripMargin)
    val expected = rep.live(spark) // post-delete live, read programmatically
    assert(expected.filter(col("value") < 30).isEmpty,
      "subquery-named keys must be gone")
    assert(rowsOf(cold.sql("SELECT * FROM graft.cdc.users")) === rowsOf(expected))
  }

  test("a single-key DELETE rewrites exactly one bucket") {
    val wh = tmpDir("dml_bucket")
    val root = s"$wh/cdc/users"
    val rep = new BucketedReplica(root, nBuckets = 8)
    rep.destroy(); rep.commit(seed)
    val key = seed.select(max(col("user_id"))).collect()(0).getLong(0)
    coldSession(wh).sql(s"DELETE FROM graft.cdc.users WHERE user_id = $key")
    val newV = rep.currentVersion.get
    val bucketDirs = versionDataDir(root, newV).listFiles()
      .filter(_.getName.startsWith("bucket=")).map(_.getName).toSeq
    assert(bucketDirs.size === 1,
      s"single-key DELETE rewrote ${bucketDirs.size} buckets: $bucketDirs")
  }

  test("a DELETE racing a CDC commit loses the pointer loudly; the retry converges") {
    val root = tmpDir("dml_race") + "/rep"
    val rep = new BucketedReplica(root, nBuckets = 4)
    rep.commit(seed)
    val maxPos = seed.agg(max(col("pos"))).collect()(0).getLong(0)
    val racing = seed.filter(col("user_id") === 2L)
      .withColumn("pos", lit(maxPos + 10)).withColumn("value", lit(500.0))
    GraftMergeInto.register(spark, "dml_race_view", rep)
    try {
      // the stream's commit lands INSIDE the DELETE's write-to-pointer window
      rep.beforePointerCommit = () => {
        rep.beforePointerCommit = () => ()
        new BucketedReplica(root, nBuckets = 4).commit(racing)
      }
      // r16: the defeated pointer create surfaces as the protocol's clean
      // ConcurrentCommit (commitPointer maps the taken-name IOException),
      // not the raw filesystem exception
      intercept[StoreIO.ConcurrentCommit] {
        spark.sql("DELETE FROM dml_race_view WHERE value >= 100")
      }
      // no partial delete: store = seed ⊎ racing commit, nothing tombstoned
      assert(rowsOf(rep.live(spark)) ===
        rowsOf(Cdc.merge(seed.unionByName(racing), Seq("user_id"))),
        "a lost DML race must leave the store exactly as the winner committed it")
      // the retry re-reads fresh and deletes the racing row too (value 500)
      spark.sql("DELETE FROM dml_race_view WHERE value >= 100")
      assert(rowsOf(rep.live(spark)) ===
        rowsOf(Cdc.merge(seed.unionByName(racing), Seq("user_id"))
          .filter(col("value") < 100)))
    } finally GraftMergeInto.unregister("dml_race_view")
  }

  test("replaceTouched serializes against the snapshot its content was " +
    "read at: a foreign commit between the DML read and the replace " +
    "loses at the pointer, never silently overwritten") {
    val root = tmpDir("dml_seam") + "/rep"
    val rep = new BucketedReplica(root, nBuckets = 4)
    rep.commit(seed)
    val maxPos = seed.agg(max(col("pos"))).collect()(0).getLong(0)
    // the DML pins its snapshot and builds its full-bucket content
    val snap = rep.pinSnapshot()
    val buckets = rep.touchedBuckets(seed)
    val content = rep.readBucketsAt(spark, buckets, snap)
      .withColumn("value", col("value") * 2).persist()
    content.count() // materialize the read before the foreign commit
    // a foreign writer commits a NEW key while the DML was planning
    val foreign = seed.limit(1)
      .withColumn("user_id", lit(424242L))
      .withColumn("pos", lit(maxPos + 1))
    rep.commit(foreign)
    intercept[graft.streaming.StoreIO.ConcurrentCommit] {
      rep.replaceTouched(content, snap)
    }
    assert(rep.live(spark).filter(col("user_id") === 424242L).count() === 1,
      "the foreign commit's row must survive the defeated DML replace")
    content.unpersist()
  }

  test("refusals: SET pk, SET op, VERSION AS OF target, nondeterministic WHERE") {
    val wh = tmpDir("dml_refuse")
    val rep = new BucketedReplica(s"$wh/cdc/users", nBuckets = 4)
    rep.destroy(); rep.commit(seed)
    val cold = coldSession(wh)
    val ePk = intercept[Exception](cold.sql(
      "UPDATE graft.cdc.users SET user_id = user_id + 1 WHERE value > 0"))
    assert(ePk.getMessage.contains("rekey") || ePk.getMessage.contains("primary-key"),
      s"pk UPDATE must name the rekey path, got: ${ePk.getMessage}")
    val eOp = intercept[Exception](cold.sql(
      "UPDATE graft.cdc.users SET op = 'DELETE' WHERE value > 0"))
    assert(eOp.getMessage.contains("op column"),
      s"op UPDATE must point at DELETE FROM, got: ${eOp.getMessage}")
    val eVer = intercept[Exception](cold.sql(
      "DELETE FROM graft.cdc.users VERSION AS OF 1 WHERE value > 0"))
    assert(eVer.getMessage.toLowerCase.contains("immutable") ||
      eVer.getMessage.toLowerCase.contains("syntax"),
      s"versioned target must refuse, got: ${eVer.getMessage}")
    val eRand = intercept[Exception](cold.sql(
      "DELETE FROM graft.cdc.users WHERE rand() < 0.5"))
    assert(eRand.getMessage.contains("deterministic"),
      s"nondeterministic WHERE must refuse, got: ${eRand.getMessage}")
    // nothing above may have mutated the store
    assert(rowsOf(rep.live(spark)) === rowsOf(Cdc.merge(seed, Seq("user_id"))))
  }
}
