package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.plans.GraftMergeInto
import graft.streaming.{BucketedReplica, CdcStream}

/** ANSI `MERGE INTO` over a BucketedReplica (the reference's analyst-facing
  * replica maintenance, reference main.tf:197-215) must be semantically
  * interchangeable with the programmatic path (`Cdc.merge` via
  * `BucketedReplica.commit`) on the canonical staged-batch flow, while
  * keeping the storage invariants (tombstones, one row per key) and the
  * bucket-bounded write economics. */
class MergeIntoSqlSpec extends SparkSpecBase {

  private val mergeSql =
    """MERGE INTO %s t USING staged_batch s ON t.user_id = s.user_id
      |WHEN MATCHED AND s.op = 'DELETE' AND s.pos > t.pos THEN DELETE
      |WHEN MATCHED AND s.pos > t.pos THEN UPDATE SET *
      |WHEN NOT MATCHED AND s.op != 'DELETE' THEN INSERT *
      |""".stripMargin

  /** Envelope-shaped seed: latest event per user becomes an UPSERT row. */
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

  /** A deduped staged batch strictly after the seed: updates for some keys,
    * deletes for others, inserts of brand-new keys. */
  private def staged: DataFrame = {
    val maxPos = seed.agg(max(col("pos"))).collect()(0).getLong(0)
    val updates = seed.filter(col("user_id") % 5 === 0)
      .withColumn("pos", lit(maxPos) + col("user_id") + 1L)
      .withColumn("ts_ns", col("pos"))
      .withColumn("value", col("value") * 2 + 1)
    val deletes = seed.filter(col("user_id") % 5 === 1)
      .withColumn("op", lit("DELETE"))
      .withColumn("pos", lit(maxPos) + col("user_id") + 1L)
      .withColumn("ts_ns", col("pos"))
    val inserts = seed.filter(col("user_id") % 5 === 2)
      .withColumn("user_id", col("user_id") + 1000L)
      .withColumn("pos", lit(maxPos) + col("user_id") + 1L)
      .withColumn("ts_ns", col("pos"))
    updates.unionByName(deletes).unionByName(inserts)
  }

  private def rowsOf(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("MERGE INTO ≡ Cdc.merge on the canonical staged-batch flow") {
    val repA = new BucketedReplica(tmpDir("msql_a") + "/rep", nBuckets = 8)
    val repB = new BucketedReplica(tmpDir("msql_b") + "/rep", nBuckets = 8)
    repA.commit(seed); repB.commit(seed)

    // programmatic path
    repA.commit(staged)
    // SQL path
    GraftMergeInto.register(spark, "replica_b", repB)
    staged.createOrReplaceTempView("staged_batch")
    spark.sql(mergeSql.format("replica_b"))

    assert(rowsOf(repB.live(spark)) === rowsOf(repA.live(spark)),
      "SQL MERGE and Cdc.merge diverged on the live view")
    // storage invariants survive the SQL path: deletes are tombstones (no
    // resurrection by late batches), exactly one stored row per key
    val deadB = repB.read(spark).filter(col("op") === "DELETE")
    assert(deadB.count() === staged.filter(col("op") === "DELETE").count())
    assert(repB.read(spark).groupBy("user_id").count().filter(col("count") > 1)
      .count() === 0)
    GraftMergeInto.unregister("replica_b")
  }

  test("the merge's ON equality plans as a keyed join, never a nested loop") {
    val rep = new BucketedReplica(tmpDir("msql_plan") + "/rep", nBuckets = 8)
    rep.commit(seed)
    GraftMergeInto.register(spark, "replica_p", rep)
    staged.createOrReplaceTempView("staged_batch")
    spark.sql(mergeSql.format("replica_p"))
    val plan = GraftMergeInto.lastMergePlan
    assert(plan.nonEmpty)
    // the scale contract: pk equality extracted into a hash/sort-merge join
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"MERGE planned a non-keyed join:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), s"no keyed join in:\n$plan")
    GraftMergeInto.unregister("replica_p")
  }

  test("MERGE rewrites only the buckets the source keys touch") {
    val root = tmpDir("msql_bounded") + "/rep"
    val rep = new BucketedReplica(root, nBuckets = 8)
    rep.commit(seed)
    val small = staged.filter(col("user_id") === 0L) // one key → one bucket
    GraftMergeInto.register(spark, "replica_bd", rep)
    small.createOrReplaceTempView("staged_batch")
    spark.sql(mergeSql.format("replica_bd"))
    val newV = rep.currentVersion.get
    val bucketDirs = versionDataDir(root, newV).listFiles()
      .filter(_.getName.startsWith("bucket=")).map(_.getName).toSeq
    assert(bucketDirs.size === 1,
      s"single-key MERGE rewrote ${bucketDirs.size} buckets: $bucketDirs")
    GraftMergeInto.unregister("replica_bd")
  }

  test("stored NULL-op rows (schema-drift landings) survive a MERGE rewrite of their bucket") {
    val rep = new BucketedReplica(tmpDir("msql_nullop") + "/rep", nBuckets = 2)
    rep.commit(seed)
    // a producer-drift batch missing the op column lands op=NULL (the
    // replica's documented tolerance); such rows are invisible to live()
    // but must never be DROPPED from storage by a later bucket rewrite
    val drifted = seed.filter(col("user_id") === 3L).drop("op")
      .withColumn("user_id", col("user_id") + 500L)
      .withColumn("pos", col("pos") + 1000000L)
    rep.commit(drifted)
    val nullOpBefore = rep.read(spark).filter(col("op").isNull).count()
    assert(nullOpBefore > 0, "fixture did not produce a NULL-op row")

    GraftMergeInto.register(spark, "replica_no", rep)
    // nBuckets=2 → any non-trivial source touches both buckets
    staged.createOrReplaceTempView("staged_batch")
    spark.sql(mergeSql.format("replica_no"))
    assert(rep.read(spark).filter(col("op").isNull).count() === nullOpBefore,
      "a NULL-op stored row vanished through the MERGE's bucket rewrite")
    GraftMergeInto.unregister("replica_no")
  }

  test("cardinality violation (two source rows, one target key) raises") {
    val rep = new BucketedReplica(tmpDir("msql_card") + "/rep", nBuckets = 8)
    rep.commit(seed)
    GraftMergeInto.register(spark, "replica_card", rep)
    staged.unionByName(staged).filter(col("op") =!= "DELETE")
      .createOrReplaceTempView("staged_batch")
    val e = intercept[Exception] { spark.sql(mergeSql.format("replica_card")) }
    assert(e.getMessage.contains("cardinality"))
    GraftMergeInto.unregister("replica_card")
  }

  test("WHEN NOT MATCHED BY SOURCE prunes keys absent from the source") {
    val rep = new BucketedReplica(tmpDir("msql_nmbs") + "/rep", nBuckets = 8)
    rep.commit(seed)
    GraftMergeInto.register(spark, "replica_nmbs", rep)
    // retain only keys present in the (update-only) source; everything the
    // source doesn't mention is deleted — the full-sync reconciliation form
    val src = staged.filter(col("op") =!= "DELETE" && col("user_id") < 100)
    src.createOrReplaceTempView("staged_batch")
    spark.sql(
      """MERGE INTO replica_nmbs t USING staged_batch s ON t.user_id = s.user_id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED BY SOURCE THEN DELETE
        |""".stripMargin)
    val liveKeys = rep.live(spark).select("user_id").collect().map(_.getLong(0)).toSet
    val srcKeys = src.select("user_id").collect().map(_.getLong(0)).toSet
    assert(liveKeys === srcKeys.filter(_ < 1000),
      "NOT MATCHED BY SOURCE must remove unmentioned keys (inserts can't fire here)")
    GraftMergeInto.unregister("replica_nmbs")
  }

  test("UPDATE expressions may mix target and source columns; extra ON conjuncts narrow the match") {
    val rep = new BucketedReplica(tmpDir("msql_expr") + "/rep", nBuckets = 8)
    rep.commit(seed)
    val baseline = rep.live(spark).select("user_id", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    GraftMergeInto.register(spark, "replica_e", rep)
    staged.filter(col("op") =!= "DELETE" && col("user_id") < 1000)
      .createOrReplaceTempView("staged_batch")
    // t.value + s.value / 2 references BOTH sides; the extra conjunct
    // restricts the match to even keys — odd matched keys carry unchanged
    spark.sql(
      """MERGE INTO replica_e t USING staged_batch s
        |ON t.user_id = s.user_id AND t.user_id % 2 = 0
        |WHEN MATCHED THEN UPDATE SET value = t.value + s.value / 2
        |""".stripMargin)
    val after = rep.live(spark).select("user_id", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val stagedVals = staged.filter(col("op") =!= "DELETE" && col("user_id") < 1000)
      .select("user_id", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    baseline.foreach { case (k, v) =>
      val expect = stagedVals.get(k) match {
        case Some(sv) if k % 2 == 0 => v + sv / 2
        case _ => v
      }
      assert(math.abs(after(k) - expect) < 1e-9, s"key $k")
    }
    GraftMergeInto.unregister("replica_e")
  }

  test("the registered view follows the replica version after each MERGE") {
    val rep = new BucketedReplica(tmpDir("msql_view") + "/rep", nBuckets = 8)
    rep.commit(seed)
    GraftMergeInto.register(spark, "replica_v", rep)
    def viewKeys(): Set[Long] =
      spark.sql("SELECT user_id FROM replica_v").collect().map(_.getLong(0)).toSet
    val before = viewKeys()
    staged.createOrReplaceTempView("staged_batch")
    spark.sql(mergeSql.format("replica_v"))
    val after = viewKeys()
    val expected = rep.live(spark).select("user_id").collect().map(_.getLong(0)).toSet
    assert(after === expected)
    assert(after !== before) // deletes removed keys, inserts added 1000+ keys
    GraftMergeInto.unregister("replica_v")
  }
}
