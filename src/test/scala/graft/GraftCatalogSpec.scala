package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.BucketedReplica

/** Durable catalog identity (graft.plans.GraftCatalog): the reference's
  * replica is a warehouse table analysts find BY NAME with no in-session
  * registration (reference main.tf:197-215) — a COLD session configured with
  * nothing but the catalog confs must SELECT, time-travel, and MERGE INTO
  * the replica, and the results must match the programmatic path. */
class GraftCatalogSpec extends SparkSpecBase {

  /** A session that knows ONLY the catalog confs — fresh catalog manager,
    * no temp views, no registry state shared with `spark`. */
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

  /** Hand a warm-session DataFrame to the cold session as a temp view
    * (DataFrames are session-bound; parquet is the neutral carrier). */
  private def handOver(cold: SparkSession, name: String, df: DataFrame): Unit = {
    val p = tmpDir(s"cat_src_$name")
    df.write.mode("overwrite").parquet(p)
    cold.read.parquet(p).createOrReplaceTempView(name)
  }

  test("a cold session resolves, reads, and time-travels the replica by name") {
    val wh = tmpDir("cat_read")
    val rep = new BucketedReplica(s"$wh/crm/users", nBuckets = 8)
    rep.commit(seed)   // v1
    rep.commit(staged) // v2
    val cold = coldSession(wh)

    assert(rowsOf(cold.sql("SELECT * FROM graft.crm.users")) ===
      rowsOf(rep.live(spark)), "cold SELECT by name diverged from rep.live")
    assert(rowsOf(cold.sql("SELECT * FROM graft.crm.users VERSION AS OF 1")) ===
      rowsOf(rep.liveAt(spark, 1)), "VERSION AS OF 1 diverged from readAt")
    // tombstones are storage detail, not analyst surface
    assert(cold.sql("SELECT * FROM graft.crm.users WHERE op = 'DELETE'").count() === 0)
    // discovery surface
    assert(cold.sql("SHOW TABLES IN graft.crm").collect()
      .map(_.getString(1)).toSeq === Seq("users"))
    assert(cold.sql("SHOW NAMESPACES IN graft").collect()
      .map(_.getString(0)).toSeq === Seq("crm"))
  }

  test("catalog reads execute as native parquet scans with pushdown, not a bespoke reader") {
    val wh = tmpDir("cat_plan")
    val rep = new BucketedReplica(s"$wh/crm/users", nBuckets = 8)
    rep.commit(seed)
    val cold = coldSession(wh)
    val q = cold.sql("SELECT user_id, value FROM graft.crm.users WHERE user_id = 7")
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("Parquet"), s"no parquet scan in:\n$physical")
    // both the analyst's pk predicate AND the live view's tombstone filter
    // reach the parquet reader
    assert(physical.contains("EqualTo(user_id,7)") &&
      physical.contains("Not(EqualTo(op,DELETE))"),
      s"filters did not reach the scan:\n$physical")
    assert(rowsOf(q) === rowsOf(rep.live(spark)
      .filter(col("user_id") === 7).select("user_id", "value")))
  }

  test("MERGE INTO by name from a cold session ≡ the programmatic commit") {
    val wh = tmpDir("cat_merge")
    val repA = new BucketedReplica(s"$wh/crm/users_a", nBuckets = 8)
    val repB = new BucketedReplica(s"$wh/crm/users_b", nBuckets = 8)
    repA.commit(seed); repB.commit(seed)
    val preMergeV = repB.currentVersion.get

    repA.commit(staged) // programmatic path, warm session
    val cold = coldSession(wh)
    handOver(cold, "staged_batch", staged)
    cold.sql(
      """MERGE INTO graft.crm.users_b t USING staged_batch s ON t.user_id = s.user_id
        |WHEN MATCHED AND s.op = 'DELETE' AND s.pos > t.pos THEN DELETE
        |WHEN MATCHED AND s.pos > t.pos THEN UPDATE SET *
        |WHEN NOT MATCHED AND s.op != 'DELETE' THEN INSERT *
        |""".stripMargin)

    assert(rowsOf(repB.live(spark)) === rowsOf(repA.live(spark)),
      "catalog MERGE and programmatic commit diverged")
    // the next cold read sees the new pointer with no refresh call
    assert(rowsOf(cold.sql("SELECT * FROM graft.crm.users_b")) ===
      rowsOf(repA.live(spark)))
    // and the pre-merge version stays readable
    assert(rowsOf(cold.sql(
      s"SELECT * FROM graft.crm.users_b VERSION AS OF $preMergeV")) ===
      rowsOf(repB.liveAt(spark, preMergeV)))
    // writing to the past is refused
    val e = intercept[Exception] {
      cold.sql(
        s"""MERGE INTO graft.crm.users_b VERSION AS OF $preMergeV t
           |USING staged_batch s ON t.user_id = s.user_id
           |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    }
    assert(e.getMessage.contains("immutable") || e.getMessage.contains("VERSION"),
      s"expected an immutability refusal, got: ${e.getMessage}")
  }

  test("INSERT INTO by name from a cold session ≡ the programmatic commit") {
    val wh = tmpDir("cat_insert")
    val repA = new BucketedReplica(s"$wh/crm/ins_a", nBuckets = 8)
    val repB = new BucketedReplica(s"$wh/crm/ins_b", nBuckets = 8)
    repA.commit(seed); repB.commit(seed)

    repA.commit(staged) // programmatic path
    val cold = coldSession(wh)
    handOver(cold, "staged_batch", staged)
    cold.sql("INSERT INTO graft.crm.ins_b SELECT * FROM staged_batch")

    // INSERT of change rows = latest-wins fold, byte-identical to commit:
    // newer positions replace, DELETE rows tombstone, new keys append
    assert(rowsOf(repB.live(spark)) === rowsOf(repA.live(spark)),
      "catalog INSERT and programmatic commit diverged")
    assert(rowsOf(cold.sql("SELECT * FROM graft.crm.ins_b")) ===
      rowsOf(repA.live(spark)))

    // literal VALUES insert lands a single new key
    cold.sql(
      """INSERT INTO graft.crm.ins_b VALUES
        |('UPSERT', 'events', 999999999999, 999999999999, 424242, 1.5, 'probe')
        |""".stripMargin)
    val got = cold.sql(
      "SELECT op, value, event_type FROM graft.crm.ins_b WHERE user_id = 424242")
      .collect()
    assert(got.length === 1 && got(0).getString(0) === "UPSERT" &&
      got(0).getDouble(1) === 1.5 && got(0).getString(2) === "probe")

    // INSERT OVERWRITE is refused with the MERGE pointer
    val e = intercept[Exception] {
      cold.sql("INSERT OVERWRITE graft.crm.ins_b SELECT * FROM staged_batch")
    }
    assert(e.getMessage.contains("MERGE INTO"),
      s"expected the overwrite refusal, got: ${e.getMessage}")
  }

  test("TIMESTAMP AS OF resolves to the version in effect at that instant") {
    val wh = tmpDir("cat_ts")
    val rep = new BucketedReplica(s"$wh/crm/ts", nBuckets = 8)
    rep.commit(seed)            // v1
    Thread.sleep(30)
    val between = System.currentTimeMillis()
    Thread.sleep(30)
    rep.commit(staged)          // v2
    val cold = coldSession(wh)

    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC")) // session TZ is UTC
    val lit = fmt.format(new java.util.Date(between))

    assert(rowsOf(cold.sql(
      s"SELECT * FROM graft.crm.ts TIMESTAMP AS OF '$lit'")) ===
      rowsOf(rep.liveAt(spark, 1)),
      "an instant between the commits must read v1")
    assert(rowsOf(cold.sql(
      "SELECT * FROM graft.crm.ts TIMESTAMP AS OF current_timestamp()")) ===
      rowsOf(rep.live(spark)),
      "now must read the current version")
    // an instant before every retained commit is refused, not guessed
    val e = intercept[Exception] {
      cold.sql("SELECT * FROM graft.crm.ts TIMESTAMP AS OF '2000-01-01 00:00:00'")
        .collect()
    }
    assert(e.getMessage.contains("retention") || e.getMessage.contains("retained"),
      s"expected the bounded-retention refusal, got: ${e.getMessage}")
  }

  test("graft_versions / graft_changes table functions read the replica by name") {
    val wh = tmpDir("cat_tvf")
    val rep = new BucketedReplica(s"$wh/crm/feed", nBuckets = 8)
    rep.commit(seed, tag = Some(10L))   // v1
    rep.commit(staged, tag = Some(11L)) // v2
    val cold = coldSession(wh)

    // retained versions: current + previous, with their source-batch tags
    val vers = cold.sql("SELECT * FROM graft_versions('crm.feed')")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(vers === Seq((1L, 10L, false), (2L, 11L, true)))

    // the SQL change feed equals the programmatic changeFeed exactly
    val got = rowsOf(cold.sql(
      "SELECT * FROM graft_changes('crm.feed', 1, 2) ORDER BY user_id"))
    val want = rowsOf(rep.changeFeed(spark, 1, 2).orderBy("user_id"))
    assert(got === want, "SQL change feed diverged from changeFeed(1,2)")
    // and it is non-trivial: the staged batch updated, deleted, and inserted
    val kinds = cold.sql("SELECT DISTINCT change FROM graft_changes('crm.feed', 1, 2)")
      .collect().map(_.getString(0)).toSet
    assert(kinds === Set("INSERT", "UPDATE", "DELETE"))

    // it composes as a relation: aggregate over the feed
    val n = cold.sql(
      "SELECT count(*) FROM graft_changes('crm.feed', 1, 2) WHERE change = 'DELETE'")
      .head().getLong(0)
    assert(n === rep.changeFeed(spark, 1, 2)
      .filter(col("change") === "DELETE").count())

    // naming a non-retained version fails with the retention message
    val e = intercept[Exception] {
      cold.sql("SELECT * FROM graft_changes('crm.feed', 0, 2)").collect()
    }
    assert(e.getMessage.contains("not retained"),
      s"expected the retention refusal, got: ${e.getMessage}")
  }

  test("CREATE TABLE provisions an empty replica a MERGE can then populate") {
    val wh = tmpDir("cat_ddl")
    val cold = coldSession(wh)
    cold.sql(
      """CREATE TABLE graft.lake.users (
        |  op STRING, tbl STRING, pos BIGINT, ts_ns BIGINT,
        |  user_id BIGINT, value DOUBLE, event_type STRING)
        |TBLPROPERTIES ('pk'='user_id', 'nBuckets'='4')""".stripMargin)
    assert(cold.sql("SELECT * FROM graft.lake.users").count() === 0)

    handOver(cold, "staged_batch", seed)
    cold.sql(
      """MERGE INTO graft.lake.users t USING staged_batch s ON t.user_id = s.user_id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(rowsOf(cold.sql("SELECT * FROM graft.lake.users")) === rowsOf(seed),
      "first MERGE into a created empty table must land every seed row")

    assert(cold.sql("SHOW TABLES IN graft.lake").count() === 1)
    cold.sql("DROP TABLE graft.lake.users")
    assert(cold.sql("SHOW TABLES IN graft.lake").count() === 0)
  }
}
