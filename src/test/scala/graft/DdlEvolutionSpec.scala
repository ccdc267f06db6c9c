package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.BucketedReplica

/** `ALTER TABLE … ADD COLUMN` on catalog replica tables
  * (GraftCatalog.alterTable → BucketedReplica.widenSchema): a
  * metadata-only version flip that appends nullable fields. Pins the
  * evolution invariants — stored rows read NULL for the new column, time
  * travel keeps each retained version's own schema, the next
  * INSERT/commit lands the column physically — and the refusals for
  * every ALTER that would orphan stored rows. */
class DdlEvolutionSpec extends SparkSpecBase {

  private def coldSession(warehouse: String): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft", "graft.plans.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft.root", warehouse)
    s
  }

  private def seed: DataFrame = {
    val ev = Tables.events(spark, sfDir)
    ev.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts_ns").desc, col("event_id").desc)))
      .filter(col("rn") === 1 && col("user_id") < 20)
      .select(lit("UPSERT").as("op"), lit("events").as("tbl"),
        col("ts_ns").as("pos"), col("ts_ns"), col("user_id"),
        col("value"), col("event_type"))
  }

  private def rowsOf(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("ADD COLUMN is metadata-only; stored rows read NULL; next write lands it") {
    val wh = tmpDir("ddl_add")
    val root = s"$wh/cdc/users"
    val rep = new BucketedReplica(root, nBuckets = 4)
    rep.destroy(); rep.commit(seed)
    val vBefore = rep.currentVersion.get
    val dataFiles = versionDataDir(root, vBefore).listFiles().length
    val cold = coldSession(wh)

    cold.sql("ALTER TABLE graft.cdc.users ADD COLUMN note STRING")

    // metadata-only: new version, same data directory untouched
    assert(rep.currentVersion.get === vBefore + 1)
    assert(!versionDataDir(root, vBefore + 1).exists(),
      "ADD COLUMN must not rewrite data")
    assert(versionDataDir(root, vBefore).listFiles().length === dataFiles)
    // stored rows read NULL for the new column
    val read = cold.sql("SELECT * FROM graft.cdc.users")
    assert(read.columns.contains("note"))
    assert(read.filter(col("note").isNotNull).isEmpty)
    assert(read.count() === rep.live(spark).count())

    // time travel keeps the pre-ALTER version's own narrower schema
    val old = cold.sql(s"SELECT * FROM graft.cdc.users VERSION AS OF $vBefore")
    assert(!old.columns.contains("note"),
      "a retained version must read under the schema it committed with")

    // the next INSERT lands the evolved column physically
    cold.sql(
      """INSERT INTO graft.cdc.users
        |VALUES ('UPSERT', 'events', 9999999999999, 9999999999999,
        |        777, 1.5, 'signup', 'hello')""".stripMargin)
    val noted = cold.sql(
      "SELECT note FROM graft.cdc.users WHERE user_id = 777").collect()
    assert(noted.map(_.getString(0)).toSeq === Seq("hello"))
    // and old keys still read NULL beside it
    assert(cold.sql("SELECT * FROM graft.cdc.users WHERE note IS NULL").count()
      === rep.live(spark).count() - 1)
  }

  test("ADD COLUMN before the first commit widens the declared contract") {
    val wh = tmpDir("ddl_pre")
    val cold = coldSession(wh)
    cold.sql(
      """CREATE TABLE graft.crm.fresh (
        |  op STRING, tbl STRING, pos BIGINT, ts_ns BIGINT,
        |  user_id BIGINT, value DOUBLE, event_type STRING)
        |TBLPROPERTIES ('pk' = 'user_id', 'nBuckets' = '4')""".stripMargin)
    cold.sql("ALTER TABLE graft.crm.fresh ADD COLUMN origin STRING")
    cold.sql(
      """INSERT INTO graft.crm.fresh
        |VALUES ('INSERT', 'fresh', 1, 1, 1, 2.0, 'signup', 'backfill')""".stripMargin)
    val r = cold.sql("SELECT user_id, origin FROM graft.crm.fresh").collect()
    assert(r.map(x => (x.getLong(0), x.getString(1))).toSeq === Seq((1L, "backfill")))
  }

  test("refusals: drop, rename, retype, positioned add, non-nullable add") {
    val wh = tmpDir("ddl_refuse")
    val rep = new BucketedReplica(s"$wh/cdc/users", nBuckets = 4)
    rep.destroy(); rep.commit(seed)
    val cold = coldSession(wh)
    def refuses(sql: String, why: String): Unit = {
      val e = intercept[Exception](cold.sql(sql))
      assert(e.getMessage.contains("orphan") || e.getMessage.contains("not supported") ||
        e.getMessage.contains("nullable") || e.getMessage.contains("append-only"),
        s"$why must refuse with rationale, got: ${e.getMessage}")
    }
    refuses("ALTER TABLE graft.cdc.users DROP COLUMN value", "DROP COLUMN")
    refuses("ALTER TABLE graft.cdc.users RENAME COLUMN value TO v2", "RENAME COLUMN")
    refuses("ALTER TABLE graft.cdc.users ALTER COLUMN value TYPE STRING", "retype")
    refuses("ALTER TABLE graft.cdc.users ADD COLUMN early STRING FIRST", "positioned add")
    refuses("ALTER TABLE graft.cdc.users ADD COLUMN strict STRING NOT NULL", "non-nullable add")
    val e = intercept[Exception](
      cold.sql("ALTER TABLE graft.cdc.users ADD COLUMN value DOUBLE"))
    assert(e.getMessage.contains("already exists"))
    // nothing mutated
    assert(rep.storedSchema.fieldNames.toSeq ===
      seed.schema.fieldNames.toSeq)
  }

  test("CTAS materializes the query's latest-wins fold as a new replica") {
    val wh = tmpDir("ddl_ctas")
    val cold = coldSession(wh)
    val src = tmpDir("ddl_ctas_src")
    seed.unionByName(seed.limit(3)
        .withColumn("pos", col("pos") + 1).withColumn("value", col("value") * 2))
      .write.mode("overwrite").parquet(src)
    cold.read.parquet(src).createOrReplaceTempView("ctas_src")

    cold.sql(
      """CREATE TABLE graft.crm.snap TBLPROPERTIES ('pk' = 'user_id', 'nBuckets' = '4')
        |AS SELECT * FROM ctas_src""".stripMargin)

    val expected = Cdc.merge(spark.read.parquet(src), Seq("user_id"))
      .collect().map(_.toString).toSet
    assert(rowsOf(cold.sql("SELECT * FROM graft.crm.snap")) === expected,
      "CTAS must land the query's latest-wins fold")
    // the created table is a full replica: DML works on it immediately
    cold.sql("DELETE FROM graft.crm.snap WHERE user_id % 2 = 0")
    assert(cold.sql("SELECT * FROM graft.crm.snap WHERE user_id % 2 = 0").isEmpty)

    // IF NOT EXISTS on an existing table: silent no-op, content untouched
    cold.sql(
      """CREATE TABLE IF NOT EXISTS graft.crm.snap TBLPROPERTIES ('pk' = 'user_id')
        |AS SELECT * FROM ctas_src""".stripMargin)
    assert(cold.sql("SELECT * FROM graft.crm.snap WHERE user_id % 2 = 0").isEmpty,
      "IF NOT EXISTS CTAS must not replace an existing replica")
    // without IF NOT EXISTS: refuse
    intercept[Exception](cold.sql(
      "CREATE TABLE graft.crm.snap AS SELECT * FROM ctas_src"))
    // a CTAS that drops the envelope is refused with the reason
    val e = intercept[Exception](cold.sql(
      "CREATE TABLE graft.crm.bare AS SELECT user_id, value FROM ctas_src"))
    assert(e.getMessage.contains("envelope"),
      s"envelope-less CTAS must refuse with rationale, got: ${e.getMessage}")
  }

  test("maintenance runs as SQL procedures: CALL graft.system.*") {
    val wh = tmpDir("ddl_call")
    val root = s"$wh/cdc/users"
    val rep = new BucketedReplica(root, nBuckets = 4)
    rep.destroy()
    // a broad commit then a single-key commit: current bucket files now
    // live in two different version dirs (the scatter compact folds)
    val oneKey = seed.select(min(col("user_id"))).collect()(0).getLong(0)
    rep.commit(seed.filter(col("user_id") =!= oneKey))
    rep.commit(seed.filter(col("user_id") === oneKey))
    val cold = coldSession(wh)
    val before = rowsOf(rep.read(spark))

    // two commits spread current bucket files across two version dirs;
    // compact folds them into ONE fresh version (content unchanged)
    val vBefore = rep.currentVersion.get
    assert(rep.read(spark).inputFiles.map(_.split("/data/")(1).split("/")(0))
      .toSet.size === 2, "precondition: bucket files scattered across versions")
    cold.sql("CALL graft.system.compact('cdc.users')")
    assert(rowsOf(rep.read(spark)) === before, "compact must not change content")
    assert(rep.currentVersion.get === vBefore + 1)
    assert(rep.read(spark).inputFiles.map(_.split("/data/")(1).split("/")(0))
      .toSet.size === 1, "compact must fold the version scatter")

    cold.sql("CALL graft.system.rebucket('cdc.users', 8)")
    assert(rowsOf(new BucketedReplica(root, nBuckets = 8).read(spark)) === before,
      "rebucket must relayout without changing content")

    // SQL DELETE writes tombstones; the GC procedure drops provably-old ones
    cold.sql("DELETE FROM graft.cdc.users WHERE user_id % 3 = 0")
    val rep8 = new BucketedReplica(root, nBuckets = 8)
    assert(rep8.read(spark).filter(col("op") === "DELETE").count() > 0)
    val horizon = seed.agg(max(col("ts_ns"))).collect()(0).getLong(0) + 1
    cold.sql(s"CALL graft.system.compact_tombstones('cdc.users', $horizon)")
    assert(rep8.read(spark).filter(col("op") === "DELETE").count() === 0,
      "past-watermark tombstones must be reclaimed")
    assert(rowsOf(rep8.live(spark)) ===
      rowsOf(rep8.read(spark)), "live content survives the GC")

    val e = intercept[Exception](cold.sql("CALL graft.system.no_such_proc('x')"))
    val chain = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(chain.contains("compact_tombstones"),
      s"unknown procedure must list the available ones, got: $chain")
  }

  test("CALL graft.system.clone creates a queryable zero-copy table") {
    val wh = tmpDir("ddl_clone")
    val root = s"$wh/cdc/users"
    val rep = new BucketedReplica(root, nBuckets = 4)
    rep.destroy(); rep.commit(seed)
    val cold = coldSession(wh)
    val before = rowsOf(rep.live(spark))

    cold.sql("CALL graft.system.clone('cdc.users', 'cdc.users_dev')")
    // discoverable by name from the cold session, content identical
    assert(rowsOf(cold.sql(
      "SELECT * FROM graft.cdc.users_dev WHERE op <> 'DELETE'")) === before)
    // zero data bytes under the clone root
    assert(!new java.io.File(s"$wh/cdc/users_dev/data").exists(),
      "shallow clone wrote data files")
    // SQL DML on the clone diverges it; the source never moves
    cold.sql("DELETE FROM graft.cdc.users_dev WHERE user_id % 2 = 0")
    assert(rowsOf(rep.live(spark)) === before, "clone DML leaked to source")
    assert(cold.sql("SELECT * FROM graft.cdc.users_dev " +
      "WHERE op <> 'DELETE' AND user_id % 2 = 0").isEmpty)
    // collision refused; detach deregisters
    intercept[Exception](
      cold.sql("CALL graft.system.clone('cdc.users', 'cdc.users_dev')"))
    cold.sql("CALL graft.system.detach_clone('cdc.users', 'cdc.users_dev')")
    assert(new BucketedReplica(root, nBuckets = 4).registeredClones.isEmpty)
  }

  test("a crashed DROP's remnants are recoverable from a COLD SQL session: " +
    "finish_drop sweeps what DROP TABLE IF EXISTS cannot reach") {
    val wh = tmpDir("ddl_finish_drop")
    val rep = new BucketedReplica(s"$wh/cdc/users", nBuckets = 4)
    rep.destroy(); rep.commit(seed)
    // the crashed-DROP state: visibility flipped (_META gone), committed
    // rows still on disk — the resurrection hazard CREATE must refuse
    assert(new java.io.File(s"$wh/cdc/users/_META").delete())
    val cold = coldSession(wh)

    // SQL DROP TABLE IF EXISTS no-ops: DropTableExec probes tableExists
    // (visible tables only) before dropTable, so the sweep arm is
    // unreachable from here — exactly the wedge finish_drop exists for
    cold.sql("DROP TABLE IF EXISTS graft.cdc.users")
    assert(new java.io.File(s"$wh/cdc/users/data").exists(),
      "IF EXISTS on a remnant must be a no-op (nothing visible to drop)")

    // CREATE over the remnants refuses loudly and names the recovery verb
    val e = intercept[Exception](cold.sql(
      """CREATE TABLE graft.cdc.users (
        |  op STRING, tbl STRING, pos BIGINT, ts_ns BIGINT,
        |  user_id BIGINT, value DOUBLE, event_type STRING)
        |TBLPROPERTIES ('pk' = 'user_id', 'nBuckets' = '4')""".stripMargin))
    assert(e.getMessage.contains("finish_drop"),
      s"the refusal must point at the SQL-reachable sweep, got: ${e.getMessage}")

    // the named recovery works from the same cold session, and CREATE
    // then provisions a FRESH table — zero resurrected rows
    cold.sql("CALL graft.system.finish_drop('cdc.users')")
    assert(!new java.io.File(s"$wh/cdc/users").exists(), "remnants not swept")
    cold.sql(
      """CREATE TABLE graft.cdc.users (
        |  op STRING, tbl STRING, pos BIGINT, ts_ns BIGINT,
        |  user_id BIGINT, value DOUBLE, event_type STRING)
        |TBLPROPERTIES ('pk' = 'user_id', 'nBuckets' = '4')""".stripMargin)
    assert(cold.sql("SELECT * FROM graft.cdc.users").count() === 0,
      "a re-created table must not resurrect the dropped rows")

    // guard rails: finish_drop refuses a VISIBLE table outright
    val e2 = intercept[Exception](
      cold.sql("CALL graft.system.finish_drop('cdc.users')"))
    assert(e2.getMessage.contains("visible table"),
      s"finish_drop on a live table must refuse, got: ${e2.getMessage}")
  }

  test("a table (or namespace) literally named 'data' is not a drop remnant: " +
    "neither dropTable nor finish_drop may sweep the namespace holding it") {
    val wh = tmpDir("ddl_data_name")
    // cdc/data is a VISIBLE table whose name collides with the replica's
    // internal data dir; cdc/deep/data/users nests a namespace named data
    val repData = new BucketedReplica(s"$wh/cdc/data", nBuckets = 4)
    repData.destroy(); repData.commit(seed)
    val repDeep = new BucketedReplica(s"$wh/cdc/deep/data/users", nBuckets = 4)
    repDeep.destroy(); repDeep.commit(seed)
    val cold = coldSession(wh)
    val cat = new graft.plans.GraftCatalog()
    cat.initialize("graft", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("root", wh)))
    import org.apache.spark.sql.connector.catalog.Identifier

    // the adversarial shapes from review: a nested NAMESPACE named 'data'
    // whose child is a visible table named like a version dir ('v2') —
    // and one deeper still, a visible table named 'bucket=b' under a
    // v-named namespace. Any name-shape match shallower than "subtree
    // holds a visible table" classifies these as remnants and sweeps them.
    val repV2 = new BucketedReplica(s"$wh/cdc2/data/v2", nBuckets = 4)
    repV2.destroy(); repV2.commit(seed)
    val repBk = new BucketedReplica(s"$wh/cdc3/data/v1/bucket=b", nBuckets = 4)
    repBk.destroy(); repBk.commit(seed)

    // direct-API dropTable on the NAMESPACE ident: the 'data' child is a
    // table, not remnant state — must report absent and delete NOTHING
    assert(!cat.dropTable(Identifier.of(Array.empty, "cdc")),
      "a namespace is not a table, visible or remnant")
    assert(!cat.dropTable(Identifier.of(Array("cdc"), "deep")),
      "a namespace whose grandchild dirs are tables is not a remnant")
    assert(!cat.dropTable(Identifier.of(Array.empty, "cdc2")),
      "a namespace with a table literally named v2 under a data dir " +
        "is not a remnant (the bucket-layer check)")
    assert(cold.sql("SELECT * FROM graft.cdc2.data.v2").count() === seed.count(),
      "dropTable swept a visible table named v2 under a data namespace")
    cold.sql("CALL graft.system.finish_drop('cdc2')")
    assert(cold.sql("SELECT * FROM graft.cdc2.data.v2").count() === seed.count(),
      "finish_drop swept the v2-named table")
    assert(!cat.dropTable(Identifier.of(Array.empty, "cdc3")),
      "a visible table named bucket=b below a v-dir is not remnant payload")
    cold.sql("CALL graft.system.finish_drop('cdc3')")
    assert(BucketedReplica.open(s"$wh/cdc3/data/v1/bucket=b")
      .live(spark).count() > 0, "the bucket=-named table was swept")

    // and a stray _PTR backup is NOT remnant state: the store layer
    // defines it as nobody's, so CREATE proceeds over it and finish_drop
    // leaves it alone (it carries nothing to resurrect or to sweep)
    val strayDir = new java.io.File(s"$wh/stray_t"); strayDir.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$wh/stray_t/_PTR-3.bak"), "manual copy")
    cold.sql("CALL graft.system.finish_drop('stray_t')") // no-op, keeps it
    assert(new java.io.File(s"$wh/stray_t/_PTR-3.bak").exists,
      "finish_drop deleted an operator's backup file")
    cold.sql(
      """CREATE TABLE graft.stray_t (
        |  op STRING, tbl STRING, pos BIGINT, ts_ns BIGINT,
        |  user_id BIGINT, value DOUBLE, event_type STRING)
        |TBLPROPERTIES ('pk' = 'user_id', 'nBuckets' = '4')""".stripMargin)
    assert(cold.sql("SELECT * FROM graft.stray_t").count() === 0,
      "CREATE over a stray backup must provision a fresh empty table")
    assert(cold.sql("SELECT * FROM graft.cdc.data").count() === seed.count(),
      "dropTable on the namespace ident swept a visible table named data")
    assert(cold.sql("SELECT * FROM graft.cdc.deep.data.users").count()
      === seed.count(), "nested namespace named data swept")

    // finish_drop on the same idents: remnant-gated, so a no-op
    cold.sql("CALL graft.system.finish_drop('cdc')")
    cold.sql("CALL graft.system.finish_drop('cdc.deep')")
    assert(cold.sql("SELECT * FROM graft.cdc.data").count() === seed.count(),
      "finish_drop swept a namespace holding a table named data")

    // and a REAL remnant whose data dir holds v<N> version dirs still
    // sweeps (the narrowing must not lose the genuine crashed-DROP case)
    assert(new java.io.File(s"$wh/cdc/data/_META").delete())
    assert(!cat.dropTable(Identifier.of(Array("cdc"), "data")),
      "remnant is not a visible table")
    assert(!new java.io.File(s"$wh/cdc/data").exists(),
      "genuine crashed-DROP remnants must still be swept")
  }

  test("a crashed-DROP dir REUSED AS A NAMESPACE: finish_drop (and " +
    "dropTable's remnant arm) deletes only the remnant entries, never " +
    "the live child tables") {
    val wh = tmpDir("ddl_reused_ns")
    val rep = new BucketedReplica(s"$wh/cdc", nBuckets = 4)
    rep.destroy(); rep.commit(seed)
    // the crashed-DROP state: visibility flipped, replica state remains
    assert(new java.io.File(s"$wh/cdc/_META").delete())
    // …and the dir is later reused as a NAMESPACE holding a LIVE table
    // (createNamespace does no remnant check; createTable only checks
    // its own dir) — the dir now holds BOTH canonical remnant files and
    // a visible child table
    val child = new BucketedReplica(s"$wh/cdc/users", nBuckets = 4)
    child.destroy(); child.commit(seed)
    val cold = coldSession(wh)
    assert(cold.sql("SELECT * FROM graft.cdc.users").count() === seed.count())

    cold.sql("CALL graft.system.finish_drop('cdc')")
    assert(cold.sql("SELECT * FROM graft.cdc.users").count() === seed.count(),
      "finish_drop recursively deleted a live table inside the reused dir")
    // the remnant entries themselves ARE gone: the dropped table's rows
    // can no longer resurrect, and the dir now reads as a plain namespace
    val left = Option(new java.io.File(s"$wh/cdc").listFiles())
      .getOrElse(Array.empty).map(_.getName).toSet
    assert(!left.exists(n => n.startsWith("_PTR-") ||
        n.matches("manifest-\\d+(-[^.]+)?\\.tsv")) && !left.contains("data"),
      s"remnant entries survived the surgical sweep: $left")

    // dropTable's remnant arm takes the same guard: rebuild the remnant
    // state around the still-live child and drive the direct-API path
    val rep2 = new BucketedReplica(s"$wh/cdc2", nBuckets = 4)
    rep2.destroy(); rep2.commit(seed)
    assert(new java.io.File(s"$wh/cdc2/_META").delete())
    val child2 = new BucketedReplica(s"$wh/cdc2/users", nBuckets = 4)
    child2.destroy(); child2.commit(seed)
    val cat = new graft.plans.GraftCatalog()
    cat.initialize("graft", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("root", wh)))
    import org.apache.spark.sql.connector.catalog.Identifier
    assert(!cat.dropTable(Identifier.of(Array.empty, "cdc2")),
      "a remnant dir is not a visible table")
    assert(cold.sql("SELECT * FROM graft.cdc2.users").count() === seed.count(),
      "dropTable's remnant arm recursively deleted a live child table")
    assert(!new java.io.File(s"$wh/cdc2/data").exists(),
      "dropTable's remnant arm must still sweep the remnant entries")
  }

  test("SHOW TABLES and DESCRIBE resolve through the catalog") {
    val wh = tmpDir("ddl_show")
    val rep = new BucketedReplica(s"$wh/cdc/users", nBuckets = 4)
    rep.destroy(); rep.commit(seed)
    val cold = coldSession(wh)
    val shown = cold.sql("SHOW TABLES IN graft.cdc").collect()
      .map(_.getString(1)).toSeq
    assert(shown === Seq("users"))
    val desc = cold.sql("DESCRIBE TABLE graft.cdc.users").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc.get("user_id") === Some("bigint"))
    assert(desc.get("value") === Some("double"))
  }
}
