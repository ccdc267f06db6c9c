package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.connector.catalog.{Identifier, TableChange}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.streaming.{BucketedReplica, CdcStream, StoreIO}

/** Crash sweep over the catalog's DDL protocols — the CrashSweepSpec
  * discipline applied to the last StoreIO consumer, plus the two
  * crash-visibility contracts this round hardened:
  *
  *  - CREATE TABLE commits via a write-once, content-atomic `_META`
  *    naming an attempt-unique schema payload, so a death mid-CREATE can
  *    never leave a VISIBLE table with a torn pk/layout/schema (the old
  *    plain writes could: `exists(_META)` went true with half the bytes
  *    durable, and the truncated pk line silently fell back to the
  *    default key);
  *  - DROP TABLE flips visibility first (`_META` side copy, then
  *    primary), so a death mid-delete leaves an invisible remnant dir —
  *    swept by the next DROP, REFUSED by CREATE when it holds committed
  *    rows (silently re-creating over pointers/data would resurrect the
  *    dropped rows under the new table).
  */
class CatalogCrashSweepSpec extends SparkSpecBase {

  private def catalogOn(wh: String): graft.plans.GraftCatalog = {
    val c = new graft.plans.GraftCatalog()
    c.initialize("graft_cs",
      new CaseInsensitiveStringMap(java.util.Map.of("root", wh)))
    c
  }

  private val ident = Identifier.of(Array("cdc"), "users")

  private val declared = StructType(Seq(
    StructField("op", StringType), StructField("tbl", StringType),
    StructField("pos", LongType), StructField("ts_ns", LongType),
    StructField("user_id", LongType), StructField("value", DoubleType),
    StructField("event_type", StringType)))

  private def props(pk: String) = {
    val m = new java.util.HashMap[String, String]()
    m.put("pk", pk); m.put("nBuckets", "4"); m
  }

  /** Catalog + replica views must AGREE at every crash state: a visible
    * table must open with its full declared contract, an invisible one
    * must not open at all, and leftover remnants are part of the digest
    * (retry convergence must sweep them). */
  private def ddlState(wh: String): Seq[String] = {
    val cat = catalogOn(wh)
    val tdir = s"$wh/cdc/users"
    if (cat.tableExists(ident)) {
      val rep = BucketedReplica.open(tdir)
      Seq(s"T|pk=${rep.pk}|schema=${rep.storedSchema.json}") ++
        rep.read(spark).collect().map("R|" + _.toString).sorted
    } else {
      intercept[Exception] { BucketedReplica.open(tdir) } // both views agree
      val leftovers = Option(new java.io.File(tdir).listFiles())
        .getOrElse(Array.empty).map(_.getName)
        .filter(n => n.startsWith("_PTR-") || n.startsWith("manifest-") ||
          n == "data")
      Seq("absent") ++ leftovers.sorted.map("L|" + _)
    }
  }

  private def deleteTree(p: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => { Files.delete(f); () })
      finally s.close()
    }
  }

  private def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    if (!Files.exists(src)) return
    val s = Files.walk(src)
    try s.forEach { (f: Path) =>
      val t = dst.resolve(src.relativize(f))
      if (Files.isDirectory(f)) { Files.createDirectories(t); () }
      else { Files.createDirectories(t.getParent)
        Files.copy(f, t, java.nio.file.StandardCopyOption.REPLACE_EXISTING); () }
    } finally s.close()
  }

  /** Same engine as CrashSweepSpec.sweep, over the warehouse root. */
  private def sweep(label: String, wh: String, op: () => Unit,
                    torn: Boolean = false): Int = {
    val rootPath = java.nio.file.Paths.get(wh)
    val pre = ddlState(wh)
    val snap = java.nio.file.Files.createTempDirectory("ddl_snap")
    copyTree(rootPath, snap)
    op()
    val post = ddlState(wh)
    var k = 1; var points = 0; var done = false
    while (!done) {
      assert(k <= 100, s"$label: runaway sweep at k=$k")
      deleteTree(rootPath); copyTree(snap, rootPath)
      StoreIO.Faults.armAt(wh, k, torn)
      var err: Option[Throwable] = None
      try op() catch { case t: Throwable => err = Some(t) }
      val (fired, _) = StoreIO.Faults.disarm()
      err match {
        case None =>
          assert(!fired, s"$label: op succeeded though crash $k fired")
          assert(ddlState(wh) == post, s"$label: uninjected rerun diverged")
          done = true
        case Some(t) =>
          if (!fired) throw new AssertionError(
            s"$label: REAL failure (no injection) at point $k", t)
          points += 1
          val s = ddlState(wh)
          assert(s == pre || s == post ||
            // the one allowed crash state: logically applied, remnants not
            // yet swept (DROP died mid-delete) — retry must converge it
            s.headOption.contains(post.headOption.getOrElse("")) &&
              s.forall(l => post.contains(l) || l.startsWith("L|")),
            s"$label crash@$k: state neither pre, post, nor " +
              s"post-with-remnants:\n  got  $s\n  pre  $pre\n  post $post")
          op() // the DDL retry
          assert(ddlState(wh) == post,
            s"$label crash@$k: retry did not converge")
      }
      k += 1
    }
    deleteTree(snap)
    info(s"$label: $points crash points swept${if (torn) " (torn)" else ""}")
    points
  }

  private def env(rows: Seq[(String, Long, Long, Double, String)]): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (o, pos, uid, v, e) =>
        Row(o, "users", pos, pos * 1000L, uid, v, e) }: _*),
      CdcStream.envelopeSchema)

  private val batch1 = Seq(
    ("INSERT", 1L, 10L, 5.00, "a"), ("INSERT", 2L, 11L, 7.25, "b"))

  test("CREATE TABLE: a crash at every mutation (torn included) leaves the " +
    "table invisible or complete — never visible with a torn contract") {
    val wh = tmpDir("ddl_create")
    val cat = catalogOn(wh)
    cat.createNamespace(Array("cdc"), java.util.Map.of())
    def create(): Unit = {
      catalogOn(wh).createTable(ident, declared,
        Array.empty[org.apache.spark.sql.connector.expressions.Transform],
        props("user_id"))
      ()
    }
    // the retry inside the sweep hits createTable again: it must not be
    // refused over its own crashed attempt's schema payload
    val p = sweep("catalog create", wh, create)
    assert(p >= 3, s"create sweep covered only $p points")
    deleteTree(java.nio.file.Paths.get(s"$wh/cdc/users"))
    val pt = sweep("catalog create (torn)", wh, create, torn = true)
    assert(pt >= 3, s"torn create sweep covered only $pt points")
  }

  test("CREATE TABLE with a custom pk survives a torn _META: the pre-fix " +
    "failure mode (visible table, silently-defaulted pk) is impossible") {
    val wh = tmpDir("ddl_torn_pk")
    val cat = catalogOn(wh)
    cat.createNamespace(Array("cdc"), java.util.Map.of())
    // crash AT the _META payload write, torn: half the bytes durable.
    // Mutations before it: namespace mkdir already done; table mkdir (1),
    // schema payload write (2), _META tmp write (3) ← tear here
    StoreIO.Faults.armAt(wh, 3, torn = true)
    intercept[Throwable] {
      cat.createTable(ident, declared,
        Array.empty[org.apache.spark.sql.connector.expressions.Transform],
        props("event_type"))
    }
    val (fired, tore) = StoreIO.Faults.disarm()
    assert(fired)
    assert(tore, "point 3 must be the tearable _META payload write")
    assert(!catalogOn(wh).tableExists(ident),
      "a torn CREATE left a VISIBLE table — the pre-fix hole")
    // retry with the same pk converges to the full contract
    catalogOn(wh).createTable(ident, declared,
      Array.empty[org.apache.spark.sql.connector.expressions.Transform],
      props("event_type"))
    assert(BucketedReplica.open(s"$wh/cdc/users").pk === "event_type")
  }

  test("DROP TABLE: visibility flips first, remnants are swept by retry, " +
    "and CREATE refuses a remnant dir that still holds committed rows") {
    val wh = tmpDir("ddl_drop")
    val cat = catalogOn(wh)
    cat.createNamespace(Array("cdc"), java.util.Map.of())
    cat.createTable(ident, declared,
      Array.empty[org.apache.spark.sql.connector.expressions.Transform],
      props("user_id"))
    BucketedReplica.open(s"$wh/cdc/users").commit(env(batch1))
    val p = sweep("catalog drop", wh,
      () => { catalogOn(wh).dropTable(ident); () })
    assert(p >= 3, s"drop sweep covered only $p points")
    // resurrection guard: rebuild the committed table, hand-create the
    // crashed-drop state (no _META, pointers+data present), then CREATE
    catalogOn(wh).createTable(ident, declared,
      Array.empty[org.apache.spark.sql.connector.expressions.Transform],
      props("user_id"))
    BucketedReplica.open(s"$wh/cdc/users").commit(env(batch1))
    new java.io.File(s"$wh/cdc/users/_META").delete()
    val e = intercept[IllegalArgumentException] {
      catalogOn(wh).createTable(ident, declared,
        Array.empty[org.apache.spark.sql.connector.expressions.Transform],
        props("user_id"))
    }
    assert(e.getMessage.contains("remnants"),
      s"CREATE over committed remnants must refuse loudly, got: ${e.getMessage}")
    // the documented path: DROP IF EXISTS finishes the interrupted drop
    assert(!catalogOn(wh).dropTable(ident), "remnant is not a visible table")
    assert(!new java.io.File(s"$wh/cdc/users").exists(), "remnants not swept")
    catalogOn(wh).createTable(ident, declared,
      Array.empty[org.apache.spark.sql.connector.expressions.Transform],
      props("user_id")) // now clean
  }

  test("DROP NAMESPACE CASCADE: every crash point leaves each table fully " +
    "visible or an invisible remnant — never visible with swept data") {
    val wh = tmpDir("ddl_dropns")
    val cat = catalogOn(wh)
    cat.createNamespace(Array("cdc"), java.util.Map.of())
    val id2 = Identifier.of(Array("cdc"), "orders")
    Seq(ident, id2).foreach { id =>
      catalogOn(wh).createTable(id, declared,
        Array.empty[org.apache.spark.sql.connector.expressions.Transform],
        props("user_id"))
      BucketedReplica.open(s"$wh/cdc/${id.name}").commit(env(batch1))
    }
    // state: per-table visibility + fsck of every VISIBLE table (the
    // hazard under test: visible + data swept), plus the namespace itself
    def nsState(): Seq[String] = {
      val cat2 = catalogOn(wh)
      val tables = Seq(ident, id2).map { id =>
        if (cat2.tableExists(id)) {
          val rep = BucketedReplica.open(s"$wh/cdc/${id.name}")
          val bad = rep.fsck(spark).filter(!col("ok")).collect()
          assert(bad.isEmpty,
            s"visible table ${id.name} fails fsck mid-crash: ${bad.mkString(";")}")
          s"T|${id.name}|rows=${rep.read(spark).count()}"
        } else s"absent|${id.name}"
      }
      tables :+ s"ns=${new java.io.File(s"$wh/cdc").exists()}"
    }
    val rootPath = java.nio.file.Paths.get(wh)
    val pre = nsState()
    val snap = java.nio.file.Files.createTempDirectory("ns_snap")
    copyTree(rootPath, snap)
    catalogOn(wh).dropNamespace(Array("cdc"), true)
    val post = nsState()
    var k = 1; var done = false; var points = 0
    while (!done) {
      assert(k <= 100, "runaway namespace sweep")
      deleteTree(rootPath); copyTree(snap, rootPath)
      StoreIO.Faults.armAt(wh, k)
      var err: Option[Throwable] = None
      try catalogOn(wh).dropNamespace(Array("cdc"), true)
      catch { case t: Throwable => err = Some(t) }
      val (fired, _) = StoreIO.Faults.disarm()
      err match {
        case None => assert(!fired); done = true
        case Some(t) =>
          if (!fired) throw new AssertionError(s"real failure at $k", t)
          points += 1
          nsState() // asserts fsck of every still-visible table internally
          catalogOn(wh).dropNamespace(Array("cdc"), true) // retry
          assert(nsState() === post, s"drop-namespace retry at $k diverged")
      }
      k += 1
    }
    deleteTree(snap)
    info(s"drop-namespace cascade: $points crash points swept")
    assert(points >= 4, s"cascade sweep covered only $points points")
  }

  test("ALTER TABLE ADD COLUMN survives every crash point before and after " +
    "the first commit") {
    val wh = tmpDir("ddl_alter")
    val cat = catalogOn(wh)
    cat.createNamespace(Array("cdc"), java.util.Map.of())
    cat.createTable(ident, declared,
      Array.empty[org.apache.spark.sql.connector.expressions.Transform],
      props("user_id"))
    // retry-shaped: ADD COLUMN is not idempotent by contract (a second
    // apply refuses "already exists"), so the operator's retry after an
    // ambiguous crash is check-then-apply — exactly what this wraps
    def alter(col0: String): () => Unit = () => {
      try catalogOn(wh).alterTable(ident,
        TableChange.addColumn(Array(col0), StringType))
      catch { case e: IllegalArgumentException
        if e.getMessage.contains("already exists") => }
      ()
    }
    // pre-first-commit: the contract file rewrite (overwriteSafe pair)
    val p1 = sweep("alter pre-commit", wh, alter("note"))
    assert(p1 >= 2, s"pre-commit alter sweep covered only $p1 points")
    // post-first-commit: the versioned metadata-only publish
    BucketedReplica.open(s"$wh/cdc/users").commit(env(batch1))
    val p2 = sweep("alter post-commit", wh, alter("note2"))
    assert(p2 >= 3, s"post-commit alter sweep covered only $p2 points")
  }
}
