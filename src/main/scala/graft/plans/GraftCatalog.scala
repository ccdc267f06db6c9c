package graft.plans

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, InsertIntoStatement, LogicalPlan, MergeIntoTable, Project, UpdateTable, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.streaming.{BucketedReplica, StoreIO}

/** Durable catalog identity for [[BucketedReplica]] stores — the reference's
  * replica is a discoverable warehouse table analysts address BY NAME from
  * any session (reference main.tf:197-215: `menagerie_reporting.pets` exists
  * independently of any job that wrote it). This catalog gives the Spark
  * replica the same property:
  *
  * {{{
  *   spark.sql.catalog.graft      = graft.plans.GraftCatalog
  *   spark.sql.catalog.graft.root = hdfs://…/replicas   // or a local dir
  *
  *   SELECT * FROM graft.crm.users                       -- live rows
  *   SELECT * FROM graft.crm.users VERSION AS OF 3       -- time travel
  *   MERGE INTO graft.crm.users t USING staged s ON …    -- replica MERGE
  * }}}
  *
  * No in-session `register` call: a COLD session with only the two confs
  * resolves the name through [[GraftCatalog.loadTable]], which opens the
  * replica from its own durable metadata (`_META`, manifest, schema files).
  *
  * Identity vs execution: the catalog provides the V2 IDENTITY surface
  * (names, schemas, versions, create/drop); execution stays on the engine's
  * native parquet scan. [[GraftTableReads]] replaces each resolved
  * [[GraftTable]] relation with the replica's parquet plan during analysis,
  * so reads get the full Catalyst treatment — column pruning and filter
  * pushdown reach the files, AQE sees ordinary file partitions — rather
  * than a bespoke DSv2 reader reimplementing (worse) what the parquet
  * source already does. MERGE keeps the bucket-bounded rewrite: the
  * intercepted command routes through [[GraftMergeCommand]], same as the
  * registered-view surface, O(touched buckets) I/O never O(replica).
  *
  * Layout: `<root>/<namespace…>/<table>` — a table is any directory holding
  * a replica `_META`; a namespace is any other directory. Multi-level
  * namespaces map to nested directories.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog {

  private var catalogName: String = _
  private var root: String = _
  private var io: StoreIO = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(throw new IllegalArgumentException(
      s"catalog $name needs spark.sql.catalog.$name.root=<replica warehouse dir>"))
    io = new StoreIO(root, StoreIO.sessionConf())
  }

  override def name(): String = catalogName

  private def rel(parts: Seq[String]): String = {
    require(parts.nonEmpty && parts.forall(p =>
      p.nonEmpty && !p.contains("/") && !p.contains("..")),
      s"illegal identifier ${parts.mkString(".")}")
    parts.mkString("/")
  }

  private def tableDir(ident: Identifier): String =
    rel(ident.namespace.toSeq :+ ident.name)

  private def parts(ident: Identifier): String =
    (ident.namespace.toSeq :+ ident.name).mkString(".")

  private def isTable(dir: String): Boolean =
    io.exists(io.path(s"$dir/_META"))

  // ---- TableCatalog ---------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val nsDir = if (namespace.isEmpty) "" else rel(namespace.toSeq) + "/"
    val p = if (namespace.isEmpty) io.root else io.path(rel(namespace.toSeq))
    if (!io.exists(p)) throw new NoSuchNamespaceException(namespace)
    io.listDirs(p).map(_.getName).filter(n => isTable(s"$nsDir$n"))
      .sorted.map(n => Identifier.of(namespace, n)).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    GraftTable(s"$catalogName.${ident.toString}", s"$root/$dir", None)
  }

  /** `VERSION AS OF v` — maps to the replica's retained-version read
    * ([[BucketedReplica.readAt]]); non-retained versions fail there with
    * the retention message. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"$catalogName versions are commit numbers; got '$version'")
    }
    GraftTable(s"$catalogName.${ident.toString}", s"$root/$dir", Some(v))
  }

  /** `TIMESTAMP AS OF ts` — Spark hands epoch MICROseconds; resolve to the
    * newest retained version committed at or before that instant
    * ([[BucketedReplica.versionAt]]) and pin it, same read path as
    * `VERSION AS OF`. Instants older than the retention window fail there
    * with the bounded-retention message. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val rep = BucketedReplica.open(s"$root/$dir")
    GraftTable(s"$catalogName.${ident.toString}", s"$root/$dir",
      Some(rep.versionAt(timestampMicros / 1000L)))
  }

  /** CREATE TABLE — provisions an EMPTY replica: writes `_META` (key +
    * bucket layout, from table properties `pk` / `nBuckets`) and records the
    * declared columns as the pre-first-commit schema contract. The first
    * commit/MERGE then versions the schema durably. */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft tables are hash-bucketed by their primary key; PARTITIONED BY is not supported")
    val dir = tableDir(ident)
    if (isTable(dir)) throw new TableAlreadyExistsException(ident)
    // refuse a dropped table's remnant dir: a DROP that crashed mid-delete
    // leaves an invisible dir that may still hold replica state (pointers,
    // data); silently creating over it would RESURRECT the dropped rows
    // under the new table. finish_drop (or a direct-API dropTable) sweeps it.
    val remnants = replicaRemnants(dir)
    // the referenced recovery must be SQL-reachable: Spark's DropTableExec
    // probes tableExists (which reports only VISIBLE tables) before calling
    // dropTable, so `DROP TABLE IF EXISTS` from SQL silently no-ops on a
    // remnant dir and never reaches the sweep arm — the finish_drop
    // procedure is the cold-session door to it (direct-API callers may
    // equivalently re-run catalog.dropTable)
    require(remnants.isEmpty,
      s"dropped-table remnants at $root/$dir (${remnants.mkString(", ")}); " +
        s"run CALL $catalogName.system.finish_drop('${parts(ident)}') to " +
        "finish the interrupted drop, then re-create")
    val pk = Option(properties.get("pk")).getOrElse("user_id")
    val n = Option(properties.get("nBuckets")).map(_.toInt).getOrElse(32)
    require(schema.fieldNames.contains(pk),
      s"declared columns must include the primary key '$pk' (set TBLPROPERTIES ('pk'='…'))")
    io.mkdirs(io.path(dir))
    // attempt-unique schema payload + a write-once `_META` commit naming
    // it (the replica's pointer discipline applied to the catalog
    // bootstrap): the _META create is content-atomic (tmp + rename), so a
    // crash mid-CREATE can never leave a VISIBLE table with a torn
    // pk/layout line — `exists(_META)` is the table's commit witness, and
    // a half-created table is invisible and retryable. A concurrent
    // double CREATE loses the exclusive create loudly instead of
    // last-writer-wins mixing one creator's schema with the other's meta.
    val attempt = java.util.UUID.randomUUID().toString.take(8)
    io.writeString(io.path(s"$dir/_SCHEMA-$attempt.json"), schema.json + "\n")
    try io.createExclusive(io.path(s"$dir/_META"),
      s"nBuckets=$n\npk=$pk\nschema=_SCHEMA-$attempt.json\n")
    catch { case _: java.io.IOException =>
      throw new TableAlreadyExistsException(ident)
    }
    GraftTable(s"$catalogName.${ident.toString}", s"$root/$dir", None)
  }

  /** COMMITTED replica state inside a dir that is not a visible table
    * (`_META` absent) — the signature of a DROP that crashed after the
    * visibility flip. Deliberately narrow: pointers, manifests, and data
    * carry dropped ROWS (the resurrection hazard), while an orphan
    * `_SCHEMA-<attempt>.json` is just a crashed CREATE's uncommitted
    * payload — harmless to overwrite, so a CREATE retry must not be
    * refused over it. Only CANONICAL control names count (`_PTR-<v>`,
    * `manifest-<v>[-attempt].tsv`): a `_PTR-3.bak` manual backup is a
    * stray the whole store layer defines as nobody's — counting it here
    * would refuse CREATE over, and let finish_drop delete, a file that
    * carries nothing. A child dir NAMED `data` counts only when it holds
    * the replica's own version-dir SHAPE (`v<N>…` with `bucket=` payload)
    * AND no visible table exists ANYWHERE under it: a namespace can
    * legitimately contain a table/namespace literally called `data`, one
    * whose child is named `v2` (version-suffixed table names), or even a
    * table named `bucket=b` another level down — any name-shape match
    * shallower than "subtree holds a visible table" would make
    * [[dropTable]]'s remnant arm recursively delete live tables. A
    * version dir holding only `_temporary` wreckage (no bucket= payload)
    * carries no committed rows — not a resurrection hazard, so not a
    * remnant. */
  private def subtreeHasTable(rel: String): Boolean =
    isTable(rel) || io.listDirs(io.path(rel))
      .exists(d => subtreeHasTable(s"$rel/${d.getName}"))

  private def replicaRemnants(dir: String): Seq[String] = {
    io.listFiles(io.path(dir)).map(_.getName)
      .filter(n =>
        (n.startsWith("_PTR-") &&
          n.stripPrefix("_PTR-").toLongOption.isDefined) ||
        n.matches("manifest-\\d+(-[^.]+)?\\.tsv")) ++
      (if (io.listDirs(io.path(s"$dir/data")).exists { v =>
             v.getName.matches("v\\d+(-.+)?") &&
               io.listDirs(v).exists(_.getName.startsWith("bucket="))
           } && !subtreeHasTable(s"$dir/data")) Seq("data") else Nil)
  }

  /** `ALTER TABLE … ADD COLUMN(S)` — maps to the replica's monotone schema
    * evolution ([[BucketedReplica.widenSchema]]): a metadata-only version
    * flip appending nullable fields; stored rows read NULL for them, the
    * next commit writes them physically, and every retained version keeps
    * reading under the schema it committed with. Every other ALTER is
    * refused with the reason: drops/renames/type changes would orphan rows
    * already stored under the old contract (the supported full-rewrite
    * path is `rebucket`/`compact`). */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val adds = changes.map {
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          s"nested ADD COLUMN ${a.fieldNames.mkString(".")} is not supported: " +
            "replica columns are flat envelope fields")
        require(a.position == null,
          "ADD COLUMN ... FIRST/AFTER is not supported: evolution is " +
            "append-only so stored files stay position-stable")
        require(a.isNullable,
          s"ADD COLUMN ${a.fieldNames.head} must be nullable: " +
            "previously-stored rows read NULL for it")
        StructField(a.fieldNames.head, a.dataType, nullable = true)
      case other => throw new UnsupportedOperationException(
        s"unsupported ALTER ${other.getClass.getSimpleName} on replica " +
          s"$catalogName.$ident: only nullable ADD COLUMN maps to the " +
          "replica's monotone schema evolution — a drop/rename/retype " +
          "would orphan rows stored under the old contract")
    }
    BucketedReplica.open(s"$root/$dir").widenSchema(adds)
    GraftTable(s"$catalogName.${ident.toString}", s"$root/$dir", None)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    if (isTable(dir)) {
      // visibility flip FIRST: deleting `_META` (side copy, then primary —
      // the reverse order would leave a state the catalog calls dropped
      // but BucketedReplica.open's existsSafe fallback still opens) makes
      // the table logically gone in one atomic step, so a crash anywhere
      // in the bulk delete leaves an invisible remnant dir — swept by the
      // next DROP below, refused by CREATE — never a half-readable table
      io.delete(io.path(s"$dir/_META.next"))
      io.delete(io.path(s"$dir/_META"))
      io.delete(io.path(dir))
      true
    } else {
      val remnants = replicaRemnants(dir)
      if (remnants.nonEmpty) {
        // a crashed DROP's leftovers: finish the job; the table is already
        // logically dropped, so report absent (DROP IF EXISTS passes silently)
        sweepRemnants(dir, remnants)
      }
      false
    }
  }

  /** Finish a crashed DROP's delete pass. When the remnant dir's subtree
    * holds NO visible table, the whole dir goes — the complete sweep the
    * interrupted DROP would have done. When it DOES (a crashed-DROP dir
    * later reused as a NAMESPACE holds both remnant pointer/manifest
    * files and live child tables — createNamespace does no remnant
    * check), only the named remnant entries are deleted: a maintenance
    * verb that promises to sweep a dead table's leftovers must never
    * recursively delete a live one. */
  private def sweepRemnants(dir: String, remnants: Seq[String]): Unit =
    if (!subtreeHasTable(dir)) io.delete(io.path(dir))
    else remnants.foreach(n => io.delete(io.path(s"$dir/$n")))

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "RENAME is not supported: replica roots are addressed by durable path")

  // ---- ProcedureCatalog -----------------------------------------------------
  // The replica's maintenance verbs as SQL procedures — the operator runs
  // storage upkeep from the same SQL session the analysts use, no JVM call
  // required (the warehouse-table norm the rest of the catalog follows):
  //
  //   CALL graft.system.compact('cdc.users')
  //   CALL graft.system.rebucket('cdc.users', 64)
  //   CALL graft.system.compact_tombstones('cdc.users', <horizon_ns>)
  //   CALL graft.system.record_first_tag('cdc.users', <tag>)
  //
  // Each maps 1:1 onto the programmatic maintenance op, so every protocol
  // guarantee those carry (atomic pointer flip, loud loss of a race with a
  // live commit, watermark-gated tombstone GC) holds verbatim.

  private def repOf(table: String): graft.streaming.BucketedReplica = {
    val dir = rel(table.split('.').toSeq)
    if (!isTable(dir)) throw new NoSuchTableException(
      Identifier.of(table.split('.').dropRight(1), table.split('.').last))
    graft.streaming.BucketedReplica.open(s"$root/$dir")
  }

  private def spark: SparkSession = SparkSession.active

  private lazy val maintenanceProcs: Map[String, GraftProcedure] = {
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    def P(n: String, t: org.apache.spark.sql.types.DataType) =
      ProcedureParameter.in(n, t).build()
    def tbl(in: org.apache.spark.sql.catalyst.InternalRow): String =
      in.getUTF8String(0).toString
    Seq(
      GraftProcedure("compact",
        "fold multi-file buckets back to one file per bucket (same content, " +
          "fresh atomic version)",
        Array(P("table", StringType)),
        in => repOf(tbl(in)).compact(spark)),
      GraftProcedure("rebucket",
        "re-lay the replica across a new bucket count (the grown-100x fix); " +
          "racing live commits lose loudly and retry on the new layout",
        Array(P("table", StringType), P("n_buckets", IntegerType)),
        in => repOf(tbl(in)).rebucket(spark, in.getInt(1))),
      GraftProcedure("compact_tombstones",
        "drop tombstones older than the watermark horizon (safe once no " +
          "earlier position can still arrive)",
        Array(P("table", StringType), P("horizon", LongType)),
        in => repOf(tbl(in)).compactTombstones(spark, in.getLong(1))),
      GraftProcedure("record_first_tag",
        "durably backfill the birth tag of a pre-birth-tag replica " +
          "(consistent-cut bookkeeping; refuses unsound claims)",
        Array(P("table", StringType), P("tag", LongType)),
        in => repOf(tbl(in)).recordFirstTag(in.getLong(1))),
      GraftProcedure("clone",
        "zero-copy shallow clone of the table's current version into a " +
          "new catalog table (manifest-only; GC-safe — the source protects " +
          "clone-referenced files until detach_clone)",
        Array(P("source_table", StringType), P("dest_table", StringType)),
        in => {
          val destDir = rel(in.getUTF8String(1).toString.split('.').toSeq)
          // visibility = any pointer: a crashed half-clone (no _PTR-*) may
          // be retried; cloneShallow itself refuses live replicas and
          // provisioned empty tables
          require(!io.exists(io.path(destDir)) ||
            !io.listFiles(io.path(destDir)).exists(_.getName.startsWith("_PTR-")),
            s"clone target ${in.getUTF8String(1)} already exists")
          repOf(tbl(in)).cloneShallow(s"$root/$destDir"); ()
        }),
      GraftProcedure("add_check",
        "declare a CHECK constraint (ANSI: only FALSE violates, tombstones " +
          "exempt); validates existing live rows, then every later commit " +
          "rejects violating batches loudly before any write",
        Array(P("table", StringType), P("name", StringType),
          P("expression", StringType)),
        in => repOf(tbl(in)).addCheck(spark,
          in.getUTF8String(1).toString, in.getUTF8String(2).toString)),
      GraftProcedure("drop_check",
        "drop a declared CHECK constraint by name",
        Array(P("table", StringType), P("name", StringType)),
        in => repOf(tbl(in)).dropCheck(in.getUTF8String(1).toString)),
      GraftProcedure("add_fk",
        "declare a FOREIGN KEY (column → parent catalog table's pk; NULL " +
          "passes, tombstones exempt); validates existing rows, then every " +
          "commit anti-joins the batch against the parent's live keys",
        Array(P("table", StringType), P("name", StringType),
          P("column", StringType), P("parent_table", StringType)),
        in => repOf(tbl(in)).addForeignKey(spark,
          in.getUTF8String(1).toString, in.getUTF8String(2).toString,
          s"$root/${rel(in.getUTF8String(3).toString.split('.').toSeq)}")),
      GraftProcedure("drop_fk",
        "drop a declared FOREIGN KEY constraint by name",
        Array(P("table", StringType), P("name", StringType)),
        in => repOf(tbl(in)).dropForeignKey(in.getUTF8String(1).toString)),
      GraftProcedure("index_vacuum",
        "reclaim a maintainable store's unreferenced wreckage (LSH/IVF: " +
          "crashed appends that never retried, dead consolidations, stale " +
          "centroid generations, leaked tmps, under the enforced vacuum " +
          "lease; corpus-ingest: side dirs above the committed frontier, " +
          "same lease; image-hash: write-job staging only — the store is " +
          "logless); accepts an absolute path or a catalog-root-relative " +
          "dotted name, sniffing the store kind from its layout",
        Array(P("store", StringType)),
        in => {
          GraftTvf.openIndexStore(GraftTvf.storeRoot(tbl(in), root)).vacuum()
          ()
        }),
      GraftProcedure("finish_drop",
        "sweep the invisible remnants of a DROP TABLE that crashed " +
          "mid-delete (SQL DROP TABLE IF EXISTS cannot reach them: Spark " +
          "probes tableExists, which reports visible tables only, before " +
          "calling dropTable); refuses a VISIBLE table, no-ops when " +
          "nothing is left to sweep",
        Array(P("table", StringType)),
        in => {
          val dir = rel(tbl(in).split('.').toSeq)
          require(!isTable(dir),
            s"${tbl(in)} is a visible table — use DROP TABLE, not finish_drop")
          // remnants-gated, never a bare rmdir: an arbitrary non-table dir
          // is a NAMESPACE, and sweeping one here would delete its visible
          // tables through a maintenance verb that promises the opposite.
          // And remnant-BEARING dirs get the subtree guard too (see
          // sweepRemnants): a crashed-DROP dir reused as a namespace holds
          // both remnant files and live child tables — only the remnant
          // entries go, never the children.
          val remnants = replicaRemnants(dir)
          if (remnants.nonEmpty) sweepRemnants(dir, remnants)
        }),
      GraftProcedure("detach_clone",
        "lift GC protection for a clone after it is destroyed or fully " +
          "materialized (externalRefs = 0); a detached live clone fails " +
          "loudly once the source GC rolls past it",
        Array(P("source_table", StringType), P("dest_table", StringType)),
        in => repOf(tbl(in)).detachClone(
          s"$root/${rel(in.getUTF8String(1).toString.split('.').toSeq)}"))
    ).map(p => p.name -> p).toMap
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      maintenanceProcs.keys.toSeq.sorted.map(n => Identifier.of(namespace, n)).toArray
    else Array.empty

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    require(ident.namespace.sameElements(Array("system")),
      s"procedures live in the 'system' namespace: CALL $catalogName.system.<name>(…)")
    maintenanceProcs.getOrElse(ident.name,
      throw new IllegalArgumentException(
        s"unknown procedure ${ident.name}; available: " +
          maintenanceProcs.keys.toSeq.sorted.mkString(", ")))
  }

  // ---- SupportsNamespaces ---------------------------------------------------

  override def listNamespaces(): Array[Array[String]] =
    io.listDirs(io.root).map(_.getName).filterNot(n => isTable(n))
      .sorted.map(Array(_)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val dir = rel(namespace.toSeq)
    if (!io.exists(io.path(dir))) throw new NoSuchNamespaceException(namespace)
    io.listDirs(io.path(dir)).map(_.getName).filterNot(n => isTable(s"$dir/$n"))
      .sorted.map(n => namespace :+ n).toArray
  }

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (namespace.nonEmpty &&
        (!io.exists(io.path(rel(namespace.toSeq))) || isTable(rel(namespace.toSeq))))
      throw new NoSuchNamespaceException(namespace)
    util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit =
    io.mkdirs(io.path(rel(namespace.toSeq)))

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val dir = rel(namespace.toSeq)
    if (!io.exists(io.path(dir))) false
    else {
      require(cascade || io.listDirs(io.path(dir)).isEmpty,
        s"namespace ${namespace.mkString(".")} is not empty")
      // depth-first, VISIBILITY-first: each table drops through dropTable
      // (whose _META flip makes it atomically invisible), so a crash
      // anywhere in the cascade leaves every table either fully visible or
      // an invisible remnant — never a visible table whose data the bulk
      // delete already swept. A retry re-enters here (the dir survives
      // until the last step) and converges; remnant dirs fall to the final
      // recursive delete.
      if (cascade) {
        listNamespaces(namespace).foreach(child => dropNamespace(child, cascade))
        listTables(namespace).foreach(t => { dropTable(t); () })
      }
      io.delete(io.path(dir)); true
    }
  }
}

/** V2 identity of one replica (optionally pinned to a retained version).
  * Capabilities are deliberately empty: [[GraftTableReads]] replaces the
  * relation with the native parquet plan before any capability check runs,
  * and MERGE interception consumes the relation without reading through it. */
case class GraftTable(ident: String, root: String, pinnedVersion: Option[Long])
    extends Table {

  /** Opened lazily from durable metadata and cached per plan-node instance
    * (a query resolves the table once; a new query re-resolves and sees
    * the latest committed pointer). */
  lazy val replica: BucketedReplica = BucketedReplica.open(root)

  override def name(): String = ident
  override def schema(): StructType =
    pinnedVersion.map(replica.schemaAt).getOrElse(replica.storedSchema)
  override def capabilities(): util.Set[TableCapability] =
    util.Collections.emptySet()
  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    m.put("root", root)
    m.put("pk", replica.pk)
    pinnedVersion.foreach(v => m.put("version", v.toString))
    m
  }
}

/** Analysis rule (injected by [[GraftExtensions]]): every resolved
  * [[GraftTable]] relation becomes the replica's live parquet plan (or the
  * `VERSION AS OF` retained read), aliased onto the relation's attribute
  * ids so parent operators are untouched. MERGE targets are exempt — the
  * [[GraftMergeInto.InterceptRule]] consumes those relations itself and
  * must still see the table identity. */
case class GraftTableReads(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // relations serving as a MERGE or INSERT *target* keep their identity:
    // the intercepted command needs the replica handle, and rewriting the
    // target to a scan would turn an updatable table into a read-only
    // subquery (the write rules consume these relations themselves)
    val writeTargets = plan.collect {
      case m: MergeIntoTable =>
        m.targetTable.collect {
          case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] => r
        }
      case i: InsertIntoStatement =>
        i.table.collect {
          case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] => r
        }
      case w: V2WriteCommand =>
        w.table.collect {
          case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] => r
        }
      case dl: DeleteFromTable =>
        dl.table.collect {
          case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] => r
        }
      case u: UpdateTable =>
        u.table.collect {
          case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] => r
        }
    }.flatten.toSet
    plan.transformUp {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftTable] && !writeTargets.contains(r) =>
        val t = r.table.asInstanceOf[GraftTable]
        val df = t.pinnedVersion match {
          case Some(v) => t.replica.liveAt(spark, v)
          case None    => t.replica.live(spark)
        }
        val child = df.queryExecution.analyzed
        Project(r.output.map { a =>
          val f = child.output.find(_.name == a.name).getOrElse(
            throw new IllegalStateException(
              s"replica at ${t.root} lost column ${a.name} the catalog schema carries"))
          Alias(f, a.name)(exprId = a.exprId)
        }, child)
    }
  }
}

/** One maintenance procedure: unbound and bound are the same object (the
  * parameter list is static), `call` runs the side effect and produces no
  * result set. */
private[plans] case class GraftProcedure(
    override val name: String,
    override val description: String,
    params: Array[ProcedureParameter],
    run: org.apache.spark.sql.catalyst.InternalRow => Unit)
    extends UnboundProcedure with BoundProcedure {
  override def bind(inputType: StructType): BoundProcedure = this
  override def parameters(): Array[ProcedureParameter] = params
  override def isDeterministic: Boolean = false
  override def call(input: org.apache.spark.sql.catalyst.InternalRow)
      : java.util.Iterator[org.apache.spark.sql.connector.read.Scan] = {
    run(input)
    java.util.Collections.emptyIterator()
  }
}
