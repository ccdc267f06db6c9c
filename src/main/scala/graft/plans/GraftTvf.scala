package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.streaming.BucketedReplica

/** SQL table functions over the durable catalog — the CDC-read-back surface
  * analysts use without touching the programmatic API:
  *
  * {{{
  *   SELECT * FROM graft_versions('crm.users')        -- retained versions + tags
  *   SELECT * FROM graft_changes('crm.users', 1, 2)   -- keyed diff v1 → v2
  * }}}
  *
  * `graft_changes` is [[BucketedReplica.changeFeed]] by name: what a
  * downstream consumer must apply to move between two RETAINED versions
  * (INSERT / UPDATE / DELETE per changed key) — the SQL twin of the b10
  * change-feed operator. `graft_versions` lists the versions a time-travel
  * or change-feed read may name (current + previous, the bounded-staleness
  * retention window) with their source-batch tags.
  *
  * HOW: `injectTableFunction` registers parse-time builders that return an
  * UNRESOLVED leaf carrying the literal arguments; the session-aware
  * resolution rule ([[GraftTvf.ResolveRule]], injected beside the catalog
  * read rule) opens the replica from the catalog root conf and substitutes
  * the real plan — a two-step needed because function builders run without
  * a session. Table names resolve under `spark.sql.catalog.graft.root`,
  * the same namespace the catalog serves (`ns.table` → `<root>/ns/table`).
  */
object GraftTvf {

  /** Unresolved placeholder a TVF builder can emit without a session. */
  case class UnresolvedGraftTvf(fn: String, args: Seq[Expression]) extends LeafNode {
    override lazy val resolved: Boolean = false
    override def output: Seq[Attribute] = Nil
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)] = Seq(
    (new FunctionIdentifier("graft_changes"),
      new ExpressionInfo(classOf[UnresolvedGraftTvf].getName, "graft_changes"),
      (exprs: Seq[Expression]) => UnresolvedGraftTvf("graft_changes", exprs)),
    (new FunctionIdentifier("graft_versions"),
      new ExpressionInfo(classOf[UnresolvedGraftTvf].getName, "graft_versions"),
      (exprs: Seq[Expression]) => UnresolvedGraftTvf("graft_versions", exprs)),
    (new FunctionIdentifier("graft_fsck"),
      new ExpressionInfo(classOf[UnresolvedGraftTvf].getName, "graft_fsck"),
      (exprs: Seq[Expression]) => UnresolvedGraftTvf("graft_fsck", exprs)),
    (new FunctionIdentifier("graft_constraints"),
      new ExpressionInfo(classOf[UnresolvedGraftTvf].getName, "graft_constraints"),
      (exprs: Seq[Expression]) => UnresolvedGraftTvf("graft_constraints", exprs)),
    (new FunctionIdentifier("graft_index_audit"),
      new ExpressionInfo(classOf[UnresolvedGraftTvf].getName, "graft_index_audit"),
      (exprs: Seq[Expression]) => UnresolvedGraftTvf("graft_index_audit", exprs)))

  private def stringArg(fn: String, args: Seq[Expression], i: Int): String =
    args(i) match {
      case Literal(s: UTF8String, StringType) => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a string literal, got ${other.sql}")
    }

  private def longArg(fn: String, args: Seq[Expression], i: Int): Long =
    args(i) match {
      case Literal(v, _: IntegerType) => v.asInstanceOf[Int].toLong
      case Literal(v, _: LongType) => v.asInstanceOf[Long]
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be an integer version, got ${other.sql}")
    }

  private def openByName(spark: SparkSession, name: String): BucketedReplica = {
    val root = spark.conf.getOption("spark.sql.catalog.graft.root").getOrElse(
      throw new IllegalArgumentException(
        "graft table functions need spark.sql.catalog.graft.root " +
          "(the catalog warehouse dir) to resolve table names"))
    val parts = name.split('.')
    require(parts.nonEmpty && parts.forall(p =>
      p.nonEmpty && !p.contains("/") && !p.contains("..")),
      s"illegal table name '$name'")
    BucketedReplica.open((root +: parts.toSeq).mkString("/"))
  }

  /** Resolve an index-store argument: an absolute path/URI is used as-is;
    * a dotted name resolves under `catalogRoot` like any table name
    * (index stores commonly live BESIDE the warehouse, hence both forms).
    * Shared by the TVF (root from the session conf) and the catalog's
    * `index_vacuum` procedure (root from its own init options) — one
    * resolution rule, two doors. */
  private[graft] def storeRoot(arg: String, catalogRoot: => String): String =
    if (arg.contains("/") || arg.contains(":")) {
      // path form: must be genuinely absolute or a scheme-qualified URI
      // whose PATH component is absolute, with no '..' segments anywhere
      // in that path — a relative path with separators ('../other',
      // 'a/../../x') or a scheme-glued relative ('file:../x', which a
      // bare split-on-'/' check misses because the '..' rides in the
      // 'file:..' segment) would reach index_vacuum's delete pass (and
      // the audit) at paths outside the warehouse root from plain SQL
      // '#'/'?' end the java.net.URI path component but ride INTO the
      // path Hadoop's Path hands the filesystem ('file:///x#/../..'
      // URI-validates as '/x' while Hadoop resolves '/x#/../..') — so a
      // guard that validated only the URI path would pass a string whose
      // filesystem meaning it never saw. No legitimate store path
      // carries either character; reject them outright.
      require(!arg.contains("#") && !arg.contains("?"),
        s"illegal store path '$arg': '#' and '?' are not allowed (the " +
          "URI fragment/query would be handed to the filesystem as " +
          "literal path characters)")
      val path =
        if (arg.startsWith("/")) arg
        else {
          require(arg.matches("[A-Za-z][A-Za-z0-9+.-]*:.*"),
            s"illegal store path '$arg': must be an absolute path or a " +
              "scheme-qualified URI (relative paths resolve nothing safely)")
          val p = try new java.net.URI(arg).getPath
            catch { case _: java.net.URISyntaxException => null }
          require(p != null && p.startsWith("/"),
            s"illegal store path '$arg': a scheme-qualified store URI " +
              "must carry an absolute path (opaque or scheme-relative " +
              "forms resolve against the process cwd)")
          p
        }
      // belt-and-braces: validate the path component HADOOP will use,
      // not just the java.net.URI parse the check above worked from
      val hadoopPath =
        try new org.apache.hadoop.fs.Path(arg).toUri.getPath
        catch { case _: IllegalArgumentException => path }
      (path.split('/') ++ hadoopPath.split('/')).find(_ == "..").foreach { _ =>
        throw new IllegalArgumentException(
          s"illegal store path '$arg': '..' segments are not allowed")
      }
      arg
    } else {
      val parts = arg.split('.').toSeq
      require(parts.nonEmpty && parts.forall(p =>
        p.nonEmpty && !p.contains("..")), s"illegal store name '$arg'")
      (catalogRoot +: parts).mkString("/")
    }

  private[graft] def indexRoot(spark: SparkSession, arg: String): String =
    storeRoot(arg,
      spark.conf.getOption("spark.sql.catalog.graft.root").getOrElse(
        throw new IllegalArgumentException(
          s"'$arg' is a relative store name; set spark.sql.catalog.graft.root " +
            "or pass an absolute path")))

  /** Open the maintainable store at `root`, sniffing which kind lives
    * there from its own durable layout — the cold-SQL-session twin of
    * holding the typed handle:
    *   - `sigs`/`postings`/`pairs`          ⇒ [[graft.streaming.LshIndex]]
    *   - `index`/`centroids`(`_gen=<v>`)    ⇒ [[graft.streaming.IvfIndex]]
    *   - `seen`/`corpus`                    ⇒ [[graft.streaming.CorpusIngest]]
    *     (the composed ingest store; its `lsh/` SUBDIR is an LshIndex of
    *     its own and stays separately addressable by path)
    *   - `hashes`/`accepted`                ⇒ [[graft.streaming.ImageHashStore]]
    * Loud on an empty or ambiguous root: auditing the WRONG store kind
    * would report vacuous health. */
  private[graft] def openIndexStore(root: String)
      : graft.streaming.MaintainableStore = {
    val io = new graft.streaming.StoreIO(root, graft.streaming.StoreIO.sessionConf())
    val kinds = Seq[(String, Seq[String], () => graft.streaming.MaintainableStore)](
      ("LSH", Seq("sigs", "postings", "pairs"),
        () => new graft.streaming.LshIndex(root)),
      ("IVF", Seq("index", "centroids"),
        () => new graft.streaming.IvfIndex(root)),
      ("corpus-ingest", Seq("seen", "corpus"),
        () => new graft.streaming.CorpusIngest(root)),
      ("image-hash", Seq("hashes", "accepted"),
        () => new graft.streaming.ImageHashStore(root)))
    val matched = kinds.filter { case (kind, dirs, _) =>
      dirs.exists(d => io.exists(io.path(d))) ||
        (kind == "IVF" &&
          io.listDirs(io.root).exists(_.getName.startsWith("centroids_gen=")))
    }
    matched match {
      case Seq((_, _, open)) => open()
      case Seq() => throw new IllegalArgumentException(
        s"no index store at $root (expected one of: LSH sigs/postings/" +
          "pairs, IVF index/centroids, corpus-ingest seen/corpus, " +
          "image-hash hashes/accepted)")
      case many => throw new IllegalArgumentException(
        s"$root holds layout dirs of MULTIPLE store kinds " +
          s"(${many.map(_._1).mkString(", ")}) — not a single store")
    }
  }

  private val constraintsSchema = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("definition", StringType, nullable = false)))

  private val versionsSchema = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("tag", LongType, nullable = true),
    StructField("is_current", BooleanType, nullable = false)))

  /** Resolution rule: expand the placeholders with the session in hand. */
  case class ResolveRule(spark: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case UnresolvedGraftTvf("graft_changes", args) =>
        require(args.length == 3,
          "graft_changes(table_name, from_version, to_version)")
        val rep = openByName(spark, stringArg("graft_changes", args, 0))
        rep.changeFeed(spark, longArg("graft_changes", args, 1),
          longArg("graft_changes", args, 2)).queryExecution.analyzed
      case UnresolvedGraftTvf("graft_versions", args) =>
        require(args.length == 1, "graft_versions(table_name)")
        val rep = openByName(spark, stringArg("graft_versions", args, 0))
        val cur = rep.currentVersion
        // control plane: ≤2 retained rows, built driver-side like any DDL
        val rows = rep.retainedTags.keySet
          .union(cur.toSet).toSeq.sorted.map { v =>
            InternalRow(v, rep.tagOf(v).map(Long.box).orNull, cur.contains(v))
          }
        LocalRelation(
          org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(versionsSchema),
          rows)
      case UnresolvedGraftTvf("graft_constraints", args) =>
        require(args.length == 1, "graft_constraints(table_name)")
        // SHOW CONSTRAINTS analog: the declared contract, control-plane only
        val rep = openByName(spark, stringArg("graft_constraints", args, 0))
        val rows =
          rep.checkConstraints.toSeq.sortBy(_._1).map { case (nm, ex) =>
            InternalRow(UTF8String.fromString("CHECK"),
              UTF8String.fromString(nm), UTF8String.fromString(ex))
          } ++
          rep.fkConstraints.toSeq.sortBy(_._1).map { case (nm, (c, pr)) =>
            InternalRow(UTF8String.fromString("FOREIGN KEY"),
              UTF8String.fromString(nm), UTF8String.fromString(s"$c -> $pr"))
          }
        LocalRelation(
          org.apache.spark.sql.catalyst.types.DataTypeUtils
            .toAttributes(constraintsSchema), rows)
      case UnresolvedGraftTvf("graft_fsck", args) =>
        require(args.length == 1, "graft_fsck(table_name)")
        // integrity audit (pk uniqueness, placement, CHECK conformity,
        // manifest/file presence) — one table scan + control-plane reads
        openByName(spark, stringArg("graft_fsck", args, 0))
          .fsck(spark).queryExecution.analyzed
      case UnresolvedGraftTvf("graft_index_audit", args) =>
        require(args.length == 1, "graft_index_audit(store_path_or_name)")
        // the maintainable stores' structural integrity report from a cold
        // SQL session — the store-family twin of graft_fsck (audit() docs:
        // bounded two-column scans, control-plane log checks); the store
        // kind (LSH / IVF / corpus-ingest / image-hash) is sniffed from
        // the root's durable layout
        val root = indexRoot(spark, stringArg("graft_index_audit", args, 0))
        openIndexStore(root).audit(spark).queryExecution.analyzed
      case u: UnresolvedGraftTvf => throw new IllegalStateException(
        s"unknown graft table function ${u.fn}")
    }
  }
}
