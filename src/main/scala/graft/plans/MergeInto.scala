package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.FullOuter
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.{col, count => fCount, lit}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.StringType
import graft.streaming.BucketedReplica

/** ANSI `MERGE INTO` over a [[BucketedReplica]] — the analyst-facing SQL
  * form of the reference's replica maintenance (the reference's warehouse
  * MERGEs staged changes into the serving table and analysts query it by
  * SQL — reference README.md:204-205, main.tf:197-215). The programmatic
  * twin is `Cdc.merge` + `BucketedReplica.commit`; this surface accepts the
  * SQL statement itself:
  *
  * {{{
  *   GraftMergeInto.register(spark, "replica", rep)
  *   spark.sql("""
  *     MERGE INTO replica t USING staged s ON t.user_id = s.user_id
  *     WHEN MATCHED AND s.op = 'DELETE' THEN DELETE
  *     WHEN MATCHED THEN UPDATE SET *
  *     WHEN NOT MATCHED AND s.op != 'DELETE' THEN INSERT *
  *   """)
  * }}}
  *
  * HOW: a resolution rule intercepts the analyzer's fully-resolved
  * [[MergeIntoTable]] when its target is a registered replica view and
  * replaces it with a runnable command — Spark's own parser and reference
  * resolution do all the SQL-surface work (star expansion, assignment
  * alignment, condition typing), and the command reuses the replica's
  * bucket-bounded storage protocol. This keeps the 100 TB economics the
  * DSv2 group-based (copy-on-write) path would lose: a MERGE rewrites only
  * the buckets the source keys touch — O(batch · replica/nBuckets) I/O,
  * never O(replica) — and commits them as one atomic pointer flip.
  *
  * Semantics (SQL MERGE over the replica's LIVE view):
  *  - the target of matching is the live view (tombstones excluded — an
  *    analyst's DELETE deletes a visible row);
  *  - `WHEN MATCHED … DELETE` writes the storage tombstone form (op ←
  *    'DELETE', other columns kept) so out-of-order CDC batches arriving
  *    later cannot resurrect the key — same invariant as `Cdc.merge`;
  *  - an INSERT for a key whose stored form is a tombstone replaces the
  *    tombstone (one stored row per key, the replica invariant);
  *  - stored tombstones not touched by any action are carried forward;
  *  - multiple source rows matching one target row raise (the ANSI
  *    cardinality violation), checked bucket-bounded before the rewrite.
  */
object GraftMergeInto {

  private val registry =
    new scala.collection.concurrent.TrieMap[String, BucketedReplica]

  /** Register `rep` as SQL-mergeable under `name`: creates/replaces a temp
    * view of the replica's live rows (the analyst read surface) and arms
    * the MERGE interception for it. Requires the session to be built with
    * [[GraftExtensions]] (`spark.sql.extensions=graft.plans.GraftExtensions`
    * on a cluster, `builder().withExtensions(new GraftExtensions)` in
    * process). */
  def register(spark: SparkSession, name: String, rep: BucketedReplica): Unit = {
    registry(name.toLowerCase) = rep
    rep.live(spark).createOrReplaceTempView(name)
  }

  def unregister(name: String): Unit = { registry.remove(name.toLowerCase); () }

  private[plans] def isRegistered(name: String): Boolean =
    registry.contains(name.toLowerCase)

  /** Physical plan of the last MERGE's merged-result computation (test
    * observability: pins that the ON equality reaches a hash/sort-merge
    * join, never a nested-loop — the scale contract of the surface). */
  @volatile private[graft] var lastMergePlan: String = ""

  /** MERGE targets come in two shapes: a registered temp view (the
    * in-session surface) or a [[GraftCatalog]] table resolved by name (the
    * durable surface — no registration call, the replica opens from the
    * table's own metadata). A `VERSION AS OF` target is rejected: retained
    * versions are immutable reads. */
  private[plans] def lookup(plan: LogicalPlan): Option[(String, BucketedReplica)] =
    plan.collectFirst {
      case SubqueryAlias(id, _) if registry.contains(id.name.toLowerCase) =>
        id.name -> registry(id.name.toLowerCase)
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
          if r.table.isInstanceOf[GraftTable] =>
        val t = r.table.asInstanceOf[GraftTable]
        require(t.pinnedVersion.isEmpty,
          s"cannot MERGE INTO ${t.name} VERSION AS OF ${t.pinnedVersion.get}: " +
            "retained versions are immutable")
        t.name -> t.replica
    }

  /** Analyzer rule (injected by [[GraftExtensions]]): fully-resolved MERGE
    * over a registered replica view → [[GraftMergeCommand]]. Runs in the
    * resolution fixed-point, BEFORE Spark's row-level-operation rewrite
    * would reject the non-DSv2 target. */
  object InterceptRule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan match {
      case m: MergeIntoTable if m.resolved =>
        lookup(m.targetTable) match {
          case Some((name, rep)) =>
            GraftMergeCommand(name, rep, new MergeSpec(m.targetTable,
              m.sourceTable, m.mergeCondition, m.matchedActions,
              m.notMatchedActions, m.notMatchedBySourceActions))
          case None => m
        }
      case _ => plan
    }
  }
}

/** The analyzer's resolved MERGE pieces, deliberately OPAQUE to Catalyst
  * tree traversal (a plain class, not TreeNode products): the command is a
  * leaf with no input, so exposing these resolved-elsewhere expressions to
  * CheckAnalysis would trip its missing-input check, and no rule should
  * rewrite them further. */
final class MergeSpec(
    val target: LogicalPlan,
    val source: LogicalPlan,
    val cond: Expression,
    val matched: Seq[MergeAction],
    val notMatched: Seq[MergeAction],
    val notMatchedBySource: Seq[MergeAction]) extends Serializable {
  override def toString: String =
    s"on ${cond.sql}: ${matched.size} matched / ${notMatched.size} not / " +
      s"${notMatchedBySource.size} not-by-source"
}

/** The executable MERGE (see [[GraftMergeInto]] for the contract). Carries
  * the analyzer's resolved pieces verbatim; run() re-reads the replica
  * FRESH (the registered view is a resolution-time snapshot), aligns the
  * fresh scan onto the view's attribute ids, and evaluates the actions as
  * one projection over a full-outer join — every expression the user wrote
  * executes inside whole-stage codegen, never row-at-a-time on the driver. */
case class GraftMergeCommand(
    viewName: String,
    rep: BucketedReplica,
    spec: MergeSpec) extends LeafRunnableCommand {

  /** The pk equality that routes bucket-bounded I/O. */
  private def keyExpr(targetAttrs: Seq[Attribute], sourceAttrs: Seq[Attribute],
                      cond: Expression): Expression =
    splitAnd(cond).collectFirst {
      case EqualTo(a: AttributeReference, rhs)
        if a.name == rep.pk && targetAttrs.exists(_.exprId == a.exprId) &&
          rhs.references.forall(r => sourceAttrs.exists(_.exprId == r.exprId)) => rhs
      case EqualTo(lhs, a: AttributeReference)
        if a.name == rep.pk && targetAttrs.exists(_.exprId == a.exprId) &&
          lhs.references.forall(r => sourceAttrs.exists(_.exprId == r.exprId)) => lhs
    }.getOrElse(throw new IllegalArgumentException(
      s"MERGE INTO $viewName requires an equality on the replica key " +
        s"'${rep.pk}' in the ON condition (got: ${cond.sql})"))

  override def run(spark: SparkSession): Seq[Row] = {
    val (target, source, cond) = (spec.target, spec.source, spec.cond)
    val targetAttrs = target.output
    val sourceAttrs = source.output
    require(targetAttrs.map(_.exprId).toSet
      .intersect(sourceAttrs.map(_.exprId).toSet).isEmpty,
      "self-MERGE (source and target sharing a relation) is not supported")
    val opAttr = targetAttrs.find(_.name == rep.opCol).getOrElse(
      throw new IllegalArgumentException(
        s"MERGE target $viewName lacks the replica op column '${rep.opCol}'"))
    require(opAttr.dataType == StringType, s"op column must be STRING")
    keyExpr(targetAttrs, sourceAttrs, cond) // validate the ON shape up front

    // A view registered before a schema-widening commit would align the
    // fresh (wide) scan onto the narrower view attrs and publish the
    // narrowed schema replica-wide — refuse loudly instead of silently
    // dropping the evolved column.
    val storedCols = rep.storedSchema.fieldNames.toSet
    val viewCols = targetAttrs.map(_.name).toSet
    require(storedCols == viewCols,
      s"MERGE view $viewName is stale: stored schema has ${storedCols.toSeq.sorted
        .mkString(",")} but the view carries ${viewCols.toSeq.sorted.mkString(",")} — " +
        s"re-run GraftMergeInto.register after schema evolution")

    // cache the SOURCE once: the bucket probe, the cardinality check, and
    // the full-outer join all contain the same source subplan, and the
    // CacheManager substitutes the cached relation into each by plan
    // equality — one evaluation instead of three (and a nondeterministic
    // source cannot disagree with itself between the probe and the join)
    val srcCached = Bridge.ofRows(spark, source).persist()
    try {
      runWithSource(spark)
    } finally { srcCached.unpersist(); () }
  }

  private def runWithSource(spark: SparkSession): Seq[Row] = {
    val (target, source, cond) = (spec.target, spec.source, spec.cond)
    val (matchedActions, notMatchedActions, notMatchedBySourceActions) =
      (spec.matched, spec.notMatched, spec.notMatchedBySource)
    val targetAttrs = target.output
    val sourceAttrs = source.output
    val srcKeyExpr = keyExpr(targetAttrs, sourceAttrs, cond)

    val srcKeys = Bridge.ofRows(spark,
      Project(Seq(Alias(srcKeyExpr, rep.pk)()), source))

    // ---- fresh target read, aligned to the view's ids --------------------
    // Bucket-bounded when actions only ever touch rows the source names; a
    // NOT MATCHED BY SOURCE action's subjects are by definition OUTSIDE the
    // source's buckets, so that form pays the full-table read it asks for.
    // ONE pinned snapshot covers this read AND the replaceTouched below, so
    // a foreign commit interleaving them loses at the write-once pointer
    // instead of being silently replaced by this MERGE's stale target view.
    val snap = rep.pinSnapshot()
    val fresh =
      if (notMatchedBySourceActions.nonEmpty) rep.readAllAt(spark, snap)
      else rep.readBucketsAt(spark, rep.touchedBuckets(srcKeys), snap)
    // two-valued split: live is exactly what rep.live() shows the analyst;
    // EVERYTHING else stored (tombstones AND null-op rows from schema-drift
    // landings) is carried forward untouched unless an action re-creates
    // the key — a NULL op must not fall through both filters and vanish
    val live = fresh.filter(col(rep.opCol) =!= "DELETE")
    val dead = fresh.filter(col(rep.opCol).isNull || col(rep.opCol) === "DELETE")

    // Cardinality: duplicate source keys ALWAYS raise. ANSI only rejects
    // multiple rows matching one TARGET row, but this store keeps ONE row
    // per key — two NOT-MATCHED inserts of the same key (or one matched +
    // one "disambiguated" by extra ON conjuncts) would both land and break
    // the invariant every later merge relies on.
    val dupKeys = srcKeys.filter(col(rep.pk).isNotNull)
      .groupBy(col(rep.pk)).agg(fCount(lit(1)).as("__n")).filter(col("__n") > 1)
      .limit(1).collect()
    if (dupKeys.nonEmpty) throw new IllegalStateException(
      s"MERGE cardinality violation: source carries key ${dupKeys(0).get(0)} " +
        s"more than once and the replica stores one row per key (dedupe the " +
        s"source first — e.g. latest-wins by '${rep.posCol}')")

    val livePlan = live.queryExecution.analyzed
    val alignedTgt = Project(targetAttrs.map { a =>
      val f = livePlan.output.find(_.name == a.name).getOrElse(
        throw new IllegalStateException(
          s"stored replica lost column ${a.name} the MERGE view carries"))
      Alias(f, a.name)(exprId = a.exprId)
    }, livePlan)

    // ---- presence-flagged full-outer join --------------------------------
    val tFlag = AttributeReference("__t_present", org.apache.spark.sql.types.BooleanType)()
    val sFlag = AttributeReference("__s_present", org.apache.spark.sql.types.BooleanType)()
    val tgtSide = Project(alignedTgt.output :+
      Alias(Literal(true), tFlag.name)(exprId = tFlag.exprId), alignedTgt)
    val srcSide = Project(sourceAttrs :+
      Alias(Literal(true), sFlag.name)(exprId = sFlag.exprId), source)
    val joined = Join(tgtSide, srcSide, FullOuter, Some(cond), JoinHint.NONE)

    val tPresent = EqualNullSafe(tFlag, Literal(true))
    val sPresent = EqualNullSafe(sFlag, Literal(true))

    // ---- first-matching-action dispatch, one codegen'd CASE --------------
    // codes: 0..n matched; 100..: not-matched; 200..: not-matched-by-source;
    // -1 carry the target row; -2 drop (unmatched source with no INSERT)
    def guard(base: Expression, c: Option[Expression]): Expression =
      c.map(And(base, _)).getOrElse(base)
    val branches: Seq[(Expression, Expression)] =
      matchedActions.zipWithIndex.map { case (a, i) =>
        guard(And(tPresent, sPresent), a.condition) -> (Literal(i): Expression)
      } ++ notMatchedActions.zipWithIndex.map { case (a, i) =>
        guard(And(Not(tPresent), sPresent), a.condition) -> (Literal(100 + i): Expression)
      } ++ notMatchedBySourceActions.zipWithIndex.map { case (a, i) =>
        guard(And(tPresent, Not(sPresent)), a.condition) -> (Literal(200 + i): Expression)
      } :+ (tPresent -> (Literal(-1): Expression))
    val codeAttr = AttributeReference("__code", org.apache.spark.sql.types.IntegerType)()
    val coded = Project(joined.output :+
      Alias(CaseWhen(branches, Some(Literal(-2))), codeAttr.name)(exprId = codeAttr.exprId),
      joined)
    val kept = Filter(Not(EqualTo(codeAttr, Literal(-2))), coded)

    def assigned(a: Attribute, assigns: Seq[Assignment], dflt: Expression): Expression =
      assigns.find(_.key match {
        case k: AttributeReference => k.exprId == a.exprId
        case _ => false
      }).orElse(assigns.find(_.key match {
        case k: AttributeReference => k.name == a.name
        case _ => false
      })).map(_.value).getOrElse(dflt)

    def actionValue(a: Attribute, action: MergeAction, code: Int,
                    sourcePresent: Boolean): (Expression, Expression) = {
      val v: Expression = action match {
        case u: UpdateAction => assigned(a, u.assignments, a)
        case ins: InsertAction =>
          assigned(a, ins.assignments, Literal.create(null, a.dataType))
        case _: DeleteAction =>
          // A MATCHED delete's stored tombstone records the DELETING row:
          // source values win on shared columns (position/event-time
          // included), so a later out-of-order batch loses against the
          // delete's own position — byte-identical to Cdc.merge's stored
          // form. A NOT-MATCHED-BY-SOURCE delete has no source row: the
          // tombstone keeps the target's values.
          if (a.name == rep.opCol) Literal("DELETE")
          else if (sourcePresent) sourceAttrs.find(_.name == a.name)
            .map(sa => Cast(sa, a.dataType): Expression).getOrElse(a)
          else a
        case other => throw new IllegalArgumentException(
          s"unsupported MERGE action: $other")
      }
      EqualTo(codeAttr, Literal(code)) -> v
    }

    val outCols: Seq[NamedExpression] = targetAttrs.map { a =>
      val cases =
        matchedActions.zipWithIndex.map { case (act, i) =>
          actionValue(a, act, i, sourcePresent = true) } ++
        notMatchedActions.zipWithIndex.map { case (act, i) =>
          actionValue(a, act, 100 + i, sourcePresent = true) } ++
        notMatchedBySourceActions.zipWithIndex.map { case (act, i) =>
          actionValue(a, act, 200 + i, sourcePresent = false) }
      Alias(CaseWhen(cases, Some(a)), a.name)() // else: carry the target row
    }
    val result = Bridge.ofRows(spark, Project(outCols, kept))
    GraftMergeInto.lastMergePlan = result.queryExecution.executedPlan.toString

    // stored tombstones stay unless an action re-created their key
    val deadKept = dead.join(result.select(col(rep.pk)), Seq(rep.pk), "left_anti")
      .select(result.columns.map(col).toSeq: _*)
    rep.replaceTouched(result.unionByName(deadKept), snap)

    // refresh the analyst view to the new version (registered-view surface
    // only; the catalog surface re-resolves loadTable per query, so the next
    // SELECT reads the new pointer with nothing to refresh)
    if (GraftMergeInto.isRegistered(viewName))
      rep.live(spark).createOrReplaceTempView(viewName)
    Seq.empty
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }
}
