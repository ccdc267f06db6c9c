package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.StringType
import graft.streaming.BucketedReplica

/** ANSI `DELETE FROM` / `UPDATE` over a [[BucketedReplica]] — the last two
  * analyst DML verbs on the replica surface (SELECT/MERGE/INSERT ship via
  * [[GraftTableReads]] / [[GraftMergeInto]] / [[GraftInsertInto]]). The
  * reference's replica is an ordinary warehouse table its analysts can run
  * any DML against (reference main.tf:197-215); after this, so is ours:
  *
  * {{{
  *   DELETE FROM graft.crm.users WHERE event_type = 'error'
  *   UPDATE graft.crm.users SET value = value * 2 WHERE value >= 50
  * }}}
  *
  * HOW: the analyzer fully resolves [[DeleteFromTable]] / [[UpdateTable]]
  * (predicate typing, assignment resolution, subqueries in WHERE); an
  * injected resolution rule replaces the resolved command on replica
  * targets before Spark's v2 row-level-operation rewrite would reject the
  * capability-free [[GraftTable]] — the same interception shape as MERGE.
  *
  * Semantics over the replica's storage protocol:
  *  - subjects are LIVE rows satisfying WHERE (an analyst deletes/updates
  *    what SELECT shows; stored tombstones and null-op drift rows are
  *    carried untouched);
  *  - DELETE writes the storage tombstone form (op ← 'DELETE', all other
  *    columns kept at the row's stored values, its position included) so a
  *    CDC batch arriving later with an OLDER position loses against the
  *    delete — the same out-of-order-resurrection guard as `Cdc.merge`;
  *  - UPDATE rewrites the subject rows in place; SET on the primary key is
  *    refused (a pk change is DELETE(old)+INSERT(new) — `Cdc.rekeySplit` /
  *    MERGE INTO), and SET on the op column is refused (the envelope is
  *    the protocol's, not the analyst's).
  *
  * Scale: the WHERE is arbitrary, so finding the subjects honestly costs
  * one full scan (exactly like MERGE's NOT MATCHED BY SOURCE, which also
  * names rows no key list bounds) — but the WRITE stays bucket-bounded:
  * the probe collects only the touched bucket ids (one driver action over
  * ≤ nBuckets longs), the rewrite re-reads just those buckets, applies the
  * predicate as one codegen'd CASE projection, and commits through the
  * replica's atomic pointer flip. A DELETE touching 1% of keys on a 100 TB
  * replica rewrites ~1% of buckets, never the table.
  */
object GraftDeleteUpdate {

  object InterceptRule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan match {
      case del: DeleteFromTable if del.resolved =>
        GraftMergeInto.lookup(del.table) match {
          case Some((name, rep)) =>
            GraftDeleteCommand(name, rep, new DmlSpec(del.table, del.condition, Nil))
          case None => del
        }
      case u: UpdateTable if u.resolved =>
        GraftMergeInto.lookup(u.table) match {
          case Some((name, rep)) =>
            GraftUpdateCommand(name, rep,
              new DmlSpec(u.table, u.condition.getOrElse(Literal(true)), u.assignments))
          case None => u
        }
      case _ => plan
    }
  }
}

/** The analyzer's resolved DML pieces, opaque to Catalyst traversal for the
  * same reason as [[MergeSpec]]: the command is a leaf, and exposing the
  * resolved-elsewhere expressions to CheckAnalysis would trip its
  * missing-input check. */
final class DmlSpec(
    val target: LogicalPlan,
    val cond: Expression,
    val assignments: Seq[Assignment]) extends Serializable {
  override def toString: String =
    s"where ${cond.sql}" +
      (if (assignments.isEmpty) "" else s" set ${assignments.map(_.sql).mkString(", ")}")
}

/** Shared probe-then-rewrite skeleton: find subject keys with one full
  * scan, rewrite exactly the buckets they hash into. */
abstract class GraftDmlCommand extends LeafRunnableCommand {
  def tableName: String
  def rep: BucketedReplica
  def spec: DmlSpec

  /** Per-column replacement for a subject row (non-subjects carry). */
  protected def newValue(a: Attribute): Expression

  protected def validate(targetAttrs: Seq[Attribute]): Unit = {}

  /** live = non-null op ≠ 'DELETE' — what `rep.live` shows the analyst;
    * null-op drift rows are dead-carried, same two-valued split as MERGE. */
  private def liveExpr(opAttr: Attribute): Expression =
    And(IsNotNull(opAttr), Not(EqualTo(opAttr, Literal("DELETE"))))

  /** Fresh scan aligned onto the resolved command's attribute ids, so the
    * analyzer-resolved WHERE/SET expressions evaluate against it. */
  private def align(plan: LogicalPlan, targetAttrs: Seq[Attribute]): LogicalPlan =
    Project(targetAttrs.map { a =>
      val f = plan.output.find(_.name == a.name).getOrElse(
        throw new IllegalStateException(
          s"stored replica lost column ${a.name} the DML target carries"))
      Alias(f, a.name)(exprId = a.exprId)
    }, plan)

  override def run(spark: SparkSession): Seq[Row] = {
    val targetAttrs = spec.target.output
    val opAttr = targetAttrs.find(_.name == rep.opCol).getOrElse(
      throw new IllegalArgumentException(
        s"DML target $tableName lacks the replica op column '${rep.opCol}'"))
    require(opAttr.dataType == StringType, "op column must be STRING")
    require(targetAttrs.exists(_.name == rep.pk),
      s"DML target $tableName lacks the replica key '${rep.pk}'")
    require(spec.cond.deterministic && spec.assignments.forall(_.value.deterministic),
      s"DML over $tableName requires a deterministic WHERE/SET: the subject " +
        "probe and the bucket rewrite evaluate it twice and must agree")
    validate(targetAttrs)
    // same stale-registration guard as MERGE: a view registered before a
    // schema-widening commit must not publish the narrowed schema
    val storedCols = rep.storedSchema.fieldNames.toSet
    val viewCols = targetAttrs.map(_.name).toSet
    require(storedCols == viewCols,
      s"DML target $tableName is stale: stored schema has ${storedCols.toSeq.sorted
        .mkString(",")} but the target carries ${viewCols.toSeq.sorted.mkString(",")}")

    val subject = And(liveExpr(opAttr), spec.cond)

    // probe: subject keys → touched bucket ids (ONE driver action)
    val freshAligned = align(rep.read(spark).queryExecution.analyzed, targetAttrs)
    val pkAttr = targetAttrs.find(_.name == rep.pk).get
    val subjectKeys = Bridge.ofRows(spark,
      Project(Seq(pkAttr), Filter(subject, freshAligned)))
    val buckets = rep.touchedBuckets(subjectKeys)
    if (buckets.isEmpty) return Seq.empty

    // rewrite: full new content of exactly the touched buckets — subjects
    // transformed, co-resident rows (live non-matching, tombstones, drift)
    // carried verbatim, one codegen'd CASE per column. ONE pinned snapshot
    // covers the read and the replace: a foreign commit interleaving them
    // loses at the write-once pointer instead of being silently replaced
    // by this DML's stale co-resident view.
    val snap = rep.pinSnapshot()
    val content = align(
      rep.readBucketsAt(spark, buckets, snap).queryExecution.analyzed,
      targetAttrs)
    val outCols: Seq[NamedExpression] = targetAttrs.map { a =>
      Alias(CaseWhen(Seq(subject -> newValue(a)), Some(a)), a.name)()
    }
    rep.replaceTouched(Bridge.ofRows(spark, Project(outCols, content)), snap)

    // registered-view surface: refresh to the new version (the catalog
    // surface re-resolves per query, nothing to refresh)
    if (GraftMergeInto.isRegistered(tableName))
      rep.live(spark).createOrReplaceTempView(tableName)
    Seq.empty
  }
}

/** The executable DELETE: subjects become storage tombstones. */
case class GraftDeleteCommand(
    tableName: String,
    rep: BucketedReplica,
    spec: DmlSpec) extends GraftDmlCommand {
  override protected def newValue(a: Attribute): Expression =
    if (a.name == rep.opCol) Literal("DELETE") else a
}

/** The executable UPDATE: subjects take their SET values in place. */
case class GraftUpdateCommand(
    tableName: String,
    rep: BucketedReplica,
    spec: DmlSpec) extends GraftDmlCommand {

  override protected def validate(targetAttrs: Seq[Attribute]): Unit = {
    def assignedName(as: Assignment): Option[String] = as.key match {
      case k: AttributeReference => Some(k.name)
      case _ => None
    }
    spec.assignments.flatMap(assignedName).foreach { n =>
      require(n != rep.pk,
        s"UPDATE $tableName SET ${rep.pk} is not supported: a primary-key " +
          "change is DELETE(old)+INSERT(new) — use Cdc.rekeySplit or MERGE INTO")
      require(n != rep.opCol,
        s"UPDATE $tableName SET ${rep.opCol} is not supported: the op column " +
          "is the storage protocol's (DELETE FROM writes tombstones)")
    }
  }

  override protected def newValue(a: Attribute): Expression =
    spec.assignments.find(_.key match {
      case k: AttributeReference => k.exprId == a.exprId
      case _ => false
    }).orElse(spec.assignments.find(_.key match {
      case k: AttributeReference => k.name == a.name
      case _ => false
    })).map { as =>
      if (as.value.dataType == a.dataType) as.value
      else Cast(as.value, a.dataType): Expression
    }.getOrElse(a)
}
