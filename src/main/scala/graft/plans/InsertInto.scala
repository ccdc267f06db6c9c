package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graftbridge.Bridge
import graft.streaming.BucketedReplica

/** ANSI `INSERT INTO` over a [[GraftCatalog]] replica table — the third
  * analyst verb on the durable catalog surface (SELECT and MERGE INTO ship
  * via [[GraftTableReads]] / [[GraftMergeInto]]; this closes the append).
  *
  * {{{
  *   INSERT INTO graft.crm.users VALUES ('INSERT', 1, 1, 7, 10.0, 'click', 'users')
  *   INSERT INTO graft.crm.users SELECT * FROM staged_changes
  * }}}
  *
  * Semantics: the inserted rows are CHANGE rows (the replica's envelope),
  * folded in through [[BucketedReplica.commit]] — the same latest-wins,
  * tombstone-aware, bucket-bounded atomic commit the programmatic B1 path
  * uses. An INSERT carrying a key the replica already stores therefore
  * REPLACES that key iff its position is newer (the replica's one-row-per-
  * key invariant), and `op='DELETE'` rows insert tombstones. This is the
  * only coherent append onto a CDC replica: a blind file-append would break
  * every invariant the merge protocol maintains.
  *
  * HOW: Spark's own resolution turns the statement into [[AppendData]] over
  * the V2 relation (column alignment, implicit casts, by-name vs
  * by-position all handled by the analyzer); the injected rule replaces the
  * resolved command with [[GraftInsertCommand]] before the capability check
  * would reject the write-capability-free [[GraftTable]]. INSERT OVERWRITE
  * is rejected explicitly: wholesale replacement of a replica discards the
  * tombstones that protect it from out-of-order resurrection — the
  * supported full-rewrite paths are `rebucket`/`compact`, and row-level
  * replacement is `MERGE INTO`.
  */
object GraftInsertInto {

  private def graftTarget(table: LogicalPlan): Option[GraftTable] =
    table.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
        r.table.asInstanceOf[GraftTable]
    }

  object InterceptRule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan match {
      case a: AppendData if a.query.resolved =>
        graftTarget(a.table) match {
          case Some(t) =>
            GraftInsertCommand(t.name(), t.replica, new InsertSpec(a.query))
          case None => a
        }
      case o: OverwriteByExpression if graftTarget(o.table).isDefined =>
        throw new UnsupportedOperationException(
          s"INSERT OVERWRITE is not supported on ${graftTarget(o.table).get.name()}: " +
            "a replica's history and tombstones are not droppable by an append " +
            "statement — use MERGE INTO for row-level replacement")
      case o: OverwritePartitionsDynamic if graftTarget(o.table).isDefined =>
        throw new UnsupportedOperationException(
          s"dynamic-partition overwrite is not supported on " +
            s"${graftTarget(o.table).get.name()}: replicas are hash-bucketed, " +
            "not partitioned")
      case _ => plan
    }
  }
}

/** The resolved insert source, opaque to Catalyst traversal for the same
  * reason as [[MergeSpec]]: the command is a leaf, and exposing the
  * resolved-elsewhere plan to CheckAnalysis would trip missing-input. */
final class InsertSpec(val query: LogicalPlan) extends Serializable {
  override def toString: String = s"insert ${query.output.map(_.name).mkString(",")}"
}

/** The executable INSERT: evaluates the analyzer-aligned source once and
  * commits it through the replica's bucket-bounded latest-wins protocol. */
case class GraftInsertCommand(
    tableName: String,
    rep: BucketedReplica,
    spec: InsertSpec) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    rep.commit(Bridge.ofRows(spark, spec.query))
    Seq.empty
  }
}
