package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.ResolvedIdentifier
import org.apache.spark.sql.catalyst.plans.logical.{CreateTableAsSelect, LogicalPlan, TableSpec}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graftbridge.Bridge

/** `CREATE TABLE … AS SELECT` on a [[GraftCatalog]] — the last DDL verb on
  * the durable surface (CREATE/DROP/ALTER ship through the catalog, DML
  * through the intercept rules):
  *
  * {{{
  *   CREATE TABLE graft.crm.snapshot TBLPROPERTIES ('pk' = 'user_id')
  *   AS SELECT * FROM staged_changes
  * }}}
  *
  * Semantics: the query result is the table's FIRST change batch, folded
  * through the same latest-wins commit as INSERT — so a CTAS from a raw
  * changelog lands its latest-wins fold, exactly what "materialize this
  * query as a replica" means here. The query must carry the replica
  * envelope (`pk`, `pos`, `op`): a replica without them could not merge,
  * tombstone, or time-travel, so a CTAS that drops them is refused with
  * the reason rather than creating a table the engine cannot maintain.
  *
  * HOW: the analyzer resolves the statement ([[CreateTableAsSelect]] with
  * a [[ResolvedIdentifier]] naming this catalog); an injected resolution
  * rule swaps in a runnable command before Spark's V2 write path would
  * reject the capability-free table — the same interception shape as
  * INSERT/MERGE/DELETE/UPDATE. */
object GraftCtas {

  object InterceptRule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan match {
      case ctas: CreateTableAsSelect if ctas.query.resolved =>
        ctas.name match {
          case r: ResolvedIdentifier if r.catalog.isInstanceOf[GraftCatalog] =>
            require(ctas.partitioning.isEmpty,
              "graft tables are hash-bucketed by their primary key; " +
                "PARTITIONED BY is not supported")
            val props = ctas.tableSpec match {
              case ts: TableSpec => ts.properties
              case _ => Map.empty[String, String]
            }
            GraftCtasCommand(r.catalog.asInstanceOf[GraftCatalog], r.identifier,
              new InsertSpec(ctas.query), props, ctas.ignoreIfExists)
          case _ => ctas
        }
      case _ => plan
    }
  }
}

/** The executable CTAS: provision through the catalog (durable `_META` +
  * declared schema), then land the query result as the first latest-wins
  * commit. */
case class GraftCtasCommand(
    catalog: GraftCatalog,
    ident: Identifier,
    spec: InsertSpec,
    properties: Map[String, String],
    ignoreIfExists: Boolean) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val alreadyThere =
      try { catalog.loadTable(ident); true }
      catch { case _: Exception => false }
    if (alreadyThere) {
      if (ignoreIfExists) return Seq.empty
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    }
    val df = Bridge.ofRows(spark, spec.query)
    val pk = properties.getOrElse("pk", "user_id")
    Seq(pk, "pos", "op").foreach(cn =>
      require(df.columns.contains(cn),
        s"CTAS into ${catalog.name}.$ident must carry the replica envelope " +
          s"column '$cn' (key '$pk', position 'pos', op 'op'): a replica " +
          "without it cannot merge, tombstone, or time-travel — add the " +
          "column to the SELECT, or set TBLPROPERTIES ('pk'='…')"))
    val props = new java.util.HashMap[String, String]()
    properties.foreach { case (k, v) => props.put(k, v) }
    val t = catalog.createTable(ident, df.schema,
      Array.empty[org.apache.spark.sql.connector.expressions.Transform], props)
      .asInstanceOf[GraftTable]
    t.replica.commit(df)
    Seq.empty
  }
}
