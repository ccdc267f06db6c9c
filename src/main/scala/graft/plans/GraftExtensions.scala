package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.{CosineSimilarity, SelfCosine}

/** Catalyst optimizer rule: `graft_cosine(x, x)` reads the vector twice and
  * keeps three accumulators; the degenerate self-similarity needs one read
  * and one accumulator. Rewrite to [[SelfCosine]], which is bit-identical to
  * the unrewritten expression for EVERY input — 1.0 for normal vectors, NaN
  * for zero/empty vectors (0/0), null for null — so the rule can never
  * change query results, only halve the per-row work. (Folding to a literal
  * 1.0 would silently lose the NaN case.) Fires e.g. when a generic
  * similarity pipeline is invoked with identical probe and corpus columns. */
object SelfCosineToOne extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(a, b) if a.deterministic && a.semanticEquals(b) =>
        SelfCosine(a)
    }
}

/** SparkSessionExtensions wiring (SURVEY §2 custom-op option (c) surface):
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` on a cluster
  * registers the native function and the rewrite at session build. In-process
  * (the driver owns session construction here) the same rule is attached via
  * `spark.experimental.extraOptimizations` — see ExtensionsSpec. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectOptimizerRule(_ => SelfCosineToOne)
    // the two custom physical operators, available without per-query
    // install() calls when the session is built with this extension
    ext.injectPlannerStrategy(_ => BroadcastRangeJoinStrategy)
    ext.injectPlannerStrategy(_ => BroadcastAsofJoinStrategy)
    // ANSI MERGE INTO over registered BucketedReplica views (SURVEY B3's
    // SQL surface) — intercepts the resolved MergeIntoTable in the
    // resolution fixed-point, before Spark's v2-only rewrite rejects it
    ext.injectResolutionRule(_ => GraftMergeInto.InterceptRule)
    // ANSI INSERT INTO over GraftCatalog replica tables: the resolved
    // AppendData routes through BucketedReplica.commit (latest-wins append)
    ext.injectResolutionRule(_ => GraftInsertInto.InterceptRule)
    // ANSI DELETE FROM / UPDATE over replica targets: resolved row-level
    // commands route through the probe-then-rewrite bucket-bounded path
    ext.injectResolutionRule(_ => GraftDeleteUpdate.InterceptRule)
    // CREATE TABLE AS SELECT on GraftCatalog: provision + first commit
    ext.injectResolutionRule(_ => GraftCtas.InterceptRule)
    // GraftCatalog read path: resolved replica-table relations (including
    // VERSION AS OF) become the native parquet plan; MERGE targets stay
    // for the intercept rule above
    ext.injectResolutionRule(session => GraftTableReads(session))
    // SQL table functions over the catalog: graft_changes (version-diff
    // change feed by name) and graft_versions (retained versions + tags)
    GraftTvf.functions.foreach(ext.injectTableFunction)
    ext.injectResolutionRule(session => GraftTvf.ResolveRule(session))
  }
}
