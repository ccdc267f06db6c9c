package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.DataType

/** Identity that reports `deterministic = false`: evaluates to exactly its
  * child (same values, same codegen — a pure pass-through like [[PinnedKey]]),
  * but the optimizer may not duplicate it, constant-fold it, or substitute it
  * into predicates that get pushed past its Project.
  *
  * Why it exists: the verify stage of the similarity joins computes an
  * expensive per-pair expression (`size(array_intersect(a, b))` over shingle
  * arrays) in a Project ABOVE the candidate join, then filters on it. The
  * optimizer collapses that Filter into the join condition by substituting
  * the alias — evaluating the O(|set|) intersect (with a fresh hash set per
  * call) for EVERY probed pair, BEFORE the cheap `d1 < d2` / length-ratio
  * conjuncts, and TWICE per pair (numerator and union denominator are
  * separate conjunct occurrences; join-condition codegen does no
  * common-subexpression elimination). Measured on e04 at sf0.1 that is ~5×
  * the necessary intersect work. Sealing the aliased expression keeps the
  * plan shape the query declares: join on the cheap keys/prefilters, project
  * the intersect ONCE over surviving pairs, filter on the projected column.
  * Same rows out; the barrier only pins WHERE the expression is evaluated.
  * (This is the JVM-expression analogue of marking an expensive UDF
  * non-deterministic to stop the optimizer duplicating it below a pushed
  * filter — a documented Spark idiom for exactly this plan pathology.)
  */
case class SealedEval(child: Expression) extends UnaryExpression {
  // PythonUDF-style: deterministic=false WITHOUT the Nondeterministic
  // trait's stateful-init machinery — eval is stateless identity.
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override def prettyName: String = "graft_sealed"
  override protected def withNewChildInternal(newChild: Expression): SealedEval =
    copy(child = newChild)
}

object SealedEval {
  /** `withColumn("nc", SealedEval.seal(expensiveExpr))` — evaluate the
    * expression exactly once, exactly where the query places it. */
  def seal(c: Column): Column = Bridge.column(SealedEval(Bridge.expression(c)))
}
