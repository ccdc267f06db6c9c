package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.DataType

/** Non-foldable identity: evaluates to exactly its child, but reports
  * `foldable = false` so constant folding and `FoldablePropagation` cannot
  * erase it from a window PARTITION BY clause.
  *
  * Why it exists: several queries run a window over an input that is
  * constant-partitioned ON PURPOSE — a k-row centroid seed numbering, a
  * 50-row top-N ranking, the documented global-ntile oracle anchor — or
  * partition by a column the fixture happens to derive from a literal
  * (`b12`'s `tbl`). Declaring the partition as `lit(0)` (or the folded
  * column) does NOT silence Spark's "No Partition Defined" WindowExec
  * warning, because the optimizer folds the literal out of the partition
  * spec and the physical window ends up partition-less anyway. Wrapping the
  * key in [[PinnedKey]] keeps the declared partition in the physical plan —
  * execution is identical (same values, one hash partition for a constant
  * key), the warning disappears, and an auditor reading the plan sees an
  * explicit `graft_pin(…)` marker saying the single partition is deliberate
  * rather than accidental. A genuinely-forgotten global window still warns.
  */
case class PinnedKey(child: Expression) extends UnaryExpression {
  override def foldable: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override def prettyName: String = "graft_pin"
  override protected def withNewChildInternal(newChild: Expression): PinnedKey =
    copy(child = newChild)
}

object PinnedKey {
  /** `partitionBy(PinnedKey.pin(key))` — the warning-free way to declare a
    * deliberate constant (or fixture-constant) window partition. */
  def pin(c: Column): Column = Bridge.column(PinnedKey(Bridge.expression(c)))
}
