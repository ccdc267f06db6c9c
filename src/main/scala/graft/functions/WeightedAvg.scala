package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, If, IsNull, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Exact weighted average as a DeclarativeAggregate (SURVEY §7.3 — the
  * pure-expression aggregate extension point, completing the triad next to
  * built-ins and the TypedImperativeAggregate MinHashAgg).
  *
  * Buffers are DECIMAL sums (Σw·x at scale 4, Σw at scale 2), so the
  * aggregate is exact, order-insensitive, and partition-invariant — the same
  * reproducibility contract as the rest of the engine — and because update/
  * merge/evaluate are pure Catalyst expressions the whole aggregate
  * participates in codegen (no ImperativeAggregate iterator boundary).
  *
  * Inputs are expected as DECIMAL(18,2) (callers cast); null x or w
  * contributes nothing.
  */
case class WeightedAvg(x: Expression, w: Expression) extends DeclarativeAggregate {

  private val sumWXType = DecimalType(38, 4)
  private val sumWType = DecimalType(38, 2)

  private lazy val sumWX = AttributeReference("sumWX", sumWXType)()
  private lazy val sumW = AttributeReference("sumW", sumWType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(sumWX, sumW)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal(Decimal(0, 38, 4), sumWXType),
    Literal(Decimal(0, 38, 2), sumWType))

  override lazy val updateExpressions: Seq[Expression] = {
    val skip = IsNull(x) || IsNull(w)
    Seq(
      If(skip, sumWX, sumWX + (x * w).cast(sumWXType)),
      If(skip, sumW, sumW + w.cast(sumWType)))
  }

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    sumWX.left + sumWX.right,
    sumW.left + sumW.right)

  // exact decimal sums → one double division at the end (identical on any
  // engine that mirrors the formula)
  override lazy val evaluateExpression: Expression =
    sumWX.cast(DoubleType) / sumW.cast(DoubleType)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(x, w)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(x = c(0), w = c(1))
  override def prettyName: String = "graft_weighted_avg"
}

object WeightedAvg {
  private val FN = "graft_weighted_avg"

  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    if (!reg.functionExists(new org.apache.spark.sql.catalyst.FunctionIdentifier(FN)))
      reg.createOrReplaceTempFunction(
        FN, exprs => WeightedAvg(exprs(0), exprs(1)).toAggregateExpression(), "built-in")
  }

  def weightedAvg(x: Column, w: Column): Column = call_function(FN, x, w)
}
