package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over two float vectors
  * (SURVEY §7.3's one justified custom Expression).
  *
  * Why not the `zip_with`+`aggregate` composition (which is what the DuckDB
  * oracle mirrors): that plan materializes an intermediate 64-element array
  * per row and evaluates three separate folds (dot, ‖a‖², ‖b‖²). This
  * expression does one fused pass over the raw ArrayData with no allocation,
  * and participates in whole-stage codegen via doGenCode — on the 100 TB
  * similarity scans this is the difference between memory-bandwidth-bound
  * and allocation-bound.
  *
  * Numeric contract: identical IEEE operation order to the composed form
  * (per-element float→double, sequential multiply-add from 0.0,
  * dot/(√na·√nb)), so results stay bit-identical to the oracle.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  // inputs must be array<float> (AbstractDataType is private[sql], so no
  // ExpectsInputTypes; both call sites go through VectorExpressions.cosine
  // over the embedding column)
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_cosine"
}

/** Degenerate-case companion to [[CosineSimilarity]]: cosine of a vector with
  * itself. For identical inputs the three accumulators of the binary form are
  * bit-identical (dot = na = nb, every term is xi·xi), so
  * na/(√na·√na) reproduces CosineSimilarity(x,x) bit-for-bit — including
  * NaN for zero/empty vectors (0/0) and null-in→null-out — with one array
  * read and one accumulator instead of two and three. Used by the
  * SelfCosineToOne optimizer rule, which must not change results. */
case class SelfCosine(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var na = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      na += xi * xi
      i += 1
    }
    na / (math.sqrt(na) * math.sqrt(na))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val na = ctx.freshName("na"); val xi = ctx.freshName("xi")
      s"""
         |int $n = $a.numElements();
         |double $na = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  $na += $xi * $xi;
         |}
         |${ev.value} = $na / (Math.sqrt($na) * Math.sqrt($na));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_self_cosine"
}

object VectorExpressions {
  private val FN = "graft_cosine"

  /** Idempotently register the expression in the session's function registry
    * (runtime equivalent of SparkSessionExtensions.injectFunction — the
    * driver owns session construction, so injection happens per-call).
    * Truly once per session: re-registering an existing name makes
    * SimpleFunctionRegistry emit a "replaced a previously registered
    * function" warning per call, which at ~250 bench queries floods the
    * log — so probe the registry first. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    val id = new org.apache.spark.sql.catalyst.FunctionIdentifier(FN)
    if (!reg.functionExists(id))
      reg.createOrReplaceTempFunction(
        FN, exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
  }

  /** Column API for the native cosine (register first). */
  def cosine(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function(FN, a, b)
  }
}
