package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-string character histogram as one native pass:
  * `graft_char_counts(s)` = ARRAY<STRUCT<ch: STRING, c: BIGINT>> with one
  * entry per distinct code point of `s` and its occurrence count.
  *
  * Purpose (e46): the composed form —
  * `explode(transform(sequence(1, length(s)), i -> substr(s, i, 1)))`
  * followed by a (doc, ch) count — pushes one row PER CHARACTER through
  * Generate + HashAggregate (~3M tiny rows at sf0.1, each paying
  * per-row operator overhead) to produce what is a per-doc histogram over
  * a few dozen distinct characters. This kernel does the same counting in
  * one tight byte-walk per document, so the exploded stream is |alphabet|
  * rows per doc, not |chars| — identical values, ~10× less per-task work,
  * and the win grows with document length (guide §1.2 step 2).
  *
  * Exactness contract: segmentation matches Spark's `substring(s, i, 1)`
  * — one entry per UTF-8 code point, split via the same
  * numBytesForFirstByte walk UTF8String.substring uses, so counts are
  * bit-identical to the composed form (and to the DuckDB twin, which
  * still spells it with unnest). Entry ORDER in the array is first
  * appearance; every consumer explodes into an order-insensitive
  * aggregate, and the exactness of the downstream DECIMAL sums never
  * depends on it.
  */
case class CharCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = CharCounts.outType

  protected override def nullSafeEval(input: Any): Any =
    CharCounts.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharCounts.counts($c)")

  override protected def withNewChildInternal(newChild: Expression): CharCounts =
    copy(child = newChild)

  override def prettyName: String = "graft_char_counts"
}

object CharCounts {
  val outType: ArrayType = ArrayType(StructType(Seq(
    StructField("ch", StringType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)

  /** One pass over the UTF-8 bytes: split into code points exactly the way
    * UTF8String.substring does (numBytesForFirstByte), count into an
    * insertion-ordered map, emit (ch, c) rows. */
  def counts(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val m = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < bytes.length) {
      val w = UTF8String.numBytesForFirstByte(bytes(i))
      val end = math.min(i + w, bytes.length)
      val ch = UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, i, end))
      val slot = m.get(ch)
      if (slot == null) m.put(ch, Array(1L)) else slot(0) += 1L
      i = end
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = InternalRow(e.getKey, e.getValue()(0))
      j += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column): Column = Bridge.column(CharCounts(Bridge.expression(c)))
}
