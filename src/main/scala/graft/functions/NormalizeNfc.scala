package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the corpus
  * cleaning stage Spark's function library lacks (combining sequences →
  * composed forms, so "e"+U+0301 and "é" hash/dedup/tokenize identically).
  * Canonical-equivalent spellings are invisible to every exact-match
  * operator in the engine (fingerprints, MinHash shingles, exact dedup);
  * normalizing FIRST is what makes those operators correct on real text,
  * which is why the cleaning pipelines of the large web corpora all start
  * here.
  *
  * Custom-op preference order (SURVEY §2): no composition of built-ins can
  * express normalization, so this is option (b) — a scalar expression with
  * doGenCode (one `Normalizer.normalize` call per row inside whole-stage
  * codegen; the JDK implements Unicode canonical composition, the same
  * algorithm DuckDB's nfc_normalize implements, so the oracle twins it
  * exactly). The fast path skips allocation entirely: `isNormalized` is a
  * cheap scan that answers true for ASCII and already-composed text —
  * i.e. almost every row of a real corpus pays one branch, no copy. */
case class NormalizeNfc(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NormalizeNfc.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeNfc.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeNfc =
    copy(child = newChild)

  override def prettyName: String = "graft_nfc"
}

object NormalizeNfc {
  /** Row kernel (shared by eval and codegen). */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def apply(c: Column): Column = Bridge.column(NormalizeNfc(Bridge.expression(c)))
}
