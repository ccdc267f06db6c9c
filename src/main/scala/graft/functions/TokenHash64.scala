package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The shared cross-engine token hash, computed directly: the first 32 bits
  * of md5(token) as an unsigned long.
  *
  * Bit-identical to the composed form the oracle SQL mirrors —
  * `conv(substring(md5(t), 1, 8), 16, 10) :: BIGINT` — because the first 8
  * hex characters of the digest ARE its first 4 bytes, read big-endian
  * unsigned. The composed form pays for a 32-character hex encode of the
  * full digest, a substring copy, and NumberConverter's string parse on
  * every call; this expression stops at the digest and assembles the long
  * from 4 bytes (measured ~2-3× on the raw hash kernel, and the hash runs
  * under every shingle/posting build in the E family). The digest object is
  * thread-local — no per-call MessageDigest.getInstance.
  *
  * Cross-engine contract: md5 is the point (DuckDB computes the identical
  * digest); do NOT swap in a faster non-cryptographic hash here.
  */
case class TokenHash64(child: Expression) extends UnaryExpression {
  // Input is always StringType at every call site (all go through
  // Extensions.tokenHash over tokenizer output); no ExpectsInputTypes —
  // same pattern as NormalizeNfc.
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_token_hash"

  protected override def nullSafeEval(input: Any): Any =
    TokenHash64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenHash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenHash64 =
    copy(child = newChild)
}

object TokenHash64 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 4 md5 bytes of the UTF-8 encoding, big-endian unsigned. */
  def hash(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  def apply(c: Column): Column = Bridge.column(TokenHash64(Bridge.expression(c)))
}
