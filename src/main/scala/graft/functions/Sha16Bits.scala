package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the first 16 BITS of sha-256(s) as an
  * int — exactly `cast(conv(substring(sha2(s, 256), 1, 4), 16, 10) as
  * int)` (the feature-hashing device of text_hash_embed /
  * text_quality_model; the DuckDB oracle spells the identical value as
  * `('0x' || substr(sha256(w), 1, 4))::INT`).
  *
  * Why native (round-16 honest-basis finding): the composite spelling
  * allocates a MessageDigest, renders a 64-char hex string, substrings
  * it, and re-parses the hex — per token; inside a higher-order
  * function all of it is INTERPRETED on top (HOFs never enter
  * codegen), which put text_quality_model at 205 s for sf10's 27.5 M
  * tokens. This kernel reuses a thread-local digest, hashes the
  * UTF8String bytes directly, and reads two bytes off the digest —
  * no hex text exists at any point. Values are bit-identical to the
  * composite (first two digest bytes ≡ first four hex chars);
  * NativeFunctionSpec asserts it.
  *
  * Registered as SQL `sha16_bits(s)` via [[GraftExtensions]]. */
case class Sha16Bits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sha16_bits expects a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sha16_bits"

  override def nullSafeEval(s: Any): Any =
    Sha16Bits.bits(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Sha16Bits$$.MODULE$$.bits($c)")

  override protected def withNewChildInternal(newChild: Expression): Sha16Bits =
    copy(child = newChild)
}

object Sha16Bits {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("SHA-256")
  }

  /** First 16 bits of sha-256 over the string's UTF-8 bytes — the
    * eval/codegen shared kernel. */
  def bits(s: UTF8String): Int = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xff) << 8) | (d(1) & 0xff)
  }
}
