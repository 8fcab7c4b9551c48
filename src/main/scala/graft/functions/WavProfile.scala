package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Native kernel for the PCM-16 WAV profile — the `pii_scan`/
  * `sha16_bits` treatment applied to the multimodal decode tier
  * (round 17): the HOF spelling ([[graft.ops.LlmOps
  * .wavDecodeSamplesExpr]] + three interpreted array passes) renders
  * the WHOLE payload to a hex STRING, then per sample allocates two
  * substrings, a concat, and a base-16 `conv` re-parse — measured
  * 72.7 s at the sf10 stress (500k items), the second-largest
  * absolute in the registry, all constant-factor. This expression
  * computes (n_frames, Σx², peak) in ONE linear scan over the payload
  * bytes — no hex render, no per-sample allocation, no samples array.
  *
  * BIT-PARITY CONTRACT (asserted vs the HOF spelling in
  * NativeFunctionSpec): samples are little-endian signed int16 at
  * byte offset 44 + 2i, count = (len − 44) div 2 (a trailing odd
  * byte is ignored, like the HOF's integer division); a payload
  * shorter than 46 bytes (header + one full frame) profiles as the
  * EMPTY sample list — n_frames = 0, sum_sq = 0 (the HOF's fold
  * init), peak = NULL (array_max of an empty list). All exact int64
  * arithmetic ⇒ parity is trivial equality, not IEEE reasoning.
  *
  * Output: struct(n_frames BIGINT, sum_sq BIGINT, peak BIGINT
  * nullable). Registered as SQL `wav_profile(payload)` via
  * [[GraftExtensions]]; the declared `multimodal_wav_decode` and its
  * streaming twin both ride it through LlmOps.wavProfileOf (stateless
  * select — streaming-safe). */
case class WavProfile(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wav_profile expects a binary argument, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_frames", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("peak", LongType, nullable = true)))

  override def prettyName: String = "wav_profile"

  override def nullSafeEval(payload: Any): Any =
    WavProfile.profile(payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WavProfile$$.MODULE$$.profile($c)")

  override protected def withNewChildInternal(newChild: Expression): WavProfile =
    copy(child = newChild)
}

object WavProfile {
  /** One pass over the payload bytes: decode each little-endian
    * signed 16-bit frame after the 44-byte header, accumulating the
    * exact int64 (count, Σx², max |x|) triple. */
  def profile(payload: Array[Byte]): GenericInternalRow = {
    val len = payload.length
    if (len < 46) return new GenericInternalRow(Array[Any](0L, 0L, null))
    val n = (len - 44) / 2
    var sumSq = 0L
    var peak = 0L
    var i = 0
    while (i < n) {
      val off = 44 + 2 * i
      val u = (payload(off) & 0xff) | ((payload(off + 1) & 0xff) << 8)
      val s = if (u >= 32768) u - 65536 else u
      sumSq += s.toLong * s.toLong
      val a = if (s < 0) -s.toLong else s.toLong
      if (a > peak) peak = a
      i += 1
    }
    new GenericInternalRow(Array[Any](n.toLong, sumSq, peak))
  }
}
