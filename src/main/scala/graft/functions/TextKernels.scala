package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native rolling-window fingerprint kernel for the tokenized-text
  * hot paths.
  *
  * The HOF formulation — `transform(sequence(...), i →
  * md5(concat_ws(" ", element_at(w, i), ..., element_at(w, i+k-1))))`
  * — evaluates an interpreted lambda per WINDOW with k boxed
  * element_at calls and a fresh concat tree each; profiling the r19
  * baseline (guide §1) put q124's window stage at 1.2 s for 500
  * sf0.1 docs on one task. This expression walks the token array
  * once per row in a tight loop, joining each window with single
  * spaces (concat_ws semantics: null tokens skipped) and
  * fingerprinting it natively.
  *
  * Modes (mirroring the three call-site families, each byte-exact
  * with its HOF twin — differential-tested in NativeFunctionsSpec):
  *  - `str`: the window string itself ([[graft.operators.TextAnalysis.shinglesOf]],
  *    q122's span tiles);
  *  - `md5`: lowercase-hex MD5 of the window's UTF-8 bytes, exactly
  *    Spark's `md5` (commons-codec md5Hex — q124/q98/q128);
  *  - `xx`: `xxhash64(window)` at Spark's seed 42 via
  *    [[XxHash64Function]] (the hashed-shingle candidate paths).
  *
  * Window rule: `stride == 1` emits FULL windows only —
  * max(0, n − width + 1) of them (the `sequence(1, n-k+1)` contract;
  * empty array when n < width). `stride > 1` tiles the array —
  * ceil(n / stride) windows, the last one short (q122's
  * `slice(w, p·span+1, span)` contract).
  *
  * Width/stride/mode arrive as foldable literals through the
  * registry builder and live as constructor values, so codegen is a
  * single static call per row.
  */
case class RollingFingerprints(child: Expression, width: Int,
                               stride: Int, mode: String)
    extends UnaryExpression {

  override def prettyName: String = "graft_rolling_fp"

  private val modeV: Int = mode match {
    case "str" => 0
    case "md5" => 1
    case "xx" => 2
    case other => throw new IllegalArgumentException(
      s"$prettyName mode must be str|md5|xx, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if width >= 1 && stride >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName width/stride must be >= 1, got ($width, $stride)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType =
    if (modeV == 2) ArrayType(LongType, containsNull = false)
    else ArrayType(StringType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    TextKernels.rollingFp(t.asInstanceOf[ArrayData], width, stride, modeV)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextKernels.rollingFp($t, $width, $stride, $modeV);")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprints =
    copy(child = newChild)
}

object RollingFingerprints {
  def fromExprs(exprs: Seq[Expression]): RollingFingerprints = {
    require(exprs.length == 4,
      s"graft_rolling_fp takes 4 arguments, got ${exprs.length}")
    require(exprs.drop(1).forall(_.foldable),
      "graft_rolling_fp width/stride/mode must be literals")
    val w = exprs(1).eval().asInstanceOf[Number].intValue()
    val s = exprs(2).eval().asInstanceOf[Number].intValue()
    val m = exprs(3).eval().asInstanceOf[UTF8String].toString
    RollingFingerprints(exprs(0), w, s, m)
  }
}

object TextKernels {

  private val Space = UTF8String.fromString(" ")

  // DigestUtils.md5Hex allocates a fresh MessageDigest per call; at
  // ~k windows per token that construction dominates the hash itself.
  // One digest per thread, manual lowercase-hex — byte-identical
  // output to Spark's md5 (which is DigestUtils.md5Hex).
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HexChars = "0123456789abcdef".toCharArray

  private def md5Hex(bytes: Array[Byte]): UTF8String = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** One row's windows: see [[RollingFingerprints]] for the window
    * rule and modes (0 = str, 1 = md5 hex, 2 = xxhash64 seed 42).
    */
  def rollingFp(toks: ArrayData, width: Int, stride: Int, mode: Int): ArrayData = {
    val n = toks.numElements()
    val count =
      if (stride == 1) math.max(0, n - width + 1)
      else (n + stride - 1) / stride
    val out = new Array[Any](count)
    val parts = new Array[UTF8String](width)
    var p = 0
    while (p < count) {
      val start = p * stride
      val len = math.min(width, n - start)
      var i = 0
      while (i < len) {
        // concat_ws semantics: null tokens are skipped (left null in
        // parts; UTF8String.concatWs skips nulls)
        parts(i) = if (toks.isNullAt(start + i)) null
          else toks.getUTF8String(start + i)
        i += 1
      }
      while (i < width) { parts(i) = null; i += 1 }
      val window = UTF8String.concatWs(Space, parts: _*)
      out(p) = mode match {
        case 0 => window
        case 1 => md5Hex(window.getBytes)
        case _ => java.lang.Long.valueOf(
          XxHash64Function.hash(window, StringType, 42L))
      }
      p += 1
    }
    new GenericArrayData(out)
  }
}
