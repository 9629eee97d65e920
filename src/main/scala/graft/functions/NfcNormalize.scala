package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expression: Unicode NFC normalization
  * (`graft_nfc`) — the canonical-composition step of text
  * canonicalization, so `"e" + COMBINING ACUTE` and the precomposed
  * `"é"` hash/shingle/dedup identically downstream.
  *
  * Spark ships no normalization function, and a Scala UDF would drop
  * the whole projection out of whole-stage codegen (the repo's
  * zero-UDF rule). The JDK's `java.text.Normalizer` implements the
  * Unicode Normalization Forms standard (UAX #15) — the same spec
  * DuckDB's `nfc_normalize` implements, which is what makes the q109
  * oracle an exact-parity check rather than a rows-only one.
  *
  * Fast path: `Normalizer.isNormalized` (the UAX #15 quick-check) is
  * a scan without allocation, and virtually all real text — all
  * ASCII, all precomposed Latin, CJK — is already NFC; the input
  * UTF8String is returned untouched in that case and the
  * allocate+recompose path runs only on actual decompositions.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.simpleString}")
  }

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.NfcNormalize.normalize($x);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Registry builder: exactly one string argument. */
  def fromExprs(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 1)
      throw new IllegalArgumentException(
        s"graft_nfc expects 1 argument (string), got ${exprs.length}")
    NfcNormalize(exprs.head)
  }

  /** Shared by the interpreted and generated paths (the generated
    * code calls this directly, so both are literally the same body).
    */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
