package graft.functions

import java.util.regex.Pattern
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expression: one fused PII scan over a string,
  * returning `struct<n_emails bigint, n_phones bigint, redacted
  * string>`.
  *
  * Replaces four independent regex expressions (2× regexp_count + a
  * nested 2× regexp_replace) with three matcher passes sharing one
  * input evaluation: the email pass counts AND redacts in a single
  * find/appendReplacement loop, the phone count runs on the ORIGINAL
  * text (word boundaries beside a redacted email differ from the
  * original — counting on the redacted form would be wrong), and the
  * phone replace runs on the email-redacted text, preserving the
  * exact sequential replace(replace(...)) semantics of the composed
  * form. The q41 plan evaluates its projection twice (range-partition
  * sampling), so halving regex passes pays off twice.
  */
case class PiiScan(child: Expression, emailRe: String, phoneRe: String)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_emails", LongType, nullable = false),
    StructField("n_phones", LongType, nullable = false),
    StructField("redacted", StringType, nullable = false)))

  override def prettyName: String = "graft_pii_scan"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  @transient private lazy val emailPattern = Pattern.compile(emailRe)
  @transient private lazy val phonePattern = Pattern.compile(phoneRe)

  override def nullSafeEval(s: Any): Any =
    PiiScan.scan(s.asInstanceOf[UTF8String], emailPattern, phonePattern)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val email = ctx.addReferenceObj("emailPat", emailPattern,
        "java.util.regex.Pattern")
      val phone = ctx.addReferenceObj("phonePat", phonePattern,
        "java.util.regex.Pattern")
      s"${ev.value} = graft.functions.PiiScan.scan($x, $email, $phone);"
    })

  override protected def withNewChildInternal(newChild: Expression): PiiScan =
    copy(child = newChild)
}

object PiiScan {

  /** The fused matcher passes — called from both interpreted eval and
    * generated code.
    */
  def scan(s: UTF8String, email: Pattern, phone: Pattern): InternalRow = {
    val str = s.toString
    val em = email.matcher(str)
    var nEmails = 0L
    val sb = new StringBuffer(str.length)
    while (em.find()) {
      nEmails += 1
      em.appendReplacement(sb, "<EMAIL>")
    }
    em.appendTail(sb)
    val afterEmail = sb.toString
    val pc = phone.matcher(str)
    var nPhones = 0L
    while (pc.find()) nPhones += 1
    val redacted = phone.matcher(afterEmail).replaceAll("<PHONE>")
    new GenericInternalRow(Array[Any](
      nEmails, nPhones, UTF8String.fromString(redacted)))
  }

  /** Registry builder: (string col, email-regex literal, phone-regex
    * literal).
    */
  def fromExprs(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 3)
      throw new IllegalArgumentException(
        s"graft_pii_scan expects 3 arguments (text, email re, phone re), got ${exprs.length}")
    (exprs(1), exprs(2)) match {
      case (Literal(e: UTF8String, StringType), Literal(p: UTF8String, StringType)) =>
        PiiScan(exprs.head, e.toString, p.toString)
      case other =>
        throw new IllegalArgumentException(
          s"graft_pii_scan expects string literal regexes, got $other")
    }
  }
}
