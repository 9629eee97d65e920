package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expression: count elements of an `array<string>`
  * that belong to a fixed word set.
  *
  * Replaces `size(filter(arr, t -> t IN (...)))` on hot text paths —
  * the higher-order-function form evaluates an interpreted lambda per
  * element; this compiles to a hash-set probe loop inside whole-stage
  * codegen. Used by stopword/lang-profile scoring
  * (TextAnalysis.qualityScore / langId).
  */
case class CountInSet(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_count_in"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    var c = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val setRef = ctx.addReferenceObj("wordSet", set, "java.util.HashSet")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |final int $n = $x.numElements();
         |long $c = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && $setRef.contains($x.getUTF8String($i))) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CountInSet =
    copy(child = newChild)
}

object CountInSet {
  /** Word-list wire delimiter: NUL cannot appear in real tokens, so
    * set members containing commas (e.g. "1,000") survive intact.
    */
  val Delimiter = "\u0000"

  /** Registry builder: (array<string>, delimiter-joined word-list
    * literal) — see [[Delimiter]].
    */
  def fromExprs(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"graft_count_in expects 2 arguments (array, word list), got ${exprs.length}")
    exprs(1) match {
      case Literal(s: UTF8String, StringType) =>
        CountInSet(exprs.head, s.toString.split(Delimiter).toSeq)
      case other =>
        throw new IllegalArgumentException(
          s"graft_count_in expects a string literal word list, got $other")
    }
  }
}
