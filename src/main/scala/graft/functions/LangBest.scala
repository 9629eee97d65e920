package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expression: classify a token array against a set of
  * word profiles in ONE pass, returning the label of the best-matching
  * profile (first-listed profile wins ties; "unknown" when no profile
  * scores > 0).
  *
  * Semantically equal to the cascade
  * `CASE WHEN hits_1 >= greatest(hits_2..n) AND hits_1 > 0 THEN l_1 …`
  * over per-profile `graft_count_in` columns — i.e. first-occurrence
  * argmax — but evaluated as a single expression. That matters for
  * plan shape, not just constant factors: the cascade references each
  * hits column 2-3×, so CollapseProject inlines (and re-evaluates) the
  * whole `split(lower(text))` subtree up to ~12× per row
  * (the SURVEY §7a pitfall; q32 measured 8.3 s → sub-second with this).
  */
case class LangBest(child: Expression, profiles: Seq[(String, Seq[String])])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_lang_best"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    profiles.map { case (_, words) =>
      val s = new java.util.HashSet[UTF8String](words.size * 2)
      words.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  @transient private lazy val labels: Array[UTF8String] =
    profiles.map { case (label, _) => UTF8String.fromString(label) }.toArray

  @transient private lazy val unknown: UTF8String =
    UTF8String.fromString(LangBest.Unknown)

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val k = sets.length
    val counts = new Array[Long](k)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        var j = 0
        while (j < k) {
          if (sets(j).contains(t)) counts(j) += 1
          j += 1
        }
      }
      i += 1
    }
    var best = -1
    var bestCount = 0L
    var j = 0
    while (j < k) {
      if (counts(j) > bestCount) { bestCount = counts(j); best = j }
      j += 1
    }
    if (best < 0) unknown else labels(best)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val setsRef = ctx.addReferenceObj("profileSets", sets,
        "java.util.HashSet[]")
      val labelsRef = ctx.addReferenceObj("profileLabels", labels,
        "org.apache.spark.unsafe.types.UTF8String[]")
      val unknownRef = ctx.addReferenceObj("unknownLabel", unknown,
        "org.apache.spark.unsafe.types.UTF8String")
      val k = ctx.freshName("k")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val best = ctx.freshName("best")
      val bestCount = ctx.freshName("bestCount")
      s"""
         |final int $k = $setsRef.length;
         |final long[] $counts = new long[$k];
         |final int $n = $x.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $t = $x.getUTF8String($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      if ($setsRef[$j].contains($t)) $counts[$j]++;
         |    }
         |  }
         |}
         |int $best = -1;
         |long $bestCount = 0L;
         |for (int $j = 0; $j < $k; $j++) {
         |  if ($counts[$j] > $bestCount) { $bestCount = $counts[$j]; $best = $j; }
         |}
         |${ev.value} = ($best < 0) ? $unknownRef : $labelsRef[$best];
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LangBest =
    copy(child = newChild)
}

object LangBest {
  val Unknown = "unknown"

  /** Profile wire format: profiles joined by [[ProfileDelimiter]], each
    * `label` + [[CountInSet.Delimiter]] + NUL-joined words (NUL cannot
    * appear in real tokens — same rationale as CountInSet).
    */
  val ProfileDelimiter: String = 1.toChar.toString  // SOH control char

  def encode(profiles: Seq[(String, Seq[String])]): String =
    profiles.map { case (label, words) =>
      (label +: words).mkString(CountInSet.Delimiter)
    }.mkString(ProfileDelimiter)

  def decode(spec: String): Seq[(String, Seq[String])] =
    spec.split(ProfileDelimiter).toSeq.map { p =>
      val parts = p.split(CountInSet.Delimiter)
      (parts.head, parts.tail.toSeq)
    }

  /** Registry builder: (array<string>, encoded-profile string literal). */
  def fromExprs(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"graft_lang_best expects 2 arguments (array, profile spec), got ${exprs.length}")
    exprs(1) match {
      case Literal(s: UTF8String, StringType) =>
        LangBest(exprs.head, decode(s.toString))
      case other =>
        throw new IllegalArgumentException(
          s"graft_lang_best expects a string literal profile spec, got $other")
    }
  }
}
