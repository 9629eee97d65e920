package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.SparkSessionExtensions

/** Registration of graft's native Catalyst expressions.
  *
  * Two paths to the same functions:
  *  - [[Registry.ensure]] — idempotent per-session registration,
  *    invoked by the operators themselves, so any externally-created
  *    SparkSession works;
  *  - [[GraftExtensions]] — `spark.sql.extensions=graft.functions.GraftExtensions`
  *    for deployments that want the functions injected at session
  *    build time (cluster-wide SQL access).
  */
object Registry {

  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_dotq", "graft.functions.LongDotProduct",
      exprs => LongDotProduct(exprs(0), exprs(1))),
    ("graft_count_in", "graft.functions.CountInSet",
      exprs => CountInSet.fromExprs(exprs)),
    ("graft_lang_best", "graft.functions.LangBest",
      exprs => LangBest.fromExprs(exprs)),
    ("graft_regexp_groups", "graft.functions.RegexpGroups",
      exprs => RegexpGroups.fromExprs(exprs)),
    ("graft_pii_scan", "graft.functions.PiiScan",
      exprs => PiiScan.fromExprs(exprs)),
    ("graft_nfc", "graft.functions.NfcNormalize",
      exprs => NfcNormalize.fromExprs(exprs)),
    ("graft_sqd2", "graft.functions.VecSqDist",
      exprs => VecSqDist.fromExprs(exprs)),
    ("graft_nearest_code", "graft.functions.NearestCode",
      exprs => NearestCode.fromExprs(exprs)),
    ("graft_quantize", "graft.functions.QuantizeVec",
      exprs => QuantizeVec.fromExprs(exprs)),
    ("graft_vec_sub", "graft.functions.VecSubtract",
      exprs => VecSubtract.fromExprs(exprs)),
    ("graft_rolling_fp", "graft.functions.RollingFingerprints",
      exprs => RollingFingerprints.fromExprs(exprs)))

  /** Idempotently register graft functions in the session's registry.
    * Skips names already present: re-registering emits a "function
    * replaced" warning per call, and `ensure` runs at every operator
    * construction — the warnings burned the bench's bounded stdout
    * tail (round-7 verdict).
    */
  def ensure(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    functions.foreach { case (name, _, builder) =>
      if (!reg.functionExists(FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}

/** SparkSessionExtensions injector (`spark.sql.extensions`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    Registry.functions.foreach { case (name, className, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(className, name),
        builder))
    }
}
