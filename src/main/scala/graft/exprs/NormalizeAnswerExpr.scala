package graft.exprs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.SparkSessionExtensions

/** B30: the custom-Expression tier of the extension surface (SURVEY §7.3's
  * optional upgrade path): `_normalize_answer` (`utils.py:292-306`) as a
  * native Catalyst expression with whole-stage codegen — the generated
  * code calls the static kernel once per row, stays inside the codegen
  * pipeline (no UDF serialization boundary), and is registered as a SQL
  * function so `spark.sql("... graft_normalize(col) ...")` works.
  */
case class NormalizeAnswerExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  // non-string arguments fail at analysis time, not with a mid-job
  // ClassCastException (AbstractDataType/ExpectsInputTypes is private[sql],
  // so the check is spelled directly)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_normalize requires a STRING argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      graft.text.TextKernels.normalizeAnswer(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.text.TextKernels.normalizeAnswer($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): NormalizeAnswerExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_normalize"
}

/** Registration surface: [[register]] installs the functions into a live
  * session; [[GraftExtensions]] is the `spark.sql.extensions` injection
  * point for cluster-wide installs (builder
  * `.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.exprs.GraftExtensions`). */
object GraftFunctions {

  // 3-arg constructor: the usage-string overloads are deprecated since 3.0
  private val normalizeInfo = new ExpressionInfo(
    classOf[NormalizeAnswerExpr].getName, null, "graft_normalize")

  private val dotInfo = new ExpressionInfo(
    classOf[DotProductExpr].getName, null, "graft_dot")

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_normalize"), normalizeInfo,
      (exprs: Seq[Expression]) => NormalizeAnswerExpr(exprs.head))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_dot"), dotInfo,
      (exprs: Seq[Expression]) => DotProductExpr(exprs(0), exprs(1)))
  }

  def inject(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_normalize"), normalizeInfo,
      (exprs: Seq[Expression]) => NormalizeAnswerExpr(exprs.head)))
    ext.injectFunction((FunctionIdentifier("graft_dot"), dotInfo,
      (exprs: Seq[Expression]) => DotProductExpr(exprs(0), exprs(1))))
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftFunctions.inject(ext)
}
