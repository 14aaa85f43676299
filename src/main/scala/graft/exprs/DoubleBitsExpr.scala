package graft.exprs

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Order-preserving DOUBLE → BIGINT bit transform (the classic IEEE-754
  * "sortable bits" trick): for non-negative doubles the raw bit pattern
  * is already ascending; negative doubles are mapped by flipping the 63
  * magnitude bits, so the full signed-long order matches the double
  * order (−max < … < −0.0 < +0.0 < … < +max < NaN).
  *
  * This is the scan-side kernel of [[graft.ops.ExactQuantiles]]: its
  * key projection runs this expression inside whole-stage codegen over
  * the vectorized parquet scan, so the quantile search can binary-search
  * the VALUE domain with integer bucket counts (map-side-combinable,
  * order-free) and then recover the exact original double bit-for-bit
  * via [[graft.ops.ExactQuantiles.fromSortableBits]] — no epsilon, no
  * micro-quantization, no lossy round-trip. Spark has no built-in that
  * exposes float bits, so this is the documented SQL-inexpressible
  * exception class; it is a native codegen expression (not a UDF), also
  * registered as the `graft_double_bits` SQL function.
  */
case class DoubleSortableBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_double_sortable_bits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires DOUBLE input, got ${dt.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val b = java.lang.Double.doubleToLongBits(input.asInstanceOf[Double])
    if (b < 0L) b ^ Long.MaxValue else b
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("bits")
      s"""
         |long $b = Double.doubleToLongBits($c);
         |${ev.value} = ($b < 0L) ? ($b ^ 0x7FFFFFFFFFFFFFFFL) : $b;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DoubleSortableBits =
    copy(child = newChild)
}
