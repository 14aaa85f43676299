package graft.exprs

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen kernels for the micro-unit-quantized (ARRAY<BIGINT>) vector
  * queries (q124 k-means, q128 MMR): the integer twins of
  * [[DotProductExpr]]. A zip_with/aggregate HOF chain evaluates its
  * lambdas interpreted per element; these read longs straight out of
  * columnar `ArrayData` inside whole-stage codegen. Both are ascending
  * left folds of exact integer terms, so they are order-insensitive
  * anyway (integer addition is associative) — swapping them in cannot
  * change any fixture or oracle hash.
  *
  * Null/length semantics MATCH the HOF spelling they replace: arrays of
  * different lengths yield NULL (zip_with pads the short side with
  * nulls, which poison the fold) — no silent truncate-to-shorter — and
  * a null array or null element yields NULL.
  */
trait LongVecFold extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  /** Java source for one loop term given element accessors. */
  protected def term(xi: String, yi: String): String
  protected def termEval(xi: Long, yi: Long): Long

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += termEval(x.getLong(i), y.getLong(i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |if ($x.numElements() != $y.numElements()) { ${ev.isNull} = true; }
         |else {
         |  int $n = $x.numElements();
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $xi = $x.getLong($i);
         |    long $yi = $y.getLong($i);
         |    $acc += ${term(xi, yi)};
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
}

/** Σ xᵢ·yᵢ over two ARRAY<BIGINT> — exact integer dot. */
case class LongDotProductExpr(left: Expression, right: Expression) extends LongVecFold {
  protected def term(xi: String, yi: String): String = s"$xi * $yi"
  protected def termEval(xi: Long, yi: Long): Long = xi * yi
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): LongDotProductExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_dot_q"
}

/** Σ (xᵢ−yᵢ)² over two ARRAY<BIGINT> — exact integer squared distance. */
case class LongSqDistExpr(left: Expression, right: Expression) extends LongVecFold {
  protected def term(xi: String, yi: String): String = s"($xi - $yi) * ($xi - $yi)"
  protected def termEval(xi: Long, yi: Long): Long = (xi - yi) * (xi - yi)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): LongSqDistExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_sqdist_q"
}
