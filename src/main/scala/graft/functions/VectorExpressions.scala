package graft.functions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the dense dot product of two numeric
  * arrays, accumulated in double LEFT-TO-RIGHT (the engine-portable order
  * every oracle uses).
  *
  * Why an Expression and not `aggregate(zip_with(...))`: higher-order
  * functions always evaluate interpreted — per element, a lambda
  * invocation and boxed intermediates — and similarity scoring sits inside
  * broadcast joins where whole rows are evaluated interpreted anyway. This
  * node is one virtual call per ROW in interpreted mode (a primitive
  * loop), and inside whole-stage codegen it inlines as a Java for-loop
  * (`doGenCode`), the preference order the Spark-first design calls for:
  * composed built-ins, then a native Expression, then mapPartitions.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def elem(t: DataType): Option[DataType] = t match {
      case ArrayType(e @ (FloatType | DoubleType), _) => Some(e)
      case _ => None
    }
    if (elem(left.dataType).isDefined && elem(right.dataType).isDefined)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = isFloat(left)
    val rf = isFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lGet = if (isFloat(left)) s"(double)$a.getFloat(i)" else s"$a.getDouble(i)"
      val rGet = if (isFloat(right)) s"(double)$b.getFloat(i)" else s"$b.getDouble(i)"
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int i = 0; i < $n; i++) {
         |  $s += $lGet * $rGet;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column API: `dot_product(a, b)` in double, left-to-right. */
  def dot_product(a: Column, b: Column): Column =
    GraftColumn.of(DotProduct(GraftColumn.exprOf(a), GraftColumn.exprOf(b)))
}
