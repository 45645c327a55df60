package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Runtime kernel for [[DotF32]]. */
object DotUtil {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements() || n == 0) return Double.NaN
    var acc = 0.0
    var i = 0
    while (i < n) {
      // null elements invalidate the vector (NOT silently read as 0)
      if (a.isNullAt(i) || b.isNullAt(i)) return Double.NaN
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}

/** Dot product of two `Array[Float]` columns as a native codegen'd
  * expression. The index-side kernel for LSH sign bits and IVF cell
  * assignment: against *unit-normalized* plane/centroid literals,
  * sign(dot) == sign(cos) and argmax dot == argmax cos, while
  * skipping the two norm loops CosineSim would redo per evaluation
  * (~3x fewer flops when one row is scored against many fixed
  * vectors).
  */
case class DotF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.floatArrayPair("dot_f32", left.dataType, right.dataType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f32"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.DotUtil.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF32 =
    copy(left = newLeft, right = newRight)
}
