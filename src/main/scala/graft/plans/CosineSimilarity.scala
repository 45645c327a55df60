package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Runtime kernel for [[CosineSim]]. Sequential left-to-right double
  * accumulation; the formula `dot / sqrt(na * nb)` is mirrored
  * verbatim by the DuckDB oracle SQL so results are bit-exact across
  * engines (no rounding needed).
  */
object CosUtil {
  /** Same accumulation order as [[cos]] on plain arrays, for typed
    * batch kernels — bit-identical results.
    */
  def cosArr(a: Array[Float], b: Array[Float]): Double = {
    val n = a.length
    if (n != b.length || n == 0) return Double.NaN
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  /** [[cosArr]] between two dim-strided slices of flat packed arrays
    * (blocked batch kernels ship vectors as one primitive float array
    * per block) — identical accumulation order, bit-identical results.
    */
  def cosFlat(a: Array[Float], offA: Int, b: Array[Float], offB: Int,
      dim: Int): Double = {
    if (dim == 0 || offA + dim > a.length || offB + dim > b.length)
      return Double.NaN
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < dim) {
      val x = a(offA + i).toDouble; val y = b(offB + i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  /** Exact replica of Spark's `round(x, 4)` on doubles
    * (BigDecimal.valueOf + HALF_UP), so kernel output equals the
    * declarative `round(cosine_sim(...), 4)` bit-for-bit.
    */
  def round4(d: Double): Double =
    if (d.isNaN || d.isInfinite) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  def cos(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements() || n == 0) return Double.NaN
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      // null elements invalidate the vector (NOT silently read as 0)
      if (a.isNullAt(i) || b.isNullAt(i)) return Double.NaN
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / math.sqrt(na * nb)
  }
}

/** Cosine similarity of two `Array[Float]` embedding columns as a
  * native codegen'd expression — the hot kernel for ANN / near-dup
  * operators. Beats `aggregate(zip_with(...))` (HigherOrderFunction,
  * interpreted lambda) by staying a single static call inside
  * whole-stage codegen, which matters when scoring 1e9+ pairs.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.floatArrayPair("cosine_sim", left.dataType, right.dataType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosUtil.cos(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.CosUtil.cos($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}
