package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Runtime kernel for [[AlignedHamming]]: merge-join two frame-hash
  * arrays, each sorted ascending by frame index with unique indices
  * (the `sort_array(collect_list(struct(frame_idx, fhash)))` shape),
  * and fold the matched positions — sum of 64-bit hamming distances
  * plus match count. One pass, zero allocation beyond the result row.
  */
object AlignedHammingUtil {
  def eval(a: ArrayData, b: ArrayData): InternalRow = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var sum = 0L
    var n = 0L
    while (i < na && j < nb) {
      val ra = a.getStruct(i, 2)
      val rb = b.getStruct(j, 2)
      val fa = ra.getInt(0)
      val fb = rb.getInt(0)
      if (fa == fb) {
        sum += java.lang.Long.bitCount(ra.getLong(1) ^ rb.getLong(1))
        n += 1
        i += 1
        j += 1
      } else if (fa < fb) i += 1
      else j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](sum, n))
  }
}

/** `aligned_hamming(a, b)` → struct(sum_h bigint, n_matched bigint):
  * the aligned-frame verification fold of the video dedup family
  * (r14 opt round). The old shape joined every candidate pair back to
  * its per-frame hash rows — at sf0.1 the saturated synthetic dHash
  * bands yield 1.35M distinct candidate pairs, so the two
  * verification joins fanned 8M+ (pair, frame) rows through a shuffle
  * and a groupBy to produce 187 surviving pairs. With each clip's
  * frames packed once into a sorted array (clip-count rows), the
  * verification is two id-keyed joins with NO fan-out and this one
  * codegen'd merge fold per pair — identical arithmetic: the same
  * `bit_count(xor)` per aligned frame, the same match count the
  * `(rb, frame_idx)` equi-join produced.
  */
case class AlignedHamming(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(StructType(fs), _) if fs.length == 2 =>
        fs(0).dataType == IntegerType && fs(1).dataType == LongType
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName: both sides must be array<struct<int,bigint>>, got " +
        s"${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("sum_h", LongType, nullable = false),
    StructField("n_matched", LongType, nullable = false)))
  override def prettyName: String = "aligned_hamming"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    AlignedHammingUtil.eval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.AlignedHammingUtil.eval($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AlignedHamming =
    copy(left = newLeft, right = newRight)
}
