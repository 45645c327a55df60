package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Element-wise mean of an `Array[Float]` column (fixed `dim`) — the
  * centroid aggregate for k-means updates / per-group mean embeddings.
  * Buffer = dim double sums + count; merge adds; eval divides. One
  * imperative update per row; partial aggregation shuffles a single
  * (dim+1)-double buffer per group per mapper.
  */
case class VectorMeanAgg(
    child: Expression, dim: Int = 64,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vector_mean"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // dim <= 0 must fail at ANALYSIS time: a negative dim would reach
    // buf(dim) out-of-bounds deep in an executor; dim = 0 would
    // silently average nothing
    case _ if dim <= 0 => TypeCheckResult.TypeCheckFailure(
      s"vector_mean expects a positive dim, got $dim")
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_mean expects array<float>, got ${other.simpleString}")
  }

  // slot dim is the count; slots 0..dim-1 are element sums
  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](dim + 1)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      // Rows with the wrong length or any null element are skipped as
      // invalid vectors — the same guard CosUtil.cos/DotUtil.dot apply,
      // so the library treats degenerate embeddings consistently.
      if (arr.numElements() == dim && !(mayHaveNulls && hasNullElement(arr))) {
        var i = 0
        while (i < dim) { buf(i) += arr.getFloat(i).toDouble; i += 1 }
        buf(dim) += 1.0
      }
    }
    buf
  }

  // Embedding columns are typically containsNull=false: skip the
  // O(dim) per-row null scan entirely when the schema rules nulls out.
  private lazy val mayHaveNulls: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  private def hasNullElement(arr: ArrayData): Boolean = {
    var i = 0
    while (i < dim) { if (arr.isNullAt(i)) return true; i += 1 }
    false
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i <= dim) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any = {
    val n = buf(dim)
    if (n == 0.0) null
    else new GenericArrayData(Array.tabulate(dim)(i => buf(i) / n))
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * (dim + 1))
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(dim + 1)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorMeanAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorMeanAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorMeanAgg =
    copy(child = newChildren(0))
}
