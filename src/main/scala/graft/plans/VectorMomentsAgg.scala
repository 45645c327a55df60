package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** First and second raw moments of an `Array[Float]` column in ONE
  * pass — the covariance input for PCA/whitening
  * ([[graft.operators.Similarity.embedPca]]).
  *
  * Buffer = dim element sums + the UPPER TRIANGLE of the Σ x·xᵀ
  * product sums (dim·(dim+1)/2 doubles — the matrix is symmetric, so
  * the lower half would double the shuffled partial for no
  * information) + count. For dim=64 that is 64+2080+1 = 2145 doubles
  * ≈ 17 KB per mapper partial — constant in the corpus, the
  * [[VectorMeanAgg]] discipline at second order. merge adds
  * element-wise; eval emits the raw buffer (sums ++ products ++
  * count) and the DRIVER finishes cov = S/n − μμᵀ: finishing in the
  * aggregate would force every consumer to want exactly covariance,
  * while the raw moments also serve mean-only and uncentered-Gram
  * consumers.
  *
  * Rows that are null, not exactly `dim` elements, or contain a null
  * or NON-FINITE element are skipped. The null/dim legs are the
  * [[VectorMeanAgg]] / CosUtil contract; the finiteness leg is
  * stricter, borrowed from randomProject's gate, because this
  * aggregate feeds a GLOBAL model: one NaN element would turn the
  * whole covariance — and with it every eigenvector and every
  * projected row — into NaN, where a per-pair kernel merely drops
  * that pair.
  */
case class VectorMomentsAgg(
    child: Expression, dim: Int = 64,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vector_moments"

  private val tri = dim * (dim + 1) / 2
  private val len = dim + tri + 1

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // dim <= 0 fails at ANALYSIS time (the VectorMeanAgg guard); a
    // large dim is a caller error worth stopping before a dim² buffer
    // allocates per group: 1024 → 4.2 MB per partial is the ceiling.
    case _ if dim <= 0 || dim > 1024 => TypeCheckResult.TypeCheckFailure(
      s"vector_moments expects dim in [1, 1024], got $dim")
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_moments expects array<float>, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Double] = new Array[Double](len)

  private lazy val mayHaveNulls: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  private def hasNullElement(arr: ArrayData): Boolean = {
    var i = 0
    while (i < dim) { if (arr.isNullAt(i)) return true; i += 1 }
    false
  }

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == dim && !(mayHaveNulls && hasNullElement(arr))) {
        // decode once into a local double array: the product loop reads
        // each element dim/2 times on average and ArrayData.getFloat is
        // not free. The same pass rejects non-finite elements.
        val x = new Array[Double](dim)
        var i = 0
        var finite = true
        while (i < dim) {
          val f = arr.getFloat(i)
          if (java.lang.Float.isNaN(f) || java.lang.Float.isInfinite(f))
            finite = false
          x(i) = f.toDouble
          i += 1
        }
        if (finite) {
          i = 0
          var t = dim
          while (i < dim) {
            buf(i) += x(i)
            var j = i
            while (j < dim) { buf(t) += x(i) * x(j); j += 1; t += 1 }
            i += 1
          }
          buf(len - 1) += 1.0
        }
      }
    }
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i < len) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any =
    if (buf(len - 1) == 0.0) null
    else new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * len)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(len)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorMomentsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorMomentsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorMomentsAgg =
    copy(child = newChildren(0))
}
