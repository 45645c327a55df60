package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash-64 as a custom imperative aggregate: input per row is one
  * token's 64-bit hash; the buffer keeps 64 signed bit-counts
  * (+1/−1 per bit position), merged by addition, finalized to the
  * sign-bit fingerprint. One buffer update per token instead of 64
  * generated sum() aggregates (same wide-agg compile cost the
  * MinHashSketch rewrite removed — see SURVEY §5b).
  */
case class SimHash64Agg(
    h: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(h)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (h.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64_agg expects bigint, got ${h.dataType.simpleString}")

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = h.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var j = 0
      while (j < 64) {
        buf(j) += (if (((x >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 64) { buf(j) += other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any = {
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (buf(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * 64)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(o: Int): SimHash64Agg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHash64Agg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHash64Agg =
    copy(h = newChildren(0))
}
